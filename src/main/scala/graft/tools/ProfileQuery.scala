package graft.tools

import graft.SparkEntry
import graft.engine.GraftSession

/** Time individual SparkEntry queries (one warm pass, two measured) —
  * local stand-in for a single bench row while iterating on a plan.
  * Run: sbt "runMain graft.tools.ProfileQuery q_a,q_b [sfDir]". */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, appName = "profile-query")
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, sfDir).count() // warm: page cache + codegen
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        println(f"[profile] $n%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($rows rows)")
      }
    }
    spark.stop()
  }
}
