package graft.tools
import graft.{Bench, SparkEntry}
import graft.engine.GraftSession
object SpotTime {
  def main(args: Array[String]): Unit = {
    val q = args(0); val dirs = args.drop(1)
    val spark = GraftSession.local(cores = 32, appName = "spot")
    dirs.foreach { d =>
      GraftSession.tables.foreach { t =>
        try GraftSession.table(spark, d, t).count() catch { case _: Throwable => () } }
      // warm once, then measure (the bench protocol)
      Bench.materialize(SparkEntry.queries(q)(spark, d))
      val t0 = System.nanoTime()
      val rows = Bench.materialize(SparkEntry.queries(q)(spark, d))
      println(f"SPOT $q $d ${(System.nanoTime()-t0)/1e9}%.3f sec $rows rows")
    }
    spark.stop()
  }
}
