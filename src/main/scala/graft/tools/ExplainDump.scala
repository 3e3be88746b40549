package graft.tools

import graft.SparkEntry
import graft.engine.GraftSession

/** Dev tool: print formatted physical plans for selected SparkEntry queries
  * (plan-shape review: pushdown, broadcast, codegen spans).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(cores = 8, appName = "graft-explain")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
