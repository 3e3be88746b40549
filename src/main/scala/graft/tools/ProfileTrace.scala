package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.GraftSession
import graft.query.Traces

/** Stage-by-stage timing of q_trace_critical_path — splits the driver-side
  * maxSpans job from the BFS assembly job so optimization targets the real
  * cost. Run: sbt "runMain graft.tools.ProfileTrace [sfDir]". */
object ProfileTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, appName = "profile-trace")
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    def spans = {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      GraftSession.table(spark, sfDir, "events")
        .select(col("user_id").as("t_id"),
          (row_number().over(w) - 1).cast("long").as("s_id"),
          floor(col("value") * 100).cast("long").as("dur"))
        .withColumn("p_id",
          when(col("s_id") === 0L, lit(null).cast("long"))
            .otherwise(((col("s_id") - 1) / 2).cast("long")))
    }

    // warm pass (page cache + codegen)
    timed("warm: spans count")(spans.count())

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val maxSpans = timed("maxSpans collect")(
        spans.groupBy(col("t_id")).count()
          .agg(max(col("count"))).collect()(0).getLong(0))
      val depth = (63 - java.lang.Long.numberOfLeadingZeros(maxSpans)).toInt + 1
      println(s"[profile] maxSpans=$maxSpans depth=$depth")
      val lazyOut = timed("lazy BFS (eagerCheck=false)")(
        Traces.criticalPath(spans, "t_id", "s_id", "p_id", "dur",
          maxDepth = depth, eagerCheck = false).count())
      val eagerOut = timed("eager BFS (default)")(
        Traces.criticalPath(spans, "t_id", "s_id", "p_id", "dur").count())
      val groupedOut = timed("grouped (mapGroups)")(
        Traces.criticalPathGrouped(spans, "t_id", "s_id", "p_id", "dur").count())
      println(s"[profile] rows lazy=$lazyOut eager=$eagerOut grouped=$groupedOut")
    }
    spark.stop()
  }
}
