package graft

/** Time a single gated query: `Test/runMain graft.TimeOneMain <name> [passes]`.
  * Same session + materialization as [[Bench]]; prints per-pass seconds.
  */
object TimeOneMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.GraftSession.local(cores = cpus, appName = "time-one")
    // queries with a build/search split time like the bench: build once,
    // per-pass figure is the search
    val body: () => org.apache.spark.sql.DataFrame =
      SparkEntry.prepared.get(name) match {
        case Some(p) =>
          val t0 = System.nanoTime()
          val artifact = p.build(spark, sfDir)
          println(f"== build: ${(System.nanoTime() - t0) / 1e9}%.3f s")
          () => p.search(spark, sfDir, artifact)
        case None =>
          val fn = SparkEntry.queries(name)
          () => fn(spark, sfDir)
      }
    (0 until passes).foreach { i =>
      val t0 = System.nanoTime()
      val rows = Bench.materialize(body())
      println(f"== pass $i: ${(System.nanoTime() - t0) / 1e9}%.3f s, $rows rows")
    }
    spark.stop()
  }
}
