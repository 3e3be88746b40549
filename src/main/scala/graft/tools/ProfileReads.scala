package graft.tools

import graft.SparkEntry
import graft.engine.GraftSession

/** Scratch: cost of constructing DataFrames over a persisted text index —
  * bare spark.read.parquet vs explicit-schema read, per sub-dir.
  */
object ProfileReads {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-reads")
    val prep = SparkEntry.prepared
    val p = prep("q_text_prf")
    val art = p.build(spark, sfDir)
    println(s"artifact: $art")
    // artifact is the index path (string) for text searches
    val path = art.toString
    val dataDir = new java.io.File(path).listFiles().map(_.toString).sorted
      .mkString("\n  ")
    println(s"index tree:\n  $dataDir")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-50s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 3).foreach { i =>
      println(s"pass $i")
      val sch = time("bare read postings (schema inference)") {
        spark.read.parquet(s"$path/data/postings").schema
      }
      time("schema-supplied read postings") {
        spark.read.schema(sch).parquet(s"$path/data/postings").schema
      }
      val dl = time("bare read doclens") {
        spark.read.parquet(s"$path/data/doclens").schema
      }
      time("schema-supplied read doclens") {
        spark.read.schema(dl).parquet(s"$path/data/doclens").schema
      }
      time("readStats") { graft.ml.TextIndex.readStats(spark, path) }
    }
    spark.stop()
  }
}
