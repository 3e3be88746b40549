package graft.tools

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.ml.Similarity

/** Measurement harness for [[graft.ml.Similarity.compactAnnIndex]]'s
  * `localitySort` option: build the same IVF and IVF-PQ indexes twice
  * from the corpus at `SPARK_GRAFT_SF_DIR`, compact one copy with the
  * locality layout and one without, then run the identical probed search
  * against both and report bytes-on-disk (the compression effect) and
  * bytes/records scanned by the search (the page-read effect). Prints one
  * JSON line per (type, layout) cell — the committed evidence for whether
  * the layout pays.
  */
object IvfLayoutProbe {

  private final class ScanListener
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val tm = e.taskMetrics
      if (tm != null) {
        bytes.addAndGet(tm.inputMetrics.bytesRead)
        records.addAndGet(tm.inputMetrics.recordsRead)
        ()
      }
    }
    def reset(): Unit = { bytes.set(0); records.set(0) }
  }

  private def dirBytes(p: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-ivf-layout")
    spark.sparkContext.setLogLevel("WARN")
    val scan = new ScanListener
    spark.sparkContext.addSparkListener(scan)
    val e = GraftSession.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    val n = e.count()
    val cents = Similarity.autoCoarseCentroids(n)
    val queries = e.filter(col("vec_id") < 50)

    def cell(kind: String, sorted: Boolean): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"ivflayout-$kind-$sorted").toString
      if (kind == "ivf")
        Similarity.saveIvfIndex(e, "vec_id", "embedding", cents, dir)
      else
        Similarity.saveIvfPqIndex(e, "vec_id", "embedding", cents, dir,
          numSubspaces = 8,
          pqCentroids = Similarity.autoPqCentroids(n),
          residual = true)
      Similarity.compactAnnIndex(spark, dir, localitySort = sorted)
      val active = java.nio.file.Paths.get(dir, "index.gen1")
      val onDisk = dirBytes(active)
      // measure the SEARCH scan only: probes + probed list partitions
      def searchOnce(): Long = {
        val res =
          if (kind == "ivf")
            Similarity.ivfSearchPersisted(spark, dir, queries,
              "vec_id", "embedding", k = 10, nProbe = Similarity.autoNProbe(cents))
          else
            Similarity.ivfPqSearchPersisted(spark, dir, queries,
              "vec_id", "embedding", k = 10, nProbe = Similarity.autoNProbe(cents),
              rerank = 0)
        res.agg(count(lit(1))).head.getLong(0)
      }
      searchOnce() // warm (page cache, codegen) — measured pass below
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      scan.reset()
      val t0 = System.nanoTime()
      val rows = searchOnce()
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"kind":"$kind","locality_sort":$sorted,"corpus_rows":$n,""" +
        s""""result_rows":$rows,"index_bytes":$onDisk,""" +
        s""""search_bytes_read":${scan.bytes.get()},""" +
        s""""search_records_read":${scan.records.get()},"sec":$sec}"""
    }

    Seq("ivf" -> false, "ivf" -> true, "ivfpq" -> false, "ivfpq" -> true)
      .foreach { case (kind, sorted) => println(cell(kind, sorted)) }
    spark.stop()
  }
}
