package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.ml.Similarity

/** Streaming ANN index maintenance ([[StreamOps.annIndexStream]]): the
  * continuously-grown index must hold exactly what the batch path
  * (saveIvfPqIndex on the first batch + appendToIvfPqIndex per later
  * batch) produces, replays must be no-ops, and persisted searches must
  * see vectors from every committed batch.
  */
class AnnIndexStreamSpec extends SparkSuite {
  import spark.implicits._

  // four bootstrap vectors (enough for 2 coarse centroids + 3 PQ cells),
  // then two appended ones — same cluster shape as the PqSpec data
  private val boot = Seq(
    (1L, Array(4f, 2f, 0f, 0f)),
    (2L, Array(0f, 0f, 100f, 100f)),
    (3L, Array(5f, 4f, 0f, 0f)),
    (4L, Array(1f, 2f, 100f, 100f)))
  private val extra = Seq(
    (100L, Array(1f, 2f, 100f, 100f)),
    (101L, Array(6f, 5f, 0f, 0f)))

  private def indexRows(path: String): Set[(Long, Long, Seq[Int])] =
    spark.read.parquet(s"$path/index").collect()
      .map(r => (r.getAs[Long]("v_id"), r.getAs[Long]("centroid_id"),
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq)).toSet

  private def process(path: String, batch: Seq[(Long, Array[Float])],
                      id: Long): Unit =
    StreamOps.processAnnIndexBatch(batch.toDF("vec_id", "embedding"), id,
      "vec_id", "embedding", path, numCentroids = 2, numSubspaces = 2,
      pqCentroids = 3, dim = 4, residual = true)

  test("streamed index == batch-path index; replay is a no-op; searches " +
      "see every committed batch") {
    val streamed = java.nio.file.Files.createTempDirectory("ann-str").toString
    process(streamed, boot, 0L)
    process(streamed, extra, 1L)
    // batch path over the same two batches
    val batch = java.nio.file.Files.createTempDirectory("ann-bat").toString
    Similarity.saveIvfPqIndex(boot.toDF("vec_id", "embedding"), "vec_id",
      "embedding", numCentroids = 2, path = batch, numSubspaces = 2,
      pqCentroids = 3, dim = 4, residual = true)
    Similarity.appendToIvfPqIndex(spark,
      extra.toDF("vec_id", "embedding"), "vec_id", "embedding", batch)
    assert(indexRows(streamed) == indexRows(batch))
    // replayed batch id: nothing double-appended
    val before = indexRows(streamed)
    process(streamed, extra, 1L)
    assert(indexRows(streamed) == before, "replay must be a no-op")
    // persisted search sees appended vectors
    val q = Seq((0L, Array(2f, 3f, 100f, 100f))).toDF("vec_id", "embedding")
    val ids = Similarity.ivfPqSearchPersisted(spark, streamed, q, "vec_id",
        "embedding", k = 4, nProbe = 2)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(ids.contains(100L), s"appended vector missing from search: $ids")
  }

  test("real stream through the writeStream wrapper") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("ann-live").toString
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.annIndexStream(
        input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        s"$dir/index", numCentroids = 2, numSubspaces = 2,
        pqCentroids = 3, dim = 4, residual = true)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData(boot: _*); q.processAllAvailable()
      input.addData(extra: _*); q.processAllAvailable()
    } finally q.stop()
    val got = indexRows(s"$dir/index").map(_._1)
    assert(got == (boot ++ extra).map(_._1).toSet, got.toString)
  }

  test("bootstrap crash between build and commit replays as a rebuild, " +
      "not an append of the bootstrap onto itself") {
    val dir = java.nio.file.Files.createTempDirectory("ann-crash").toString
    process(dir, boot, 0L)
    // simulate the crash window: the build completed (codebook + index
    // exist) but the commit never landed — delete the _last_batch marker
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir, "_last_batch"), false))
    val fresh = indexRows(dir)
    process(dir, boot, 0L) // at-least-once redelivery of the bootstrap
    assert(indexRows(dir) == fresh,
      "replayed bootstrap must rebuild (idempotent), not append duplicates")
    assert(spark.read.parquet(s"$dir/index").count() == boot.size,
      "every bootstrap vector must appear exactly once")
    // a pre-built seed index (codebook, no marker) still routes to append
    val seeded = java.nio.file.Files.createTempDirectory("ann-seed").toString
    Similarity.saveIvfPqIndex(boot.toDF("vec_id", "embedding"), "vec_id",
      "embedding", numCentroids = 2, path = seeded, numSubspaces = 2,
      pqCentroids = 3, dim = 4, residual = true)
    process(seeded, extra, 0L)
    assert(indexRows(seeded).map(_._1) == (boot ++ extra).map(_._1).toSet)
  }

  test("index compaction: one file per list, searches unchanged, appends " +
      "land in the new generation, rebuild resets the pointer") {
    val dir = java.nio.file.Files.createTempDirectory("ann-compact").toString
    process(dir, boot, 0L)
    process(dir, extra, 1L) // second file set in each touched partition
    val q = Seq((0L, Array(2f, 3f, 100f, 100f))).toDF("vec_id", "embedding")
    def search(): Set[(Long, Long)] =
      Similarity.ivfPqSearchPersisted(spark, dir, q, "vec_id", "embedding",
          k = 4, nProbe = 2)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
        .toSet
    def parquetFiles(d: java.io.File): Int =
      d.listFiles().count(f => f.getName.endsWith(".parquet"))
    val before = search()
    val preDirs = new java.io.File(s"$dir/index").listFiles()
      .filter(_.getName.startsWith("centroid_id="))
    assert(preDirs.exists(parquetFiles(_) > 1),
      "append must have created a multi-file partition for this test to bite")
    Similarity.compactAnnIndex(spark, dir)
    // pointer flipped, old generation gone, exactly one file per list
    assert(!new java.io.File(s"$dir/index").exists())
    val genDirs = new java.io.File(s"$dir/index.gen1").listFiles()
      .filter(_.getName.startsWith("centroid_id="))
    assert(genDirs.nonEmpty && genDirs.forall(parquetFiles(_) == 1))
    assert(search() == before, "compaction must not change search results")
    // an append after compaction lands in the ACTIVE generation
    process(dir, Seq((200L, Array(5f, 5f, 0f, 0f))), 2L)
    assert(Similarity.ivfPqSearchPersisted(spark, dir,
        Seq((0L, Array(5f, 5f, 0f, 0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 6, nProbe = 2)
      .collect().map(_.getAs[Long]("n_id")).contains(200L))
    // keepPrevious leaves the superseded generation for mid-scan readers
    Similarity.compactAnnIndex(spark, dir, keepPrevious = true)
    assert(new java.io.File(s"$dir/index.gen1").exists())
    assert(new java.io.File(s"$dir/index.gen2").exists())
    // a rebuild writes the original dir and resets generations
    Similarity.saveIvfPqIndex(boot.toDF("vec_id", "embedding"), "vec_id",
      "embedding", numCentroids = 2, path = dir, numSubspaces = 2,
      pqCentroids = 3, dim = 4, residual = true)
    assert(new java.io.File(s"$dir/index").exists())
    assert(!new java.io.File(s"$dir/index.gen1").exists())
    assert(!new java.io.File(s"$dir/index.gen2").exists())
    assert(!new java.io.File(s"$dir/_index_gen").exists())
  }

  test("compactEvery folds compaction into the maintenance loop") {
    val dir = java.nio.file.Files.createTempDirectory("ann-autoc").toString
    def proc(batch: Seq[(Long, Array[Float])], id: Long): Unit =
      StreamOps.processAnnIndexBatch(batch.toDF("vec_id", "embedding"), id,
        "vec_id", "embedding", dir, numCentroids = 2, numSubspaces = 2,
        pqCentroids = 3, dim = 4, residual = true, compactEvery = 2)
    proc(boot, 0L)
    proc(extra, 1L)
    proc(Seq((300L, Array(7f, 6f, 0f, 0f))), 2L) // batch 2 → compact
    assert(new java.io.File(s"$dir/_index_gen").exists(),
      "batch 2 must have triggered an in-loop compaction")
    assert(!new java.io.File(s"$dir/index").exists())
    val ids = Similarity.ivfPqSearchPersisted(spark, dir,
        Seq((0L, Array(6f, 5f, 0f, 0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 7, nProbe = 2)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(ids == (boot ++ extra).map(_._1).toSet + 300L, ids.toString)
  }

  test("lshIndexStream: streamed == batch union, replay no-op, crash " +
      "window rebuilds, compactEvery fires") {
    val dim64boot = (0L until 8L).map(i =>
      (i, Array.tabulate(64)(d => ((i * 7 + d) % 5 - 2).toFloat)))
    val dim64extra = (100L until 104L).map(i =>
      (i, Array.tabulate(64)(d => ((i * 3 + d) % 7 - 3).toFloat)))
    val dir = java.nio.file.Files.createTempDirectory("lsh-str").toString
    def proc(batch: Seq[(Long, Array[Float])], id: Long): Unit =
      StreamOps.processLshIndexBatch(batch.toDF("vec_id", "embedding"),
        id, "vec_id", "embedding", dir, nBits = 4, compactEvery = 2)
    proc(dim64boot, 0L)
    proc(dim64extra, 1L)
    // equals one index over the union (LSH append is exactly a re-hash)
    val all = (dim64boot ++ dim64extra).toDF("vec_id", "embedding")
    val ref = java.nio.file.Files.createTempDirectory("lsh-ref").toString
    Similarity.saveLshIndex(all, "vec_id", "embedding", ref, nBits = 4)
    val q = all.filter($"vec_id" < 2L)
    def rows(p: String) = Similarity.lshSearchPersisted(spark, p, q,
        "vec_id", "embedding", k = 3, multiProbe = 2)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Int]("rk"))).toSet
    assert(rows(dir) == rows(ref))
    // replay is a no-op
    val n0 = spark.read.parquet(Similarity.activeIndexDir(spark, dir)).count()
    proc(dim64extra, 1L)
    assert(spark.read.parquet(Similarity.activeIndexDir(spark, dir))
      .count() == n0)
    // crash window: delete _last_batch, replay bootstrap → rebuild
    val crash = java.nio.file.Files.createTempDirectory("lsh-crash").toString
    StreamOps.processLshIndexBatch(dim64boot.toDF("vec_id", "embedding"),
      0L, "vec_id", "embedding", crash, nBits = 4)
    val fs = new org.apache.hadoop.fs.Path(crash)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(crash, "_last_batch"), false))
    StreamOps.processLshIndexBatch(dim64boot.toDF("vec_id", "embedding"),
      0L, "vec_id", "embedding", crash, nBits = 4)
    assert(spark.read.parquet(s"$crash/index").count() == dim64boot.size,
      "replayed bootstrap must rebuild, not append duplicates")
    // compactEvery=2 fired at batch 2
    proc(dim64boot.map { case (i, v) => (i + 500, v) }, 2L)
    assert(new java.io.File(s"$dir/_index_gen").exists(),
      "batch 2 must have triggered in-loop compaction")
    assert(rows(dir).nonEmpty)
  }

  test("opCol CDC feed: deletes hide vectors, delete wins in-batch, " +
      "replay converges, compaction purges") {
    val dir = java.nio.file.Files.createTempDirectory("ann-cdc").toString
    def proc(rows: Seq[(Long, Array[Float], String)], id: Long): Unit =
      StreamOps.processAnnIndexBatch(
        rows.toDF("vec_id", "embedding", "op"), id, "vec_id", "embedding",
        dir, numCentroids = 2, numSubspaces = 2, pqCentroids = 3, dim = 4,
        residual = true, opCol = Some("op"))
    def searchIds(): Set[Long] = {
      val q = Seq((0L, Array(2f, 3f, 100f, 100f)),
        (1000L, Array(5f, 4f, 0f, 0f))).toDF("vec_id", "embedding")
      Similarity.ivfPqSearchPersisted(spark, dir, q, "vec_id", "embedding",
        k = 8, nProbe = 2).collect().map(_.getAs[Long]("n_id")).toSet
    }
    // batch 0: bootstrap (all adds)
    proc(boot.map { case (i, v) => (i, v, "add") }, 0L)
    assert(searchIds() == boot.map(_._1).toSet)
    // batch 1: two adds + a delete of an indexed vector AND an in-batch
    // add+delete of the same id (delete wins)
    proc(extra.map { case (i, v) => (i, v, "add") } ++
      Seq((2L, Array(0f, 0f, 0f, 0f), "delete"),
        (500L, Array(9f, 9f, 0f, 0f), "add"),
        (500L, Array(0f, 0f, 0f, 0f), "delete")), 1L)
    val afterB1 = searchIds()
    assert(afterB1 == (boot.map(_._1).toSet - 2L) ++ extra.map(_._1),
      s"got $afterB1")
    // crash replay of batch 1 (delete the commit marker): at-least-once
    // redelivery must converge to the same visible set
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(new org.apache.hadoop.fs.Path(dir, "_last_batch"), false))
    proc(extra.map { case (i, v) => (i, v, "add") } ++
      Seq((2L, Array(0f, 0f, 0f, 0f), "delete"),
        (500L, Array(9f, 9f, 0f, 0f), "add"),
        (500L, Array(0f, 0f, 0f, 0f), "delete")), 1L)
    assert(searchIds() == afterB1, "replayed CDC batch must converge")
    // batch 2: re-insert of the deleted id becomes visible (epoch rule)
    proc(Seq((2L, Array(0f, 0f, 100f, 100f), "add")), 2L)
    assert(searchIds().contains(2L), "re-insert after delete must be visible")
    // compaction purges the tombstoned physical rows
    Similarity.compactAnnIndex(spark, dir)
    assert(searchIds().contains(2L))
    assert(!searchIds().contains(500L))
    assert(!new java.io.File(s"$dir/deletes").exists())
  }

  test("lsh opCol CDC feed: delete hides, re-insert returns") {
    val vecs = (0L until 8L).map(i =>
      (i, Array.tabulate(64)(d => ((i * 7 + d) % 5 - 2).toFloat)))
    val dir = java.nio.file.Files.createTempDirectory("lsh-cdc").toString
    def proc(rows: Seq[(Long, Array[Float], String)], id: Long): Unit =
      StreamOps.processLshIndexBatch(
        rows.toDF("vec_id", "embedding", "op"), id, "vec_id", "embedding",
        dir, nBits = 3, opCol = Some("op"))
    def hits(): Set[Long] = Similarity.lshSearchPersisted(spark, dir,
        vecs.take(2).toDF("vec_id", "embedding"), "vec_id", "embedding",
        k = 8, multiProbe = 3)
      .collect().map(_.getAs[Long]("n_id")).toSet
    proc(vecs.map { case (i, v) => (i, v, "add") }, 0L)
    val full = hits()
    assert(full.nonEmpty)
    val victim = full.head
    proc(Seq((victim, Array.fill(64)(0f), "delete")), 1L)
    assert(!hits().contains(victim))
    proc(Seq(vecs.find(_._1 == victim).map { case (i, v) => (i, v, "add") }.get),
      2L)
    assert(hits().contains(victim), "re-inserted LSH vector must be visible")
  }

  test("an empty batch still commits its id (no replay loop)") {
    val dir = java.nio.file.Files.createTempDirectory("ann-empty").toString
    process(dir, boot, 0L)
    StreamOps.processAnnIndexBatch(
      Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding"), 1L,
      "vec_id", "embedding", dir, numCentroids = 2, numSubspaces = 2,
      pqCentroids = 3, dim = 4, residual = true)
    val before = indexRows(dir)
    // batch 1 is committed: replaying it (even non-empty now) is skipped
    process(dir, extra, 1L)
    assert(indexRows(dir) == before)
    // and a NEW id still appends
    process(dir, extra, 2L)
    assert(indexRows(dir).map(_._1).contains(100L))
  }
}
