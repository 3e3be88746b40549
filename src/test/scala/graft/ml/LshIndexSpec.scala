package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Persisted sign-LSH index ([[Similarity.saveLshIndex]] /
  * [[Similarity.lshSearchPersisted]]): identical ranking to the ad-hoc
  * [[Similarity.knnLsh]], bucket-partition-pruned reads, the shared
  * append/compact/rebuild lifecycle, and explicit rebuild errors on a
  * stale meta layout.
  */
class LshIndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = graft.engine.GraftSession
    .table(spark, sfDir, "embeddings")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
      r.getAs[Int]("rk"))).toSet

  test("persisted LSH search equals ad-hoc knnLsh, multi-probe included") {
    val e = corpus
    val queries = e.filter($"vec_id" < 5L)
    val dir = java.nio.file.Files.createTempDirectory("lsh-idx").toString
    Similarity.saveLshIndex(e, "vec_id", "embedding", dir, nBits = 4)
    for (mp <- Seq(0, 2)) {
      val adhoc = Similarity.knnLsh(e, queries, "vec_id", "embedding",
        k = 3, nBits = 4, multiProbe = mp)
      val pers = Similarity.lshSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 3, multiProbe = mp)
      assert(rows(pers) == rows(adhoc), s"multiProbe=$mp")
    }
    // the on-disk layout is one directory per bucket
    val dirs = new java.io.File(s"$dir/index").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(dirs.length > 1)
  }

  test("append is visible immediately and hashes with the INDEX'S bits") {
    val e = corpus
    val dir = java.nio.file.Files.createTempDirectory("lsh-app").toString
    Similarity.saveLshIndex(e.filter($"vec_id" < 1000L), "vec_id",
      "embedding", dir, nBits = 4)
    Similarity.appendToLshIndex(spark, e.filter($"vec_id" >= 1000L),
      "vec_id", "embedding", dir)
    val queries = e.filter($"vec_id" < 5L)
    val adhoc = Similarity.knnLsh(e, queries, "vec_id", "embedding",
      k = 3, nBits = 4)
    val pers = Similarity.lshSearchPersisted(spark, dir, queries,
      "vec_id", "embedding", k = 3)
    assert(rows(pers) == rows(adhoc),
      "built+appended index must answer like an index built on the union")
  }

  test("compactAnnIndex works on the bucket layout; searches unchanged") {
    val e = corpus
    val dir = java.nio.file.Files.createTempDirectory("lsh-cmp").toString
    Similarity.saveLshIndex(e.filter($"vec_id" < 1000L), "vec_id",
      "embedding", dir, nBits = 4)
    Similarity.appendToLshIndex(spark, e.filter($"vec_id" >= 1000L),
      "vec_id", "embedding", dir)
    val queries = e.filter($"vec_id" < 5L)
    val before = rows(Similarity.lshSearchPersisted(spark, dir, queries,
      "vec_id", "embedding", k = 3, multiProbe = 2))
    Similarity.compactAnnIndex(spark, dir)
    assert(!new java.io.File(s"$dir/index").exists())
    val genDirs = new java.io.File(s"$dir/index.gen1").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(genDirs.nonEmpty && genDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    assert(rows(Similarity.lshSearchPersisted(spark, dir, queries,
      "vec_id", "embedding", k = 3, multiProbe = 2)) == before)
    // appends keep working against the active generation
    Similarity.appendToLshIndex(spark,
      Seq((90001L, Array.fill(64)(1f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", dir)
    assert(spark.read.parquet(s"$dir/index.gen1")
      .filter($"v_id" === 90001L).count() == 1)
  }

  test("stale/empty/future meta fails with an explicit rebuild message") {
    val e = corpus
    val dir = java.nio.file.Files.createTempDirectory("lsh-meta").toString
    Similarity.saveLshIndex(e, "vec_id", "embedding", dir, nBits = 4)
    val queries = e.filter($"vec_id" < 2L)
    def searchFails(): String =
      intercept[IllegalStateException] {
        Similarity.lshSearchPersisted(spark, dir, queries, "vec_id",
          "embedding", k = 3).collect()
      }.getMessage
    // wrong columns (pre-version layout)
    Seq((4, "x")).toDF("bits", "junk")
      .write.mode("overwrite").parquet(s"$dir/meta")
    assert(searchFails().contains("rebuild"))
    // right schema, zero rows
    Seq.empty[(Int, Int)].toDF("n_bits", "format_version")
      .write.mode("overwrite").parquet(s"$dir/meta")
    assert(searchFails().contains("rebuild"))
    // future version
    Seq((4, 99)).toDF("n_bits", "format_version")
      .write.mode("overwrite").parquet(s"$dir/meta")
    assert(searchFails().contains("rebuild"))
  }

  // bucket-partition pruning is pinned with scan metrics in
  // PersistedPruningSpec, alongside the IVF/IVF-PQ contracts
}
