package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Index merges ([[Similarity.mergeLshIndexes]] /
  * [[Similarity.mergeIvfIndexes]]): LSH merge is exactly a rebuild from
  * the union corpus (buckets are data-independent); IVF merge keeps A's
  * quantizer and re-assigns B (parity with assigning the union under A's
  * centroids); deletion state folds in; layout mismatches fail loudly.
  */
class AnnMergeSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = graft.engine.GraftSession
    .table(spark, sfDir, "embeddings")

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
      r.getAs[Int]("rk"))).toSet

  test("LSH merge == rebuild from the union corpus; deletes fold in") {
    val e = corpus
    val a = e.filter($"vec_id" < 300L)
    val b = e.filter($"vec_id" >= 300L && $"vec_id" < 600L)
    val ia = tmp("mglA"); val ib = tmp("mglB")
    val out = tmp("mglO"); val ref = tmp("mglR")
    Similarity.saveLshIndex(a, "vec_id", "embedding", ia, nBits = 4)
    Similarity.saveLshIndex(b, "vec_id", "embedding", ib, nBits = 4)
    Similarity.deleteFromAnnIndex(spark, ia,
      Seq(7L).toDF("vec_id"), "vec_id")
    Similarity.mergeLshIndexes(spark, ia, ib, out)
    Similarity.saveLshIndex(
      a.filter($"vec_id" =!= 7L).unionByName(b),
      "vec_id", "embedding", ref, nBits = 4)
    val q = e.filter($"vec_id" < 5L)
    val m = Similarity.lshSearchPersisted(spark, out, q, "vec_id",
      "embedding", k = 3, multiProbe = 2)
    val r = Similarity.lshSearchPersisted(spark, ref, q, "vec_id",
      "embedding", k = 3, multiProbe = 2)
    assert(rows(m) == rows(r) && rows(m).nonEmpty)
    // mismatched widths fail loudly
    val ic = tmp("mglC")
    Similarity.saveLshIndex(b, "vec_id", "embedding", ic, nBits = 6)
    intercept[IllegalArgumentException] {
      Similarity.mergeLshIndexes(spark, ia, ic, tmp("mglX"))
    }
  }

  test("IVF merge keeps A's quantizer; parity with union-under-A") {
    val e = corpus
    val a = e.filter($"vec_id" < 300L)
    val b = e.filter($"vec_id" >= 300L && $"vec_id" < 600L)
    val ia = tmp("mgiA"); val ib = tmp("mgiB")
    val out = tmp("mgiO"); val ref = tmp("mgiR")
    Similarity.saveIvfIndex(a, "vec_id", "embedding", 8, ia)
    Similarity.saveIvfIndex(b, "vec_id", "embedding", 8, ib)
    Similarity.mergeIvfIndexes(spark, ia, ib, out)
    // reference: A's index with B appended (appendToIvfIndex assigns to
    // A's centroids — the same quantizer contract the merge promises)
    Similarity.saveIvfIndex(a, "vec_id", "embedding", 8, ref)
    Similarity.appendToIvfIndex(spark, b, "vec_id", "embedding", ref)
    val q = e.filter($"vec_id" < 5L)
    for (np <- Seq(2, 8)) {
      val m = Similarity.ivfSearchPersisted(spark, out, q, "vec_id",
        "embedding", k = 3, nProbe = np)
      val r = Similarity.ivfSearchPersisted(spark, ref, q, "vec_id",
        "embedding", k = 3, nProbe = np)
      assert(rows(m) == rows(r) && rows(m).nonEmpty, s"nProbe=$np")
    }
    // merged index supports the lifecycle: delete is visible
    Similarity.deleteFromAnnIndex(spark, out,
      Seq(301L).toDF("vec_id"), "vec_id")
    val after = Similarity.ivfSearchPersisted(spark, out, q, "vec_id",
      "embedding", k = 3, nProbe = 8)
    assert(!after.collect().map(_.getAs[Long]("n_id")).contains(301L))
  }
}
