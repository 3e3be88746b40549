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

  test("IVF-PQ TRUE merge via the raw sidecar: parity with append-into-" +
      "copy-of-A, raw-less B fails loudly, deletes fold in, residual too") {
    val e = corpus
    val a = e.filter($"vec_id" < 300L)
    val b = e.filter($"vec_id" >= 300L && $"vec_id" < 600L)
    for (res <- Seq(false, true)) {
      val ia = tmp("mgpA"); val ib = tmp("mgpB")
      val out = tmp("mgpO"); val ref = tmp("mgpR")
      Similarity.saveIvfPqIndex(a, "vec_id", "embedding", 8, ia,
        residual = res)
      Similarity.saveIvfPqIndex(b, "vec_id", "embedding", 8, ib,
        residual = res, keepRawVectors = true)
      // a deleted B vector must not survive the merge
      Similarity.deleteFromAnnIndex(spark, ib,
        Seq(310L).toDF("vec_id"), "vec_id")
      Similarity.mergeIvfPqIndexes(spark, ia, ib, out)
      // reference: rebuild A, append B's raw corpus — the promised
      // contract (same frozen quantizer + codebook)
      Similarity.saveIvfPqIndex(a, "vec_id", "embedding", 8, ref,
        residual = res)
      Similarity.appendToIvfPqIndex(spark,
        b.filter($"vec_id" =!= 310L), "vec_id", "embedding", ref)
      val q = e.filter($"vec_id" < 5L)
      for (np <- Seq(2, 8)) {
        val m = Similarity.ivfPqSearchPersisted(spark, out, q, "vec_id",
          "embedding", k = 3, nProbe = np)
        val r = Similarity.ivfPqSearchPersisted(spark, ref, q, "vec_id",
          "embedding", k = 3, nProbe = np)
        assert(rows(m) == rows(r) && rows(m).nonEmpty,
          s"residual=$res nProbe=$np")
        assert(!m.collect().map(_.getAs[Long]("n_id")).contains(310L))
      }
    }
    // refined (k-means) codebook: the merge reads the persisted model,
    // so Lloyd-refined codebooks re-encode just as the seeded ones do
    {
      val ia = tmp("mgpAr"); val ib = tmp("mgpBr")
      val out = tmp("mgpOr"); val ref = tmp("mgpRr")
      Similarity.saveIvfPqIndex(a, "vec_id", "embedding", 8, ia,
        refineIters = 2, coarseIters = 1)
      Similarity.saveIvfPqIndex(b, "vec_id", "embedding", 8, ib,
        keepRawVectors = true)
      Similarity.mergeIvfPqIndexes(spark, ia, ib, out)
      Similarity.saveIvfPqIndex(a, "vec_id", "embedding", 8, ref,
        refineIters = 2, coarseIters = 1)
      Similarity.appendToIvfPqIndex(spark, b, "vec_id", "embedding", ref)
      val q = e.filter($"vec_id" < 5L)
      val m = Similarity.ivfPqSearchPersisted(spark, out, q, "vec_id",
        "embedding", k = 3, nProbe = 8)
      val r = Similarity.ivfPqSearchPersisted(spark, ref, q, "vec_id",
        "embedding", k = 3, nProbe = 8)
      assert(rows(m) == rows(r) && rows(m).nonEmpty, "refined codebook")
    }

    // raw-less B: loud error naming the fix
    val ia2 = tmp("mgpA2"); val ib2 = tmp("mgpB2")
    Similarity.saveIvfPqIndex(a, "vec_id", "embedding", 8, ia2)
    Similarity.saveIvfPqIndex(b, "vec_id", "embedding", 8, ib2)
    val err = intercept[IllegalArgumentException] {
      Similarity.mergeIvfPqIndexes(spark, ia2, ib2, tmp("mgpX"))
    }
    assert(err.getMessage.contains("keepRawVectors"))
  }

  test("raw sidecar lifecycle: append keeps it in sync; compaction " +
      "purges deleted raw rows so a later merge cannot resurrect them; " +
      "merged output stays mergeable iff both inputs carried raw") {
    val e = corpus
    val a = e.filter($"vec_id" < 200L)
    val b1 = e.filter($"vec_id" >= 200L && $"vec_id" < 400L)
    val b2 = e.filter($"vec_id" >= 400L && $"vec_id" < 500L)
    val ia = tmp("rlA"); val ib = tmp("rlB")
    Similarity.saveIvfPqIndex(a, "vec_id", "embedding", 8, ia,
      keepRawVectors = true)
    Similarity.saveIvfPqIndex(b1, "vec_id", "embedding", 8, ib,
      keepRawVectors = true)
    // append flows into the sidecar too
    Similarity.appendToIvfPqIndex(spark, b2, "vec_id", "embedding", ib)
    // delete + compact: the purge point — tombstone log clears, so the
    // sidecar must shed the row in the same generation step
    Similarity.deleteFromAnnIndex(spark, ib,
      Seq(450L).toDF("vec_id"), "vec_id")
    Similarity.compactAnnIndex(spark, ib)
    val out = tmp("rlO")
    Similarity.mergeIvfPqIndexes(spark, ia, ib, out)
    val q = e.filter($"vec_id" < 5L)
    val got = Similarity.ivfPqSearchPersisted(spark, out, q, "vec_id",
      "embedding", k = 200, nProbe = 8)
    val ids = got.collect().map(_.getAs[Long]("n_id")).toSet
    assert(!ids.contains(450L), "compaction left a resurrectable raw row")
    assert(ids.contains(401L)) // appended rows merged fine
    // both inputs carried raw -> the merged index is itself mergeable
    val ic = tmp("rlC")
    Similarity.saveIvfPqIndex(b2, "vec_id", "embedding", 8, ic,
      keepRawVectors = true)
    val out2 = tmp("rlO2")
    Similarity.mergeIvfPqIndexes(spark, out, ic, out2)
    assert(Similarity.ivfPqSearchPersisted(spark, out2, q, "vec_id",
      "embedding", k = 3, nProbe = 2).collect().nonEmpty)
  }
}
