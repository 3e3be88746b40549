package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Similarity.assignToCentroidsSpill]] / `ivfSearch(spill = r)` and the
  * persisted-index spill lifecycle — multi-assignment must degrade to the
  * classic single assignment at r = 1, become EXACT at full replication,
  * never emit duplicate result rows, and keep its replication factor
  * coherent through save / append / delete / merge.
  */
class IvfSpillSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = {
    val rows = (0L until 40L).map { i =>
      val v = Array.fill(8)(0.1f * ((i % 5) + 1))
      v((i % 4).toInt * 2) = 5f + i
      (i, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }
  private def q = vecs.filter($"vec_id" < 4)

  private def resultTriples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
      r.getAs[Int]("rk"))).toSet

  test("spill = 1 IS the classic single assignment; full replication " +
      "at nProbe = 1 equals brute force; no duplicate result rows") {
    val plain = Similarity.ivfSearch(vecs, q, "vec_id", "embedding",
      k = 3, numCentroids = 8, nProbe = 2)
    val spill1 = Similarity.ivfSearch(vecs, q, "vec_id", "embedding",
      k = 3, numCentroids = 8, nProbe = 2, spill = 1)
    assert(resultTriples(spill1) == resultTriples(plain))
    // every vector in EVERY list: one probe sees the whole corpus
    val full = Similarity.ivfSearch(vecs, q, "vec_id", "embedding",
      k = 3, numCentroids = 8, nProbe = 1, spill = 8)
    val brute = Similarity.knnBruteForce(vecs, q, "vec_id", "embedding", 3)
    assert(resultTriples(full) == resultTriples(brute))
    // spill = 2: candidates reached via both shared lists collapse
    val s2 = Similarity.ivfSearch(vecs, q, "vec_id", "embedding",
      k = 10, numCentroids = 8, nProbe = 4, spill = 2)
    val pairs = s2.select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.distinct.size == pairs.size, "duplicate (q, n) rows")
  }

  test("persisted spill lifecycle: marker round-trips, search equals " +
      "ad-hoc, appends replicate, deletes hide every copy, radius " +
      "results stay sets, merge refuses mismatched factors") {
    val dir = java.nio.file.Files.createTempDirectory("ivf-spill").toString
    Similarity.saveIvfIndex(vecs, "vec_id", "embedding", 8, dir, spill = 2)
    assert(Similarity.indexSpill(spark, dir) == 2)
    // each vector sits in exactly two lists
    val idx = spark.read.parquet(s"$dir/index")
    assert(idx.count() == 80L)
    assert(idx.groupBy("v_id").count().filter($"count" =!= 2).count() == 0)
    val pers = Similarity.ivfSearchPersisted(spark, dir, q, "vec_id",
      "embedding", k = 3, nProbe = 2)
    val adhoc = Similarity.ivfSearch(vecs, q, "vec_id", "embedding",
      k = 3, numCentroids = 8, nProbe = 2, spill = 2)
    assert(resultTriples(pers) == resultTriples(adhoc))
    // append honors the index's factor: the new vector lands twice
    val extra = Seq((100L, Array.fill(8)(1f))).toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(spark, extra, "vec_id", "embedding", dir)
    assert(spark.read.parquet(s"$dir/index")
      .filter($"v_id" === 100L).count() == 2L)
    // a delete hides BOTH replicas
    Similarity.deleteFromAnnIndex(spark, dir,
      Seq(100L).toDF("vec_id"), "vec_id")
    val afterDel = Similarity.ivfSearchPersisted(spark, dir, q, "vec_id",
      "embedding", k = 40, nProbe = 8)
    assert(!afterDel.collect().exists(_.getAs[Long]("n_id") == 100L))
    // radius results are sets even when both replicas are probed
    val rad = Similarity.ivfRadiusSearchPersisted(spark, dir, q,
      "vec_id", "embedding", minCosine = 0.0, nProbe = 8)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rad.distinct.size == rad.size, "duplicate radius pairs")
    // exact re-rank WITHOUT an external corpus derives it from the
    // spilled index — replicas must collapse first, or each candidate
    // scores twice and duplicates occupy top-k slots
    val rr = Similarity.ivfSearchPersisted(spark, dir, q, "vec_id",
      "embedding", k = 5, nProbe = 8, rerank = 20)
    val rrRows = rr.collect()
    val rrPairs = rrRows.map(r => (r.getAs[Long]("q_id"),
      r.getAs[Long]("n_id"))).toSeq
    assert(rrPairs.distinct.size == rrPairs.size,
      "duplicate reranked rows from spilled replicas")
    assert(rrRows.groupBy(_.getAs[Long]("q_id")).values
      .forall(_.length == 5), "rerank must fill k DISTINCT slots")
    // merge refuses a spill-factor fork instead of silently mixing
    val plainDir = java.nio.file.Files.createTempDirectory("ivf-s1").toString
    Similarity.saveIvfIndex(vecs, "vec_id", "embedding", 8, plainDir)
    val out = java.nio.file.Files.createTempDirectory("ivf-out").toString
    val ex = intercept[IllegalArgumentException] {
      Similarity.mergeIvfIndexes(spark, dir, plainDir, out)
    }
    assert(ex.getMessage.contains("spill factors differ"), ex.getMessage)
    // rebuild at spill = 1 clears the marker (no stale dedup exchange)
    Similarity.saveIvfIndex(vecs, "vec_id", "embedding", 8, dir)
    assert(Similarity.indexSpill(spark, dir) == 1)
  }
}
