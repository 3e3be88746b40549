package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Radius (threshold) retrieval ([[Similarity.radiusSearch]] /
  * [[Similarity.ivfRadiusSearchPersisted]]): brute-force ground truth,
  * full-probe parity of the persisted path, subset behavior at small
  * nProbe, attribute pre-filtering, and deletion visibility.
  */
class RadiusSearchSpec extends SparkSuite {
  import spark.implicits._

  // two tight clusters far apart plus one outlier
  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(0.9f, 0.1f, 0f, 0f), 0),
    (2L, Array(0.8f, 0.2f, 0f, 0f), 1),
    (3L, Array(0f, 0f, 1f, 0f), 0),
    (4L, Array(0f, 0.1f, 0.9f, 0f), 1),
    (5L, Array(0f, 0f, 0f, 1f), 0))
    .toDF("vec_id", "embedding", "label")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"q_id", $"n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("radiusSearch returns exactly the pairs above the threshold") {
    val got = pairs(Similarity.radiusSearch(vecs,
      vecs.filter($"vec_id" === 0L), "vec_id", "embedding", 0.9))
    // cos(0,1) ≈ 0.9939, cos(0,2) ≈ 0.9701; all others ≤ 0
    assert(got == Set((0L, 1L), (0L, 2L)))
    val loose = pairs(Similarity.radiusSearch(vecs,
      vecs.filter($"vec_id" === 0L), "vec_id", "embedding", -1.0))
    assert(loose == Set((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L)))
  }

  test("persisted radius search: full probe depth equals brute force; " +
      "small nProbe is a subset; where pre-filters; deletion hides") {
    val idx = java.nio.file.Files.createTempDirectory("radidx").toString
    Similarity.saveIvfIndex(vecs, "vec_id", "embedding",
      numCentroids = 3, idx, attrCols = Seq("label"))
    val q = vecs.filter($"vec_id" === 0L)
    val brute = pairs(Similarity.radiusSearch(vecs, q,
      "vec_id", "embedding", 0.9))
    val full = pairs(Similarity.ivfRadiusSearchPersisted(spark, idx, q,
      "vec_id", "embedding", 0.9, nProbe = 3))
    assert(full == brute)
    val narrow = pairs(Similarity.ivfRadiusSearchPersisted(spark, idx, q,
      "vec_id", "embedding", 0.9, nProbe = 1))
    assert(narrow.subsetOf(full))
    val filtered = pairs(Similarity.ivfRadiusSearchPersisted(spark, idx, q,
      "vec_id", "embedding", 0.9, nProbe = 3,
      where = Some(col("label") === 1)))
    assert(filtered == Set((0L, 2L)))
    Similarity.deleteFromAnnIndex(spark, idx,
      Seq(1L).toDF("vec_id"), "vec_id")
    val afterDel = pairs(Similarity.ivfRadiusSearchPersisted(spark, idx, q,
      "vec_id", "embedding", 0.9, nProbe = 3))
    assert(afterDel == Set((0L, 2L)))
  }
}
