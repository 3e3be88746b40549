package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSuite

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f)), // close to 1
    (3L, Array(0f, 1f, 0f)),     // orthogonal to 1
    (4L, Array(-1f, 0f, 0f)),    // opposite of 1
  ).toDF("vec_id", "embedding")

  test("cosine is exact on unit axes") {
    val c = vecs.filter($"vec_id" === 1L)
      .crossJoin(vecs.filter($"vec_id" === 3L).select($"embedding".as("e2")))
      .select(Similarity.cosine($"embedding", $"e2").as("c")).as[Double].head()
    assert(c == 0.0)
  }

  test("knnBruteForce ranks by cosine desc with id tiebreak, excludes self") {
    val r = Similarity
      .knnBruteForce(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding", 3)
      .orderBy("rk").collect()
    assert(r.map(_.getAs[Long]("n_id")).toSeq == Seq(2L, 3L, 4L))
    assert(r.map(_.getAs[Int]("rk")).toSeq == Seq(1, 2, 3))
  }

  test("signBucket buckets by coordinate signs") {
    val b = vecs.select($"vec_id", Similarity.signBucket($"embedding", 3).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == 7L)  // all coords >= 0
    assert(b(4L) == 6L)  // first coord negative
  }

  test("knnLsh only returns same-bucket candidates") {
    val r = Similarity
      .knnLsh(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding",
        k = 3, nBits = 3)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(!r.contains(4L)) // different bucket (negative first coord)
    assert(r.contains(2L))
  }

  test("nearDupPairs returns ordered pairs above threshold only") {
    val p = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.9)
      .collect()
    assert(p.length == 1)
    assert((p(0).getAs[Long]("id_a"), p(0).getAs[Long]("id_b")) == (1L, 2L))
  }

  test("persisted IVF index returns exactly the ad-hoc ivfSearch results") {
    val corpus = graft.engine.GraftSession
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = corpus.filter($"vec_id" < 5L)
    val adhoc = Similarity.ivfSearch(corpus, queries, "vec_id", "embedding",
        k = 3, numCentroids = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val path = java.nio.file.Files.createTempDirectory("ivf").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, path = path)
    val persisted = Similarity.ivfSearchPersisted(spark, path, queries,
        "vec_id", "embedding", k = 3, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(persisted == adhoc)
    // the on-disk layout is one directory per centroid list
    val dirs = new java.io.File(s"$path/index").listFiles()
      .filter(_.getName.startsWith("centroid_id="))
    assert(dirs.length > 1)
  }
}
