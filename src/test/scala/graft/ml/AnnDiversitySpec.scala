package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Result diversification: facet-capped search (`facetCap` — at most m
  * per attribute value per query) and MMR re-ranking
  * ([[Similarity.mmrRerank]] — embedding-space diversity, no attribute
  * needed).
  */
class AnnDiversitySpec extends SparkSuite {
  import spark.implicits._

  private def corpus: DataFrame = (0L until 64L).map { i =>
    (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 13 - 6).toFloat), (i % 3).toInt)
  }.toDF("vec_id", "embedding", "grp")

  private def queries: DataFrame = corpus.filter($"vec_id" < 3)

  test("facetCap: at most m per facet per query, best-first, then true top-k") {
    val dir = java.nio.file.Files.createTempDirectory("div-ivf").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, dir, attrCols = Seq("grp"))
    val got = Similarity.ivfSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbe = 8,
        facetCap = Some(("grp", 1)))
      .select($"q_id", $"n_id", $"grp", $"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // k=3 with cap 1 over 3 facet values -> exactly one of each grp
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == 3, s"q=$q got ${rows.length} rows")
      assert(rows.map(_._3).toSet == Set(0, 1, 2),
        s"q=$q facets ${rows.map(_._3).toSeq}")
    }
    // equivalence: per facet keep the single best by (cosine desc, id
    // asc) from full-probe brute force, then top-3 of those
    val brute = Similarity.knnBruteForce(corpus, queries, "vec_id",
        "embedding", k = 63)
      .join(corpus.select($"vec_id".as("n_id"), $"grp"), "n_id")
    val bestPerFacet = brute
      .withColumn("frk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id", $"grp")
          .orderBy($"cosine".desc, $"n_id".asc)))
      .filter($"frk" === 1)
      .withColumn("rk2", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"q_id").orderBy($"cosine".desc, $"n_id".asc)))
      .filter($"rk2" <= 3)
      .select($"q_id", $"n_id", $"grp", $"rk2".as("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.sorted.toSeq == bestPerFacet.sorted.toSeq)
  }

  test("facetCap composes with rerank: cap constrains the shortlist, " +
      "exact top-k inherits it") {
    val dir = java.nio.file.Files.createTempDirectory("div-rerank").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, dir, attrCols = Seq("grp"))
    val got = Similarity.ivfSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 3, nProbe = 8, rerank = 16,
        facetCap = Some(("grp", 1)))
      .join(corpus.select($"vec_id".as("n_id"), $"grp"), "n_id")
      .select($"q_id", $"n_id", $"grp", $"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // the rerank-path output keeps the (q_id, n_id, dist, rk) contract;
    // joining facets back must show <= 1 per facet per query
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.length == 3, s"q=$q got ${rows.length} rows")
      assert(rows.map(_._3).distinct.length == rows.length,
        s"q=$q facet repeated: ${rows.map(_._3).toSeq}")
    }
  }

  test("facetCap composes with where") {
    val dir = java.nio.file.Files.createTempDirectory("div-where").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, dir, attrCols = Seq("grp"))
    val got = Similarity.ivfSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 4, nProbe = 8,
        where = Some($"grp" =!= 0), facetCap = Some(("grp", 2)))
      .select($"n_id", $"grp").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(got.nonEmpty)
    assert(got.forall(_._2 != 0))
  }

  // MMR fixture: a tight relevant cluster {1, 2} plus a moderately
  // relevant but distinct candidate 3
  private val q = Array(1f, 1f, 0f, 0f)
  private val mmrCorpus = Seq(
    (1L, Array(1f, 0.9f, 0f, 0f)),
    (2L, Array(1f, 0.9f, 0.001f, 0f)),
    (3L, Array(0.5f, 1.2f, 0f, 0f)))
    .toDF("vec_id", "embedding")
  private val mmrQueries = Seq((100L, q)).toDF("vec_id", "embedding")
  private val shortlist = Seq((100L, 1L), (100L, 2L), (100L, 3L))
    .toDF("q_id", "n_id")

  test("MMR at lambda=1 is plain top-k by query similarity") {
    val got = Similarity.mmrRerank(shortlist, mmrCorpus, mmrQueries,
        "vec_id", "embedding", k = 2, lambda = 1.0)
      .orderBy($"rk").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 2L), s"got $got")
  }

  test("MMR at lambda=0.5 trades the near-duplicate for the distinct candidate") {
    val got = Similarity.mmrRerank(shortlist, mmrCorpus, mmrQueries,
        "vec_id", "embedding", k = 2, lambda = 0.5)
      .orderBy($"rk").collect().map(_.getLong(1)).toSeq
    // first pick is still the most relevant (1); the second skips its
    // near-duplicate (2) for the diverse candidate (3)
    assert(got == Seq(1L, 3L), s"got $got")
  }

  test("MMR contract: size min(k, |shortlist|), rk dense from 1, deterministic") {
    val a = Similarity.mmrRerank(shortlist, mmrCorpus, mmrQueries,
        "vec_id", "embedding", k = 10, lambda = 0.7)
      .orderBy($"rk").collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(a.length == 3)
    assert(a.map(_._2) == Seq(1, 2, 3))
    val b = Similarity.mmrRerank(shortlist, mmrCorpus, mmrQueries,
        "vec_id", "embedding", k = 10, lambda = 0.7)
      .orderBy($"rk").collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
    assert(a == b)
  }

  test("MMR end-to-end over a persisted-search shortlist") {
    val dir = java.nio.file.Files.createTempDirectory("div-mmr").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, dir)
    val short = Similarity.ivfSearchPersisted(spark, dir, queries,
      "vec_id", "embedding", k = 20, nProbe = 8)
    val got = Similarity.mmrRerank(short, corpus, queries,
      "vec_id", "embedding", k = 5, lambda = 0.5)
    val rows = got.collect()
    assert(rows.length == 15, s"3 queries x 5 = 15, got ${rows.length}")
    // every returned id came from the query's own shortlist
    val shortSets = short.select($"q_id", $"n_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    rows.foreach { r =>
      assert(shortSets(r.getLong(0)).contains(r.getLong(1)))
    }
  }
}
