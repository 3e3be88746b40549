package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Filtered (attribute-constrained) search over the persisted raw-vector
  * indexes: `saveIvfIndex/saveLshIndex(attrCols = ...)` persist metadata
  * inside the list rows, and `where` PRE-filters candidates before
  * ranking — the true top-k among matching vectors, not the matching
  * survivors of an unconstrained top-k.
  */
class AnnFilterSpec extends SparkSuite {
  import spark.implicits._

  // 64 vectors, attribute grp = i mod 3
  private def corpus: DataFrame = (0L until 64L).map { i =>
    (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 13 - 6).toFloat), (i % 3).toInt)
  }.toDF("vec_id", "embedding", "grp")

  private def queries: DataFrame = corpus.filter($"vec_id" < 3)

  test("IVF: full-probe filtered search equals brute force over the matching subset") {
    val dir = java.nio.file.Files.createTempDirectory("fil-ivf").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, dir, attrCols = Seq("grp"))
    val got = Similarity.ivfSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 5, nProbe = 8,
        where = Some($"grp" === 1))
      .select($"q_id", $"n_id", $"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    val want = Similarity.knnBruteForce(corpus.filter($"grp" === 1),
        queries, "vec_id", "embedding", k = 5)
      .select($"q_id", $"n_id", $"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sorted
    assert(got == want)
    // pre-filtering: every query still gets a FULL k of matching ids
    // (21 matching candidates >> k) — a post-filtered top-k would not
    assert(got.groupBy(_._1).forall(_._2.size == 5))
  }

  test("IVF: appends inherit the attribute layout; a batch missing the column fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("fil-app").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, dir, attrCols = Seq("grp"))
    Similarity.appendToIvfIndex(spark,
      Seq((200L, Array(1f, 2f, 3f, 4f), 1)).toDF("vec_id", "embedding", "grp"),
      "vec_id", "embedding", dir)
    val hit = Similarity.ivfSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 64, nProbe = 8,
        where = Some($"grp" === 1))
      .select($"n_id").collect().map(_.getLong(0)).toSet
    assert(hit.contains(200L), "appended attributed vector missing")
    val miss = Similarity.ivfSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 64, nProbe = 8,
        where = Some($"grp" === 2))
      .select($"n_id").collect().map(_.getLong(0)).toSet
    assert(!miss.contains(200L))
    // append without the persisted attribute column: analysis error now,
    // not a silently forked schema
    intercept[org.apache.spark.sql.AnalysisException] {
      Similarity.appendToIvfIndex(spark,
        Seq((300L, Array(1f, 1f, 1f, 1f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dir)
    }
  }

  test("IVF: where composes with deletions and survives compaction") {
    val dir = java.nio.file.Files.createTempDirectory("fil-del").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, dir, attrCols = Seq("grp"))
    def hits(): Set[Long] = Similarity.ivfSearchPersisted(spark, dir,
        queries, "vec_id", "embedding", k = 64, nProbe = 8,
        where = Some($"grp" === 1))
      .select($"n_id").collect().map(_.getLong(0)).toSet
    val full = hits()
    assert(full.nonEmpty && full.forall(_ % 3 == 1))
    val victim = full.head
    Similarity.deleteFromAnnIndex(spark, dir, Seq(victim).toDF("vec_id"),
      "vec_id")
    assert(hits() == full - victim)
    Similarity.compactAnnIndex(spark, dir)
    assert(hits() == full - victim,
      "attributes or tombstone state lost in compaction")
  }

  test("LSH: filtered search returns only matching ids; full k when available") {
    val dir = java.nio.file.Files.createTempDirectory("fil-lsh").toString
    Similarity.saveLshIndex(corpus, "vec_id", "embedding", dir, nBits = 2,
      attrCols = Seq("grp"))
    val got = Similarity.lshSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 3, multiProbe = 2,
        where = Some($"grp" === 2))
      .select($"q_id", $"n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.forall(_._2 % 3 == 2), s"non-matching ids surfaced: ${got.toSeq}")
    // unfiltered search at the same probes finds non-grp-2 neighbors, so
    // the filter is doing real work
    val unfiltered = Similarity.lshSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k = 3, multiProbe = 2)
      .select($"n_id").collect().map(_.getLong(0))
    assert(unfiltered.exists(_ % 3 != 2))
  }
}
