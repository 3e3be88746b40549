package graft.ml

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Property tests for the dedup family against independent, obviously
  * correct Scala specifications — randomized corpora (repeated phrases,
  * shared boilerplate, empty/short docs) instead of the hand-picked
  * examples in `DedupSpec`. Fewer iterations than a pure-JVM property
  * suite: every check runs Spark jobs.
  */
class DedupPropertySpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic forAll at fixed seeds (the scalatest/scalacheck bridge
    * is not in the offline cache).
    */
  private def forAll[T](gen: Gen[T], iters: Int = 12)(check: T => Unit): Unit =
    (0 until iters).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val vocab =
    Vector("alpha", "beta", "gamma", "delta", "rain", "stone", "river",
      "cloud", "iron", "wolf")

  /** Docs built from a small vocabulary so shingle collisions are common —
    * the regime where dedup logic can actually go wrong.
    */
  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(2, 14)
    docs <- Gen.listOfN(n, Gen.chooseNum(0, 9).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** Independent Scala oracle: distinct word-trigram sets per doc, exact
    * pairwise Jaccard.
    */
  private def naiveJaccard(corpus: List[(Long, String)], threshold: Double)
      : Set[(Long, Long, Double)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = corpus.map { case (id, t) => id -> shingles(t) }
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= threshold
    } yield (a, b, j)).toSet
  }

  /** Random (id, text, score) corpora for the keep-best canonical policy. */
  private val genScored: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.chooseNum(2, 14)
    rows <- Gen.listOfN(n, for {
      len <- Gen.chooseNum(0, 5)
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
      score <- Gen.chooseNum(0L, 5L) // small range => frequent ties
      spaced <- Gen.oneOf(" ", "  ") // whitespace variants normalize equal
      upper <- Gen.oneOf(true, false)
    } yield {
      val t = toks.mkString(spaced)
      (if (upper) t.toUpperCase else t, score)
    })
  } yield rows.zipWithIndex.map { case ((t, s), i) => (i.toLong, t, s) }

  test("exactKeepBest equals the naive argmax oracle on random corpora") {
    forAll(genScored) { corpus =>
      val df = corpus.toDF("doc_id", "text", "q")
      val got = Dedup.exactKeepBest(df, "doc_id", "text", col("q"))
        .collect()
        .map(r => (r.getAs[Long]("keep_id"), r.getAs[Long]("score"),
          r.getAs[Long]("dup_count"))).toSet
      // oracle: group by normalized content; keep max score, min id on tie
      val norm = (t: String) => t.trim.toLowerCase.replaceAll("\\s+", " ")
      val expected = corpus.groupBy(c => norm(c._2)).values.map { g =>
        val best = g.minBy(c => (-c._3, c._1))
        (best._1, best._3, g.size.toLong)
      }.toSet
      assert(got == expected, s"corpus=$corpus")
    }
  }

  test("jaccardPairs equals the naive pairwise oracle on random corpora") {
    forAll(genCorpus) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val got = Dedup.jaccardPairs(df, "doc_id", "text", n = 3,
          threshold = 0.5)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = naiveJaccard(corpus, 0.5)
      assert(got.map(p => (p._1, p._2)) == want.map(p => (p._1, p._2)),
        s"corpus=$corpus")
      // jaccard values agree exactly (both are exact ratios of set sizes)
      val wantMap = want.map(p => (p._1, p._2) -> p._3).toMap
      got.foreach { case (a, b, j) =>
        assert(math.abs(j - wantMap((a, b))) < 1e-12) }
    }
  }

  test("split corpora: indexed probe == direct bipartite == naive restriction") {
    forAll(genCorpus, iters = 8) { corpus =>
      val cut = corpus.length / 2
      val (refC, newC) = corpus.splitAt(cut)
      if (refC.nonEmpty && newC.nonEmpty) {
        val refDf = refC.toDF("doc_id", "text")
        val newDf = newC.toDF("doc_id", "text")
        val direct = Dedup.jaccardAgainstReference(newDf, refDf, "doc_id",
            "text", n = 3, threshold = 0.5)
          .select("new_id", "ref_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val idx = java.nio.file.Files.createTempDirectory("propidx").toString
        Dedup.saveShingleIndex(refDf, "doc_id", "text", idx, n = 3,
          numBuckets = 4)
        val probed = Dedup.jaccardAgainstIndex(spark, idx, newDf, "doc_id",
            "text", n = 3, threshold = 0.5, numBuckets = 4)
          .select("new_id", "ref_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val refIds = refC.map(_._1).toSet
        val naive = naiveJaccard(corpus, 0.5)
          .collect { case (a, b, _) if refIds(a) ^ refIds(b) =>
            if (refIds(a)) (b, a) else (a, b) }
        assert(direct == naive, s"corpus=$corpus")
        assert(probed == direct, s"corpus=$corpus")
      }
    }
  }

  test("exactGroups: dup counts sum to corpus size, canonical is the min id") {
    forAll(genCorpus) { corpus =>
      val nonEmpty = corpus // empty-text docs still group (empty fp)
      val df = nonEmpty.toDF("doc_id", "text")
      val g = Dedup.exactGroups(df, "doc_id", "text").collect()
      assert(g.map(_.getAs[Long]("dup_count")).sum == nonEmpty.length)
      val norm = nonEmpty.groupBy(_._2.trim.toLowerCase
        .replaceAll("\\s+", " "))
      g.foreach { row =>
        val canon = row.getAs[Long]("canonical_id")
        // canonical id is the smallest doc id of SOME normalized group
        assert(norm.values.exists(ds => ds.map(_._1).min == canon))
      }
    }
  }

  test("contaminationOverlap: fraction bounds and exact zero/full extremes") {
    forAll(genCorpus, iters = 8) { corpus =>
      val cut = math.max(1, corpus.length / 3)
      val (bench, train) = corpus.splitAt(cut)
      val r = Dedup.contaminationOverlap(train.toDF("doc_id", "text"),
          bench.toDF("doc_id", "text"), "doc_id", "text", n = 3).collect()
      r.foreach { row =>
        val total = row.getAs[Long]("total_ngrams")
        val cont = row.getAs[Long]("contaminated")
        val frac = row.getAs[Double]("overlap_frac")
        assert(total > 0 && cont >= 0 && cont <= total)
        assert(math.abs(frac - cont.toDouble / total) < 1e-12)
      }
      // every reported doc has >= 3 tokens; every >=3-token train doc reports
      val want = train.filter(_._2.split("\\s+").count(_.nonEmpty) >= 3)
        .map(_._1).toSet
      assert(r.map(_.getAs[Long]("train_id")).toSet == want)
    }
  }
}
