package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Eval.thresholdSweep]] — one-pass precision/recall tables. */
class EvalSpec extends SparkSuite {
  import spark.implicits._

  test("sweep matches the brute-force per-threshold confusion table") {
    // scores 1..20; label = score is even
    val df = (1L to 20L).map(s => (s, s % 2 == 0)).toDF("score", "y")
    val out = Eval.thresholdSweep(df, "score", "y", Seq(5L, 10L, 15L))
      .orderBy($"threshold")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val expected = Seq(5L, 10L, 15L).map { t =>
      val tp = (1L to 20L).count(s => s >= t && s % 2 == 0).toLong
      val fp = (1L to 20L).count(s => s >= t && s % 2 != 0).toLong
      val fn = 10L - tp
      val tn = 10L - fp
      (t, tp, fp, fn, tn, tp * 1000000L / (tp + fp), tp * 1000000L / 10L)
    }
    assert(out == expected)
  }

  test("zero denominators yield null, not a division error") {
    val df = Seq((1L, true), (2L, false)).toDF("score", "y")
    val r = Eval.thresholdSweep(df, "score", "y", Seq(100L))
      .collect().head
    assert(r.getLong(1) == 0L && r.getLong(3) == 1L) // tp 0, fn 1
    assert(r.isNullAt(5)) // precision null at tp+fp = 0
    assert(r.getLong(6) == 0L) // recall 0/1 = 0
    // all-negative labels: recall null too
    val neg = Eval.thresholdSweep(
      Seq((1L, false)).toDF("score", "y"), "score", "y", Seq(0L))
      .collect().head
    assert(neg.isNullAt(6))
  }

  test("aucExact: perfect, random-tied, and inverted separations") {
    // perfect: all positives above all negatives → AUC 1
    val perfect = (1L to 10L).map(s => (s, s > 5))
    assert(Eval.aucExact(perfect.toDF("score", "y"), "score", "y")
      .collect().head.getLong(2) == 1000000L)
    // all scores tied → AUC exactly 1/2 (tie half-credit)
    val tied = Seq((5L, true), (5L, true), (5L, false), (5L, false))
    assert(Eval.aucExact(tied.toDF("score", "y"), "score", "y")
      .collect().head.getLong(2) == 500000L)
    // inverted → AUC 0
    val inv = (1L to 10L).map(s => (s, s <= 5))
    assert(Eval.aucExact(inv.toDF("score", "y"), "score", "y")
      .collect().head.getLong(2) == 0L)
    // hand case with a partial tie: pos {3,5}, neg {3,4}
    // pairs: (3,3)=.5 (3,4)=0 (5,3)=1 (5,4)=1 → U=2.5/4 → 625000
    val mixed = Seq((3L, true), (5L, true), (3L, false), (4L, false))
    assert(Eval.aucExact(mixed.toDF("score", "y"), "score", "y")
      .collect().head.getLong(2) == 625000L)
    // single-class input → null
    assert(Eval.aucExact(Seq((1L, true)).toDF("score", "y"), "score", "y")
      .collect().head.isNullAt(2))
  }

  test("calibrationBins: clamped edges, exact rates") {
    val df = Seq((-5L, false), (0L, true), (100L, true), (100L, false),
      (799L, true), (2000L, true)).toDF("score", "y")
    val r = Eval.calibrationBins(df, "score", "y", lo = 0L, hi = 800L,
        nBins = 8)
      .orderBy($"bin")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4))).toSeq
    // bin width 100: bin 0 = {-5 clamped (neg), 0 (pos)}, bin 1 = the
    // two 100s (one pos), bin 7 = {799, 2000 clamped} both pos
    assert(r == Seq((0L, 0L, 2L, 1L, 500000L), (1L, 100L, 2L, 1L, 500000L),
      (7L, 700L, 2L, 2L, 1000000L)))
  }

  test("aucExact distributed cumulative: wide spans (multi-score " +
      "buckets), negative scores, empty input") {
    // span ≫ 4096 → several distinct scores share a bucket; negative
    // min exercises the (s - mn) rebase. Brute-force pairwise oracle.
    val rows = (0 until 500).map { i =>
      val s = -40000L + i.toLong * 163L // spans ~81k, crosses buckets
      (s, (i * 7 % 3) != 0)
    }
    val got = Eval.aucExact(rows.toDF("score", "y"), "score", "y")
      .collect().head
    val pos = rows.filter(_._2).map(_._1); val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val exp = u2 * 1000000L / (2L * pos.size * neg.size)
    assert(got.getLong(0) == pos.size.toLong &&
      got.getLong(1) == neg.size.toLong && got.getLong(2) == exp)
    // empty input → (0, 0, null)
    val empty = Eval.aucExact(
      Seq.empty[(Long, Boolean)].toDF("score", "y"), "score", "y")
      .collect().head
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L &&
      empty.isNullAt(2))
  }

  test("apExact matches the brute-force rank walk: ties broken by id, " +
      "wide spans, degenerate inputs") {
    def brute(rows: Seq[(Long, Long, Boolean)]): (Long, Long, Option[Long]) = {
      val sorted = rows.sortBy(r => (-r._1, r._2))
      var cp = 0L; var s = 0L; var k = 0L
      sorted.foreach { case (_, _, y) =>
        k += 1; if (y) { cp += 1; s += cp * 1000000L / k } }
      (cp, rows.size.toLong, if (cp > 0) Some(s / cp) else None)
    }
    def run(rows: Seq[(Long, Long, Boolean)]) = {
      val r = Eval.apExact(rows.toDF("score", "id", "y"),
        "score", "y", "id").collect().head
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))
    }
    // heavy ties (few distinct scores, many ids) + negative scores +
    // wide span so rows cross buckets
    val rows = (0 until 400).map { i =>
      val s = Seq(-50000L, -3L, 0L, 7L, 90000L)(i % 5)
      (s, i.toLong, (i * 11 % 7) < 3)
    }
    assert(run(rows) == brute(rows))
    // perfect ranking → exactly 1
    val perfect = (0 until 50).map(i => (100L - i, i.toLong, i < 10))
    assert(run(perfect) == ((10L, 50L, Some(1000000L))))
    assert(run(perfect) == brute(perfect))
    // no positives → null; empty → (0, 0, null)
    assert(run(Seq((5L, 1L, false))) == ((0L, 1L, None)))
    assert(run(Seq.empty[(Long, Long, Boolean)]) == ((0L, 0L, None)))
  }

  test("retrievalMetrics: rr/hits/recall per judged query, standard " +
      "conventions") {
    val ranking = Seq(
      (0L, 100L, 1L), (0L, 101L, 2L), (0L, 102L, 3L), // q0: rel at rk 2,3
      (1L, 100L, 1L), (1L, 103L, 2L),                 // q1: no rel ranked
      (2L, 104L, 1L))                                 // q2: rel at rk 1
      .toDF("q_id", "doc_id", "rk")
    val relevant = Seq(
      (0L, 101L), (0L, 102L), (0L, 999L), // n_rel 3, hits 2, first 2
      (1L, 999L),                         // n_rel 1, hits 0
      (2L, 104L),                         // n_rel 1, hits 1, first 1
      (3L, 777L))                         // judged but never ranked
      .toDF("q_id", "doc_id")
    val out = Eval.retrievalMetrics(ranking, relevant)
      .orderBy($"q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(out == Seq(
      (0L, 3L, 2L, 2L, 500000L, 666666L),
      (1L, 1L, 0L, -1L, 0L, 0L),
      (2L, 1L, 1L, 1L, 1000000L, 1000000L),
      (3L, 1L, 0L, -1L, 0L, 0L)))
    // unjudged queries (ranking-only) are omitted — nothing to score
    assert(!out.exists(_._1 == 4L))
  }

  test("retrievalMetrics: duplicated ranked rows do NOT inflate hits " +
      "or push recall past 1e6 (best rank wins)") {
    val ranking = Seq(
      (0L, 101L, 2L), (0L, 101L, 5L), (0L, 101L, 2L), // same doc 3×
      (0L, 102L, 3L))
      .toDF("q_id", "doc_id", "rk")
    val relevant = Seq((0L, 101L), (0L, 102L)).toDF("q_id", "doc_id")
    val out = Eval.retrievalMetrics(ranking, relevant).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L) // n_rel
    assert(r.getLong(2) == 2L) // hits == distinct relevant ranked, not 4
    assert(r.getLong(3) == 2L) // first_rank = best duplicate
    assert(r.getLong(5) == 1000000L) // recall capped by construction
  }

  test("ndcgAtK: matches a brute-force double-precision nDCG, perfect " +
      "ranking scores 1e6, conventions for unjudged/unranked/all-zero") {
    // q0: perfect — grades 3,2,1 ranked in that order
    // q1: inverted — grade-1 doc first, grade-3 doc last (+ unjudged doc)
    // q2: judged (grade 2) but never ranked -> dcg 0, ndcg 0
    // q3: all grades zero -> idcg 0 -> ndcg null
    val ranking = Seq(
      (0L, 10L, 1L), (0L, 11L, 2L), (0L, 12L, 3L),
      (1L, 21L, 1L), (1L, 99L, 2L), (1L, 23L, 3L),
      (3L, 40L, 1L))
      .toDF("q_id", "doc_id", "rk")
    val judgments = Seq(
      (0L, 10L, 3L), (0L, 11L, 2L), (0L, 12L, 1L),
      (1L, 23L, 3L), (1L, 21L, 1L),
      (2L, 30L, 2L),
      (3L, 40L, 0L))
      .toDF("q_id", "doc_id", "grade")
    val out = Eval.ndcgAtK(ranking, judgments, 10)
      .orderBy($"q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    def term(g: Long, rk: Long): Long =
      math.floor(1000000.0 * g * 0.6931471805599453 /
        math.log(rk + 1.0)).toLong
    val dcg0 = term(3, 1) + term(2, 2) + term(1, 3)
    val dcg1 = term(1, 1) + term(3, 3)
    val idcg1 = term(3, 1) + term(1, 2)
    assert(out == Seq(
      (0L, dcg0, dcg0, 1000000L),
      (1L, dcg1, idcg1, dcg1 * 1000000L / idcg1),
      (2L, 0L, term(2, 1), 0L),
      (3L, 0L, 0L, -1L)))
    // inverted < perfect
    assert(dcg1 * 1000000L / idcg1 < 1000000L)
    // k cuts BOTH the ranking and the ideal: at k=1, q1 scores the
    // grade-1 doc against an ideal of the grade-3 doc
    val k1 = Eval.ndcgAtK(ranking, judgments, 1)
      .filter($"q_id" === 1L).collect().head
    assert(k1.getLong(1) == term(1, 1) && k1.getLong(2) == term(3, 1))
    // duplicate ranked rows / duplicate judgments don't change anything
    val dup = Eval.ndcgAtK(
      ranking.unionAll(ranking), judgments.unionAll(judgments), 10)
      .orderBy($"q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(dup == out)
    // macro summary: q3 (all-zero grades) is UNDEFINED — excluded from
    // the mean, not zeroed into it
    val s = Eval.ndcgSummary(Eval.ndcgAtK(ranking, judgments, 10))
      .collect().head
    assert(s.getLong(0) == 4L && s.getLong(1) == 3L)
    val defined = out.filter(_._4 >= 0).map(_._4)
    assert(s.getLong(2) == defined.sum / defined.size)
    // nothing scored → null mean, not a division error
    val none = Eval.ndcgSummary(Eval.ndcgAtK(ranking,
      Seq((9L, 1L, 0L)).toDF("q_id", "doc_id", "grade"), 10))
      .collect().head
    assert(none.getLong(0) == 1L && none.getLong(1) == 0L && none.isNullAt(2))
  }

  test("prCurve matches the brute-force walk and integrates to apExact") {
    val rows = (0 until 300).map { i =>
      val s = Seq(-9000L, -1L, 4L, 4L, 777L)(i % 5) // dup bucket values
      (s, i.toLong, (i * 13 % 5) < 2)
    }
    val got = Eval.prCurve(rows.toDF("score", "id", "y"),
        "score", "y", "id")
      .orderBy($"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val sorted = rows.sortBy(r => (-r._1, r._2))
    val p = rows.count(_._3).toLong
    var cp = 0L
    val exp = sorted.zipWithIndex.flatMap { case ((_, _, y), k0) =>
      val k = k0 + 1L
      if (y) { cp += 1; Some((k, cp, cp * 1000000L / k, cp * 1000000L / p)) }
      else None
    }
    assert(got == exp)
    // the AP scalar is the mean of the curve's precision points
    val ap = Eval.apExact(rows.toDF("score", "id", "y"),
      "score", "y", "id").collect().head.getLong(2)
    assert(ap == exp.map(_._3).sum / p)
    // degenerates: no positives / empty input → empty curve
    assert(Eval.prCurve(Seq((1L, 1L, false)).toDF("score", "id", "y"),
      "score", "y", "id").count() == 0L)
    assert(Eval.prCurve(Seq.empty[(Long, Long, Boolean)]
      .toDF("score", "id", "y"), "score", "y", "id").count() == 0L)
  }

  test("retrievalSummary: exact macro means over the per-query metrics") {
    val ranking = Seq((0L, 100L, 1L), (0L, 101L, 2L), (1L, 100L, 1L),
        (2L, 104L, 1L))
      .toDF("q_id", "doc_id", "rk")
    val relevant = Seq((0L, 101L), (0L, 999L), (1L, 999L), (2L, 104L))
      .toDF("q_id", "doc_id")
    val m = Eval.retrievalMetrics(ranking, relevant)
    val r = Eval.retrievalSummary(m).collect().head
    // rr: q0 = 500000, q1 = 0, q2 = 1000000 → mrr 1500000/3
    // recall: q0 = 500000, q1 = 0, q2 = 1000000 → macro 500000
    // success: 2 of 3
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 500000L, 500000L, 666666L)))
  }

  test("rank-walk PROPERTY: aucExact/apExact/prCurve match brute force " +
      "across random spans, tie densities and label rates") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 5) {
      val n = 80 + rnd.nextInt(120)
      val span = Seq(3L, 40L, 100000L, 4000000000L)(trial % 4)
      val rows = (0 until n).map { i =>
        (rnd.nextLong() % span, i.toLong, rnd.nextInt(4) == 0)
      }
      val df = rows.toDF("score", "id", "y")
      // brute AUC over distinct pairs
      val pos = rows.filter(_._3).map(_._1)
      val neg = rows.filterNot(_._3).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val twoU = (for (p <- pos; q <- neg)
          yield if (p > q) 2L else if (p == q) 1L else 0L).sum
        val expAuc = twoU * 1000000L / (2L * pos.size * neg.size)
        assert(Eval.aucExact(df, "score", "y").collect().head.getLong(2)
          == expAuc, s"trial $trial auc")
      }
      // brute AP + PR walk
      val sorted = rows.sortBy(r => (-r._1, r._2))
      var cp = 0L; var apSum = 0L; var k = 0L
      val curve = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      sorted.foreach { case (_, _, y) =>
        k += 1
        if (y) { cp += 1; apSum += cp * 1000000L / k; curve += ((k, cp)) }
      }
      if (cp > 0) {
        assert(Eval.apExact(df, "score", "y", "id")
          .collect().head.getLong(2) == apSum / cp, s"trial $trial ap")
        val got = Eval.prCurve(df, "score", "y", "id")
          .orderBy($"rk").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        assert(got == curve.toSeq, s"trial $trial curve")
      }
    }
  }

  test("aucGuardOk: division form survives products that wrap Long") {
    assert(Eval.aucGuardOk(0L, 5L) && Eval.aucGuardOk(5L, 0L))
    assert(Eval.aucGuardOk(1000L, 1000L))
    // 3.1e9 × 3.1e9 wraps to a small positive Long — the old product
    // form PASSED this; the division form must reject it
    val b = 3100000000L
    assert(BigInt(b) * BigInt(b) > BigInt(Long.MaxValue)) // truly over
    assert(!Eval.aucGuardOk(b, b))
    // just inside the cap: P·N == maxLong/2e6 exactly
    val cap = Long.MaxValue / 2000000L
    assert(Eval.aucGuardOk(1L, cap) && !Eval.aucGuardOk(1L, cap + 1))
  }

  test("apByGroup matches per-group apExact") {
    val df = ((0 until 120).map { i =>
      ("a", Seq(-7L, 0L, 13L, 900L)(i % 4), i.toLong, i % 3 == 0) } ++
      Seq(("b", 5L, 200L, true), ("b", 4L, 201L, false)) ++
      Seq(("c", 1L, 300L, false)))
      .toDF("g", "score", "id", "y")
    val grouped = Eval.apByGroup(df, "g", "score", "y", "id")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    for (g <- Seq("a", "b", "c")) {
      val single = Eval.apExact(df.filter($"g" === g), "score", "y", "id")
        .collect().head
      val exp = if (single.isNullAt(2)) None else Some(single.getLong(2))
      assert(grouped(g) == exp, s"group $g")
    }
    assert(grouped("b") == Some(1000000L) && grouped("c") == None)
  }

  test("aucByGroup matches per-group aucExact") {
    val df = ((1L to 10L).map(s => ("a", s, s > 5)) ++
      Seq(("b", 5L, true), ("b", 5L, false)) ++
      Seq(("c", 1L, true))).toDF("g", "score", "y")
    val grouped = Eval.aucByGroup(df, "g", "score", "y")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(grouped == Map("a" -> Some(1000000L), "b" -> Some(500000L),
      "c" -> None))
    for (g <- Seq("a", "b", "c")) {
      val single = Eval.aucExact(df.filter($"g" === g), "score", "y")
        .collect().head
      val exp = if (single.isNullAt(2)) None else Some(single.getLong(2))
      assert(grouped(g) == exp, s"group $g")
    }
  }

  test("thresholds must be strictly ascending") {
    val df = Seq((1L, true)).toDF("score", "y")
    intercept[IllegalArgumentException] {
      Eval.thresholdSweep(df, "score", "y", Seq(5L, 5L))
    }
    intercept[IllegalArgumentException] {
      Eval.thresholdSweep(df, "score", "y", Nil)
    }
  }

  test("precisionAtK: trec convention (divide by k), rank cut, dup " +
      "dedupe, zero-hit and never-ranked queries score 0") {
    val ranking = Seq(
      // q0: rel docs at rk 1,2,7 — only 2 inside k=5
      (0L, 100L, 1L), (0L, 101L, 2L), (0L, 102L, 3L), (0L, 103L, 7L),
      // q1: relevant doc duplicated at rk 6 and 3 — best rank 3 counts
      (1L, 200L, 6L), (1L, 200L, 3L),
      // q2: nothing relevant in the ranking
      (2L, 300L, 1L))
      .toDF("q_id", "doc_id", "rk")
    val relevant = Seq(
      (0L, 100L), (0L, 101L), (0L, 103L), (0L, 999L),
      (1L, 200L), (1L, 201L),
      (2L, 888L),
      (3L, 777L)) // judged, never ranked
      .toDF("q_id", "doc_id")
    val out = Eval.precisionAtK(ranking, relevant, 5)
      .orderBy($"q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(out == Seq(
      (0L, 4L, 2L, 400000L, 500000L),   // hits@5 = rk1,2 (rk7 cut)
      (1L, 2L, 1L, 200000L, 500000L),   // dup collapses to best rank 3
      (2L, 1L, 0L, 0L, 0L),
      (3L, 1L, 0L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Eval.precisionAtK(ranking, relevant, 0)
    }
  }

  test("retrievalTopline: one row combining the binary macro summary " +
      "with macro nDCG") {
    val ranking = Seq((0L, 10L, 1L), (1L, 20L, 1L))
      .toDF("q_id", "doc_id", "rk")
    val relevant = Seq((0L, 10L), (1L, 99L)).toDF("q_id", "doc_id")
    val judgments = Seq((0L, 10L, 2L), (1L, 20L, 0L))
      .toDF("q_id", "doc_id", "grade")
    val out = Eval.retrievalTopline(
      Eval.retrievalMetrics(ranking, relevant),
      Eval.ndcgAtK(ranking, judgments, 10)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(r.fieldIndex("n_queries")) == 2L)
    assert(r.getLong(r.fieldIndex("mrr_micro")) == 500000L)
    assert(r.getLong(r.fieldIndex("success_rate_micro")) == 500000L)
    // q1 has idcg 0 -> excluded; q0 is perfect -> macro nDCG = 1e6
    assert(r.getLong(r.fieldIndex("n_scored")) == 1L)
    assert(r.getLong(r.fieldIndex("macro_ndcg_micro")) == 1000000L)
  }

  test("ece: brute-force parity, clamping, and the one-row shape") {
    // scores 0..99 over [0, 100), 4 bins of width 25; label = score >= 50
    // plus two out-of-range rows that must clamp into the edge bins
    val rows = (0L until 100L).map(s => (s, s >= 50L)) ++
      Seq((-10L, false), (500L, true))
    val df = rows.toDF("score", "y")
    val out = Eval.ece(df, "score", "y", lo = 0L, hi = 100L, nBins = 4)
      .collect().head
    // brute force (same clamp, same integer grid)
    val clamped = rows.map { case (s, y) => (math.min(math.max(s, 0L), 100L), y) }
    val byBin = clamped.groupBy { case (s, _) =>
      math.min(math.max(s * 4 / 100, 0L), 3L) }
    val gaps = byBin.values.map { g =>
      val n = g.size.toLong
      val acc = g.count(_._2).toLong * 1000000L / n
      val conf = g.map(_._1).sum * 1000000L / (n * 100L)
      (n, math.abs(acc - conf))
    }
    val n = gaps.map(_._1).sum
    assert(out.getLong(out.fieldIndex("n")) == n && n == 102L)
    assert(out.getLong(out.fieldIndex("n_bins")) == byBin.size)
    assert(out.getLong(out.fieldIndex("ece_micro")) ==
      gaps.map { case (nb, g) => nb * g }.sum / n)
    assert(out.getLong(out.fieldIndex("mce_micro")) == gaps.map(_._2).max)
    intercept[IllegalArgumentException] {
      Eval.ece(df, "score", "y", 0L, 0L, 4)
    }
    // span·nBins would wrap the bin id — rejected up front, never
    // silently mis-binned
    intercept[IllegalArgumentException] {
      Eval.ece(df, "score", "y", 0L, Long.MaxValue / 2, 4)
    }
    // hi − lo itself wraps negative for extreme lo < 0 < hi
    intercept[IllegalArgumentException] {
      Eval.ece(df, "score", "y", Long.MinValue, Long.MaxValue, 1)
    }
  }

  test("ece: a perfectly calibrated scorer has zero error") {
    // one bin [0, 2): every score 1, half positive -> acc 500000,
    // conf 500000
    val df = Seq((1L, true), (1L, false)).toDF("score", "y")
    val r = Eval.ece(df, "score", "y", 0L, 2L, 1).collect().head
    assert(r.getLong(r.fieldIndex("ece_micro")) == 0L)
    assert(r.getLong(r.fieldIndex("mce_micro")) == 0L)
  }

  test("rankAgreement: identical, reversed, and disjoint rankings") {
    def rk(q: Long, docs: Seq[Long]) =
      docs.zipWithIndex.map { case (d, i) => (q, d, i + 1L) }
    // q0: identical lists; q1: exactly reversed; q2: disjoint docs
    val a = (rk(0L, Seq(1, 2, 3)) ++ rk(1L, Seq(1, 2, 3)) ++
      rk(2L, Seq(1, 2))).toDF("q_id", "doc_id", "rk")
    val b = (rk(0L, Seq(1, 2, 3)) ++ rk(1L, Seq(3, 2, 1)) ++
      rk(2L, Seq(8, 9))).toDF("q_id", "doc_id", "rk")
    val out = Eval.rankAgreement(a, b, 10).orderBy($"q_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) Long.MinValue else r.getLong(5))).toSeq
    assert(out == Seq(
      (0L, 3L, 3L, 3L, 1000000L, 1000000L),   // perfect agreement
      (1L, 3L, 3L, 3L, 1000000L, -1000000L),  // same set, reversed order
      (2L, 2L, 2L, 0L, 0L, Long.MinValue)))   // no common docs: tau null
  }

  test("rboAtK: brute-force parity; identical lists hit 1-p^k; " +
      "top-weighted (rank-1 agreement beats rank-k agreement); " +
      "disjoint lists score 0") {
    val k = 5
    val p = 0.9
    // brute force with the same driver-constant grid
    def brute(a: Map[Long, Long], b: Map[Long, Long]): Long = {
      val cs = (1 to k).scanLeft(1.0)((acc, _) => acc * p)
        .take(k).zipWithIndex
        .map { case (pp, i) => 1000000.0 * (1.0 - p) * pp / (i + 1.0) }
      (1 to k).map { d =>
        val ov = a.count { case (doc, ra) =>
          ra <= d && b.get(doc).exists(_ <= d) }
        math.floor(cs(d - 1) * ov.toDouble).toLong
      }.sum
    }
    def df(m: Map[Long, Long], q: Long = 0L) =
      m.toSeq.map { case (doc, rk) => (q, doc, rk) }
        .toDF("q_id", "doc_id", "rk")
    val ident = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L)
    val r1 = Eval.rboAtK(df(ident), df(ident), k, p).collect().head
    assert(r1.getLong(r1.fieldIndex("rbo_micro")) == brute(ident, ident))
    assert(r1.getLong(r1.fieldIndex("overlap_k")) == 5L)
    // identical lists: Σ(1-p)p^(d-1)·1 per depth — ≈ 1 - p^k
    val exact = 1000000.0 * (1.0 - math.pow(p, k))
    assert(math.abs(r1.getLong(r1.fieldIndex("rbo_micro")) - exact) < 10)
    // agreement only at rank 1 vs only at rank k: top-weighted
    val a1 = Map(1L -> 1L, 2L -> 2L, 3L -> 3L)
    val b1 = Map(1L -> 1L, 8L -> 2L, 9L -> 3L)   // share only rank-1 doc
    val aK = Map(2L -> 1L, 3L -> 2L, 1L -> 3L)
    val bK = Map(8L -> 1L, 9L -> 2L, 1L -> 3L)   // share only a rank-3 doc
    val top = Eval.rboAtK(df(a1), df(b1), k, p).collect().head
      .getAs[Long]("rbo_micro")
    val bot = Eval.rboAtK(df(aK), df(bK), k, p).collect().head
      .getAs[Long]("rbo_micro")
    assert(top > bot && bot > 0L)
    assert(top == brute(a1, b1) && bot == brute(aK, bK))
    // disjoint: zero
    val z = Eval.rboAtK(df(Map(1L -> 1L)), df(Map(2L -> 1L)), k, p)
      .collect().head
    assert(z.getLong(z.fieldIndex("rbo_micro")) == 0L)
    assert(z.getLong(z.fieldIndex("overlap_k")) == 0L)
    intercept[IllegalArgumentException] { Eval.rboAtK(df(ident),
      df(ident), k, 1.0) }
  }

  test("rankAgreement: rank cut at k, dup collapse to best rank, and " +
      "the sign-split tau on a mixed case") {
    // q0 common docs with ranks a=(1,2,3), b=(2,1,3): pairs (1,2) disc,
    // (1,3) conc, (2,3) conc -> tau = (2-1)/3 = 333333 micro
    val a = Seq((0L, 1L, 1L), (0L, 1L, 9L), (0L, 2L, 2L), (0L, 3L, 3L),
      (0L, 4L, 11L)).toDF("q_id", "doc_id", "rk") // rk 11 > k: cut
    val b = Seq((0L, 1L, 2L), (0L, 2L, 1L), (0L, 3L, 3L))
      .toDF("q_id", "doc_id", "rk")
    val r = Eval.rankAgreement(a, b, 10).collect().head
    assert(r.getLong(r.fieldIndex("n_a")) == 3L)
    assert(r.getLong(r.fieldIndex("n_b")) == 3L)
    assert(r.getLong(r.fieldIndex("n_common")) == 3L)
    assert(r.getLong(r.fieldIndex("jaccard_micro")) == 1000000L)
    assert(r.getLong(r.fieldIndex("tau_micro")) == 333333L)
    // tau truncates toward zero on the negative side too: swap a/b legs
    // of the discordant-majority mirror — 1 conc, 2 disc -> -333333
    val a2 = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L))
      .toDF("q_id", "doc_id", "rk")
    val b2 = Seq((0L, 1L, 3L), (0L, 2L, 1L), (0L, 3L, 2L))
      .toDF("q_id", "doc_id", "rk")
    val r2 = Eval.rankAgreement(a2, b2, 10).collect().head
    assert(r2.getLong(r2.fieldIndex("tau_micro")) == -333333L)
  }

  test("rboExtrapolated: identical lists extrapolate to exactly 10^6; " +
      "ext = truncated + floor(p^k/k·X_k·10^6); disjoint stays 0") {
    val k = 5
    val p = 0.9
    def df(m: Map[Long, Long], q: Long = 0L) =
      m.toSeq.map { case (doc, rk) => (q, doc, rk) }
        .toDF("q_id", "doc_id", "rk")
    val ident = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L)
    val r = Eval.rboExtrapolated(df(ident), df(ident), k, p)
      .collect().head
    val trunc = r.getAs[Long]("rbo_micro")
    val ext = r.getAs[Long]("rbo_ext_micro")
    // the residual closes the truncation gap: identical lists score a
    // full 1.0 under extrapolation (each term floors, so within k micro)
    assert(ext == trunc +
      math.floor(Eval.rboExtConstant(k, p) * 5.0).toLong)
    assert(math.abs(ext - 1000000L) <= k)
    assert(ext > trunc)
    // disjoint lists: X_k = 0 — the residual adds nothing
    val z = Eval.rboExtrapolated(df(Map(1L -> 1L)), df(Map(2L -> 1L)),
      k, p).collect().head
    assert(z.getAs[Long]("rbo_ext_micro") == 0L)
  }

  test("spearmanAtK: identical = 10^6, reversed = -10^6, hand case; " +
      "re-rank densifies gapped common ranks; n < 2 nulls") {
    def df(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("q_id", "doc_id", "rk")
    val a = df(Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
    val same = Eval.spearmanAtK(a, a, 10).collect().head
    assert(same.getLong(same.fieldIndex("rho_micro")) == 1000000L)
    val rev = Eval.spearmanAtK(a,
      df(Seq((0L, 1L, 3L), (0L, 2L, 2L), (0L, 3L, 1L))), 10)
      .collect().head
    assert(rev.getLong(rev.fieldIndex("sum_d2")) == 8L)
    assert(rev.getLong(rev.fieldIndex("rho_micro")) == -1000000L)
    // one swap among 3: d = (1,1,0)... ranks a=(1,2,3) b=(2,1,3):
    // sum_d2 = 2, rho = 1 - 12/24 = 0.5
    val half = Eval.spearmanAtK(a,
      df(Seq((0L, 1L, 2L), (0L, 2L, 1L), (0L, 3L, 3L))), 10)
      .collect().head
    assert(half.getLong(half.fieldIndex("rho_micro")) == 500000L)
    // gapped common ranks densify: b ranks (1, 9) over 2 common docs
    // re-rank to (1, 2) — agreement is still perfect
    val g = Eval.spearmanAtK(
      df(Seq((0L, 1L, 1L), (0L, 2L, 2L))),
      df(Seq((0L, 1L, 1L), (0L, 2L, 9L))), 10).collect().head
    assert(g.getLong(g.fieldIndex("rho_micro")) == 1000000L)
    // a single common doc: undefined, null
    val one = Eval.spearmanAtK(df(Seq((0L, 1L, 1L))),
      df(Seq((0L, 1L, 1L))), 10).collect().head
    assert(one.isNullAt(one.fieldIndex("rho_micro")))
  }

  test("tau-b and spearman property net: 40 random tied rankings match " +
      "a pure-Scala brute force exactly") {
    val rnd = new scala.util.Random(29)
    def bruteTauB(ra: Map[Long, Long], rb: Map[Long, Long])
        : (Long, Long, Long, Long, Option[Long]) = {
      val docs = ra.keySet.intersect(rb.keySet).toSeq.sorted
      val pairs = for {
        i <- docs.indices; j <- (i + 1) until docs.size
      } yield (docs(i), docs(j))
      var c = 0L; var d = 0L; var ta = 0L; var tb = 0L
      pairs.foreach { case (x, y) =>
        val s = (ra(x) - ra(y)) * (rb(x) - rb(y))
        if (s > 0) c += 1 else if (s < 0) d += 1
        if (ra(x) == ra(y)) ta += 1
        if (rb(x) == rb(y)) tb += 1
      }
      val n0 = pairs.size.toLong
      val t = if (n0 - ta > 0 && n0 - tb > 0)
        Some(math.floor((c - d).toDouble * 1000000.0 /
          math.sqrt((n0 - ta).toDouble * (n0 - tb).toDouble)).toLong)
      else None
      (c, d, ta, tb, t)
    }
    def bruteRho(ra: Map[Long, Long], rb: Map[Long, Long]): Option[Long] = {
      val docs = ra.keySet.intersect(rb.keySet).toSeq.sorted
      if (docs.size < 2) return None
      def dense(m: Map[Long, Long]) = docs
        .sortBy(doc => (m(doc), doc)).zipWithIndex
        .map { case (doc, i) => doc -> (i + 1L) }.toMap
      val da = dense(ra); val db = dense(rb)
      val sd2 = docs.map(doc => {
        val d = da(doc) - db(doc); d * d }).sum
      val n = docs.size.toLong
      Some(1000000L - 6L * sd2 * 1000000L / (n * (n * n - 1)))
    }
    for (_ <- 1 to 40) {
      val n = 2 + rnd.nextInt(8)
      // tied ranks: draw from a small range so collisions are common
      def ranking() = (1L to n.toLong)
        .map(doc => doc -> (1L + rnd.nextInt(4).toLong)).toMap
      val ra = ranking(); val rb = ranking()
      def df(m: Map[Long, Long]) =
        m.toSeq.map { case (doc, rk) => (0L, doc, rk) }
          .toDF("q_id", "doc_id", "rk")
      val rT = Eval.rankAgreementTauB(df(ra), df(rb), 10).collect().head
      val (c, d, ta, tb, t) = bruteTauB(ra, rb)
      assert((rT.getLong(2), rT.getLong(3), rT.getLong(4),
        rT.getLong(5)) == ((c, d, ta, tb)), s"$ra / $rb")
      assert((if (rT.isNullAt(6)) None else Some(rT.getLong(6))) == t,
        s"taub $ra / $rb")
      val rS = Eval.spearmanAtK(df(ra), df(rb), 10).collect().head
      assert((if (rS.isNullAt(3)) None else Some(rS.getLong(3))) ==
        bruteRho(ra, rb), s"rho $ra / $rb")
    }
  }

  test("rankAgreementTauB: hand-computed tie case; tie-free τ-b equals " +
      "plain τ scaled by the full-pair denominator; all-tied side nulls") {
    def df(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("q_id", "doc_id", "rk")
    // a ranks: 1,1,2 (docs 1,2 tied); b ranks: 1,2,3.
    // pairs: (1,2) tied in a (b differs) — n1; (1,3) conc; (2,3) conc.
    // C=2 D=0 n0=3 n1=1 n2=0 → τ-b = 2/√(2·3) = 0.816496…
    val a = df(Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 2L)))
    val b = df(Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
    val r = Eval.rankAgreementTauB(a, b, 10).collect().head
    assert(r.getLong(r.fieldIndex("n_common")) == 3L)
    assert(r.getLong(r.fieldIndex("conc")) == 2L)
    assert(r.getLong(r.fieldIndex("disc")) == 0L)
    assert(r.getLong(r.fieldIndex("tie_a")) == 1L)
    assert(r.getLong(r.fieldIndex("tie_b")) == 0L)
    assert(r.getLong(r.fieldIndex("taub_micro")) ==
      math.floor(2.0 * 1000000.0 / math.sqrt(2.0 * 3.0)).toLong)
    // no ties: τ-b reduces to plain τ (C−D over all pairs)
    val a2 = df(Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L)))
    val b2 = df(Seq((0L, 1L, 2L), (0L, 2L, 1L), (0L, 3L, 3L)))
    val r2 = Eval.rankAgreementTauB(a2, b2, 10).collect().head
    assert(r2.getLong(r2.fieldIndex("taub_micro")) ==
      math.floor(1.0 * 1000000.0 / 3.0).toLong) // (2−1)/3
    // one side entirely tied: denominator factor 0 → null, never ÷0
    val aT = df(Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L)))
    val r3 = Eval.rankAgreementTauB(aT, b2, 10).collect().head
    assert(r3.isNullAt(r3.fieldIndex("taub_micro")))
    // negative side floors (not truncates): all-discordant mirror
    val r4 = Eval.rankAgreementTauB(a2,
      df(Seq((0L, 1L, 3L), (0L, 2L, 2L), (0L, 3L, 1L))), 10)
      .collect().head
    assert(r4.getLong(r4.fieldIndex("taub_micro")) == -1000000L)
  }
}
