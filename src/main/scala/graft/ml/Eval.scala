package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-evaluation primitives for the training-data pipeline: a
  * quality/toxicity/language scorer gates millions of documents, and the
  * cut point comes from a threshold sweep over a labeled slice. All
  * arithmetic integer-exact (micro-grid fractions via BIGINT division)
  * so sweeps reproduce bit-for-bit across engines.
  */
object Eval {

  /** PRECISION/RECALL TABLE over score thresholds — one pass, not one
    * pass per threshold: `score >= t` is monotone in `t`, so each row
    * reduces to the NUMBER of thresholds it clears (a codegen'd sum of
    * comparisons), one hash aggregate counts `(bin, label)` cells
    * (≤ 2(T+1) rows — a bounded driver fold assembles the cumulative
    * tails). At 100 TB the data pass is the whole cost and it is
    * exactly one narrow projection + one map-side-combined aggregate.
    *
    * `thresholds` must be strictly ascending. Confusion counts are
    * BIGINT; `precision_micro`/`recall_micro` are
    * `floor(10⁶·tp/(tp+fp))` / `floor(10⁶·tp/(tp+fn))`, null when the
    * denominator is zero. Returns one row per threshold:
    * (threshold, tp, fp, fn, tn, precision_micro, recall_micro).
    */
  def thresholdSweep(df: DataFrame, scoreCol: String, labelCol: String,
                     thresholds: Seq[Long]): DataFrame = {
    require(thresholds.nonEmpty &&
      thresholds.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      "thresholds must be non-empty and strictly ascending")
    val spark = df.sparkSession
    import spark.implicits._
    val score = col(scoreCol).cast("long")
    val bin = thresholds
      .map(t => when(score >= t, 1).otherwise(0)).reduce(_ + _)
    val cells = df
      .select(bin.as("bin"), col(labelCol).cast("boolean").as("y"))
      .groupBy(col("bin"), col("y")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getBoolean(1), r.getLong(2)))
    val posTotal = cells.filter(_._2).map(_._3).sum
    val negTotal = cells.filter(!_._2).map(_._3).sum
    val rows = thresholds.zipWithIndex.map { case (t, i0) =>
      val i = i0 + 1 // row predicted positive at threshold i ⇔ bin >= i
      val tp = cells.filter(c => c._1 >= i && c._2).map(_._3).sum
      val fp = cells.filter(c => c._1 >= i && !c._2).map(_._3).sum
      val fn = posTotal - tp
      val tn = negTotal - fp
      val prec = if (tp + fp > 0) Some(tp * 1000000L / (tp + fp)) else None
      val rec = if (tp + fn > 0) Some(tp * 1000000L / (tp + fn)) else None
      (t, tp, fp, fn, tn, prec, rec)
    }
    rows.toDF("threshold", "tp", "fp", "fn", "tn",
      "precision_micro", "recall_micro")
  }

  /** EXACT ROC-AUC via the Mann–Whitney rank-sum statistic, ties
    * handled exactly in half-units kept integral:
    * `2U = Σ_s pos_s · (2·neg_below(s) + neg_s)` over DISTINCT score
    * values, `AUC = U / (P·N)`, emitted as
    * `auc_micro = floor(10⁶·2U / (2·P·N))` — pure BIGINT arithmetic,
    * bit-reproducible across engines.
    *
    * Shape: one hash aggregate to per-score (pos, neg) counts
    * (|distinct scores| ≪ rows for gridded scores — quantize continuous
    * scores to the micro grid first, the house convention), then a
    * DISTRIBUTED cumulative: distinct scores bucket into ≤ 4096
    * order-aligned ranges, the running negative count windows
    * PARTITIONED per bucket, and cross-bucket bases come from a bounded
    * driver fold over per-bucket totals — no unpartitioned window
    * anywhere, so the cumulative scales with executors, not one task.
    * Labeled eval slices are sampled data by nature; the BIGINT range
    * guard ([[aucGuardOk]], division form) rejects inputs that would
    * overflow instead of silently wrapping. Returns one row
    * (pos, neg, auc_micro); auc_micro null when either class is empty.
    */
  /** Micro-grid range guard in DIVISION form — the product form
    * (`p * n <= cap`) itself wraps for p, n ≳ 3·10⁹ and can then PASS
    * the check on garbage. Cap is `maxLong / 2·10⁶`, not `/10⁶`:
    * the emitted numerator is `2U·10⁶ ≤ 2·10⁶·P·N`, so P·N must leave
    * TWO factors of headroom, else a near-1 AUC wraps the numerator.
    */
  private[ml] def aucGuardOk(p: Long, n: Long): Boolean =
    p == 0 || n == 0 || n <= Long.MaxValue / 2000000L / p

  def aucExact(df: DataFrame, scoreCol: String,
               labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perScore = df
      .select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy(col("s"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("pos_s"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("neg_s"))
      .persist()
    try {
      // DISTRIBUTED cumulative over ordered distinct scores — no global
      // (unpartitioned) window: scores bucket into ≤ maxBuckets
      // order-aligned ranges, the window runs PARTITIONED per bucket,
      // and each bucket's base offset comes from a bounded driver fold
      // over the per-bucket neg totals (≤ maxBuckets rows — the same
      // bounded-fold precedent as [[thresholdSweep]]'s cell assembly).
      val mm = perScore.agg(min(col("s")), max(col("s"))).collect().head
      if (mm.isNullAt(0)) // empty input: (0, 0, null)
        Seq((0L, 0L, Option.empty[Long])).toDF("pos", "neg", "auc_micro")
      else {
        val (mn, mx) = (mm.getLong(0), mm.getLong(1))
        require(BigInt(mx) - BigInt(mn) <= BigInt(Long.MaxValue),
          s"score span [$mn, $mx] exceeds the Long range — grid scores " +
            "(micro convention) before aucExact")
        val maxBuckets = 4096L
        val width = (mx - mn) / maxBuckets + 1
        // `div`, not `/`: Column./ on BIGINTs returns DOUBLE (see
        // calibrationBins) — bucket ids must stay integer-exact
        val bCol = expr(s"(s - $mn) div $width").as("b")
        val bucketed = perScore.select(col("s"), col("pos_s"),
          col("neg_s"), bCol)
        val bases = bucketed.groupBy(col("b"))
          .agg(sum(col("neg_s")).as("nb"))
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .sortBy(_._1)
        // each bucket's base = negatives in all STRICTLY LOWER buckets
        var acc = 0L
        val baseRows = bases.map { case (b, nb) =>
          val r = (b, acc); acc += nb; r }
        val baseDf = baseRows.toSeq.toDF("b", "neg_base")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("b")).orderBy(col("s"))
          .rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
        val agg = bucketed
          .withColumn("neg_in_bucket",
            coalesce(sum(col("neg_s")).over(w), lit(0L)))
          .join(broadcast(baseDf), Seq("b"))
          .withColumn("neg_below", col("neg_base") + col("neg_in_bucket"))
          .agg(coalesce(sum(col("pos_s")), lit(0L)).as("pos"),
            coalesce(sum(col("neg_s")), lit(0L)).as("neg"),
            coalesce(sum(col("pos_s") *
              (col("neg_below") * 2L + col("neg_s"))), lit(0L)).as("two_u"))
          .collect().head
        val (p, n, twoU) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
        require(aucGuardOk(p, n),
          s"P*N = ${p}*$n overflows the exact micro grid — sample the " +
            "eval slice (AUC is a statistic of a labeled sample, not a " +
            "corpus scan)")
        val auc = if (p > 0 && n > 0) Some(twoU * 1000000L / (2L * p * n))
          else None
        Seq((p, n, auc)).toDF("pos", "neg", "auc_micro")
      }
    } finally { perScore.unpersist(); () }
  }

  /** EXACT AVERAGE PRECISION — the PR-curve companion to [[aucExact]]
    * (the quality-classifier gate metric when positives are rare and
    * ROC-AUC flatters): `AP = (1/P) Σ_{positive at rank k} prec@k`,
    * ranks over the DETERMINISTIC total order (score desc, id asc).
    * The explicit id tie-break makes the statistic bit-reproducible
    * across engines where tie-interpolating definitions depend on
    * float summation order; each positive's `prec@k` lands on the 10⁻⁶
    * grid BEFORE the sum (`floor(10⁶·cumPos(k)/k)` summed as BIGINT —
    * the order-free convention), then `ap_micro = Σ div P`.
    *
    * Distributed shape: the same two-level cumulative as [[aucExact]] —
    * rows bucket into ≤ 4096 score ranges, rank and cumulative-positive
    * windows run PARTITIONED per bucket (ordered score desc, id asc),
    * and cross-bucket bases come from a bounded driver fold over
    * per-bucket (rows, positives) totals. No unpartitioned window.
    * Returns one row (pos, n, ap_micro); ap_micro null when there are
    * no positives.
    */
  /** The shared DISTRIBUTED RANK WALK behind [[apExact]] and
    * [[prCurve]]: given persisted `(s, i, y)` rows, return the frame
    * extended with the global `rk` (1-based over score desc, id asc)
    * and `cp` (cumulative positives through the current row) — rows
    * bucketed into ≤ 4096 score ranges, windows PARTITIONED per
    * bucket, cross-bucket bases from a bounded driver fold. None when
    * the input is empty. Caller owns the persist lifecycle.
    */
  private def rankWalk(rows: DataFrame): Option[DataFrame] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val mm = rows.agg(min(col("s")), max(col("s"))).collect().head
    if (mm.isNullAt(0)) None
    else {
      val (mn, mx) = (mm.getLong(0), mm.getLong(1))
      require(BigInt(mx) - BigInt(mn) <= BigInt(Long.MaxValue),
        s"score span [$mn, $mx] exceeds the Long range — grid scores " +
          "(micro convention) first")
      val maxBuckets = 4096L
      val width = (mx - mn) / maxBuckets + 1
      val bucketed = rows.withColumn("b", expr(s"(s - $mn) div $width"))
      // DESC global order: a bucket's base = rows/positives in all
      // HIGHER buckets (higher score range sorts first)
      val bt = bucketed.groupBy(col("b"))
        .agg(count(lit(1)).as("nb"),
          sum(when(col("y"), 1L).otherwise(0L)).as("pb"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(-_._1)
      var accN = 0L; var accP = 0L
      val baseRows = bt.map { case (b, nb, pb) =>
        val r = (b, accN, accP); accN += nb; accP += pb; r }
      val baseDf = baseRows.toSeq.toDF("b", "base_n", "base_p")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("b")).orderBy(col("s").desc, col("i").asc)
      val wc = w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Some(bucketed.join(broadcast(baseDf), Seq("b"))
        .withColumn("rk", col("base_n") + row_number().over(w))
        .withColumn("cp", col("base_p") +
          sum(when(col("y"), 1L).otherwise(0L)).over(wc)))
    }
  }

  private def scoredRows(df: DataFrame, scoreCol: String, labelCol: String,
                         idCol: String): DataFrame =
    df.select(col(scoreCol).cast("long").as("s"),
      col(idCol).cast("long").as("i"),
      col(labelCol).cast("boolean").as("y"))

  def apExact(df: DataFrame, scoreCol: String, labelCol: String,
              idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = scoredRows(df, scoreCol, labelCol, idCol).persist()
    try {
      rankWalk(rows) match {
        case None =>
          Seq((0L, 0L, Option.empty[Long])).toDF("pos", "n", "ap_micro")
        case Some(ranked) =>
          val agg = ranked.agg(
            coalesce(sum(when(col("y"), 1L).otherwise(0L)), lit(0L))
              .as("pos"),
            count(lit(1)).as("n"),
            coalesce(sum(when(col("y"),
              expr("cp * 1000000 div rk"))), lit(0L)).as("ap_sum"))
            .collect().head
          val (p, n, apSum) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
          // cp·10⁶ ≤ P·10⁶ and Σ terms ≤ P·10⁶ — division-form guard
          require(p <= Long.MaxValue / 1000000L,
            s"P = $p overflows the exact micro grid — sample the eval slice")
          val ap = if (p > 0) Some(apSum / p) else None
          Seq((p, n, ap)).toDF("pos", "n", "ap_micro")
      }
    } finally { rows.unpersist(); () }
  }

  /** EXACT PR CURVE — the full curve behind [[apExact]]'s scalar: one
    * row per POSITIVE at its global rank with the precision and recall
    * at that cut, `prec@k = floor(10⁶·cp/k)`,
    * `recall@k = floor(10⁶·cp/P)` — the operating-point picker for a
    * quality-classifier gate ("what threshold buys 95% precision, and
    * what recall does it cost?"). Output is |positives| rows (an eval
    * slice, not a corpus); the walk itself is the same bucketed
    * distributed cumulative as [[apExact]] — no unpartitioned window.
    * Returns (rk, cum_pos, precision_micro, recall_micro), rk
    * ascending.
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = scoredRows(df, scoreCol, labelCol, idCol).persist()
    try {
      rankWalk(rows) match {
        case None =>
          Seq.empty[(Long, Long, Long, Long)]
            .toDF("rk", "cum_pos", "precision_micro", "recall_micro")
        case Some(ranked) =>
          val p = rows.filter(col("y")).count()
          require(p <= Long.MaxValue / 1000000L,
            s"P = $p overflows the exact micro grid — sample the eval slice")
          if (p == 0)
            Seq.empty[(Long, Long, Long, Long)]
              .toDF("rk", "cum_pos", "precision_micro", "recall_micro")
          // Eager localCheckpoint BEFORE the finally-unpersist: the
          // curve must materialize while `rows` is still cached —
          // rankWalk's per-bucket bases were collected from THIS
          // evaluation, and a lazy return re-evaluated after unpersist
          // would recompute the source (and, for a non-deterministic
          // input, disagree with those driver-collected bases). Output
          // is |positives| rows — an eval slice, checkpoint-sized.
          else ranked.filter(col("y"))
            .select(col("rk"), col("cp").as("cum_pos"),
              expr("cp * 1000000 div rk").as("precision_micro"),
              expr(s"cp * 1000000 div $p").as("recall_micro"))
            .localCheckpoint(true)
      }
    } finally { rows.unpersist(); () }
  }

  /** [[aucExact]] PER GROUP, fully distributed — one AUC per slice
    * (per-source, per-language, per-shard quality audits) with no
    * driver fold: per-(group, score) counts, the cumulative over
    * distinct scores windows WITHIN each group, and the final micro
    * division runs on executors as BIGINT `div` (with a loud
    * `raise_error` on grids that would overflow — sample the slice).
    * Returns (groupCol, pos, neg, auc_micro); auc_micro null when a
    * group has a single class.
    */
  def aucByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                 labelCol: String): DataFrame = {
    val perScore = df
      .select(col(groupCol).as("g"), col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("boolean").as("y"))
      .groupBy(col("g"), col("s"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("pos_s"),
        sum(when(!col("y"), 1L).otherwise(0L)).as("neg_s"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    perScore
      .withColumn("neg_below", coalesce(sum(col("neg_s")).over(w), lit(0L)))
      .groupBy(col("g"))
      .agg(sum(col("pos_s")).as("pos"), sum(col("neg_s")).as("neg"),
        sum(col("pos_s") * (col("neg_below") * 2L + col("neg_s")))
          .as("two_u"))
      .select(col("g").as(groupCol), col("pos"), col("neg"),
        when(col("pos") > 0 && col("neg") > 0,
          // division-form guard (product form wraps and can then PASS);
          // /2·10⁶ cap: the numerator 2U·10⁶ needs the extra factor —
          // see aucGuardOk
          when(expr(s"neg <= ${Long.MaxValue / 2000000L} div pos"),
            expr("two_u * 1000000 div (2 * pos * neg)"))
            .otherwise(expr(
              "raise_error('P*N overflows the exact micro grid — " +
                "sample the eval slice')")))
          .as("auc_micro"))
  }

  /** [[apExact]] PER GROUP, fully distributed — one average precision
    * per slice, the PR twin of [[aucByGroup]]: the rank walk's window
    * partitions naturally by group (no bucketing needed), per-positive
    * `prec@k` grids before the sum, and the final division runs
    * executor-side as BIGINT `div` behind the same loud overflow guard.
    * Returns (groupCol, pos, n, ap_micro); ap_micro null when a group
    * has no positives.
    */
  def apByGroup(df: DataFrame, groupCol: String, scoreCol: String,
                labelCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("s").desc, col("i").asc)
    val wc = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(groupCol).as("g"), col(scoreCol).cast("long").as("s"),
        col(idCol).cast("long").as("i"),
        col(labelCol).cast("boolean").as("y"))
      .withColumn("rk", row_number().over(w))
      .withColumn("cp", sum(when(col("y"), 1L).otherwise(0L)).over(wc))
      .groupBy(col("g"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("pos"),
        count(lit(1)).as("n"),
        sum(when(col("y"), expr("cp * 1000000 div rk"))).as("ap_sum"))
      .select(col("g").as(groupCol), col("pos"), col("n"),
        when(col("pos") > 0,
          when(expr(s"pos <= ${Long.MaxValue / 1000000L}"),
            expr("ap_sum div pos"))
            .otherwise(expr(
              "raise_error('P overflows the exact micro grid — " +
                "sample the eval slice')")))
          .as("ap_micro"))
  }

  /** OFFLINE RETRIEVAL EVALUATION — score a per-query RANKING against a
    * RELEVANCE judgment set (the trec_eval shape: rankings from any of
    * the search ops, judgments from clicks/labels): per query the
    * reciprocal rank of the first relevant hit, hits in the ranking,
    * and recall vs the query's total judged-relevant count, all on the
    * 10⁻⁶ grid. Conventions: a judged query with no relevant hit in the
    * ranking scores rr = 0 and recall = 0 (standard); a query with NO
    * judgments at all is omitted (it cannot be scored); macro means are
    * one `avg` over the output. One equi-join on (q_id, doc_id) + two
    * hash aggregates — every stage keyed, nothing corpus-sized.
    *
    * `ranking` = (q_id, doc_id, rk) with 1-based per-query ranks;
    * `relevant` = (q_id, doc_id) judgments. Returns per judged query:
    * (q_id, n_rel, hits, first_rank, rr_micro, recall_micro);
    * first_rank is null (and rr_micro 0) when no relevant doc ranked.
    */
  def retrievalMetrics(ranking: DataFrame, relevant: DataFrame): DataFrame = {
    val rel = relevant.select(col("q_id"), col("doc_id")).distinct()
    val nRel = rel.groupBy(col("q_id")).agg(count(lit(1)).as("n_rel"))
    // Dedupe the RANKING side too (best = min rank per (q_id, doc_id)):
    // a duplicated ranked row would otherwise inflate `hits` via
    // count(*) — recall above 10⁶, hits above n_rel. The aggregate
    // shares the join's (q_id, doc_id) partitioning, so it costs no
    // extra exchange.
    val rk1 = ranking.select(col("q_id"), col("doc_id"), col("rk"))
      .groupBy(col("q_id"), col("doc_id")).agg(min(col("rk")).as("rk"))
    val hits = rk1
      .join(rel, Seq("q_id", "doc_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("hits"), min(col("rk")).as("first_rank"))
    nRel.join(hits, Seq("q_id"), "left")
      .select(col("q_id"), col("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("first_rank").cast("long").as("first_rank"),
        coalesce(expr("1000000 div first_rank"), lit(0L)).as("rr_micro"),
        expr("coalesce(hits, 0) * 1000000 div n_rel").as("recall_micro"))
  }

  /** MACRO SUMMARY over [[retrievalMetrics]] output: the headline
    * numbers an offline-eval dashboard shows — judged-query count,
    * MRR (mean of rr_micro), macro recall, and success rate (share of
    * judged queries with ≥ 1 relevant hit), all as exact BIGINT micro
    * means (`Σ div n` — each summand already gridded). One aggregate.
    * Returns (n_queries, mrr_micro, macro_recall_micro,
    * success_rate_micro); empty input yields a single all-null-metric
    * row with n_queries 0.
    */
  def retrievalSummary(metrics: DataFrame): DataFrame =
    metrics.agg(count(lit(1)).as("n_queries"),
      expr("sum(rr_micro) div count(1)").as("mrr_micro"),
      expr("sum(recall_micro) div count(1)").as("macro_recall_micro"),
      expr("sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) * 1000000 " +
        "div count(1)").as("success_rate_micro"))

  /** PRECISION@K / RECALL@K per judged query — the rank-cut twins of
    * [[retrievalMetrics]] (which scores the WHOLE ranking): how good are
    * the first `k` results. trec_eval convention: the denominator of
    * P@k is `k` itself (a query that returns fewer than k docs is
    * penalized, not excused). Dedupe mirrors [[retrievalMetrics]]
    * exactly — best (min) rank per ranked (q_id, doc_id), distinct
    * judgments — and queries judged but with nothing in the top k score
    * 0. Shape: one rank-filtered equi-join + two keyed hash aggregates,
    * nothing corpus-sized. Returns per judged query:
    * (q_id, n_rel, hits_k, p_at_k_micro, recall_at_k_micro).
    */
  def precisionAtK(ranking: DataFrame, relevant: DataFrame,
                   k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val rel = relevant.select(col("q_id"), col("doc_id")).distinct()
    val nRel = rel.groupBy(col("q_id")).agg(count(lit(1)).as("n_rel"))
    val rk1 = ranking.select(col("q_id"), col("doc_id"), col("rk"))
      .groupBy(col("q_id"), col("doc_id")).agg(min(col("rk")).as("rk"))
      .filter(col("rk") <= k)
    val hitsK = rk1.join(rel, Seq("q_id", "doc_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("hits_k"))
    nRel.join(hitsK, Seq("q_id"), "left")
      .select(col("q_id"), col("n_rel"),
        coalesce(col("hits_k"), lit(0L)).as("hits_k"),
        expr(s"coalesce(hits_k, 0) * 1000000 div $k").as("p_at_k_micro"),
        expr("coalesce(hits_k, 0) * 1000000 div n_rel")
          .as("recall_at_k_micro"))
  }

  /** ONE-ROW RETRIEVAL TOPLINE — the dashboard headline joining the
    * binary-judgment macro summary ([[retrievalSummary]]) with the
    * graded one ([[ndcgSummary]]): n_queries, MRR, macro recall,
    * success rate, plus n_scored / macro nDCG from the graded side.
    * Both inputs are single-row aggregates, so the combine is a
    * broadcast-trivial cross join of two 1-row frames — no key needed,
    * no scale concern. Column names stay distinct by construction.
    */
  def retrievalTopline(metrics: DataFrame, ndcg: DataFrame): DataFrame =
    retrievalSummary(metrics).crossJoin(
      ndcgSummary(ndcg).select(col("n_scored"), col("macro_ndcg_micro")))

  /** MACRO SUMMARY over [[ndcgAtK]] output — the headline graded-eval
    * number: judged-query count, how many have a defined nDCG (idcg >
    * 0), and the macro mean over THOSE (exact BIGINT micro mean; an
    * all-zero-grade query is undefined, not zero — averaging it in
    * would punish unanswerable queries). One aggregate.
    * Returns (n_queries, n_scored, macro_ndcg_micro — null when
    * nothing scored).
    */
  def ndcgSummary(ndcg: DataFrame): DataFrame =
    ndcg.agg(count(lit(1)).as("n_queries"),
      sum(when(col("ndcg_micro").isNotNull, 1L).otherwise(0L))
        .as("n_scored"),
      expr("sum(ndcg_micro) div nullif(sum(CASE WHEN ndcg_micro IS NOT " +
        "NULL THEN 1 ELSE 0 END), 0)").as("macro_ndcg_micro"))

  /** CALIBRATION BINS (reliability diagram): equal-width score bins over
    * `[lo, hi)`, per bin the count, positive count, and empirical
    * positive rate on the micro grid — "when the scorer says 0.8, is it
    * right 80% of the time?". Scores outside the range clamp to the
    * edge bins. One narrow projection + one aggregate. Returns
    * (bin, bin_lo, n, n_pos, pos_rate_micro) for occupied bins.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo, "need nBins >= 1 and hi > lo")
    val score = col(scoreCol).cast("long")
    // `div`, not `/`: Spark's / on BIGINTs returns DOUBLE (the classic
    // silent-precision trap); div keeps the arithmetic integer-exact.
    // Truncation-vs-floor on negatives is moot — the clamp handles the
    // out-of-range side.
    df.select(((score - lo) * nBins).as("__num"),
        col(labelCol).cast("boolean").as("y"))
      .withColumn("bin", least(greatest(
        expr(s"__num div ${hi - lo}"), lit(0L)), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"))
      .select(col("bin"),
        expr(s"$lo + bin * ${hi - lo} div $nBins").as("bin_lo"),
        col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("pos_rate_micro"))
  }

  /** ln 2 as the exact double literal, hardcoded in BOTH engines (the
    * oracle SQL embeds the same decimal) so the nDCG discount never
    * depends on two libms agreeing about `ln(2.0)`.
    */
  private val Ln2 = 0.6931471805599453

  /** nDCG@k over GRADED judgments — the one trec_eval metric binary
    * judgments can't express ("a grade-3 doc at rank 1 beats a grade-1
    * doc there"): per query, `DCG@k = Σ_{rk≤k} grade/log₂(rk+1)` over
    * the ranking, normalized by the ideal DCG of that query's own
    * judgments (grades sorted descending, top k). Linear gain (the
    * trec_eval convention; exponential 2^g−1 is a caller-side grade
    * remap away).
    *
    * Determinism (cross-engine oracle parity): each per-rank term grids
    * FIRST — `floor(10⁶·grade·ln2 / ln(rk+1))` with a fixed
    * multiplication order and [[Ln2]] hardcoded — and the BIGINT terms
    * sum order-independently; the final ratio is BIGINT micro division
    * (the "ln on the 10⁻⁶ grid" house convention, collocations
    * precedent). Inputs dedupe defensively like [[retrievalMetrics]]:
    * best (min) rank per ranked (q_id, doc_id), max grade per judged
    * pair. Docs ranked but unjudged gain 0 (inner join — no corpus-
    * sized null fill); queries judged but never ranked score dcg 0.
    * All-zero-grade queries have idcg 0 → ndcg null (undefined).
    *
    * Scale shape: two keyed hash aggregates + one (q_id, doc_id)
    * equi-join + one window PARTITIONED by query over ≤ judgment-count
    * rows — nothing corpus-sized, nothing unpartitioned. Returns per
    * judged query: (q_id, dcg_micro, idcg_micro, ndcg_micro).
    */
  def ndcgAtK(ranking: DataFrame, judgments: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // discounted micro gain at 1-based rank `rkCol`, fixed expr tree:
    // floor(((1e6 * grade) * ln2) / ln(rk + 1))
    def termMicro(gradeCol: Column, rkCol: Column): Column =
      floor(lit(1000000.0) * gradeCol.cast("double") * lit(Ln2) /
        log(rkCol.cast("double") + lit(1.0))).cast("long")
    val jud = judgments
      .select(col("q_id"), col("doc_id"), col("grade").cast("long").as("g"))
      .groupBy(col("q_id"), col("doc_id")).agg(max(col("g")).as("g"))
    val rk1 = ranking.select(col("q_id"), col("doc_id"), col("rk"))
      .filter(col("rk") <= k)
      .groupBy(col("q_id"), col("doc_id")).agg(min(col("rk")).as("rk"))
    val dcg = rk1.join(jud, Seq("q_id", "doc_id"))
      .groupBy(col("q_id"))
      .agg(sum(termMicro(col("g"), col("rk"))).as("dcg_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("g").desc, col("doc_id").asc)
    val idcg = jud.filter(col("g") > 0)
      .withColumn("irk", row_number().over(w))
      .filter(col("irk") <= k)
      .groupBy(col("q_id"))
      .agg(sum(termMicro(col("g"), col("irk"))).as("idcg_micro"))
    jud.select(col("q_id")).distinct()
      .join(dcg, Seq("q_id"), "left")
      .join(idcg, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"),
        when(coalesce(col("idcg_micro"), lit(0L)) > 0,
          // division-form overflow guard (aucGuardOk precedent):
          // dcg ≤ idcg by construction, but a hostile grade scale
          // could push dcg_micro past maxLong/1e6 — raise, don't wrap
          when(coalesce(col("dcg_micro"), lit(0L)) <=
              lit(Long.MaxValue / 1000000L),
            expr("coalesce(dcg_micro, 0) * 1000000 div idcg_micro"))
            .otherwise(expr("raise_error('ndcgAtK: dcg overflows the " +
              "exact micro grid — rescale grades')").cast("long")))
          .as("ndcg_micro"))
  }

  /** EXPECTED / MAXIMUM CALIBRATION ERROR — the one-row headline over the
    * [[calibrationBins]] reliability diagram: per equal-width score bin
    * the gap between the empirical positive rate and the bin's MEAN
    * predicted score (the "adaptive-confidence" ECE variant — midpoints
    * punish a scorer for where the bin sits, not for what it predicted),
    * ECE = Σ_b (n_b/N)·|acc_b − conf_b|, MCE = max_b |acc_b − conf_b|.
    *
    * Integer-exact: scores clamp to `[lo, hi]` and normalize to the
    * micro grid via BIGINT division with a fixed operation order —
    * `conf_micro = (Σscore − n·lo)·10⁶ div (n·(hi−lo))` — so both
    * engines floor identically; the ECE numerator sums
    * `n_b·|acc−conf|` as BIGINTs before one final division by N.
    * Division-form overflow guards on both divisions (aucGuardOk
    * precedent): a bin would need n·(hi−lo) > maxLong/10⁶ ≈ 9.2·10¹²
    * score-units to wrap — raise loudly instead.
    *
    * Scale shape: one narrow projection + one ≤nBins-row hash aggregate
    * + one 1-row final aggregate — the data pass is the whole cost.
    * Returns one row: (n, n_bins, ece_micro, mce_micro).
    */
  def ece(df: DataFrame, scoreCol: String, labelCol: String,
          lo: Long, hi: Long, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo, "need nBins >= 1 and hi > lo")
    val span = hi - lo
    // the bin id is (s − lo)·nBins div span with s − lo ≤ span, so the
    // product wraps (silently mis-binning, against the raise-don't-wrap
    // contract) unless span·nBins fits a BIGINT; span itself must not
    // have wrapped either (hi − lo overflows for extreme lo < 0 < hi)
    require(span > 0 && span <= Long.MaxValue / nBins,
      "Eval.ece: [lo, hi] span overflows the exact bin grid — " +
        "rescale scores or use fewer bins")
    val clamped = least(greatest(col(scoreCol).cast("long"), lit(lo)),
      lit(hi))
    val bins = df
      .select(clamped.as("s"), col(labelCol).cast("boolean").as("y"))
      .withColumn("bin", least(greatest(
        expr(s"(s - $lo) * $nBins div $span"), lit(0L)),
        lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("s") - lit(lo)).as("s_sum"))
    val guarded = bins
      .withColumn("__ok",
        when(col("n") <= lit(Long.MaxValue / 1000000L / span), lit(true))
          .otherwise(expr("raise_error('Eval.ece: bin mass overflows " +
            "the exact micro grid — rescale scores or widen bins')")
            .cast("boolean")))
      .withColumn("acc_micro", expr("n_pos * 1000000 div n"))
      .withColumn("conf_micro",
        when(col("__ok"), expr(s"s_sum * 1000000 div (n * $span)")))
      .withColumn("gap", abs(col("acc_micro") - col("conf_micro")))
    guarded.agg(
        sum(col("n")).as("n"),
        count(lit(1)).as("n_bins"),
        // Σ n_b·gap ≤ N·10⁶ — guard the same way before dividing by N
        when(sum(col("n")) <= lit(Long.MaxValue / 1000000L),
          expr("sum(n * gap) div sum(n)"))
          .otherwise(expr("raise_error('Eval.ece: corpus too large for " +
            "the exact micro grid')").cast("long")).as("ece_micro"),
        max(col("gap")).as("mce_micro"))
  }

  /** RANK-BIASED OVERLAP @k (Webber 2010, truncated) — the TOP-WEIGHTED
    * agreement measure [[rankAgreement]]'s Jaccard/τ are not: agreement
    * at rank 1 matters more than at rank 10,
    * `RBO@k = Σ_{d=1..k} (1−p)·p^(d−1) · |A_d ∩ B_d| / d`.
    * A common doc enters the intersection at depth `max(rank_A,
    * rank_B)`, so the per-depth overlap is one cumulative count.
    *
    * Determinism: the depth constants `c_d = 10⁶·(1−p)·p^(d−1)/d` are
    * computed ON THE DRIVER with a fixed multiplication order and
    * embedded as double literals in the plan (the Ln2 convention — no
    * cross-engine `pow`); each depth's term grids to
    * `floor(c_d · ov_d)` before the order-independent BIGINT sum.
    * Inputs dedupe to best rank like [[rankAgreement]].
    *
    * Scale shape: the (q_id, doc_id) equi-join of two ≤k cut lists,
    * one hash aggregate, a broadcast k-row depth grid, and a window
    * PARTITIONED per query over exactly k rows. Returns per query:
    * (q_id, overlap_k, rbo_micro).
    */
  def rboAtK(a: DataFrame, b: DataFrame, k: Int,
             p: Double = 0.9): DataFrame = {
    require(k >= 1 && p > 0.0 && p < 1.0, "need k >= 1 and 0 < p < 1")
    // c_d by repeated multiplication, never pow()
    val cs = new Array[Double](k + 1)
    var pPow = 1.0
    var d = 1
    while (d <= k) {
      cs(d) = 1000000.0 * (1.0 - p) * pPow / d.toDouble
      pPow = pPow * p
      d += 1
    }
    def cut(r: DataFrame, rkName: String) = r
      .select(col("q_id"), col("doc_id"), col("rk"))
      .filter(col("rk") <= k)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(min(col("rk")).as(rkName))
    val ca = cut(a, "rk_a")
    val cb = cut(b, "rk_b")
    val qs = ca.select(col("q_id")).union(cb.select(col("q_id"))).distinct()
    val entries = ca.join(cb, Seq("q_id", "doc_id"))
      .select(col("q_id"), greatest(col("rk_a"), col("rk_b")).as("d_in"))
      .groupBy(col("q_id"), col("d_in")).agg(count(lit(1)).as("cnt"))
    val spark = a.sparkSession
    import spark.implicits._
    val depths = broadcast((1 to k).map(_.toLong).toDF("d"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cd = (1 until k).foldLeft(when(col("d") === 1L, lit(cs(1)))) {
      (acc, i) => acc.when(col("d") === (i + 1).toLong, lit(cs(i + 1)))
    }
    val lhs = qs.crossJoin(depths)
    lhs.join(entries, lhs("q_id") === entries("q_id") &&
        lhs("d") === entries("d_in"), "left")
      .select(lhs("q_id"), lhs("d"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
      .withColumn("ov", sum(col("cnt")).over(w))
      .withColumn("term", floor(cd * col("ov").cast("double")).cast("long"))
      .groupBy(col("q_id"))
      .agg(max(when(col("d") === k.toLong, col("ov"))).as("overlap_k"),
        sum(col("term")).as("rbo_micro"))
  }

  /** RBO EXTRAPOLATED — [[rboAtK]] plus Webber 2010's point estimate
    * (eq. 30 truncated-list form): the truncated RBO@k is a LOWER bound
    * (it scores zero agreement beyond depth k); the extrapolation
    * assumes the lists keep agreeing at their observed depth-k rate,
    * adding `p^k · X_k / k`. RBO_ext = Σ_d c_d·X_d + 10⁶·p^k·X_k/k —
    * one extra driver-computed constant (same repeated-multiplication
    * convention as the depth table, never pow()) over [[rboAtK]]'s
    * aggregate, so the plan cost is identical. Returns
    * (q_id, overlap_k, rbo_micro, rbo_ext_micro).
    */
  def rboExtrapolated(a: DataFrame, b: DataFrame, k: Int,
                      p: Double = 0.9): DataFrame = {
    require(k >= 1 && p > 0.0 && p < 1.0, "need k >= 1 and 0 < p < 1")
    // p^k by the same repeated multiplication the depth table uses
    var pPow = 1.0
    var d = 0
    while (d < k) { pPow = pPow * p; d += 1 }
    val extC = 1000000.0 * pPow / k.toDouble
    rboAtK(a, b, k, p).withColumn("rbo_ext_micro",
      col("rbo_micro") +
        floor(lit(extC) * col("overlap_k").cast("double")).cast("long"))
  }

  /** The extrapolation constant `10⁶·p^k/k` with [[rboExtrapolated]]'s
    * exact multiplication order — exposed so oracle SQL embeds the SAME
    * double literal (the driver-literal constant-table convention).
    */
  def rboExtConstant(k: Int, p: Double): Double = {
    var pPow = 1.0
    var d = 0
    while (d < k) { pPow = pPow * p; d += 1 }
    1000000.0 * pPow / k.toDouble
  }

  /** KENDALL τ-b @k — [[rankAgreement]]'s τ made TIE-AWARE: rankings
    * produced by `rank()` (or any scoring with duplicates) tie documents
    * at the same position, and plain τ's C+D denominator quietly shrinks
    * as if those pairs never existed. τ-b = (C−D) / √((n₀−n₁)(n₀−n₂))
    * with n₀ = all common-doc pairs, n₁/n₂ = pairs tied in a/b —
    * the standard correction (Kendall 1945).
    *
    * Determinism: C, D, n₀, n₁, n₂ are exact BIGINTs; the final score is
    * ONE fixed IEEE tree — `(double)(C−D)·10⁶ / √((double)dₐ·(double)d_b)`
    * then floor — and sqrt is IEEE-exact, so both engines produce the
    * same bits (the only-sqrt-is-exact convention). Null when either
    * denominator factor is 0 (fewer than 2 common docs, or ALL pairs
    * tied on a side). Pair walk bounded like [[rankAgreement]]: with
    * rank()-style ties the `rk ≤ k` cut admits k plus the final tie
    * group, so the per-query pair count is (cut size)², still never
    * corpus-sized. Returns (q_id, n_common, conc, disc, tie_a, tie_b,
    * taub_micro).
    */
  def rankAgreementTauB(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def cut(r: DataFrame, rkName: String) = r
      .select(col("q_id"), col("doc_id"), col("rk"))
      .filter(col("rk") <= k)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(min(col("rk")).as(rkName))
    val common = cut(a, "rk_a").join(cut(b, "rk_b"), Seq("q_id", "doc_id"))
    val l = common.select(col("q_id"), col("doc_id").as("d1"),
      col("rk_a").as("a1"), col("rk_b").as("b1"))
    val r = common.select(col("q_id"), col("doc_id").as("d2"),
      col("rk_a").as("a2"), col("rk_b").as("b2"))
    val sgn = (col("a1") - col("a2")) * (col("b1") - col("b2"))
    val nc = common.groupBy(col("q_id")).agg(count(lit(1)).as("n_common"))
    val pairs = l.join(r, Seq("q_id")).filter(col("d1") < col("d2"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n0"),
        sum(when(sgn > 0, 1L).otherwise(0L)).as("conc"),
        sum(when(sgn < 0, 1L).otherwise(0L)).as("disc"),
        sum(when(col("a1") === col("a2"), 1L).otherwise(0L)).as("tie_a"),
        sum(when(col("b1") === col("b2"), 1L).otherwise(0L)).as("tie_b"))
    nc.join(pairs, Seq("q_id"), "left")
      .select(col("q_id"), col("n_common"),
        coalesce(col("conc"), lit(0L)).as("conc"),
        coalesce(col("disc"), lit(0L)).as("disc"),
        coalesce(col("tie_a"), lit(0L)).as("tie_a"),
        coalesce(col("tie_b"), lit(0L)).as("tie_b"),
        when(col("n0") - col("tie_a") > 0 && col("n0") - col("tie_b") > 0,
          floor((col("conc") - col("disc")).cast("double") *
              lit(1000000.0) /
              sqrt((col("n0") - col("tie_a")).cast("double") *
                (col("n0") - col("tie_b")).cast("double")))
            .cast("long"))
          .as("taub_micro"))
  }

  /** SPEARMAN'S ρ @k — the third classic rank-correlation lens next to
    * [[rankAgreement]]'s τ and [[rboAtK]]: τ counts pair inversions
    * (every swap costs the same), ρ penalizes by DISPLACEMENT distance
    * (a doc moved 5 places costs 25× one moved 1), RBO weights by
    * depth. Common docs of the two ≤k cut lists re-rank densely 1..n
    * within the common subset (row_number by each side's rank,
    * doc_id tiebreak — documented, both engines identical), then
    * ρ = 1 − 6·Σd²/(n(n²−1)).
    *
    * Integer-exact: Σd² is a BIGINT sum, the division is one micro
    * `div` with a non-negative numerator (truncation = floor), and the
    * subtraction from 10⁶ is exact — bit-identical across engines.
    * Division-form overflow guard on Σd²·6·10⁶. Null when n < 2.
    * Scale shape: the common-set equi-join, two ≤k-row windows per
    * query, one hash aggregate. Returns (q_id, n_common, sum_d2,
    * rho_micro).
    */
  def spearmanAtK(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    // n_common ≤ k and the denominator n(n²−1) wraps BIGINT at
    // n ≥ 2,097,152 — reject up front (raise-don't-wrap contract)
    require(k >= 1 && k < (1 << 21),
      "k must be in [1, 2^21) — n(n^2-1) must fit a BIGINT")
    def cut(r: DataFrame, rkName: String) = r
      .select(col("q_id"), col("doc_id"), col("rk"))
      .filter(col("rk") <= k)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(min(col("rk")).as(rkName))
    val common = cut(a, "rk_a").join(cut(b, "rk_b"), Seq("q_id", "doc_id"))
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("rk_a").asc, col("doc_id").asc)
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("rk_b").asc, col("doc_id").asc)
    common
      .withColumn("ra", row_number().over(wA).cast("long"))
      .withColumn("rb", row_number().over(wB).cast("long"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_common"),
        sum((col("ra") - col("rb")) * (col("ra") - col("rb")))
          .as("sum_d2"))
      .select(col("q_id"), col("n_common"), col("sum_d2"),
        when(col("n_common") >= 2,
          when(col("sum_d2") <= lit(Long.MaxValue / 6000000L),
            lit(1000000L) - expr("6 * sum_d2 * 1000000 div " +
              "(n_common * (n_common * n_common - 1))"))
            .otherwise(expr("raise_error('Eval.spearmanAtK: " +
              "displacement mass overflows the exact micro grid — " +
              "use a smaller k')").cast("long")))
          .as("rho_micro"))
  }

  /** RANKING AGREEMENT @k — how much two rankings of the same queries
    * agree (exact vs ANN retrieval, yesterday's index vs today's): per
    * query the top-k overlap (Jaccard over the two ≤k-row cut lists)
    * and Kendall's τ restricted to the COMMON documents (concordant vs
    * discordant rank-order pairs; τ = (C−D)/(C+D), null when fewer than
    * two common docs). Both inputs dedupe defensively to their best
    * (min) rank per (q_id, doc_id), like [[retrievalMetrics]].
    *
    * Scale shape: two ≤k-cut hash aggregates, one (q_id, doc_id)
    * equi-join, and a pair join that is an EQUI-join on q_id with the
    * `doc_id <` residual — per query at most k(k−1)/2 pairs, so the
    * join output is bounded by queries·k², never corpus-sized. All
    * counts BIGINT; ratios are micro divisions. Returns per query:
    * (q_id, n_a, n_b, n_common, jaccard_micro, tau_micro).
    */
  def rankAgreement(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    def cut(r: DataFrame, rkName: String) = r
      .select(col("q_id"), col("doc_id"), col("rk"))
      .filter(col("rk") <= k)
      .groupBy(col("q_id"), col("doc_id"))
      .agg(min(col("rk")).as(rkName))
    val ca = cut(a, "rk_a")
    val cb = cut(b, "rk_b")
    val na = ca.groupBy(col("q_id")).agg(count(lit(1)).as("n_a"))
    val nb = cb.groupBy(col("q_id")).agg(count(lit(1)).as("n_b"))
    val common = ca.join(cb, Seq("q_id", "doc_id"))
    val nc = common.groupBy(col("q_id")).agg(count(lit(1)).as("n_common"))
    // pair walk over the common set: equi-join on q_id, doc_id_1 <
    // doc_id_2 residual — ≤ k(k−1)/2 output rows per query
    val l = common.select(col("q_id"), col("doc_id").as("d1"),
      col("rk_a").as("a1"), col("rk_b").as("b1"))
    val r = common.select(col("q_id"), col("doc_id").as("d2"),
      col("rk_a").as("a2"), col("rk_b").as("b2"))
    val sgn = (col("a1") - col("a2")) * (col("b1") - col("b2"))
    val pairs = l.join(r, Seq("q_id")).filter(col("d1") < col("d2"))
      .groupBy(col("q_id"))
      .agg(sum(when(sgn > 0, 1L).otherwise(0L)).as("conc"),
        sum(when(sgn < 0, 1L).otherwise(0L)).as("disc"))
    na.join(nb, Seq("q_id"), "full")
      .join(nc, Seq("q_id"), "left")
      .join(pairs, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        expr("coalesce(n_common, 0) * 1000000 div " +
          "nullif(coalesce(n_a, 0) + coalesce(n_b, 0) - " +
          "coalesce(n_common, 0), 0)").as("jaccard_micro"),
        // sign-split division: Spark's `div` truncates toward zero while
        // DuckDB's `//` floors — they agree only on non-negative
        // numerators, so divide |C−D| and re-apply the sign
        when(col("conc") + col("disc") > 0,
          when(col("conc") >= col("disc"),
            expr("(conc - disc) * 1000000 div (conc + disc)"))
            .otherwise(-expr("(disc - conc) * 1000000 div (conc + disc)")))
          .as("tau_micro"))
  }
}
