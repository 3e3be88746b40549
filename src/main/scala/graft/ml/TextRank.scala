package graft.ml

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-weighting / ranking over a document corpus: TF-IDF keyword
  * extraction and BM25 query scoring — the retrieval half of a
  * training-data pipeline (keyword features, corpus search, query-based
  * filtering).
  *
  * Scale design (100 TB): both operators are explode → hash-aggregate
  * pipelines. Term statistics (`df`, corpus size, average doc length) are
  * tiny aggregates broadcast back to the big exploded frame; the corpus
  * itself is shuffled only by `(doc, term)` for the tf counts. No window
  * over the whole corpus: the per-doc top-k uses a partial top-k-friendly
  * `row_number` bounded per doc key.
  *
  * Float determinism: scores end as `floor(score · 10⁶)` BIGINT
  * micro-scores. Every input to the score is an exact integer (tf, df, N,
  * doc length) and the expression tree is fixed, so engines agree to the
  * last bit except for `ln` (correctly rounded in glibc, ≤1 ulp in the
  * JVM); the 10⁻⁶ truncation grid makes a last-ulp discrepancy harmless
  * unless a score lands within ~10⁻¹⁰ relative of a grid line — the
  * strict oracle gate checks exactly this.
  */
object TextRank {

  /** Per-(doc, term) frequency over whitespace tokens. */
  def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k TF-IDF terms per document: `score = tf · ln(N / df)`, emitted as
    * an exact `score_micro` BIGINT plus its (tf, df) inputs. Ties (and
    * everything else) break on ascending term.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int = 3): DataFrame = {
    // tf feeds dfreq and the join; column pruning narrows each copy (the
    // dfreq side drops the count), so the planner recomputes rather than
    // reuses — deliberate: both passes are scan-bound with the native
    // tokenizer, and a corpus-scale cache would pin executor storage
    val tf = termFreq(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val score = col("tf").cast("double") *
      log(col("n_docs").cast("double") / col("df").cast("double"))
    val scored = tf
      .join(dfreq, "term") // broadcast-eligible: |vocab| rows
      .crossJoin(broadcast(n))
      .withColumn("score_micro",
        floor(score * lit(1000000.0)).cast("long"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("score_micro"), col("rk"))
  }

  /** BM25 scores for a fixed bag of query terms (k1 = 1.2, b = 0.75):
    *
    * score(d) = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5)) ·
    *            tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * The per-term contributions are pivoted into fixed columns and added in
    * a FIXED left-to-right order (a grouped double sum would be
    * order-nondeterministic). Docs matching no term are omitted. Returns
    * `(doc_id, score_micro)`, `floor(score·10⁶)`.
    */
  def bm25Scores(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms == queryTerms.distinct)
    val toks = docs.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val consts = toks.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
    val tf = toks.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))
    val perTerm = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(consts))
      .withColumn("contrib", idf * (col("tf").cast("double") * lit(k1 + 1.0)) / denom)
    // positional aliases (c_0, c_1, …) keyed by term INDEX, never term
    // text: a term containing '.' or '`' would break column resolution
    val termCols = queryTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("contrib"))).as(s"c_$i") }
    val pivoted = perTerm.groupBy(col("doc_id"))
      .agg(termCols.head, termCols.tail: _*)
    val total = queryTerms.indices
      .map(i => coalesce(col(s"c_$i"), lit(0.0)))
      .reduceLeft(_ + _) // left-to-right: fixed IEEE evaluation order
    pivoted.select(col("doc_id"),
      floor(total * lit(1000000.0)).cast("long").as("score_micro"))
  }

  /** Corpus-trained bigram-LM scoring — the perplexity-style quality filter
    * (CCNet / Gopher recipe: score each document under a cheap LM trained
    * on the corpus itself; outliers on either end are boilerplate or
    * garbage). Add-one-smoothed conditional probability per bigram,
    *
    *   P(w₂|w₁) = (count(w₁w₂) + 1) / (count(w₁·) + V),
    *
    * where `count(w₁·)` is the unigram occurrence count of w₁ and V the
    * vocabulary size. Output per doc (≥ 2 tokens): `n_bigrams`,
    * `sum_micro` = Σ floor(ln P · 10⁶) and `avg_nll` = −sum/(n·10⁶) — the
    * average negative log-likelihood, ONE exact division.
    *
    * Float determinism: each bigram's ln lands on the 10⁻⁶ grid BEFORE
    * summation, so the per-doc sum is an exact BIGINT in any order — this
    * is how a multi-term float sum survives a distributed aggregation
    * bit-identically (the tfidf/bm25 grid trick, moved inside the sum).
    *
    * Scale shape: two explode → hash-count passes build the model (vocab-
    * sized outputs, partial-aggregated map-side); scoring joins the
    * exploded bigrams to the model on the bigram / first-word keys (both
    * broadcast-eligible at dictionary size, shuffle joins beyond); the
    * per-doc reduce is one hash agg. No windows, no driver loops.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
              maxBroadcastVocab: Long = 4000000L): DataFrame = {
    // no persist: the repeated subtrees (uni for vocab + the join, bg for
    // bcnt + scoring) are recomputed column-pruned-narrow — scan-bound
    // passes with the native tokenizer, where a cache would pin
    // corpus-scale executor storage across calls
    val toks = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("u_cnt"))
    val bg = toks.filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        explode(TextAnalysis.ngrams(col("tk"), 2)).as("bg"))
    val bcnt = bg.groupBy(col("bg")).agg(count(lit(1)).as("b_cnt"))
    // Same stopword-skew guard as [[dsirScores]]: both model tables are
    // dictionary-sized (Heaps' law), so under the cap they broadcast and
    // the exploded bigram stream never shuffles on hot word/bigram keys;
    // above it the shuffle joins stand with AQE skew-splitting.
    // ONE probe job yields BOTH model-table sizes: union the two vocab
    // aggregates under a tag and count rows per tag. Previously the bigram
    // side ran a separate .count() job over the same aggregate the main
    // query recomputes (r11 verdict: a redundant probe pass); folding both
    // counts into one job keeps the plain map-side-combined aggregations
    // (a tagged explode+distinct variant was measured SLOWER — the
    // per-occurrence key concat and the wide distinct shuffle cost more
    // than the job it saved). The unigram count doubles as the smoothing
    // plan literal V.
    val sizes = uni.select(lit("u").as("tag"))
      .union(bcnt.select(lit("b").as("tag")))
      .groupBy(col("tag")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val vsz = sizes.getOrElse("u", 0L)
    val uniSide = if (vsz <= maxBroadcastVocab) broadcast(uni) else uni
    val bcntSide =
      if (sizes.getOrElse("b", 0L) <= maxBroadcastVocab) broadcast(bcnt)
      else bcnt
    val terms = bg
      .withColumn("w", substring_index(col("bg"), " ", 1))
      .join(bcntSide, "bg")
      .join(uniSide, "w")
      .withColumn("t",
        floor(log((col("b_cnt") + 1).cast("double") /
          (col("u_cnt") + lit(vsz)).cast("double")) * lit(1000000.0))
          .cast("long"))
    terms.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("t")).as("sum_micro"))
      .withColumn("avg_nll",
        (-col("sum_micro")).cast("double") /
          (col("n_bigrams") * 1000000L).cast("double"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document log
    * importance weight `log p_target(x)/p_raw(x)` under add-1-smoothed
    * unigram bag-of-words models, where the target distribution is
    * estimated from the subset of `docs` matching `targetPred` (the
    * in-domain exemplar set) and the raw distribution from the whole
    * corpus. Select the top-weight documents (or feed the weight into
    * [[Sampling.weightedSample]]) to skew a crawl toward the target
    * domain.
    *
    * Per-token terms are quantized to the 10⁻⁶ grid BEFORE the per-doc sum
    * (the [[lmScore]] convention), so the score is an exact BIGINT —
    * engine-portable and order-insensitive. The smoothed ratio is computed
    * as a product of two double ratios (never a product of raw counts), so
    * nothing overflows at any corpus size. Residual portability caveat
    * (shared with [[lmScore]]): "engine-portable" relies on the engines'
    * `ln` implementations agreeing to the last bit — a 1-ULP divergence on
    * a term that lands EXACTLY on a 10⁻⁶ grid boundary would flip that
    * term's `floor` by 1. JVM `Math.log` and DuckDB `ln` have agreed on
    * every gated corpus to date; this is an empirical property, not an
    * IEEE-guaranteed one.
    *
    * Scale shape: one token explode feeding two map-side-combinable word
    * aggregations, a word-keyed shuffle join of tokens against the (raw ⋈
    * target) stats table, and one per-doc aggregation. Totals/vocab are
    * single-row broadcasts. Identical topology to [[lmScore]] / [[bm25Scores]].
    */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 targetPred: Column,
                 maxBroadcastVocab: Long = 4000000L): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"), targetPred.as("__tgt"),
        TextAnalysis.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
    val words = toks.select(col("doc_id"), col("__tgt"),
      explode(col("tk")).as("w"))
    val raw = words.groupBy(col("w")).agg(count(lit(1)).as("r_cnt"))
    val tgt = words.filter(col("__tgt"))
      .groupBy(col("w")).agg(count(lit(1)).as("t_cnt"))
    val totals = words.agg(count(lit(1)).as("r_tot"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("t_tot"))
    val stats = raw.join(tgt, Seq("w"), "left").na.fill(0L, Seq("t_cnt"))
    // Stopwords are classic hot keys on the word-keyed join below. The
    // distinct-word vocabulary grows sublinearly in corpus size (Heaps'
    // law), so `stats` almost always fits a broadcast: the vocabulary
    // scalar the score already needs doubles as the decision — collected
    // ONCE and folded in as a plan literal (a separate .count() probe
    // would recompute the same aggregate, and the r10 bench measured that
    // duplicate pass as a 25% regression on q_sample_importance).
    // Broadcasting turns the join into a map-side hash join — no shuffle
    // of the raw token stream, no hot keys at all. Beyond the cap the
    // shuffle join stands and AQE's skew split covers the stopword keys.
    val vsz = raw.agg(count(lit(1))).head().getLong(0)
    val statsSide =
      if (vsz <= maxBroadcastVocab) broadcast(stats) else stats
    val terms = words.select(col("doc_id"), col("w"))
      .join(statsSide, "w")
      .crossJoin(broadcast(totals))
      .withColumn("t",
        floor(log(
          ((col("t_cnt") + 1).cast("double") / (col("r_cnt") + 1).cast("double")) *
          ((col("r_tot") + lit(vsz)).cast("double") /
            (col("t_tot") + lit(vsz)).cast("double"))) * lit(1000000.0))
          .cast("long"))
    terms.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("t")).as("logratio_micro"))
  }

  /** Linear text-classifier inference over hashing-trick features — the
    * apply side of a fastText/VW-style quality model: per-doc logit =
    * Σ tf(slot)·w(slot) + bias, with weights on the 10⁻⁶ integer grid
    * (micro units) so the sum is an EXACT BIGINT — engine-portable like
    * [[dsirScores]] (no float accumulation order, no transcendental in
    * the gated path; the sigmoid is monotone, so thresholding on the
    * logit is equivalent).
    *
    * Scale: [[TextAnalysis.hashingFeatures]]'s single hash-shuffle plus
    * one more map-side-combinable groupBy; the weight vector rides as a
    * plan literal (array `element_at`), never a join — model application
    * is a narrow aggregate however large the corpus.
    *
    * Output: (id, logit_micro BIGINT, logit DOUBLE) for every doc with at
    * least one token (tokenless docs carry no feature mass — filter or
    * default them upstream).
    */
  /** Distributed batch-gradient training of the logistic model
    * [[scoreLinearModel]] applies — the TRAIN side of the fastText-style
    * quality classifier, run entirely in-engine. Full-batch gradient
    * descent: each iteration recomputes per-doc logits under the current
    * weights (a plan literal, like the apply side), folds the residuals
    * into one ≤`dim`-row gradient aggregate, and the driver updates the
    * dense weight vector.
    *
    * Scale: the exploded feature frame (one row per (doc, occupied slot))
    * is built ONCE and cached; each iteration is then two
    * map-side-combinable aggregates over it — per-doc logit, per-slot
    * gradient — and a ≤`dim`-row collect. Driver state is `dim` doubles.
    * Iterations are sequential by nature (GD); everything inside one
    * iteration is distributed.
    *
    * Returns (weights, bias) in natural units; quantize with
    * [[toMicro]] to feed [[scoreLinearModel]]. Labels: `labelCol` as 1.0
    * (positive) / 0.0 (negative). Docs with no tokens carry no features
    * and are ignored. Not oracle-gated: training is iterative and
    * float-accumulating (spec-verified on separable data instead).
    */
  def trainLinearModel(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dim: Int, iters: Int = 20,
      lr: Double = 0.5): (Array[Double], Double) = {
    require(iters >= 1 && dim >= 1)
    val f = TextAnalysis.hashingFeatures(docs, idCol, textCol, dim)
      .join(docs.select(col(idCol), col(labelCol).cast("double").as("__y")),
        Seq(idCol))
      .persist()
    try {
      val n = math.max(1L, f.select(col(idCol)).distinct().count())
      var w = new Array[Double](dim)
      var b = 0.0
      var it = 0
      while (it < iters) {
        val logits = f
          .withColumn("__w", element_at(lit(w), col("slot") + 1))
          .groupBy(col(idCol))
          .agg((sum(col("tf") * col("__w")) + b).as("__z"),
            first(col("__y")).as("__y"))
          .withColumn("__r",
            lit(1.0) / (lit(1.0) + exp(-col("__z"))) - col("__y"))
        val grads = f.join(logits.select(col(idCol), col("__r")), Seq(idCol))
          .groupBy(col("slot"))
          .agg(sum(col("tf") * col("__r")).as("__g"))
          .collect().map(r => r.getInt(0) -> r.getAs[Double]("__g")).toMap
        val bGrad = logits.agg(sum(col("__r"))).head().getDouble(0)
        w = Array.tabulate(dim)(s => w(s) - lr * grads.getOrElse(s, 0.0) / n)
        b -= lr * bGrad / n
        it += 1
      }
      (w, b)
    } finally { f.unpersist(); () }
  }

  /** Quantize trained weights/bias onto [[scoreLinearModel]]'s 10⁻⁶ grid. */
  def toMicro(w: Array[Double], b: Double): (Array[Long], Long) =
    (w.map(x => math.floor(x * 1e6).toLong), math.floor(b * 1e6).toLong)

  def scoreLinearModel(docs: DataFrame, idCol: String, textCol: String,
      weightsMicro: Array[Long], biasMicro: Long): DataFrame = {
    val dim = weightsMicro.length
    require(dim >= 1, "weights must be non-empty")
    TextAnalysis.hashingFeatures(docs, idCol, textCol, dim)
      .withColumn("__wq", element_at(lit(weightsMicro), col("slot") + 1))
      .groupBy(col(idCol))
      .agg((sum(col("tf") * col("__wq")) + biasMicro).as("logit_micro"))
      .withColumn("logit", col("logit_micro").cast("double") / 1000000.0)
  }
}
