package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary training — the Sennrich et al. 2016
  * byte-pair-encoding recipe (arXiv:1508.07909 §3.2) restructured for a
  * corpus-scale engine:
  *
  *   1. ONE corpus-wide pass builds the distinct (word, freq) table — the
  *      only shuffle that ever touches raw tokens. Zipf guarantees this
  *      table is orders of magnitude smaller than the corpus (distinct
  *      words vs total tokens), which is what makes iterating affordable.
  *   2. Each merge iteration runs entirely over that table: a hash
  *      aggregation of adjacent symbol pairs weighted by word frequency,
  *      an argmax collect of exactly ONE row to the driver, and a narrow
  *      `transform` applying the merge left-to-right non-overlapping.
  *      No raw-corpus pass ever repeats.
  *
  * The pair merge inside each word is a sequential fold expressed with
  * `aggregate` over the symbol array (state = emitted symbols + one
  * pending symbol) — codegen-free HOF but over the small distinct-word
  * table, not the corpus. Ties in pair frequency break lexicographically
  * (left, then right), so training is deterministic and engine-portable.
  *
  * The learned merges induce a subword vocabulary
  * ([[vocabFromMerges]]) directly usable by the existing greedy
  * [[TextAnalysis.wordpiece]] encoder.
  */
object BpeTrain {

  /** One learned merge: iteration rank, the pair, its merged symbol, and
    * the weighted frequency that won the argmax.
    */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, freq: Long)

  /** Distinct-word frequency table — the single corpus-wide shuffle.
    * `word` plus `syms` (the word exploded into single-character symbols).
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      // split-on-empty can emit boundary empties depending on the regex
      // engine — filter defensively so symbols are never ""
      .withColumn("syms",
        filter(split(col("word"), ""), s => s =!= ""))

  /** Adjacent-pair weighted counts over a symbolized word table: one hash
    * aggregation; pair key = (left, right). This is the per-iteration
    * workhorse AND a useful corpus statistic on its own (`q_bpe_pairs`).
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), posexplode(expr(
        "transform(slice(syms, 1, size(syms) - 1)," +
          " (s, i) -> struct(s AS l, syms[i + 1] AS r))"))
        .as(Seq("pos", "pair")))
      .groupBy(col("pair.l").as("lhs"), col("pair.r").as("rhs"))
      .agg(sum(col("freq")).as("pair_freq"))

  /** Left-to-right non-overlapping replacement of the adjacent pair
    * (`l`,`r`) by their concatenation inside a symbol array — the standard
    * single-iteration BPE merge. Sequential fold: state carries the
    * emitted prefix and one pending symbol ('' = none; symbols are never
    * empty strings).
    */
  def mergePair(syms: Column, l: String, r: String): Column = {
    val folded = aggregate(
      syms,
      struct(expr("CAST(array() AS array<string>)").as("out"),
        lit("").as("pend")),
      (acc, x) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend === "", struct(out.as("out"), x.as("pend")))
          .when(pend === l && x === r,
            struct(concat(out, array(lit(l + r))).as("out"),
              lit("").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"), x.as("pend")))
      },
      acc => when(acc.getField("pend") === "", acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pend")))))
    folded
  }

  /** Train `numMerges` BPE merges over the corpus. Returns the ranked
    * merge list (driver-side — it IS the model, numMerges rows).
    *
    * Per iteration: one pair-count aggregation over the persisted
    * distinct-word table + one single-row collect (the argmax) + one
    * narrow transform. Stops early when no adjacent pair remains.
    *
    * Cost honesty: each merge RECOUNTS all pairs (one Spark job over the
    * distinct-word table), so `numMerges` is expected moderate
    * (hundreds). A production 32k-merge vocabulary wants incremental
    * pair-delta maintenance (only pairs adjacent to the merged symbol
    * change) — same asymptotics per iteration but without per-job
    * scheduling overhead ×32k; the recount formulation is chosen here
    * for auditability against the oracle-gated [[pairCounts]].
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    var words = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    words.count() // materialize before iterating
    val merges = Seq.newBuilder[Merge]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("pair_freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, f) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(i, l, r, l + r, f)
        val next = words.withColumn("syms", mergePair(col("syms"), l, r))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        next.count()
        words.unpersist()
        words = next
        i += 1
      }
    }
    words.unpersist()
    merges.result()
  }

  /** Merge-rank-faithful BPE encoding of a token-array column against a
    * learned merge list ([[graft.functions.BpeEncodePieces]], a native
    * codegen'd kernel): per token, the lowest-rank applicable merge is
    * applied repeatedly — the exact inverse of [[train]], so
    * `encode(train(corpus))` reproduces training-time segmentation, which
    * greedy longest-match WordPiece does not guarantee. Returns the flat
    * piece array per row.
    */
  def encode(toks: Column, merges: Seq[Merge]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.BpeEncodePieces(
      ColumnBridge.expression(toks), merges.map(m => (m.left, m.right))))
  }

  /** Subword vocabulary induced by a merge list: all single characters
    * seen in the corpus plus every merged symbol, each emitted BOTH as a
    * word-initial piece and as a `##`-prefixed continuation piece — the
    * convention the greedy [[TextAnalysis.wordpiece]] encoder matches on,
    * so every corpus word tokenizes without `[UNK]`.
    */
  def vocabFromMerges(docs: DataFrame, textCol: String,
                      merges: Seq[Merge]): Seq[String] = {
    val chars = wordTable(docs, textCol)
      .select(explode(col("syms")).as("c")).distinct()
      .collect().map(_.getString(0)).toSeq
    val pieces = (chars ++ merges.map(_.merged)).distinct
    (pieces ++ pieces.map("##" + _)).sorted
  }
}
