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
    * Two execution paths with IDENTICAL semantics (spec-asserted equal):
    *   - distinct-word count ≤ `maxDriverWords` (the common case — Zipf
    *     compresses even web-scale corpora to tens of millions of
    *     distinct words): the (word, freq) table collects once and
    *     training runs in-memory with incremental pair-delta maintenance
    *     ([[trainInMemory]]) — zero Spark jobs per merge, which is what
    *     makes 32k-merge production vocabularies affordable. This is the
    *     same capped-driver-hybrid shape as [[Dedup]]'s cluster
    *     union-find.
    *   - above the cap: the fully-distributed recount loop
    *     ([[trainDistributed]]) — one pair-count aggregation + single-row
    *     argmax per merge, never materializing words on the driver.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxDriverWords: Long = 2000000L): Seq[Merge] = {
    val words = wordTable(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (words.count() <= maxDriverWords) {
        val wf = words.select(col("word"), col("freq"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        trainInMemory(wf, numMerges)
      } else trainDistributed(words, numMerges)
    } finally { words.unpersist(); () }
  }

  /** Code-point order on strings — the order `UTF8String` binary
    * comparison (and therefore Spark's `orderBy` on strings) induces.
    * Java's `String.compareTo` is UTF-16 code-UNIT order, which ranks
    * supplementary characters (surrogates 0xD800+) BELOW BMP characters
    * ≥ U+E000 — the two orders disagree exactly on non-BMP text, so every
    * driver-side tie-break in this file must use this comparator to stay
    * merge-for-merge equal to the distributed path.
    */
  private[ml] def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** One word split into code-point symbols — `"ab😀"` → `["a","b","😀"]`.
    * Matches [[wordTable]]'s `split(word, '')` (Java regex splits at code
    * points) and the [[graft.functions.BpeModel]] encode-side
    * symbolization; splitting at UTF-16 code units instead would strand
    * lone surrogates that `UTF8String.fromString` corrupts to '?'.
    */
  private[ml] def codePointSyms(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0
    var si = 0
    while (i < w.length) {
      val cc = Character.charCount(w.codePointAt(i))
      out(si) = w.substring(i, i + cc)
      si += 1
      i += cc
    }
    out
  }

  /** Distributed recount loop (the over-cap path), learning merges in
    * BATCHES so a 32k-merge production vocabulary does not cost one
    * pair-count job chain per merge.
    *
    * Per pass: one pair-count aggregation, one bounded `topM`-row collect,
    * then a driver-side selection of the longest prefix of the
    * (freq desc, lhs, rhs) order that provably equals sequential BPE:
    *
    *   - selected pairs are pairwise SYMBOL-DISJOINT, where each selection
    *     claims its left, right AND merged string (l+r): merging p cannot
    *     change the adjacency count of a pair q that shares none of the
    *     three (it only rewrites occurrences of p's symbols into p.merged,
    *     so it can neither create nor destroy a q-adjacency unless q names
    *     one of them), so all selected counts stay exact and
    *     order-independent while the batch applies.
    *   - selection stops at the first pair that SHARES a symbol with the
    *     prefix (or at `topM`/`maxBatch` exhaustion), and the prefix is
    *     then trimmed to pairs with freq STRICTLY above that cut
    *     frequency. A merge of (l,r) can only create new pairs (X,lr) or
    *     (lr,Y) whose counts are bounded by the OLD counts of (X,l) /
    *     (r,Y) — pairs sharing a symbol with the selection, which all sit
    *     at or below the cut. Strict trimming therefore guarantees no
    *     created pair can outrank (or tie-break against) any batch member,
    *     i.e. sequential BPE would have picked exactly this batch in this
    *     order. Empty trim (top ties interact) falls back to the single
    *     top pair — plain sequential behavior.
    *
    * The whole batch applies as ONE nested [[mergePair]] projection over
    * the word table, materialized via `localCheckpoint` — lineage is CUT
    * each pass, so the logical plan does not accumulate one aggregate-HOF
    * per learned merge across passes (deep-plan analysis blowup).
    * Tail-frequency tie classes (where most of a 32k vocabulary lives) are
    * huge, so passes amortize tens-to-hundreds of merges each:
    * `BpeTrainSpec` pins the sublinear job growth with a listener.
    */
  def trainDistributed(wordsIn: DataFrame, numMerges: Int,
                       maxBatch: Int = 256, topM: Int = 4096): Seq[Merge] = {
    var words = wordsIn
    val merges = Seq.newBuilder[Merge]
    var learned = 0
    var exhausted = false
    while (learned < numMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("pair_freq").desc, col("lhs").asc, col("rhs").asc)
        .limit(topM).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val want = math.min(maxBatch, numMerges - learned)
        val selected = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
        val used = scala.collection.mutable.HashSet[String]()
        // freq at the first interacting pair / collection horizon; -1 = none
        var cutFreq = -1L
        var idx = 0
        while (idx < top.length && selected.size < want && cutFreq < 0) {
          val (l, r, f) = top(idx)
          if (used(l) || used(r) || used(l + r)) cutFreq = f
          else {
            selected += ((l, r, f))
            used += l
            used += r
            used += l + r
          }
          idx += 1
        }
        // pairs never seen (beyond topM, or beyond the maxBatch stop) also
        // bound created-pair counts — treat the first unseen freq as a cut
        if (cutFreq < 0 && (idx < top.length || top.length == topM))
          cutFreq = if (idx < top.length) top(idx)._3 else top.last._3
        val batch0 =
          if (cutFreq < 0) selected.toSeq
          else selected.takeWhile(_._3 > cutFreq).toSeq
        val batch = if (batch0.nonEmpty) batch0 else Seq(top.head)
        batch.foreach { case (l, r, f) =>
          merges += Merge(learned, l, r, l + r, f)
          learned += 1
        }
        val newSyms = batch.foldLeft(col("syms")) {
          case (c, (l, r, _)) => mergePair(c, l, r)
        }
        // localCheckpoint (eager): materializes the pass AND truncates
        // lineage, so plan depth stays one pass deep, not numMerges deep —
        // superseded checkpoint blocks are released by the ContextCleaner
        // once the previous frame goes unreferenced
        words = words.withColumn("syms", newSyms).localCheckpoint()
      }
    }
    merges.result()
  }

  /** In-memory trainer over a collected (word, freq) table with
    * incremental pair-delta maintenance: merging pair p only touches the
    * words that CONTAIN p (tracked by an inverted pair→words index), each
    * of which subtracts its current pair contributions, applies the
    * merge, and re-adds — O(affected words × word length) per merge
    * instead of a full recount. Argmax scans the live pair map with the
    * full (freq desc, lhs asc, rhs asc) tiebreak, so results are
    * independent of hash-map iteration order and identical to
    * [[trainDistributed]].
    */
  def trainInMemory(wordFreqs: Seq[(String, Long)],
                    numMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val words = mutable.ArrayBuffer[Array[String]]()
    val freqs = mutable.ArrayBuffer[Long]()
    wordFreqs.foreach { case (w, f) =>
      words += codePointSyms(w)
      freqs += f
    }
    val pairCount = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.Set[Int]]()
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      val f = freqs(i)
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * f
        if (c == 0L) pairCount.remove(p) else pairCount.update(p, c)
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set()) += i
        j += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))
    def mergeArray(s: Array[String], l: String, r: String): Array[String] = {
      val out = mutable.ArrayBuffer[String]()
      var p = 0
      while (p < s.length) {
        if (p + 1 < s.length && s(p) == l && s(p + 1) == r) {
          out += l + r; p += 2
        } else { out += s(p); p += 1 }
      }
      out.toArray
    }
    val merges = Seq.newBuilder[Merge]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      var bestP: (String, String) = null
      var bestC = 0L
      // tie-break in CODE-POINT order ([[cpCompare]]) — Scala's String '<'
      // is UTF-16 code-unit order and disagrees for non-BMP symbols,
      // which would desync this path from trainDistributed's orderBy
      pairCount.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && bestP != null && {
          val dl = cpCompare(p._1, bestP._1)
          dl < 0 || (dl == 0 && cpCompare(p._2, bestP._2) < 0)
        })) {
          bestP = p; bestC = c
        }
      }
      if (bestP == null) done = true
      else {
        merges += Merge(k, bestP._1, bestP._2, bestP._1 + bestP._2, bestC)
        // affected membership can be stale (a word that no longer holds
        // the pair): subtract-current/merge(no-op)/re-add cancels exactly
        val affected = pairWords.getOrElse(bestP, mutable.Set.empty).toArray
        pairWords.remove(bestP)
        affected.foreach { i =>
          addWord(i, -1L)
          words(i) = mergeArray(words(i), bestP._1, bestP._2)
          addWord(i, 1L)
        }
        k += 1
      }
    }
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
