package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.functions.{CountInSet, LangBest, RepetitionStats, SumTokenChars, UnicodeNormalize, WhitespaceTokens, WordEntropyStats, WordNgrams, WordpiecePieces}

/** Text-analysis operators for training-data pipelines: tokenization, token
  * counting, quality scoring, language-ID heuristic, fingerprinting.
  *
  * The hot per-row kernels (tokenize, n-gram, stopword counting, repetition
  * statistics) are native Catalyst expressions ([[graft.functions.TextExprs]])
  * — single-pass JVM loops reachable from whole-stage codegen. The
  * equivalent `org.apache.spark.sql.functions` higher-order-function
  * pipelines they replaced are evaluated interpreted per element
  * (`CodegenFallback`, no subexpression caching) and measured ~10x slower
  * at corpus scale. No UDFs, no shuffle: the 100 TB path stays a single
  * narrow projection over the documents table.
  */
object TextAnalysis {

  private def nat(c: Column)(
      f: org.apache.spark.sql.catalyst.expressions.Expression =>
        org.apache.spark.sql.catalyst.expressions.Expression): Column =
    ColumnBridge.column(f(ColumnBridge.expression(c)))

  /** Whitespace tokens, empty-safe (split on space runs, drop empties). */
  def tokens(text: Column): Column = nat(text)(WhitespaceTokens(_))

  /** Unicode normalization (default NFC) — multilingual corpora arrive in
    * mixed composed/decomposed forms; every downstream exact-hash op
    * (dedup fingerprints, shingles, decontamination n-grams) silently
    * misses matches until the text is on one canonical form. Narrow
    * per-row kernel with an `isNormalized` zero-copy fast path.
    */
  def normalizeUnicode(text: Column, form: String = "NFC"): Column =
    nat(text)(UnicodeNormalize(_, form))

  /** Accent folding: NFD-decompose then strip combining marks (`\p{Mn}`) —
    * "café" → "cafe". The search-normalization companion to
    * [[normalizeUnicode]] (matches DuckDB/utf8proc `strip_accents` on
    * Latin-script text).
    */
  def foldAccents(text: Column): Column =
    regexp_replace(normalizeUnicode(text, "NFD"), "\\p{Mn}", "")

  /** BPE-ish subword count: runs of letters, digits, or single symbols —
    * the standard cheap proxy for LLM token counts.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word-level n-gram shingles (default 3), distinct (first-occurrence
    * order, matching `array_distinct`). One native pass per row.
    */
  def shingles(toks: Column, n: Int = 3): Column =
    nat(toks)(WordNgrams(_, n, distinct = true))

  /** Word-level n-grams WITH repeats (positional occurrences) — the
    * repetition signals need occurrence counts, not the distinct set.
    */
  def ngrams(toks: Column, n: Int): Column =
    nat(toks)(WordNgrams(_, n, distinct = false))

  /** Common-stopword sets used by the language-ID heuristic and the quality
    * score. Public, conventional lists (top function words per language).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "avec"),
  )

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    nat(toks)(CountInSet(_, words))

  /** Quality metrics: deterministic per-row arithmetic (exact across
    * engines — counts and integer-division-derived doubles only).
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val distinctWords = size(array_distinct(toks)).cast("long")
    val stopHits = stopwordHits(toks, stopwords("en")).cast("long")
    // exact sum of token lengths (integer sum — order-independent)
    val tokChars = nat(toks)(SumTokenChars(_))
    Seq(
      "n_words" -> nWords,
      "n_chars" -> nChars,
      "distinct_words" -> distinctWords,
      "avg_word_len" -> tokChars.cast("double") / nWords,
      "distinct_ratio" -> distinctWords.cast("double") / nWords,
      "stopword_ratio" -> stopHits.cast("double") / nWords,
    )
  }

  /** Composite quality score in [0,1]: length band + lexical diversity +
    * stopword presence. The exact formula is a policy choice; what matters
    * is it is pure column arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val cols = qualityColumns(text).toMap
    val lengthOk = when(cols("n_words").between(20, 1000), 1.0).otherwise(0.5)
    val diversity = least(cols("distinct_ratio") * 2.0, lit(1.0))
    val stop = least(cols("stopword_ratio") * 5.0, lit(1.0))
    (lengthOk + diversity + stop) / 3.0
  }

  /** Language-ID by stopword-hit voting: score per language, argmax with
    * deterministic tiebreak (language name ascending), "und" when no hits.
    * One native pass over the token array accumulates all four language
    * counters at once ([[graft.functions.LangBest]]).
    */
  def langId(text: Column): Column =
    nat(tokens(text))(LangBest(_, stopwords.toSeq))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text,
    * plus a 60-bit numeric fingerprint (hex prefix as integer) for compact
    * join keys.
    */
  def fingerprintColumns(text: Column): Seq[(String, Column)] = {
    val norm = regexp_replace(trim(lower(text)), "\\s+", " ")
    val h = md5(norm.cast("binary"))
    Seq(
      "fp_md5" -> h,
      "fp_num" -> conv(substring(h, 1, 15), 16, 10).cast("long"))
  }

  /** PII scrubbing for training corpora: mask emails, IPv4 addresses, URLs
    * and long digit runs (phone/account numbers) with typed placeholders.
    * Pure `regexp_replace` chain — codegen'd, no UDF, order matters (URLs
    * before bare digit runs so ports/paths don't get half-masked; emails
    * before URLs so `user@host` isn't URL-mangled). The regexes use the
    * RE2-safe subset so an external engine reproduces them byte-for-byte.
    */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email,
      "https?://[^\\s]+", "<URL>")
    val ip = regexp_replace(url,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{7,}\\b", "<NUM>")
  }

  /** Count of PII matches scrubbed (for corpus audits): how many
    * placeholders appear in the scrubbed text.
    */
  def piiCount(text: Column): Column = {
    val scrubbed = scrubPii(text)
    Seq("<EMAIL>", "<URL>", "<IP>", "<NUM>").map { p =>
      (length(scrubbed) -
        length(regexp_replace(scrubbed, java.util.regex.Pattern.quote(p), ""))) /
        p.length
    }.reduce(_ + _).cast("long")
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1, adapted to
    * word n-grams): per document,
    *   - `top_word_frac`    — occurrences of the most frequent word / total words;
    *   - `top_bigram_frac`  — occurrences of the most frequent bigram / total bigrams;
    *   - `dup_trigram_frac` — fraction of trigram occurrences whose trigram
    *     appears more than once in the document.
    * High values flag boilerplate/spam that exact- and near-dedup miss
    * (repetition is WITHIN the document, not across documents).
    *
    * Shape: SHUFFLE-FREE. Every statistic here is within one document, so
    * no exchange is ever needed: one native pass per row counts all three
    * gram sizes at once ([[graft.functions.RepetitionStats]]). A narrow
    * projection over the documents table — at 100 TB this runs at scan
    * speed. All counts are integers; each fraction is ONE exact double
    * division, so the output is bit-identical across engines. Documents
    * too short for an n-gram size get a NULL fraction for it; documents
    * with no tokens produce no row (exactly the rows the explode
    * formulation yields).
    */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col(idCol), nat(col("tk"))(RepetitionStats(_)).as("rs"))
    base.select(
      col(idCol),
      col("rs.n_words").as("n_words"),
      (col("rs.top_word").cast("double") / col("rs.n_words"))
        .as("top_word_frac"),
      when(col("rs.n_bigrams") > 0,
        col("rs.top_bigram").cast("double") / col("rs.n_bigrams"))
        .as("top_bigram_frac"),
      when(col("rs.n_trigrams") > 0,
        col("rs.dup_trigrams").cast("double") / col("rs.n_trigrams"))
        .as("dup_trigram_frac"))
  }

  /** Per-document Shannon entropy of the word distribution (in
    * −10⁶·nats, exact BIGINT): the standard gibberish/boilerplate quality
    * signal — near-zero entropy means the document is a handful of words
    * repeated (spam, keyword stuffing, log spew); natural text sits near
    * its token-count ceiling. Complements [[repetitionSignals]] (which
    * sees *positional* repetition) with a position-free distributional
    * one.
    *
    * Shape: a single native one-pass kernel per row
    * ([[graft.functions.WordEntropyStats]]) — NO token explode, NO
    * (doc, word) shuffle; at 100 TB this runs at scan speed. Per-word
    * terms quantize to the 10⁻⁶ grid before an integer sum, so hashmap
    * iteration order cannot perturb the result (engine-portable).
    */
  def wordEntropy(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col(idCol), nat(col("tk"))(WordEntropyStats(_)).as("we"))
      .select(col(idCol),
        col("we.n_tokens").as("n_tokens"),
        col("we.distinct_words").as("distinct_words"),
        col("we.entropy_micro").as("entropy_micro"))

  /** Deflate-compressibility quality signal per document: raw/deflated
    * byte counts and the ratio on the 1e-6 grid (low = repetitive or
    * templated, near 1e6 = incompressible gibberish/binary-in-text). One
    * native per-row kernel ([[graft.functions.DeflateStats]]) inside
    * whole-stage codegen — scan-bound, no shuffle. Spec-gated: deflate is
    * not expressible in any SQL oracle engine.
    */
  def compressionRatio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        nat(col(textCol))(graft.functions.DeflateStats(_)).as("cs"))
      .select(col(idCol),
        col("cs.raw_bytes").as("raw_bytes"),
        col("cs.deflate_bytes").as("deflate_bytes"),
        col("cs.ratio_micro").as("ratio_micro"))

  /** FLESCH READING EASE per document — the classic readability signal
    * next to [[qualityScore]]/[[gopherFlags]] (training mixtures are
    * routinely stratified by readability): `206.835 − 1.015·(words/
    * sentences) − 84.6·(syllables/words)`. Syllables use the standard
    * vowel-group heuristic (runs of `[aeiouy]` per lowercased word,
    * min 1); sentences count `[.!?]+` runs (min 1).
    *
    * Determinism: all three counts are exact BIGINTs (regexp-defined,
    * engine-portable); the score is a FIXED IEEE tree over them
    * (two divisions, two multiplies, left-assoc subtraction), floored
    * to the micro grid — oracle-gateable despite being a float formula.
    * Shape: per-row higher-order aggregate over the token array — no
    * explode, no shuffle, scan-bound. Rows with zero words drop.
    */
  def readability(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val syll = aggregate(toks, lit(0L), (acc, t) =>
      acc + greatest(lit(1L),
        size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
          .cast("long")))
    val sent = greatest(lit(1L),
      size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0)))
        .cast("long"))
    val w = col("n_words").cast("double")
    val flesch = lit(206.835) -
      lit(1.015) * (w / col("n_sentences").cast("double")) -
      lit(84.6) * (col("n_syllables").cast("double") / w)
    // Flesch–Kincaid GRADE LEVEL — same counts, the school-grade scale
    val fkgl = lit(0.39) * (w / col("n_sentences").cast("double")) +
      lit(11.8) * (col("n_syllables").cast("double") / w) - lit(15.59)
    docs.select(col(idCol), size(toks).cast("long").as("n_words"),
        sent.as("n_sentences"), syll.as("n_syllables"))
      .filter(col("n_words") > 0)
      .withColumn("flesch_micro",
        floor(flesch * lit(1000000.0)).cast("long"))
      .withColumn("fkgl_micro",
        floor(fkgl * lit(1000000.0)).cast("long"))
  }

  /** C4-style cleaning flags (Raffel et al. 2020 §2.2, adapted to
    * single-line documents): policy-configurable boolean signals plus the
    * conjunction `keep`. Pure per-row predicates — narrow projection, no
    * shuffle, fully codegen'd; at 100 TB this runs at scan speed.
    */
  def c4Flags(text: Column, blocklist: Seq[String] = Seq("lorem", "javascript"),
      minWords: Int = 5): Seq[(String, Column)] = {
    val toks = tokens(lower(text))
    val nWords = size(toks).cast("long")
    val blockHits = size(filter(toks, t => t.isin(blocklist.map(lit(_)): _*))).cast("long")
    Seq(
      "n_words" -> nWords,
      "min_words_ok" -> (nWords >= minWords),
      "ends_with_punct" -> trim(text).rlike("[.!?]$"),
      "has_curly" -> text.contains("{"),
      "block_hits" -> blockHits,
      "keep" -> ((nWords >= minWords) && (blockHits === 0L) && !text.contains("{")))
  }

  /** Gopher-style document filter rules (Rae et al. 2021 Table A1) — the
    * standard pre-training quality gate alongside [[c4Flags]]: word-count
    * band, mean-word-length band [3,10], hash / ellipsis symbol-to-word
    * ratios ≤ 0.1, bullet-started lines ≤ 90%, ellipsis-ended lines
    * ≤ 30%, words-with-an-alphabetic-character ≥ 80%, and ≥ 2 distinct
    * stopwords present (Gopher's 8-word set).
    *
    * Every threshold compares INTEGERS (`tok_chars BETWEEN 3·n AND
    * 10·n`, `hash_hits·10 ≤ n`, `alpha_words·5 ≥ 4·n`, …) — no division,
    * no floats, bit-identical across engines, and empty documents flag
    * deterministically instead of yielding NULL ratios. Pure per-row
    * column arithmetic: a narrow codegen'd projection, no shuffle — at
    * 100 TB this runs at scan speed like [[c4Flags]].
    */
  def gopherFlags(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      stopset: Seq[String] = Seq("the", "be", "to", "of", "and", "that",
        "have", "with")): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val tokChars = nat(toks)(SumTokenChars(_))
    val alphaWords =
      size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    def occurrences(needle: String): Column =
      ((length(text) -
        length(regexp_replace(text, java.util.regex.Pattern.quote(needle),
          ""))) / needle.length).cast("long")
    val hashHits = occurrences("#")
    val ellipsisHits = occurrences("...") + occurrences("…")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines =
      size(filter(lines, l => l.rlike("^\\s*[•\\-\\*]"))).cast("long")
    val ellipsisLines =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$")))
        .cast("long")
    val stopHits = size(filter(array_distinct(toks),
      t => t.isin(stopset.map(lit(_)): _*))).cast("long")
    val flags = Seq(
      "word_count_ok" -> nWords.between(minWords, maxWords),
      "word_len_ok" -> tokChars.between(lit(3L) * nWords, lit(10L) * nWords),
      "hash_ok" -> (hashHits * 10 <= nWords),
      "ellipsis_ok" -> (ellipsisHits * 10 <= nWords),
      "bullet_ok" -> (bulletLines * 10 <= nLines * 9),
      "ellipsis_line_ok" -> (ellipsisLines * 10 <= nLines * 3),
      "alpha_ok" -> (alphaWords * 5 >= nWords * 4),
      "stopword_ok" -> (stopHits >= 2))
    Seq(
      "n_words" -> nWords,
      "tok_chars" -> tokChars.cast("long"),
      "alpha_words" -> alphaWords,
      "hash_hits" -> hashHits,
      "ellipsis_hits" -> ellipsisHits,
      "n_lines" -> nLines,
      "bullet_lines" -> bulletLines,
      "ellipsis_lines" -> ellipsisLines,
      "stop_hits" -> stopHits) ++ flags ++
      Seq("keep" -> flags.map(_._2).reduce(_ && _))
  }

  /** Greedy WordPiece application (BERT inference tokenization) against a
    * fixed subword vocabulary — the "tokenizer apply" step downstream of
    * [[vocabulary]] induction: per whitespace token, longest-match pieces
    * (continuations carry "##"), `unk` when nothing matches. Native
    * single-pass kernel ([[graft.functions.WordpiecePieces]]); the
    * vocabulary rides along as a codegen reference, so at 100 TB this is
    * a narrow scan-speed projection like every kernel here.
    */
  def wordpiece(toks: Column, vocab: Seq[String],
                unk: String = "[UNK]"): Column =
    nat(toks)(WordpiecePieces(_, vocab, unk))

  /** Per-source corpus report — the "dataset card" numbers every training
    * corpus ships with (docs, token/char volume, language spread, cleaning
    * keep-rate, and the mix share). One narrow projection (native token
    * counts + C4 keep flag per row) into one hash aggregation; the two
    * rates are exact single divisions. At 100 TB this is scan-bound with a
    * source-count-sized output.
    */
  def corpusReport(docs: DataFrame, sourceCol: String = "source",
      textCol: String = "text", langCol: String = "lang",
      blocklist: Seq[String] = Seq("lorem", "javascript"),
      minWords: Int = 5): DataFrame = {
    val keep = c4Flags(col(textCol), blocklist, minWords).toMap.apply("keep")
    val rows = docs.select(col(sourceCol),
      size(tokens(col(textCol))).cast("long").as("__nw"),
      length(col(textCol)).cast("long").as("__nc"),
      col(langCol).as("__lang"),
      when(keep, 1L).otherwise(0L).as("__kp"))
    val total = rows.agg(count(lit(1)).as("__total"))
    rows.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("total_words"),
        sum(col("__nc")).as("total_chars"),
        countDistinct(col("__lang")).as("n_langs"),
        sum(col("__kp")).as("n_keep"))
      .crossJoin(broadcast(total))
      .select(col(sourceCol), col("n_docs"), col("total_words"),
        col("total_chars"), col("n_langs"), col("n_keep"),
        (col("total_words").cast("double") / col("n_docs"))
          .as("avg_words"),
        (col("n_keep").cast("double") / col("n_docs")).as("keep_rate"),
        (col("n_docs").cast("double") / col("__total")).as("mix_share"))
  }

  /** Corpus vocabulary induction: the top-`topK` whitespace tokens by
    * occurrence count, with rank (ties broken token-ascending) and the
    * cumulative fraction of ALL token occurrences the vocabulary covers up
    * to that rank — the curve a tokenizer-vocab decision reads.
    *
    * Scale shape: the explode feeds a map-side partial count (the shuffle
    * carries one row per DISTINCT token per partition, not per occurrence);
    * the global total rides in via one broadcast row; only the top-`topK`
    * survivors pass through the single-partition ranking window, so the
    * unbounded corpus never meets a global sort.
    */
  def vocabulary(docs: DataFrame, textCol: String = "text",
      topK: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occ"))
    val total = counts.agg(sum(col("n_occ")).as("__total"))
    // keep only candidates that can reach the top-K before the global
    // window: rank within no partition at all is the last tiny step
    val top = counts
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(topK)
    // partition the ≤ topK-row windows by the constant-valued __total
    // attribute: semantically global (every row shares the value) but a
    // non-foldable partition key, so Spark 4's EliminateWindowPartitions
    // can't strip it back to the warning-spraying empty spec
    val w = Window.partitionBy(col("__total"))
      .orderBy(col("n_occ").desc, col("token").asc)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_frac",
        (sum(col("n_occ")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("__total")))
      .select(col("rank").cast("long").as("rank"), col("token"),
        col("n_occ"), col("cum_frac"))
  }

  /** Hashing-trick featurizer (fastText / Vowpal-Wabbit style): each
    * document becomes sparse term-frequency features over a fixed `dim`-slot
    * space, slot = portable 60-bit hash of the token mod `dim`. The point of
    * the trick at 100 TB: no vocabulary pass, no dictionary broadcast, no
    * OOV handling — feature extraction is a stateless per-row map.
    *
    * Output: (id, slot, tf) — one row per (document, occupied slot).
    *
    * Scale: explode feeds ONE hash-shuffle with map-side partial counts;
    * output is bounded by docs × dim regardless of document length. The
    * md5-based [[Dedup.hash60]] keeps slots engine-portable (the oracle
    * recomputes them in SQL); swap `xxhash64` in if portability is not
    * needed (~10× cheaper hash, same shape).
    */
  def hashingFeatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = 1024): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    docs.select(col(idCol), explode(tokens(col(textCol))).as("__w"))
      .select(col(idCol),
        (Dedup.hash60(col("__w")) % dim).cast("int").as("slot"))
      .groupBy(col(idCol), col("slot"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Overlapping token-window chunking (RAG / embedding prep): each
    * document becomes chunks of `size` tokens starting every `stride`
    * tokens (stride < size ⇒ overlap). The final chunk may be shorter;
    * chunks never start past the last token. Pure per-row explode — narrow,
    * shuffle-free, scales with executors.
    */
  def chunk(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", size: Int = 128, stride: Int = 96): DataFrame = {
    require(size >= 1 && stride >= 1, "size and stride must be >= 1")
    // filter on the allocation-free token COUNT before the projection:
    // `size(__tk) > 0` pushed below the select re-tokenized every row a
    // second time inside the substituted Filter (tokencount(text) ≥ 1 is
    // the same predicate — tokens(null) is null and size(null) < 0)
    val base = docs
      .filter(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.functions.TokenCount(org.apache.spark.sql.graft.ColumnBridge
          .expression(col(textCol)))) >= 1)
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
    base.select(col(idCol),
        posexplode(transform(
          sequence(lit(1), org.apache.spark.sql.functions.size(col("__tk")),
            lit(stride)),
          i => slice(col("__tk"), i, lit(size)))).as(Seq("__ci", "__chunk")))
      .select(col(idCol), col("__ci").cast("long").as("chunk_id"),
        org.apache.spark.sql.functions.size(col("__chunk")).cast("long")
          .as("n_tokens"),
        concat_ws(" ", col("__chunk")).as("chunk"))
  }

  /** COLLOCATIONS — corpus-level co-occurrence mining: ordered token
    * pairs `(left, right)` where right follows left within `window`
    * positions, scored by pointwise mutual information. The classic
    * phrase-discovery / "statistically surprising neighbor" op (Church &
    * Hanks 1990): PMI = ln(P(ab) / (P(a)·P(b))) with P(ab) from the
    * windowed pair counts and P(·) from unigram counts.
    *
    * Scale shape: ONE sort per document (window partitioned by doc id,
    * ordered by position) feeds `window` codegen'd `lead`s — pair
    * generation is linear in corpus tokens × window with no self-join
    * and no per-token interpreted lambda; pair and unigram counts are
    * map-side-combined hash aggregates; the answer is a TakeOrdered of
    * `topK` rows. `minCount` bounds the tail before ranking.
    *
    * Determinism: pmi_micro = floor(ln(num/den)·10⁶) with num/den built
    * from exact BIGINTs in a fixed multiplication order — the house
    * "ln on the 10⁻⁶ grid" convention, mirrored verbatim by the oracle.
    * Returns (left, right, n_pair, pmi_micro), ties to (left, right).
    */
  def collocations(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", window: Int = 2, minCount: Long = 2,
      topK: Int = 20): DataFrame = {
    require(window >= 1 && topK >= 1, "window and topK must be >= 1")
    import org.apache.spark.sql.expressions.{Window => W}
    val tk = docs.select(col(idCol).as("__d"),
        posexplode(tokens(col(textCol))).as(Seq("__p", "__w")))
    val uni = tk.groupBy(col("__w").as("w")).agg(count(lit(1)).as("c_w"))
    val nTok = tk.agg(count(lit(1)).as("n_tok"))
    val spec = W.partitionBy(col("__d")).orderBy(col("__p"))
    val pairs = tk
      .select(col("__w").as("left"),
        array((1 to window).map(d =>
          lead(col("__w"), d).over(spec)): _*).as("__r"))
      .select(col("left"), explode(col("__r")).as("right"))
      .filter(col("right").isNotNull)
    val pairCounts = pairs.groupBy(col("left"), col("right"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val nPair = pairs.agg(count(lit(1)).as("n_pair_total"))
    val num = col("n_pair").cast("double") *
      col("n_tok").cast("double") * col("n_tok").cast("double")
    val den = col("c_a").cast("double") *
      col("c_b").cast("double") * col("n_pair_total").cast("double")
    // unigram side is the vocabulary — ≪ corpus but NOT broadcast-safe
    // by contract at 100 TB; keyed joins, AQE picks broadcast when small
    pairCounts
      .join(uni.select(col("w").as("left"), col("c_w").as("c_a")), "left")
      .join(uni.select(col("w").as("right"), col("c_w").as("c_b")), "right")
      .crossJoin(broadcast(nPair)).crossJoin(broadcast(nTok))
      .select(col("left"), col("right"), col("n_pair"),
        floor(log(num / den) * lit(1000000.0)).cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("left").asc, col("right").asc)
      .limit(topK)
  }

  /** All text-analysis columns applied to a documents DataFrame. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    val withQuality = qualityColumns(c).foldLeft(df) { case (d, (n, expr)) =>
      d.withColumn(n, expr)
    }
    val withFp = fingerprintColumns(c).foldLeft(withQuality) { case (d, (n, expr)) =>
      d.withColumn(n, expr)
    }
    withFp
      .withColumn("subword_count", subwordCount(c).cast("long"))
      .withColumn("quality_score", qualityScore(c))
      .withColumn("lang_pred", langId(c))
  }
}
