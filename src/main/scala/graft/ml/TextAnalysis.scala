package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, token
  * counting, quality scoring, language-ID heuristic, fingerprinting.
  *
  * Everything is built from `org.apache.spark.sql.functions` higher-order
  * array functions — no UDFs, so the whole pipeline stays inside
  * whole-stage codegen and scales linearly with executors (the 100 TB path
  * is a single narrow projection over the documents table; no shuffle).
  */
object TextAnalysis {

  /** Whitespace tokens, empty-safe. */
  def tokens(text: Column): Column =
    filter(split(text, " +"), t => t =!= "")

  /** BPE-ish subword count: runs of letters, digits, or single symbols —
    * the standard cheap proxy for LLM token counts.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Word-level n-gram shingles (default 3), distinct.
    *
    * Built as a fold of `zip_with` over shifted `slice`s so every lambda
    * touches only its element variables. Referencing the token-array
    * expression *inside* a lambda would re-evaluate the whole
    * split-and-filter per element (interpreted higher-order functions do no
    * subexpression caching) — that turns shingling O(tokens²) per row; this
    * formulation is linear.
    */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(ngrams(toks, n))

  /** Word-level n-grams WITH repeats (positional occurrences) — the
    * repetition signals need occurrence counts, not the distinct set.
    * Same linear zip_with-over-shifted-slices construction as [[shingles]].
    */
  def ngrams(toks: Column, n: Int): Column = {
    require(n >= 1, "ngram size must be >= 1")
    val len = greatest(size(toks) - (n - 1), lit(0))
    val joined = (1 until n).foldLeft(slice(toks, lit(1), len)) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), len), (a, b) => concat(a, lit(" "), b))
    }
    when(size(toks) < n, array().cast("array<string>")).otherwise(joined)
  }

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
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Quality metrics: deterministic per-row arithmetic (exact across
    * engines — counts and integer-division-derived doubles only).
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val nChars = length(text).cast("long")
    val distinctWords = size(array_distinct(toks)).cast("long")
    val stopHits = stopwordHits(toks, stopwords("en")).cast("long")
    // exact sum of token lengths (integer fold — order-independent)
    val tokChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
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
    *
    * ONE `aggregate` fold over the token array accumulates all four
    * language counters at once. Higher-order functions are evaluated
    * interpreted (no common-subexpression caching), so the previous
    * four-`filter` formulation re-ran the tokenize split once per language;
    * this shape tokenizes once per row and is the cheapest possible pass.
    */
  def langId(text: Column): Column = {
    val langs = stopwords.toSeq.sortBy(_._1)
    val zero = struct(langs.map { case (l, _) => lit(0L).as(l) }: _*)
    aggregate(
      tokens(text),
      zero,
      (acc, t) => struct(langs.map { case (l, words) =>
        (acc(l) + when(t.isin(words.map(lit(_)): _*), 1L).otherwise(0L)).as(l)
      }: _*),
      acc => {
        val maxHits = greatest(langs.map { case (l, _) => acc(l) }: _*)
        // fold in ascending language order: the first language reaching
        // maxHits wins -> tiebreak (hits desc, lang asc), "und" on zero hits
        langs.foldRight(lit("und")) { case ((l, _), els) =>
          when(maxHits > 0 && acc(l) === maxHits, lit(l)).otherwise(els)
        }
      })
  }

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
    * no exchange is ever needed: per row, sort each gram array and fold it
    * once, counting the longest equal-run (= the top gram's occurrence
    * count) and the number of singleton runs (= grams occurring exactly
    * once). A narrow projection over the documents table — at 100 TB this
    * runs at scan speed, where the previous explode-and-aggregate shape
    * shuffled ~3x the corpus text twice. All counts are integers; each
    * fraction is ONE exact double division, so the output is bit-identical
    * across engines. Documents too short for an n-gram size get a NULL
    * fraction for it; documents with no tokens produce no row (exactly the
    * rows the explode formulation yields).
    */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col(idCol), col("tk"),
        ngrams(col("tk"), 2).as("bg"), ngrams(col("tk"), 3).as("tg"))
    val ws = gramRunStats(col("tk"))
    val bs = gramRunStats(col("bg"))
    val ts = gramRunStats(col("tg"))
    val nw = size(col("tk")).cast("long")
    val nb = size(col("bg")).cast("long")
    val nt = size(col("tg")).cast("long")
    base.select(
      col(idCol),
      nw.as("n_words"),
      (ws("best").cast("double") / nw).as("top_word_frac"),
      when(nb > 0, bs("best").cast("double") / nb).as("top_bigram_frac"),
      when(nt > 0, (nt - ts("ones")).cast("double") / nt).as("dup_trigram_frac"))
  }

  /** Per-row run statistics over a gram array: sort, then one linear fold
    * tracking the current equal-run length. Returns a struct with
    * `best` (longest run = occurrence count of the most frequent gram) and
    * `ones` (number of grams occurring exactly once). The empty-string
    * sentinel for `prev` is safe: grams are built from non-empty tokens.
    */
  private def gramRunStats(grams: Column): Column = {
    val zero = struct(lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("best"), lit(0L).as("ones"))
    aggregate(array_sort(grams), zero, (acc, g) => {
      val run = when(g === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
      struct(g.as("prev"), run.as("run"),
        greatest(acc("best"), run).as("best"),
        (acc("ones") +
          when(run === 1L, 1L).when(run === 2L, -1L).otherwise(0L)).as("ones"))
    })
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
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occ").desc, col("token").asc)))
      .withColumn("cum_frac",
        (sum(col("n_occ")).over(
          Window.orderBy(col("n_occ").desc, col("token").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double") / col("__total")))
      .select(col("rank").cast("long").as("rank"), col("token"),
        col("n_occ"), col("cum_frac"))
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
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("__tk"))
      .filter(org.apache.spark.sql.functions.size(col("__tk")) > 0)
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
