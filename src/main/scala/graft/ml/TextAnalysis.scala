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
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordHits(toks, words).as("hits"), lit(lang).as("lang"))
    }
    // argmax: sort by (hits desc, lang asc) via array_max on (hits, negated-lang)
    // simpler: greatest over structs compares fields in order -> (hits, lang)
    // needs hits desc + lang asc; invert lang by using reverse-sorted input and
    // stable greatest. Use array sort instead:
    val arr = array(scored: _*)
    val best = element_at(array_sort(arr,
      (l, r) =>
        when(l("hits") > r("hits"), -1)
          .when(l("hits") < r("hits"), 1)
          .when(l("lang") < r("lang"), -1)
          .when(l("lang") > r("lang"), 1)
          .otherwise(0)), 1)
    when(best("hits") > 0, best("lang")).otherwise(lit("und"))
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
    * Shape: one explode of the tagged (n, gram) occurrences, then two
    * hash aggregations — identical to the novelty pipeline, skew-safe, no
    * per-row quadratic lambda work and no collect_list. All counts are
    * integers; each fraction is ONE exact double division, so the output is
    * bit-identical across engines. Documents too short for an n-gram size
    * get a NULL fraction for it.
    */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("tk"))
    val occurrences = toks.select(col(idCol), explode(concat(
        transform(col("tk"), t => struct(lit(1).as("n"), t.as("gram"))),
        transform(ngrams(col("tk"), 2), g => struct(lit(2).as("n"), g.as("gram"))),
        transform(ngrams(col("tk"), 3), g => struct(lit(3).as("n"), g.as("gram")))))
        .as("g"))
      .select(col(idCol), col("g.n").as("n"), col("g.gram").as("gram"))
    val gramCounts = occurrences
      .groupBy(col(idCol), col("n"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val perN = gramCounts
      .groupBy(col(idCol), col("n"))
      .agg(sum(col("cnt")).as("total"), max(col("cnt")).as("top"),
        coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L)).as("dup"))
    def pick(n: Int, c: String) = max(when(col("n") === n, col(c)))
    perN.groupBy(col(idCol))
      .agg(
        pick(1, "total").as("n_words"),
        (pick(1, "top").cast("double") / pick(1, "total")).as("top_word_frac"),
        (pick(2, "top").cast("double") / pick(2, "total")).as("top_bigram_frac"),
        (pick(3, "dup").cast("double") / pick(3, "total")).as("dup_trigram_frac"))
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
