package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSuite

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("text")

  test("tokens splits on whitespace runs and drops empties") {
    val r = one("  the  quick  fox ")
      .select(TextAnalysis.tokens(col("text")).as("t"))
      .as[Seq[String]].head()
    assert(r == Seq("the", "quick", "fox"))
  }

  test("subwordCount counts letter runs, digit runs, single symbols") {
    val r = one("Hello, world42! x")
      .select(TextAnalysis.subwordCount(col("text")).as("n"))
      .as[Int].head()
    // hello , world 42 ! x -> 6
    assert(r == 6)
  }

  test("shingles produces distinct word n-grams") {
    val r = one("a b c d a b c d")
      .select(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].head()
    assert(r.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("shingles on short text yields empty array, not negative sequence") {
    val r = one("a b")
      .select(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3).as("s"))
      .as[Seq[String]].head()
    assert(r.isEmpty)
  }

  test("langId votes by stopwords with deterministic tiebreak") {
    val df = Seq(
      "the cat is on the mat and it is fine",
      "el gato y la casa en un lugar",
      "zzz qqq www").toDF("text")
    val r = df.select(TextAnalysis.langId(col("text")).as("l"))
      .as[String].collect().toSeq
    assert(r == Seq("en", "es", "und"))
  }

  test("fingerprint is whitespace/case-insensitive and numerically stable") {
    val df = Seq("Hello  World", "hello world", "different").toDF("text")
    val r = df
      .select(TextAnalysis.fingerprintColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()
    assert(r(0) == r(1))
    assert(r(0) != r(2))
    assert(r(0).getLong(1) > 0)
  }

  test("scrubPii masks emails, URLs, IPs, digit runs; piiCount audits") {
    val r = one("mail bob.smith+x@corp.io see https://a.b/c?d=1 from " +
        "192.168.0.1 call 5551234567 but keep 42 and v1.2.3.4000")
      .select(TextAnalysis.scrubPii(col("text")).as("s"),
        TextAnalysis.piiCount(col("text")).as("n"))
      .collect()(0)
    val s = r.getString(0)
    assert(s.contains("<EMAIL>") && !s.contains("corp.io"))
    assert(s.contains("<URL>") && !s.contains("a.b/c"))
    assert(s.contains("<IP>") && !s.contains("192.168.0.1"))
    assert(s.contains("<NUM>") && !s.contains("5551234567"))
    assert(s.contains("keep 42")) // short numbers survive
    assert(r.getLong(1) == 4L)
  }

  test("quality columns are exact integer-derived values") {
    val r = one("the the fox")
      .select(TextAnalysis.qualityColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect()(0)
    assert(r.getAs[Long]("n_words") == 3L)
    assert(r.getAs[Long]("distinct_words") == 2L)
    assert(r.getAs[Double]("avg_word_len") == 9.0 / 3) // t-h-e,t-h-e,f-o-x
    assert(r.getAs[Double]("stopword_ratio") == 2.0 / 3)
  }

  test("ngrams keeps repeats; shingles is its distinct set") {
    val df = one("a b a b a")
    val grams = df.select(TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 2).as("g"))
      .as[Seq[String]].head()
    assert(grams == Seq("a b", "b a", "a b", "b a"))
    val sh = df.select(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 2).as("s"))
      .as[Seq[String]].head()
    assert(sh.toSet == Set("a b", "b a") && sh.size == 2)
  }

  test("repetitionSignals: exact fractions on a constructed document") {
    // doc 1: "x x x y" -> words: x:3 y:1 (top 3/4); bigrams: "x x":2,"x y":1
    // (top 2/3); trigrams: "x x x":1,"x x y":1 (dup 0/2)
    // doc 2: "a b" -> no trigrams -> NULL dup_trigram_frac
    val df = Seq((1L, "x x x y"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_words") == 4L)
    assert(r(0).getAs[Double]("top_word_frac") == 3.0 / 4)
    assert(r(0).getAs[Double]("top_bigram_frac") == 2.0 / 3)
    assert(r(0).getAs[Double]("dup_trigram_frac") == 0.0)
    assert(r(1).getAs[Long]("n_words") == 2L)
    assert(r(1).isNullAt(r(1).fieldIndex("dup_trigram_frac")))
  }

  test("wordEntropy: hand-computed micro-nat entropies") {
    val df = Seq(
      (1L, "a a b"),   // p = (2/3, 1/3)
      (2L, "a a a"),   // single word -> entropy 0
      (3L, "a b c"),   // uniform over 3
      (4L, " "))       // no tokens -> no row
      .toDF("doc_id", "text")
    def term(c: Long, n: Long): Long = {
      val p = c.toDouble / n.toDouble
      math.floor(p * math.log(p) * 1e6).toLong
    }
    val r = TextAnalysis.wordEntropy(df).orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = r.map(x => x.getLong(0) -> (x.getAs[Long]("n_tokens"),
      x.getAs[Long]("distinct_words"), x.getAs[Long]("entropy_micro"))).toMap
    assert(byId(1L) == (3L, 2L, -(term(2, 3) + term(1, 3))))
    assert(byId(2L) == (3L, 1L, 0L))
    assert(byId(3L) == (3L, 3L, -(3 * term(1, 3))))
    // repetitive doc carries less entropy than the uniform one
    assert(byId(1L)._3 < byId(3L)._3)
  }

  test("repetitionSignals flags heavy repetition") {
    val df = Seq((1L, Seq.fill(20)("spam spam").mkString(" ")),
      (2L, (1 to 40).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(df).orderBy("doc_id").collect()
    assert(r(0).getAs[Double]("dup_trigram_frac") == 1.0) // all trigrams repeat
    assert(r(1).getAs[Double]("top_word_frac") == 1.0 / 40)
    assert(r(1).getAs[Double]("dup_trigram_frac") == 0.0)
  }

  test("vocabulary ranks by count desc then token asc, with coverage curve") {
    val df = Seq((1L, "b b b a a c"), (2L, "a d")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabulary(df, topK = 3).orderBy("rank").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    // counts: a=3, b=3, c=1, d=1 over 8 occurrences; tie a<b, c<d
    assert(r.toSeq == Seq(
      (1L, "a", 3L, 3.0 / 8), (2L, "b", 3L, 6.0 / 8), (3L, "c", 1L, 7.0 / 8)))
  }

  test("chunk: overlapping windows, short tail, empty docs dropped") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),
      (2L, "only three tokens"),
      (3L, "  ")).toDF("doc_id", "text")
    val r = TextAnalysis.chunk(df, size = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r.toSeq == Seq(
      (1L, 0L, 4L, "t1 t2 t3 t4"), (1L, 1L, 4L, "t4 t5 t6 t7"),
      (1L, 2L, 4L, "t7 t8 t9 t10"), (1L, 3L, 1L, "t10"),
      (2L, 0L, 3L, "only three tokens")))
  }

  test("c4Flags: word floor, blocklist, punctuation, braces") {
    val df = Seq(
      (1L, "This is a perfectly fine sentence."),
      (2L, "short"),
      (3L, "enable javascript to view this page properly"),
      (4L, "some code here { return 1; } end of it")).toDF("doc_id", "text")
    val flags = df.select(col("doc_id") +:
      TextAnalysis.c4Flags(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id").collect()
    assert(flags(0).getAs[Boolean]("keep"))
    assert(flags(0).getAs[Boolean]("ends_with_punct"))
    assert(!flags(1).getAs[Boolean]("min_words_ok") && !flags(1).getAs[Boolean]("keep"))
    assert(flags(2).getAs[Long]("block_hits") == 1L && !flags(2).getAs[Boolean]("keep"))
    assert(flags(3).getAs[Boolean]("has_curly") && !flags(3).getAs[Boolean]("keep"))
  }

  test("wordpiece: greedy longest-match with ## continuations and [UNK]") {
    val vocab = Seq("un", "aff", "able", "##aff", "##able", "##ble", "a",
      "hug", "##s")
    val df = Seq("unaffable hugs a zzz").toDF("text")
    val pieces = df.select(TextAnalysis.wordpiece(
        TextAnalysis.tokens(col("text")), vocab).as("p"))
      .as[Seq[String]].collect()(0)
    // greedy: longest prefix first; zzz has no match at position 0 -> UNK
    assert(pieces == Seq("un", "##aff", "##able", "hug", "##s", "a", "[UNK]"))
    // SQL-free sanity: vocabulary induction output plugs straight in
    val induced = TextAnalysis.vocabulary(
      Seq("hug hug hugs").toDF("text"), topK = 2)
    assert(induced.count() == 2)
  }

  test("corpusReport aggregates exact per-source dataset-card stats") {
    val docs = Seq(
      (1L, "one two three four five six", "en", "a"),
      (2L, "short", "en", "a"),
      (3L, "uno dos tres cuatro cinco seis", "es", "b")).toDF(
      "doc_id", "text", "lang", "source")
    val r = TextAnalysis.corpusReport(docs).orderBy("source").collect()
    assert(r.length == 2)
    val a = r(0)
    assert(a.getAs[Long]("n_docs") == 2L)
    assert(a.getAs[Long]("total_words") == 7L)
    assert(a.getAs[Long]("n_langs") == 1L)
    assert(a.getAs[Long]("n_keep") == 1L) // "short" fails the word floor
    assert(a.getAs[Double]("keep_rate") == 0.5)
    assert(a.getAs[Double]("avg_words") == 3.5)
    assert(a.getAs[Double]("mix_share") == 2.0 / 3.0)
    assert(r(1).getAs[Double]("mix_share") == 1.0 / 3.0)
  }

  test("native text kernels are SQL-visible via graft_* functions") {
    val r = spark.sql(
      """SELECT graft_ngrams(graft_tokens('a b  c'), 2) AS g,
        |       graft_ngrams(graft_tokens('x y x y'), 2, true) AS d,
        |       graft_repetition(graft_tokens('x x x')) AS s""".stripMargin)
      .collect()(0)
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
    assert(r.getSeq[String](1) == Seq("x y", "y x")) // distinct, first-occurrence
    val s = r.getStruct(2)
    assert(s.getAs[Long]("n_words") == 3L && s.getAs[Long]("top_word") == 3L)
    assert(s.getAs[Long]("n_trigrams") == 1L && s.getAs[Long]("dup_trigrams") == 0L)
    // deflate stats ride the same registration path
    val d = spark.sql("SELECT graft_deflate(repeat('ab ', 100)) AS c")
      .collect()(0).getStruct(0)
    assert(d.getAs[Long]("raw_bytes") == 300L)
    assert(d.getAs[Long]("ratio_micro") < 200000L)
  }

  test("normalizeUnicode composes NFC, foldAccents strips marks; SQL fn") {
    import spark.implicits._
    // decomposed input spelled with escapes: e + combining acute (U+0301),
    // A + combining ring (U+030A) -- the source file stays ASCII
    val decomposed = "cafe\u0301 A\u030a"
    val composed = "caf\u00e9 \u00c5"
    val df = Seq((1L, decomposed)).toDF("id", "t")
    val r = df.select(
      TextAnalysis.normalizeUnicode(col("t")).as("nfc"),
      TextAnalysis.normalizeUnicode(col("t"), "NFKC").as("nfkc"),
      TextAnalysis.foldAccents(col("t")).as("folded")).head()
    assert(r.getString(0) == composed)
    assert(r.getString(1) == composed)
    assert(r.getString(2) == "cafe A") // marks stripped
    // already-normalized input passes through unchanged (fast path)
    assert(df.select(TextAnalysis.normalizeUnicode(lit("plain ascii")))
      .head().getString(0) == "plain ascii")
    // SQL registration with literal form; bad form fails at plan time
    assert(spark.sql("SELECT graft_normalize('cafe\u0301') AS x")
      .head().getString(0) == "caf\u00e9")
    intercept[Exception] {
      spark.sql("SELECT graft_normalize('x', 'NOPE')").collect()
    }
  }

  test("hashingFeatures: slot-summed tf equals token count, slots bounded") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "x"), (3L, "")).toDF("doc_id", "text")
    val f = TextAnalysis.hashingFeatures(docs, dim = 8).collect()
    // empty doc contributes no rows; totals per doc match token counts
    val perDoc = f.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("tf")).sum).toMap
    assert(perDoc == Map(1L -> 4L, 2L -> 1L))
    f.foreach { r =>
      val s = r.getAs[Int]("slot"); assert(s >= 0 && s < 8)
    }
    // the two 'a' occurrences land in ONE slot row with tf=2
    val doc1 = f.filter(_.getAs[Long]("doc_id") == 1L)
    assert(doc1.map(_.getAs[Long]("tf")).sorted.toSeq == Seq(1L, 1L, 2L))
  }

  test("compressionRatio: repetition compresses, gibberish does not") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val gibberish = Array.fill(400)((33 + rnd.nextInt(94)).toChar).mkString
    val docs = Seq(
      (1L, "spam spam spam " * 30),         // highly repetitive
      (2L, gibberish),                       // printable noise
      (3L, ("the quick brown fox jumps over the lazy dog while distant " +
        "ships cross a calm harbor and merchants argue about the price " +
        "of salt, copper, and grain under a pale morning sky; later the " +
        "council will meet to debate the new harbor tax and nobody " +
        "expects a quick resolution to the dispute")),
      (4L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("raw_bytes"), x.getAs[Long]("deflate_bytes"),
         x.getAs[Long]("ratio_micro"))).toMap
    assert(r(1L)._3 < 200000L, s"repetition should compress 5x+: ${r(1L)}")
    assert(r(2L)._3 > 800000L, s"noise should barely compress: ${r(2L)}")
    assert(r(3L)._3 > r(1L)._3 && r(3L)._3 < r(2L)._3,
      s"prose sits between: $r")
    assert(r(4L) == ((0L, r(4L)._2, 1000000L)), "empty text pins ratio at 1")
    // deterministic: a second evaluation is bit-identical
    val again = TextAnalysis.compressionRatio(docs).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("ratio_micro")).toMap
    assert(r.view.mapValues(_._3).toMap == again)
    // the kernel stays inside whole-stage codegen (no fallback/UDF)
    val plan = TextAnalysis.compressionRatio(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }

  test("gopherFlags: each rule trips on a crafted document, integer " +
      "thresholds are exact at the boundary") {
    import org.apache.spark.sql.functions.col
    def flagsOf(text: String, minWords: Int = 2): Map[String, Any] = {
      val row = Seq(Tuple1(text)).toDF("text")
        .select(TextAnalysis.gopherFlags(col("text"), minWords = minWords)
          .map { case (n, c) => c.as(n) }: _*)
        .collect().head
      row.schema.fieldNames.zip(row.toSeq).toMap
    }
    // a clean document passes every rule
    val good = flagsOf("the cat sat with all of that good gear here now")
    assert(good("keep") == true && good("stop_hits") == 4L)
    // word-count band (n_words = 1 < minWords 2)
    assert(flagsOf("word")("word_count_ok") == false)
    // mean-word-length band: 11-char words exceed the [3,10] band;
    // boundary: exactly 10 still passes (inclusive)
    assert(flagsOf("abcdefghijk abcdefghijk")("word_len_ok") == false)
    assert(flagsOf("abcdefghij abcdefghij")("word_len_ok") == true)
    // hash symbol ratio: 1 hash per 10 words is the inclusive edge
    val hashEdge = flagsOf("# one two three four five six seven eight nine")
    assert(hashEdge("hash_hits") == 1L && hashEdge("hash_ok") == true)
    assert(flagsOf("# one two three")("hash_ok") == false)
    // ellipsis counts both the 3-dot spelling and the unicode char
    val ell = flagsOf("wait... or wait… but ok")
    assert(ell("ellipsis_hits") == 2L && ell("ellipsis_ok") == false)
    // bullet lines / ellipsis-ended lines over a multi-line doc
    val lines = flagsOf("- a bullet\n- another\nplain ends...\nalso ends…")
    assert(lines("n_lines") == 4L && lines("bullet_lines") == 2L &&
      lines("ellipsis_lines") == 2L && lines("bullet_ok") == true &&
      lines("ellipsis_line_ok") == false) // 2/4 > 0.3
    // alpha-word share: symbols-only words fail the 80% floor
    val alpha = flagsOf("123 456 789 #### real")
    assert(alpha("alpha_words") == 1L && alpha("alpha_ok") == false)
    // stopword presence needs >= 2 DISTINCT stopwords
    assert(flagsOf("the the the cat")("stopword_ok") == false)
    assert(flagsOf("the cat of note")("stopword_ok") == true)
  }

  test("readability: exact counts (vowel-group syllables, [.!?]+ " +
      "sentences), the Flesch tree on the micro grid, zero-word drop") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"),      // 6 words, 2 sentences
      (2L, "strength myth"),                  // no sentence mark -> 1
      (3L, "   "),                            // zero words: dropped
      (4L, "Hello?! Bye.")                    // ?! collapses to one run
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toList
    def flesch(w: Long, s: Long, sy: Long): Long =
      math.floor((206.835 - 1.015 * (w.toDouble / s.toDouble) -
        84.6 * (sy.toDouble / w.toDouble)) * 1000000.0).toLong
    def fkgl(w: Long, s: Long, sy: Long): Long =
      math.floor((0.39 * (w.toDouble / s.toDouble) +
        11.8 * (sy.toDouble / w.toDouble) - 15.59) * 1000000.0).toLong
    // syllables: The=1 cat=1 sat.=1 The=1 dog=1 ran!=1 -> 6
    // "strength"=1 ("e" run), "myth"=1 (y) -> 2
    // "Hello?!"=2 (e, o), "Bye."=1 (ye counts as one run) -> 3
    assert(out == List(
      (1L, 6L, 2L, 6L, flesch(6, 2, 6), fkgl(6, 2, 6)),
      (2L, 2L, 1L, 2L, flesch(2, 1, 2), fkgl(2, 1, 2)),
      (4L, 2L, 2L, 3L, flesch(2, 2, 3), fkgl(2, 2, 3))))
    // sanity: simple short sentences score "easy" (high), and a
    // long-word pile scores lower
    val easy = out.head._5
    val hard = TextAnalysis.readability(
      Seq((9L, "antidisestablishmentarianism incomprehensibilities"))
        .toDF("doc_id", "text")).collect().head.getLong(4)
    assert(easy > hard)
  }
}
