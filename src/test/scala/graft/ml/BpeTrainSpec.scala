package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSuite

class BpeTrainSpec extends SparkSuite {
  import spark.implicits._

  /** Pure-Scala reference BPE (Sennrich 2016): same tie-break (freq desc,
    * then lexicographic pair), same left-to-right non-overlapping merge.
    */
  private def refTrain(wordFreqs: Map[String, Long],
                       n: Int): Seq[(String, String)] = {
    var words: Map[Vector[String], Long] =
      wordFreqs.map { case (w, f) => w.map(_.toString).toVector -> f }
    val out = Seq.newBuilder[(String, String)]
    for (_ <- 0 until n) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _            =>
        }
      }
      if (counts.nonEmpty) {
        val (pair, _) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += pair
        words = words.map { case (syms, f) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == pair._1 &&
              syms(i + 1) == pair._2) {
              merged += pair._1 + pair._2; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result() -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  private lazy val docs = Seq(
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest").toDF("text")

  test("all three train paths match the pure-Scala reference merge-for-merge") {
    val want = refTrain(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
    // dispatching path (in-memory under the cap)
    val got = BpeTrain.train(docs, "text", numMerges = 8)
      .map(m => (m.left, m.right))
    assert(got == want)
    // forced fully-distributed recount loop
    val distributed = BpeTrain
      .trainDistributed(BpeTrain.wordTable(docs, "text"), numMerges = 8)
      .map(m => (m.left, m.right))
    assert(distributed == want)
    // in-memory delta trainer directly (full Merge rows, incl. freq)
    val wf = BpeTrain.wordTable(docs, "text").select("word", "freq")
      .as[(String, Long)].collect().toSeq
    val inMem = BpeTrain.trainInMemory(wf, numMerges = 8)
    val distFull = BpeTrain
      .trainDistributed(BpeTrain.wordTable(docs, "text"), numMerges = 8)
    assert(inMem == distFull) // same ranks, pairs, merged symbols AND freqs
    // ranks are sequential, merged = left+right
    val merges = BpeTrain.train(docs, "text", numMerges = 3)
    assert(merges.map(_.rank) == Seq(0, 1, 2))
    assert(merges.forall(m => m.merged == m.left + m.right))
  }

  test("in-memory and distributed trainers agree on a wider random corpus") {
    val rnd = new scala.util.Random(7)
    val vocabChars = "abcdef"
    val corpus = (0 until 120).map { _ =>
      (0 until 6).map(_ => (0 until (2 + rnd.nextInt(5)))
        .map(_ => vocabChars(rnd.nextInt(vocabChars.length))).mkString)
        .mkString(" ")
    }.toDF("text")
    val inMem = BpeTrain.train(corpus, "text", numMerges = 12)
    val dist = BpeTrain
      .trainDistributed(BpeTrain.wordTable(corpus, "text"), numMerges = 12)
    assert(inMem == dist)
  }

  test("non-BMP text: all paths symbolize by code point and agree") {
    // 😀=U+1F600, 😁=U+1F601 (surrogate pairs), ﷽=U+FDFD (BMP, > surrogates
    // in UTF-16 code-UNIT order but < any supplementary in code-POINT
    // order) — the corpus where code-unit symbolization/tie-breaks diverge
    val docs = Seq("😀😁 😀😁 😀😁", "a﷽ a﷽ a😀 a😀").toDF("text")
    // wordTable symbolizes whole code points (no lone surrogates)
    val syms = BpeTrain.wordTable(docs, "text")
      .select(explode(col("syms")).as("s")).distinct()
      .as[String].collect().toSet
    assert(syms == Set("😀", "😁", "a", "﷽"))
    assert(syms.forall(s => !s.exists(Character.isSurrogate) || s.length == 2))
    val inMem = BpeTrain.train(docs, "text", numMerges = 4)
    val dist = BpeTrain
      .trainDistributed(BpeTrain.wordTable(docs, "text"), numMerges = 4)
    assert(inMem == dist)
    // the (a,﷽)=2 vs (a,😀)=2 tie must break in CODE-POINT order (﷽ first)
    // on both paths — Java's code-unit '<' would pick 😀
    assert(inMem.map(m => (m.left, m.right)).contains(("a", "﷽")))
    assert(inMem.indexWhere(m => m.right == "﷽") <
      inMem.indexWhere(m => m.right == "😀"))
    // encode round-trips losslessly: pieces rejoin to the original tokens
    val pieces = docs
      .select(BpeTrain.encode(TextAnalysis.tokens(col("text")), inMem).as("p"),
        concat_ws("", TextAnalysis.tokens(col("text"))).as("joined"))
      .as[(Seq[String], String)].collect()
    pieces.foreach { case (p, joined) => assert(p.mkString == joined) }
  }

  test("trainDistributed batches merges: jobs grow sublinearly") {
    // 40 two-letter words over 80 DISTINCT characters: every pair is
    // symbol-disjoint from every other, so one pass can learn all 40
    // merges exactly (no conflicts -> no created pairs -> tie class safe)
    val chars = (0 until 80).map(i => ('一' + i).toChar.toString)
    val words = (0 until 40).map(i => chars(2 * i) + chars(2 * i + 1))
    val docs = words.mkString(" ").split("XX").toSeq.toDF("text") // 1 row
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    val table = BpeTrain.wordTable(docs, "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    table.count()
    spark.sparkContext.addSparkListener(listener)
    try {
      val got = BpeTrain.trainDistributed(table, numMerges = 40)
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      assert(got.size == 40)
      assert(got.map(m => (m.left, m.right)).toSet ==
        (0 until 40).map(i => (chars(2 * i), chars(2 * i + 1))).toSet)
      // the old loop cost >= 2 jobs per merge (>= 80); batching does the
      // whole vocabulary in one pass: pair-count + argmax collect +
      // checkpoint materialization
      assert(jobs.get() <= 10, s"jobs=${jobs.get()}")
      // and equals the in-memory trainer merge-for-merge
      val wf = table.select("word", "freq")
        .as[(String, Long)].collect().toSeq
      assert(got == BpeTrain.trainInMemory(wf, numMerges = 40))
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      table.unpersist(); ()
    }
  }

  test("mergePair is left-to-right non-overlapping") {
    val df = Seq(Seq("a", "a", "a", "a"), Seq("a", "a", "a"),
      Seq("b", "a", "a")).toDF("syms")
    val out = df.select(BpeTrain.mergePair(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("aa", "aa"), Seq("aa", "a"), Seq("b", "aa")))
  }

  test("pair counts weight by word frequency and cover all adjacencies") {
    val pc = BpeTrain.pairCounts(BpeTrain.wordTable(docs, "text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // 'e','s' appears in newest (6) and widest (3) -> 9
    assert(pc(("e", "s")) == 9L)
    // 'l','o' in low (5) and lower (2) -> 7
    assert(pc(("l", "o")) == 7L)
  }

  test("native encode reproduces training-time segmentation, pieces rejoin") {
    val merges = BpeTrain.train(docs, "text", numMerges = 6)

    /** reference apply: lowest-rank pair anywhere, merge all occurrences
      * left-to-right, repeat — mirrors the kernel exactly
      */
    def refEncode(word: String): Seq[String] = {
      val rank = merges.map(m => (m.left, m.right)).zipWithIndex.toMap
      var syms = word.map(_.toString).toVector
      var done = syms.length < 2
      while (!done) {
        val best = syms.zip(syms.drop(1))
          .flatMap(p => rank.get(p).map(r => (r, p))).sortBy(_._1).headOption
        best match {
          case None => done = true
          case Some((_, (l, r))) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.result()
            if (syms.length < 2) done = true
        }
      }
      syms
    }

    val words = Seq("low", "lower", "newest", "widest", "unseen")
    val got = words.toDF("w")
      .select(col("w"), BpeTrain.encode(array(col("w")), merges).as("p"))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(got(w) == refEncode(w), s"word $w")
      assert(got(w).mkString == w) // pieces always rejoin to the token
    }
    // a word never seen in training still encodes (to chars at worst)
    assert(got("unseen").nonEmpty)
    // multi-token rows emit a flat piece sequence across tokens
    val multi = Seq("low lower").toDF("text")
      .select(BpeTrain.encode(TextAnalysis.tokens(col("text")), merges).as("p"))
      .as[Seq[String]].head()
    assert(multi == refEncode("low") ++ refEncode("lower"))
  }

  test("vocabFromMerges feeds the greedy wordpiece encoder") {
    val merges = BpeTrain.train(docs, "text", numMerges = 10)
    val vocab = BpeTrain.vocabFromMerges(docs, "text", merges)
    assert(merges.map(_.merged).forall(vocab.contains))
    val pieces = docs
      .select(TextAnalysis.wordpiece(TextAnalysis.tokens(col("text")),
        vocab, "[UNK]").as("p"))
      .as[Seq[String]].collect().flatten
    assert(pieces.nonEmpty)
    assert(!pieces.contains("[UNK]")) // vocab covers every corpus char
  }
}
