package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.UnigramModel

/** Unigram-LM trainer/encoder vs an INDEPENDENT pure-Scala reference
  * implementing the same documented algorithm (seed → hard-EM → prune;
  * Viterbi with the strictly-greater / ascending-length tie-break).
  * Iterative EM over per-word DP is not SQL-expressible, so this parity
  * is the gate (the deflate/WordPiece convention).
  */
class UnigramLmSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------- pure-Scala reference --------------------

  private def refCpSubstrings(w: String, maxLen: Int): Seq[String] = {
    val offs = {
      val b = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < w.length) { b += i; i += Character.charCount(w.codePointAt(i)) }
      b += w.length; b.toSeq
    }
    val n = offs.length - 1
    for {
      i <- 0 until n
      len <- 1 to math.min(maxLen, n - i)
    } yield w.substring(offs(i), offs(i + len))
  }

  private final case class RefModel(lp: Map[String, Double], unkLp: Double) {
    val maxLen: Int =
      if (lp.isEmpty) 1 else lp.keys.map(p => p.codePointCount(0, p.length)).max
    def segment(w: String): Seq[String] = {
      val offs = {
        val b = scala.collection.mutable.ArrayBuffer[Int]()
        var i = 0
        while (i < w.length) { b += i; i += Character.charCount(w.codePointAt(i)) }
        b += w.length; b.toSeq
      }
      val n = offs.length - 1
      if (n == 0) return Nil
      val best = Array.fill(n + 1)(Double.NegativeInfinity)
      val backJ = new Array[Int](n + 1)
      val backP = new Array[String](n + 1)
      best(0) = 0.0
      for (i <- 1 to n; len <- 1 to math.min(maxLen, i)) {
        val j = i - len
        if (best(j) != Double.NegativeInfinity) {
          val sub = w.substring(offs(j), offs(i))
          lp.get(sub) match {
            case Some(p) =>
              val sc = best(j) + p
              if (sc > best(i)) { best(i) = sc; backJ(i) = j; backP(i) = sub }
            case None if len == 1 =>
              val sc = best(j) + unkLp
              if (sc > best(i)) {
                best(i) = sc; backJ(i) = j; backP(i) = UnigramLm.Unk
              }
            case None => ()
          }
        }
      }
      var pos = n
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (pos > 0) { out += backP(pos); pos = backJ(pos) }
      out.reverse.toSeq
    }
  }

  private def refFit(singles: Seq[(String, Long)],
                     multis: Seq[(String, Long)]): RefModel = {
    val all = singles ++ multis
    val total = math.max(1L, all.map(_._2).sum)
    val floor = math.log(0.5 / total.toDouble)
    RefModel(all.map { case (p, c) =>
      p -> (if (c > 0) math.log(c.toDouble / total.toDouble) else floor)
    }.toMap, floor + math.log(0.5))
  }

  private def refTrain(wordFreqs: Seq[(String, Long)], vocabSize: Int,
                       maxPieceLen: Int, seedSize: Int,
                       iters: Int): RefModel = {
    val subCounts = scala.collection.mutable.Map[String, Long]()
    wordFreqs.foreach { case (w, f) =>
      refCpSubstrings(w, maxPieceLen).foreach { s =>
        subCounts(s) = subCounts.getOrElse(s, 0L) + f
      }
    }
    def cpLen(p: String) = p.codePointCount(0, p.length)
    val singles = subCounts.toSeq.filter(p => cpLen(p._1) == 1)
    val multis0 = subCounts.toSeq.filter(p => cpLen(p._1) > 1)
      .sortBy(p => (-p._2, p._1))
      .take(math.max(0, seedSize - singles.length))
    var model = refFit(singles, multis0)
    for (it <- 0 until iters) {
      val last = it == iters - 1
      val counts = scala.collection.mutable.Map[String, Long]()
      wordFreqs.foreach { case (w, f) =>
        model.segment(w).filterNot(_ == UnigramLm.Unk).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val singlesNow = singles.map { case (p, _) =>
        (p, counts.getOrElse(p, 0L)) }
      val multisNow = counts.toSeq.filter(p => cpLen(p._1) > 1)
        .sortBy(p => (-p._2, p._1))
      val kept = if (!last) multisNow
        else multisNow.take(math.max(0, vocabSize - singlesNow.length))
      model = refFit(singlesNow, kept)
    }
    model
  }

  // ---- soft-EM reference: forward-backward expectations, same pinned
  // ---- loop orders as the kernel contract (start asc, length asc)

  private def refOffs(w: String): Array[Int] = {
    val b = scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < w.length) { b += i; i += Character.charCount(w.codePointAt(i)) }
    b += w.length; b.toArray
  }

  private def refLadd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else {
      val m = math.max(a, b)
      m + math.log1p(math.exp(math.min(a, b) - m))
    }

  private def refExpected(w: String, m: RefModel): Seq[(String, Long)] = {
    val offs = refOffs(w)
    val n = offs.length - 1
    if (n == 0) return Nil
    def edgeLp(j: Int, i: Int): Double = {
      val sub = w.substring(offs(j), offs(i))
      m.lp.get(sub) match {
        case Some(p) => p
        case None if i - j == 1 => m.unkLp
        case None => Double.NaN
      }
    }
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    for (i <- 1 to n; len <- 1 to math.min(m.maxLen, i)) {
      val j = i - len
      if (alpha(j) != Double.NegativeInfinity) {
        val lp = edgeLp(j, i)
        if (!lp.isNaN) alpha(i) = refLadd(alpha(i), alpha(j) + lp)
      }
    }
    beta(n) = 0.0
    for (s <- (n - 1) to 0 by -1;
         len <- 1 to math.min(m.maxLen, n - s)) {
      val e = s + len
      if (beta(e) != Double.NegativeInfinity) {
        val lp = edgeLp(s, e)
        if (!lp.isNaN) beta(s) = refLadd(beta(s), lp + beta(e))
      }
    }
    val z = alpha(n)
    if (z == Double.NegativeInfinity) return Nil
    val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (st <- 0 until n; len <- 1 to math.min(m.maxLen, n - st)) {
      val en = st + len
      if (alpha(st) != Double.NegativeInfinity &&
          beta(en) != Double.NegativeInfinity) {
        val lp = edgeLp(st, en)
        if (!lp.isNaN) {
          val sub = w.substring(offs(st), offs(en))
          val label = if (m.lp.contains(sub)) sub else UnigramLm.Unk
          acc(label) = acc.getOrElse(label, 0.0) +
            math.exp(alpha(st) + lp + beta(en) - z)
        }
      }
    }
    acc.toSeq.map { case (p, e) => (p, math.floor(e * 1e6).toLong) }
      .filter(_._2 > 0L).sortBy(_._1)
  }

  private def refFitMicro(singles: Seq[(String, BigInt)],
                          multis: Seq[(String, BigInt)]): RefModel = {
    val all = singles ++ multis
    val total = all.map(_._2).sum.max(BigInt(1))
    val floor = math.log(0.5 / total.toDouble)
    RefModel(all.map { case (p, c) =>
      p -> (if (c > 0) math.log(c.toDouble / total.toDouble) else floor)
    }.toMap, floor + math.log(0.5))
  }

  private def refTrainSoft(wordFreqs: Seq[(String, Long)], vocabSize: Int,
                           maxPieceLen: Int, seedSize: Int,
                           iters: Int): RefModel = {
    val subCounts = scala.collection.mutable.Map[String, Long]()
    wordFreqs.foreach { case (w, f) =>
      refCpSubstrings(w, maxPieceLen).foreach { s =>
        subCounts(s) = subCounts.getOrElse(s, 0L) + f
      }
    }
    def cpLen(p: String) = p.codePointCount(0, p.length)
    val singles = subCounts.toSeq.filter(p => cpLen(p._1) == 1)
    val multis0 = subCounts.toSeq.filter(p => cpLen(p._1) > 1)
      .sortBy(p => (-p._2, p._1))
      .take(math.max(0, seedSize - singles.length))
    var model = refFit(singles, multis0)
    for (it <- 0 until iters) {
      val last = it == iters - 1
      val counts = scala.collection.mutable.Map[String, BigInt]()
      wordFreqs.foreach { case (w, f) =>
        refExpected(w, model).foreach { case (p, eMicro) =>
          if (p != UnigramLm.Unk)
            counts(p) = counts.getOrElse(p, BigInt(0)) + BigInt(f) * eMicro
        }
      }
      val singlesNow = singles.map { case (p, _) =>
        (p, counts.getOrElse(p, BigInt(0))) }
      val multisNow = counts.toSeq.filter(p => cpLen(p._1) > 1)
        .sortBy(p => (-p._2, p._1))
      val kept = if (!last) multisNow
        else multisNow.take(math.max(0, vocabSize - singlesNow.length))
      model = refFitMicro(singlesNow, kept)
    }
    model
  }

  // ---- sampled-segmentation reference: FFBS with the same pinned
  // ---- orders, uniforms, and <=-boundary latch as the kernel contract

  private def refSampled(w: String, m: RefModel, alpha: Double,
                         seed: Long): Seq[String] = {
    val offs = refOffs(w)
    val n = offs.length - 1
    if (n == 0) return Nil
    def scaledLp(j: Int, i: Int): Double = {
      val sub = w.substring(offs(j), offs(i))
      m.lp.get(sub) match {
        case Some(p) => alpha * p
        case None if i - j == 1 => alpha * m.unkLp
        case None => Double.NaN
      }
    }
    val a = Array.fill(n + 1)(Double.NegativeInfinity)
    a(0) = 0.0
    for (i <- 1 to n; len <- 1 to math.min(m.maxLen, i)) {
      val j = i - len
      if (a(j) != Double.NegativeInfinity) {
        val lp = scaledLp(j, i)
        if (!lp.isNaN) a(i) = refLadd(a(i), a(j) + lp)
      }
    }
    if (a(n) == Double.NegativeInfinity) return Nil
    def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def uni(pos: Long): Double =
      (mix64(w.hashCode.toLong ^ (seed * 0xc2b2ae3d27d4eb4fL) ^
        (pos * 0x5851f42d4c957f2dL)) >>> 11).toDouble /
        (1L << 53).toDouble
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var pos = n
    while (pos > 0) {
      val u = uni(pos.toLong)
      var cum = 0.0
      var chosenJ = -1
      var chosenP: String = null
      for (len <- 1 to math.min(m.maxLen, pos)) {
        val j = pos - len
        if (a(j) != Double.NegativeInfinity) {
          val lp = scaledLp(j, pos)
          if (!lp.isNaN) {
            val sub = w.substring(offs(j), offs(pos))
            val piece =
              if (m.lp.contains(sub)) sub else UnigramLm.Unk
            if (chosenJ < 0 || cum <= u) { chosenJ = j; chosenP = piece }
            cum += math.exp(a(j) + lp - a(pos))
          }
        }
      }
      out += chosenP
      pos = chosenJ
    }
    out.reverse.toSeq
  }

  // -------------------------------- fixtures -------------------------

  private val corpus = Seq(
    "low low low lower lowest",
    "new newer newest news",
    "wide wider widest low",
    "the newest news is the widest news")
  private def docs = corpus.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  private def wordFreqs: Seq[(String, Long)] = corpus
    .flatMap(_.split(" +")).filter(_.nonEmpty)
    .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq

  private def modelMap(m: UnigramModel): Map[String, Double] =
    m.piecesSeq.toMap

  test("train == the pure-Scala reference (pieces AND log-probs exact), " +
      "and is invariant under repartitioning") {
    val m = UnigramLm.train(docs, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 64, iters = 3)
    val ref = refTrain(wordFreqs, 40, 4, 64, 3)
    assert(modelMap(m) == ref.lp)
    assert(m.unkLogp == ref.unkLp)
    // vocab budget respected; singles always present
    assert(modelMap(m).size <= 40)
    val chars = wordFreqs.flatMap(_._1.toCharArray.map(_.toString)).toSet
    assert(chars.subsetOf(modelMap(m).keySet))
    val m2 = UnigramLm.train(docs.repartition(7), "text", 40, 4, 64, 3)
    assert(modelMap(m2) == ref.lp)
  }

  test("encodePieces == the reference Viterbi; pieces reconstruct each " +
      "word; learned multi-char pieces actually appear") {
    val m = UnigramLm.train(docs, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 64, iters = 3)
    val ref = refTrain(wordFreqs, 40, 4, 64, 3)
    val got = docs
      .select(col("doc_id"),
        UnigramLm.encodePieces(TextAnalysis.tokens(col("text")), m)
          .as("pieces"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).toList).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val words = t.split(" +").filter(_.nonEmpty).toSeq
      val want = words.flatMap(ref.segment)
      assert(got(i.toLong) == want, s"doc $i")
      // reconstruction: no unk in-domain, concatenation round-trips
      assert(got(i.toLong).mkString == words.mkString)
    }
    // the EM actually learned something beyond characters
    assert(got.values.flatten.exists(_.length > 1))
  }

  test("expectedMicro: kernel == reference bit-for-bit, posteriors match " +
      "the analytic lattice, zero-micro entries drop") {
    // vocab: a, b at p=0.25 each; ab at p=0.5. Word "ab" has two paths:
    // [ab] mass 0.5, [a][b] mass 0.0625; Z = 0.5625, so the posteriors
    // are ab = 8/9, a = b = 1/9.
    val lp = Map("a" -> math.log(0.25), "b" -> math.log(0.25),
      "ab" -> math.log(0.5))
    val ref = RefModel(lp, -20.0)
    val m = new graft.functions.UnigramModel(lp.toSeq, UnigramLm.Unk, -20.0)
    def kernel(w: String): Seq[(String, Long)] = {
      val arr = m.expectedMicro(w)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
    }
    val got = kernel("ab")
    assert(got == refExpected("ab", ref))
    val byP = got.toMap
    assert(math.abs(byP("ab") - 888888L) <= 1)
    assert(math.abs(byP("a") - 111111L) <= 1)
    assert(byP("a") == byP("b"))
    // posterior mass of a full segmentation sums to ~1 per covered char
    // (each code point is covered by exactly one piece on every path)
    assert(math.abs((byP("ab") * 2 + byP("a") + byP("b")) - 2000000L) <= 4)
    // unknown char routes through the UNK edge
    val unkGot = kernel("axb").toMap
    assert(unkGot.contains(UnigramLm.Unk))
    // empty/unsegmentable words return nothing
    assert(kernel("") == Nil)
    // property net: random words over {a, b, c} — kernel == reference
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(8)))
        .map(_ => "abc" (rnd.nextInt(3))).mkString
      assert(kernel(w) == refExpected(w, ref), s"word $w")
    }
  }

  test("trainSoft == the pure-Scala forward-backward reference (pieces " +
      "AND log-probs exact), invariant under repartitioning, and keeps " +
      "lattice runners-up that hard-EM starves") {
    val m = UnigramLm.trainSoft(docs, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 64, iters = 3)
    val ref = refTrainSoft(wordFreqs, 40, 4, 64, 3)
    assert(modelMap(m) == ref.lp)
    assert(m.unkLogp == ref.unkLp)
    assert(modelMap(m).size <= 40)
    val chars = wordFreqs.flatMap(_._1.toCharArray.map(_.toString)).toSet
    assert(chars.subsetOf(modelMap(m).keySet))
    val m2 = UnigramLm.trainSoft(docs.repartition(7), "text", 40, 4, 64, 3)
    assert(modelMap(m2) == ref.lp)
    // soft-EM's defining property: with a big vocab budget the E-step
    // gives EVERY lattice piece posterior mass, while hard-EM credits
    // only Viterbi winners — so soft keeps strictly more multi-char
    // pieces alive on the same corpus and budget
    val hard = UnigramLm.train(docs, "text", vocabSize = 64,
      maxPieceLen = 4, seedSize = 64, iters = 2)
    val soft = UnigramLm.trainSoft(docs, "text", vocabSize = 64,
      maxPieceLen = 4, seedSize = 64, iters = 2)
    def multiCount(mm: graft.functions.UnigramModel) =
      mm.piecesSeq.count(p => p._1.codePointCount(0, p._1.length) > 1)
    assert(multiCount(soft) > multiCount(hard))
    // encode side is shared Viterbi: pieces still reconstruct each word
    val got = docs
      .select(UnigramLm.encodePieces(TextAnalysis.tokens(col("text")), m)
        .as("pieces"))
      .collect().flatMap(_.getSeq[String](0))
    assert(got.nonEmpty && got.forall(_ != UnigramLm.Unk))
  }

  test("encodePiecesSampled: kernel == FFBS reference for every (word, " +
      "seed); pieces reconstruct; alpha sweeps uniform -> Viterbi") {
    val lp = Map("a" -> math.log(0.25), "b" -> math.log(0.25),
      "ab" -> math.log(0.5))
    val ref = RefModel(lp, -20.0)
    val m = new graft.functions.UnigramModel(lp.toSeq, UnigramLm.Unk, -20.0)
    def kernel(w: String, alpha: Double, seed: Long): Seq[String] =
      m.segmentSampled(w, alpha, seed).map(_.toString).toSeq
    // exact parity across words, seeds, alphas (incl. OOV chars)
    val rnd = new scala.util.Random(11)
    for (seed <- 0L until 20L; alpha <- Seq(0.0, 0.2, 1.0, 5.0)) {
      val w = (1 to (1 + rnd.nextInt(7))).map(_ => "abx"(rnd.nextInt(3)))
        .mkString
      assert(kernel(w, alpha, seed) == refSampled(w, ref, alpha, seed),
        s"word $w alpha $alpha seed $seed")
    }
    // sampling actually mixes: over many seeds at alpha=1, "ab" is
    // sometimes [ab] (posterior 8/9) and sometimes [a, b] (1/9)
    val draws = (0L until 400L).map(s => kernel("ab", 1.0, s))
    val whole = draws.count(_ == Seq("ab"))
    assert(whole > 300 && whole < 390, s"whole=$whole") // ≈ 8/9 of 400
    assert(draws.exists(_ == Seq("a", "b")))
    // alpha=0: uniform over the two segmentations (~200 each)
    val unif = (0L until 400L).map(s => kernel("ab", 0.0, s))
      .count(_ == Seq("ab"))
    assert(unif > 150 && unif < 250, s"unif=$unif")
    // large alpha: effectively Viterbi
    assert((0L until 100L).forall(s => kernel("ab", 50.0, s) ==
      Seq("ab")))
    // reconstruction holds for every draw (sampling never edits chars)
    draws.foreach(ps => assert(ps.mkString == "ab"))
    // DataFrame path: deterministic under repartitioning, same seed
    val docsDf = Seq((1L, "ab ab abab"), (2L, "ba ab")).toDF("id", "t")
    def enc(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"), UnigramLm.encodePiecesSampled(
        TextAnalysis.tokens(col("t")), m, 1.0, seed = 7L).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(enc(docsDf) == enc(docsDf.repartition(5)))
    // cross-seed DIVERSITY (the augmentation epochs story,
    // q_unigram_augment): distinct seeds draw a different segmentation
    // for at least one document; the SAME seed always collapses
    def encSeed(seed: Long) = docsDf
      .select(col("id"), UnigramLm.encodePiecesSampled(
        TextAnalysis.tokens(col("t")), m, 0.5, seed = seed).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(encSeed(41L) == encSeed(41L))
    assert((1L to 10L).exists(s => encSeed(41L) != encSeed(41L + s)))
    intercept[IllegalArgumentException] {
      UnigramLm.encodePiecesSampled(col("t"), m, -0.5, 1L)
    }
    // Infinity/NaN have no Java double-literal form — rejected up
    // front instead of failing Janino compilation on the codegen path
    intercept[IllegalArgumentException] {
      UnigramLm.encodePiecesSampled(col("t"), m,
        Double.PositiveInfinity, 1L)
    }
    intercept[IllegalArgumentException] {
      UnigramLm.encodePiecesSampled(col("t"), m, Double.NaN, 1L)
    }
  }

  test("unknown characters segment to <unk> per code point without " +
      "derailing neighbors") {
    val m = UnigramLm.train(docs, "text", vocabSize = 40,
      maxPieceLen = 4, seedSize = 64, iters = 2)
    val out = Seq((1L, "lowélow")).toDF("id", "t")
      .select(UnigramLm.encodePieces(TextAnalysis.tokens(col("t")), m)
        .as("p"))
      .collect().head.getSeq[String](0).toList
    assert(out.count(_ == UnigramLm.Unk) == 1)
    assert(out.filterNot(_ == UnigramLm.Unk).mkString == "lowlow")
  }
}
