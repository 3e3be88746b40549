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
