package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property tests for the native text kernels against independent,
  * obviously-correct Scala specifications — the kernels replaced the
  * declarative HOF pipelines for speed, so equivalence is re-proven here
  * over randomized inputs (unicode, space runs, repeats) rather than only
  * the example-based specs. Pure JVM: the kernels are static functions, no
  * SparkSession needed.
  */
class TextExprsPropertySpec extends AnyFunSuite {

  /** Deterministic stand-in for forAll (scalatest/scalacheck bridge is not
    * in the offline cache): sample the generator at 200 fixed seeds.
    */
  private def forAll[T](gen: Gen[T])(check: T => Unit): Unit =
    (0 until 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val genWord: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString.take(6)),
    Gen.oneOf("a", "b", "ab", "é", "日本", "x1"))

  private val genText: Gen[String] = for {
    words <- Gen.listOf(genWord)
    seps <- Gen.listOfN(words.length + 1, Gen.chooseNum(0, 3))
  } yield {
    val sb = new StringBuilder(" " * seps.head)
    words.zip(seps.tail).foreach { case (w, k) => sb ++= w ++= " " * k }
    sb.toString
  }

  private val genTokens: Gen[List[String]] =
    Gen.listOf(genWord) // duplicates arise naturally from the small pool

  private def arr(toks: Seq[String]): GenericArrayData =
    new GenericArrayData(
      toks.map(t => UTF8String.fromString(t)).toArray[Any])

  private def strings(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  test("tokenize == split-on-space-runs with empties dropped") {
    forAll(genText) { s =>
      val expected = s.split(" +").toSeq.filter(_.nonEmpty)
      val actual = strings(TextExprs.tokenize(UTF8String.fromString(s)))
      assert(actual == expected, s"input=<$s>")
    }
  }

  test("ngrams == sliding windows joined with spaces; distinct keeps first") {
    forAll(for { t <- genTokens; n <- Gen.chooseNum(1, 4) } yield (t, n)) {
      case (toks, n) =>
        val expected =
          if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        assert(strings(TextExprs.ngrams(arr(toks), n, distinct = false)) ==
          expected)
        assert(strings(TextExprs.ngrams(arr(toks), n, distinct = true)) ==
          expected.distinct)
    }
  }

  test("repetition == brute-force gram counting") {
    forAll(genTokens) { toks =>
      val r = TextExprs.repetition(arr(toks))
      def counts(n: Int): Map[String, Int] =
        if (toks.length < n) Map.empty
        else toks.sliding(n).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
      val (w, b, t) = (counts(1), counts(2), counts(3))
      assert(r.getLong(0) == toks.length.toLong)
      assert(r.getLong(1) == (if (w.isEmpty) 0L else w.values.max.toLong))
      assert(r.getLong(2) == math.max(toks.length - 1, 0).toLong)
      assert(r.getLong(3) == (if (b.isEmpty) 0L else b.values.max.toLong))
      assert(r.getLong(4) == math.max(toks.length - 2, 0).toLong)
      assert(r.getLong(5) == t.values.filter(_ > 1).sum.toLong)
    }
  }

  test("windowHashes: length correct; equal windows hash equal") {
    forAll(for { t <- genTokens; k <- Gen.chooseNum(1, 4) } yield (t, k)) {
      case (toks, k) =>
        val hs = TextExprs.windowHashes(arr(toks), k)
        val n = math.max(toks.length - k + 1, 0)
        assert(hs.numElements() == n)
        if (n > 0) {
          val windows = toks.sliding(k).toSeq
          val pairs = windows.zipWithIndex
          for ((w1, i) <- pairs; (w2, j) <- pairs if w1 == w2)
            assert(hs.getLong(i) == hs.getLong(j))
        }
    }
  }

  test("countInSet / sumTokenChars == naive folds") {
    forAll(genTokens) { toks =>
      val set = TextExprs.buildSet(Seq("a", "ab", "é"))
      assert(TextExprs.countInSet(arr(toks), set) ==
        toks.count(Set("a", "ab", "é")).toLong)
      assert(TextExprs.sumTokenChars(arr(toks)) ==
        toks.map(t => t.codePointCount(0, t.length).toLong).sum)
    }
  }

  test("wordpiece pieces rejoin to the token; unmatched tokens become UNK") {
    val vocab = Seq("a", "b", "ab", "##a", "##b", "##ab", "c")
    val set = TextExprs.buildSet(vocab)
    val unk = UTF8String.fromString("[UNK]")
    forAll(Gen.listOf(Gen.oneOf("a", "ab", "aab", "abab", "zz", "c", "cab"))) {
      toks =>
        val pieces = strings(TextExprs.wordpiece(arr(toks), set, unk))
        // reassemble: each token is either [UNK] or a run of pieces whose
        // de-##-ed concatenation equals the token
        var i = 0
        toks.foreach { t =>
          if (pieces(i) == "[UNK]") i += 1
          else {
            val sb = new StringBuilder(pieces(i)); i += 1
            while (i < pieces.length && pieces(i).startsWith("##")) {
              sb ++= pieces(i).substring(2); i += 1
            }
            assert(sb.toString == t, s"token=$t pieces=$pieces")
          }
        }
        assert(i == pieces.length)
    }
  }
  test("unicodeNormalize: idempotent per form; NFC(NFD(x)) == NFC(x); " +
       "already-normalized input returns the SAME UTF8String (fast path)") {
    import java.text.Normalizer.Form
    // strings salted with combining marks (acute U+0301, ring U+030A,
    // umlaut U+0308) and precomposed letters so composition really fires
    val genUni: Gen[String] = for {
      parts <- Gen.listOf(Gen.oneOf(
        "cafe", "e\u0301", "A\u030a", "o\u0308", "\u00e9", "\u00c5",
        "\ufb01" /* fi ligature: NFKC-only change */, "x", " "))
    } yield parts.mkString
    val forms = Seq(Form.NFC, Form.NFD, Form.NFKC, Form.NFKD)
    forAll(genUni) { raw =>
      val u = UTF8String.fromString(raw)
      forms.foreach { f =>
        val once = TextExprs.unicodeNormalize(u, f)
        val twice = TextExprs.unicodeNormalize(once, f)
        // idempotence, and the fast path returns the same object
        assert(twice.toString == once.toString, s"form=$f raw=$raw")
        assert(twice eq once, s"fast path missed: form=$f raw=$raw")
        // agrees with the platform normalizer
        assert(once.toString ==
          java.text.Normalizer.normalize(raw, f), s"form=$f raw=$raw")
      }
      // canonical equivalence: composing the decomposition restores NFC
      val nfd = TextExprs.unicodeNormalize(u, Form.NFD)
      assert(TextExprs.unicodeNormalize(nfd, Form.NFC).toString ==
        TextExprs.unicodeNormalize(u, Form.NFC).toString, s"raw=$raw")
    }
  }
}
