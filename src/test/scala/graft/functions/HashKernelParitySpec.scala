package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.SparkSuite
import graft.ml.Dedup

/** Bit-parity of the round-19 native kernels against the builtin
  * expression chains they replaced. Each kernel's contract is "identical
  * values, codegen-reachable" — these specs pin the identical-values half
  * on adversarial inputs (empty, whitespace-only, tabs/CR/LF runs,
  * multibyte UTF-8, null) so the optimization can never drift the dedup /
  * sketch / sampling fingerprints.
  */
case class RangeRow(start_tok: Long, end_tok: Long)

class HashKernelParitySpec extends SparkSuite {

  private val samples = Seq(
    null.asInstanceOf[String], "", " ", "   ", "\t", " \t\n\f\r ",
    "hello world", "  Hello   WORLD  ", "a", "a b c d e",
    "tab\tsep\ncr\rmix  runs\t\t\tdeep", "café  ÉTÉ ",
    "你好 世界  你好", "x " * 40 + "tail",
    "MiXeD Caseİı DOTTED", "trail space ", " lead space")

  private def df = {
    import spark.implicits._
    samples.toDF("t")
  }

  test("NormText == regexp_replace(trim(lower(text)), \\s+, ' ')") {
    val got = df.select(Dedup.normText(col("t"))).collect().map(_.get(0))
    val want = df.select(regexp_replace(trim(lower(col("t"))), "\\s+", " "))
      .collect().map(_.get(0))
    assert(got.toSeq == want.toSeq)
  }

  test("NormText prefix == substring(normText, 1, n) for several n") {
    for (n <- Seq(0, 1, 3, 8, 80)) {
      val got = df.select(ColumnBridge.column(
        NormText(ColumnBridge.expression(col("t")), n))).collect().map(_.get(0))
      val want = df.select(substring(
          regexp_replace(trim(lower(col("t"))), "\\s+", " "), 1, n))
        .collect().map(_.get(0))
      assert(got.toSeq == want.toSeq, s"prefixLen=$n")
    }
  }

  test("Hash60 == conv(substring(md5, 1, 15), 16, 10) on strings and binary") {
    val got = df.select(Dedup.hash60(col("t"))).collect().map(_.get(0))
    val want = df.select(
        conv(substring(md5(col("t").cast("binary")), 1, 15), 16, 10)
          .cast("long")).collect().map(_.get(0))
    assert(got.toSeq == want.toSeq)
    val gotB = df.select(Dedup.hash60(col("t").cast("binary")))
      .collect().map(_.get(0))
    assert(gotB.toSeq == want.toSeq)
  }

  test("XxHash64Array / Hash60ModArray == per-element transform lambdas") {
    import spark.implicits._
    val arrs = Seq(Seq("a", "b", "a b", "café", ""), Seq(), Seq("x"))
      .toDF("a")
    val gotX = arrs.select(ColumnBridge.column(
      XxHash64Array(ColumnBridge.expression(col("a"))))).collect().map(_.get(0))
    val wantX = arrs.select(transform(col("a"), s => xxhash64(s)))
      .collect().map(_.get(0))
    assert(gotX.toSeq == wantX.toSeq)
    val gotH = arrs.select(ColumnBridge.column(
        Hash60ModArray(ColumnBridge.expression(col("a")), Dedup.Prime)))
      .collect().map(_.get(0))
    val wantH = arrs.select(transform(col("a"), s =>
        conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long") %
          Dedup.Prime))
      .collect().map(_.get(0))
    assert(gotH.toSeq == wantH.toSeq)
  }

  test("MinHashSig == array(array_min(transform(sh, (a*x+b) % Prime)) ...)") {
    import spark.implicits._
    val arrs = Seq(Seq(0L, 1L, 17L, 2147483646L, 1234567L), Seq(42L), Seq())
      .toDF("sh")
    val got = arrs.select(Dedup.minhashSignature(col("sh")))
      .collect().map(_.get(0))
    val want = arrs.select(array(Dedup.minhashParams.map { case (a, b) =>
        array_min(transform(col("sh"), x => (lit(a) * x + lit(b)) % Dedup.Prime))
      }: _*)).collect().map(_.get(0))
    assert(got.toSeq == want.toSeq)
  }

  test("TokenCount == size(tokenize(text))") {
    val got = df.select(ColumnBridge.column(
      TokenCount(ColumnBridge.expression(col("t"))))).collect().map(_.get(0))
    val want = df.select(size(graft.ml.TextAnalysis.tokens(col("t"))))
      .collect().map(_.get(0))
    assert(got.toSeq == want.toSeq)
  }

  test("thresholded levenshtein keeps exact distances for survivors") {
    import spark.implicits._
    val pairs = Seq(("abcd", "abcd"), ("abcd", "abxd"), ("abcd", "xyzq"),
      ("", ""), ("", "abc"), ("kitten", "sitting")).toDF("a", "b")
    val full = pairs.select(levenshtein(col("a"), col("b"))).collect()
      .map(_.getInt(0))
    val banded = pairs.select(levenshtein(col("a"), col("b"), 3)).collect()
      .map(_.getInt(0))
    full.zip(banded).foreach { case (f, bd) =>
      if (f <= 3) assert(bd == f) else assert(bd == -1)
    }
  }

  test("SpliceConcat == when/filter/exists HOF splice") {
    import spark.implicits._
    val rows = Seq(
      (Seq("a", "b", "c", "d", "e"), Some(Seq((2L, 3L)))),
      (Seq("a", "b", "c"), Some(Seq((1L, 3L)))),       // everything cut
      (Seq("a", "b", "c"), Some(Seq((1L, 1L), (3L, 3L)))),
      (Seq("a", "b"), None),                            // no ranges
      (Seq.empty[String], Some(Seq((1L, 2L)))),
      (Seq.empty[String], None))
    val df = rows.map { case (tk, rs) =>
      (tk, rs.map(_.map { case (a, b) => RangeRow(a, b) }))
    }.toDF("tk", "rs")
    val want = df.select(
      when(col("rs").isNull, concat_ws(" ", col("tk")))
        .otherwise(concat_ws(" ", filter(col("tk"), (t, i) =>
          !exists(col("rs"), r =>
            (i + 1) >= r("start_tok") && (i + 1) <= r("end_tok"))))))
      .collect().map(_.getString(0))
    val emptyRanges = array().cast(
      "array<struct<start_tok: bigint, end_tok: bigint>>")
    val got = df.select(ColumnBridge.column(SpliceConcat(
        ColumnBridge.expression(col("tk")),
        ColumnBridge.expression(coalesce(col("rs"), emptyRanges)))))
      .collect().map(_.getString(0))
    assert(got.toSeq == want.toSeq)
  }
}
