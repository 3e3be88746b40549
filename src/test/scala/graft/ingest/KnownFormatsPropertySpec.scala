package graft.ingest

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Per-format round-trip sweep over the whole builtin inventory: every
  * format's sample line — plus digit-perturbed, truncated, and garbage
  * variants — is pushed through BOTH execution paths (the per-event Scala
  * `extract` and the codegen'd columnar `extractColumns`), which must agree
  * line-for-line on the match verdict and on every captured field. The
  * perturbation generator is the "round-trip": values it writes into a line
  * must come back out of the capture groups verbatim.
  *
  * Columnar nuance: `regexp_extract` yields "" both for an optional group
  * that did not participate and for a genuinely empty capture, while the
  * Scala path omits non-participating groups — ""/null/absent are therefore
  * one equivalence class in the comparison.
  */
class KnownFormatsPropertySpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  /** Replace every digit with a random digit, preserving run lengths and
    * every non-digit character — the log shape survives, the values change.
    */
  private def perturbDigits(line: String): String =
    line.map(c => if (c.isDigit) ('0' + rnd.nextInt(10)).toChar else c)

  private def scalaSide(name: String, line: String)
      : Option[Map[String, String]] =
    KnownFormats.extract(name, line)
      .map(_.filter { case (_, v) => v != null && v.nonEmpty })

  /** Columnar pass over `lines`; returns per-line (verified, field map). */
  private def columnarSide(name: String, lines: Seq[String])
      : Seq[(Boolean, Map[String, String])] = {
    val fields = KnownFormats.get(name).get.allFields
    val out = KnownFormats.extractColumns(
        lines.zipWithIndex.toDF("raw", "i"), "raw", name)
      .orderBy(col("i")).collect()
    out.map { r =>
      val m = fields.flatMap { f =>
        val v = r.getAs[String](f)
        if (v == null || v.isEmpty) None else Some(f -> v)
      }.toMap
      (r.getAs[Boolean]("p_format_verified"), m)
    }.toSeq
  }

  test("both paths agree on every sample, its perturbations, and garbage") {
    val garbage = Seq("", "x", "not a log line at all",
      "{{{{", "12345", "\t\t", "ﬆ unicode ﬁ line")
    var matchedPerturbed = 0
    var totalPerturbed = 0
    FormatSamples.allLines.foreach { case (name, sample) =>
      val perturbed = Seq.fill(5)(perturbDigits(sample))
      val truncated = Seq(sample.length / 4, sample.length / 2)
        .map(sample.take)
      val lines = (sample +: perturbed) ++ truncated ++ garbage
      val colSide = columnarSide(name, lines)
      lines.zip(colSide).foreach { case (line, (vCol, mCol)) =>
        val sSide = scalaSide(name, line)
        assert(sSide.isDefined == vCol,
          s"$name: paths disagree on match for '${line.take(60)}'")
        sSide.foreach { mScala =>
          assert(mScala == mCol,
            s"$name: captures differ on '${line.take(60)}': " +
              s"scala=$mScala columnar=$mCol")
        }
      }
      // the original sample always matches on both paths
      assert(colSide.head._1, s"$name: sample line no longer matches")
      totalPerturbed += perturbed.size
      matchedPerturbed += colSide.slice(1, 1 + perturbed.size).count(_._1)
    }
    // the generator must actually exercise the match path, not just break
    // every line: digit shuffles keep the shape for the vast majority
    assert(matchedPerturbed >= totalPerturbed * 7 / 10,
      s"perturbation broke too many lines: $matchedPerturbed/$totalPerturbed")
  }

  test("perturbed digit values round-trip through the capture groups") {
    // for each format: every digit-run the regex captured in the perturbed
    // line must be a substring the perturbation actually wrote — i.e. the
    // extracted value equals the value in the line at the same position
    FormatSamples.samples.foreach { case (name, (sample, (field, _))) =>
      val original = KnownFormats.extract(name, sample)
      assert(original.isDefined, s"$name sample must match")
      (1 to 3).foreach { _ =>
        val p = perturbDigits(sample)
        KnownFormats.extract(name, p).foreach { m =>
          m.foreach { case (f, v) =>
            assert(p.contains(v),
              s"$name.$f: captured '$v' not present in perturbed line")
          }
          // the spot-check field survives as a captured key whenever its
          // original value was non-digit (digits may legally change)
          val origVal = original.get.get(field)
          if (origVal.exists(v => !v.exists(_.isDigit)))
            assert(m.contains(field), s"$name: lost field $field")
        }
      }
    }
  }
}
