package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/** Property nets for the round-16 metric operators, each against an
  * independent scalar Scala model:
  *   - cusumBy's window identity vs the literal Page recursion across
  *     random series with gaps, negative-deviation regimes and ties;
  *   - histogramQuantile vs a direct scalar reimplementation, plus the
  *     Prometheus invariants (monotone in φ, bounded by the covering
  *     bucket, first bucket interpolates from 0);
  *   - apdexBy vs direct bucket counting.
  */
class MetricsPropertySpec extends SparkSuite {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], iters: Int = 20)(check: T => Unit): Unit =
    (0 until iters).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  // ------------------------------------------------------------ cusum

  private val genSeries: Gen[Map[String, List[(Int, Int)]]] = for {
    nG <- Gen.chooseNum(1, 4)
    m <- Gen.sequence[List[(String, List[(Int, Int)])], (String, List[(Int, Int)])](
      (0 until nG).toList.map { g =>
        for {
          nB <- Gen.chooseNum(1, 30)
          // bin hour offsets with gaps; events per bin 0..12
          bins <- Gen.listOfN(nB, for {
            h <- Gen.chooseNum(0, 60)
            n <- Gen.chooseNum(1, 12)
          } yield (h, n))
        } yield (s"g$g", bins.distinctBy(_._1))
      })
  } yield m.toMap

  test("cusumBy PROPERTY: equals the literal recursion on random gappy " +
      "series for several slacks") {
    val base = 1704067200000L
    forAll(genSeries) { series =>
      val rows = series.toList.flatMap { case (g, bins) =>
        bins.flatMap { case (h, n) =>
          (0 until n).map(i =>
            (g, new Timestamp(base + h * 3600000L + i * 1000L)))
        }
      }
      val df = rows.toDF("g", "ts")
      for (slack <- Seq(0L, 2L)) {
        val out = TimeSeries.cusumBy(df, "g", "ts", 3600000L, lit(1L),
            slack, decision = 5L)
          .collect().map(r => (r.getString(0),
            r.getAs[java.time.LocalDateTime](1)
              .toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
            r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
          .groupBy(_._1)
        series.foreach { case (g, bins) =>
          val xs = bins.sortBy(_._1).map(_._2.toLong)
          val mu = xs.sum / xs.length
          var sp = 0L; var sn = 0L
          val got = out(g).sortBy(_._2)
          assert(got.length == xs.length)
          got.zip(xs).foreach { case (r, x) =>
            assert(r._3 == x)
            sp = math.max(0L, sp + x - mu - slack)
            sn = math.max(0L, sn - x + mu - slack)
            assert(r._4 == sp && r._5 == sn,
              s"$g slack=$slack at ${r._2}: got (${r._4},${r._5}) " +
                s"want ($sp,$sn)")
            assert(r._6 == (sp > 5L || sn > 5L))
          }
        }
      }
    }
  }

  // -------------------------------------------- histogram quantile

  private val genBuckets: Gen[(List[(String, Long, Long)], Long)] = for {
    nG <- Gen.chooseNum(1, 3)
    phi <- Gen.chooseNum(1, 1000000)
    rows <- Gen.sequence[List[List[(String, Long, Long)]], List[(String, Long, Long)]](
      (0 until nG).toList.map { g =>
        for {
          nB <- Gen.chooseNum(1, 8)
          les <- Gen.listOfN(nB, Gen.chooseNum(1, 40))
          cnts <- Gen.listOfN(nB, Gen.chooseNum(0, 9))
        } yield les.map(_.toLong * 50L).distinct.sorted
          .zip(cnts).map { case (le, c) => (s"g$g", le, c.toLong) }
      })
  } yield (rows.flatten, phi.toLong)

  /** Scalar model of the operator's contract. */
  private def hqModel(buckets: Seq[(Long, Long)],
                      phi: Long): (Long, Option[Long]) = {
    val sorted = buckets.sortBy(_._1)
    val total = sorted.map(_._2).sum
    if (total == 0) return (0L, None)
    var cum = 0L; var lower = 0L
    for ((le, cnt) <- sorted) {
      val prev = cum
      cum += cnt
      if (cnt > 0 &&
          BigInt(cum) * 1000000 >= BigInt(phi) * total) {
        val q = math.floor(lower.toDouble + (le - lower).toDouble *
          ((phi.toDouble * total.toDouble - prev.toDouble * 1000000.0) /
            (cnt.toDouble * 1000000.0))).toLong
        return (total, Some(q))
      }
      lower = le
    }
    (total, None) // unreachable for phi <= 1e6 with total > 0
  }

  test("histogramQuantile PROPERTY: equals the scalar model; bounded by " +
      "its covering bucket; monotone in phi") {
    forAll(genBuckets) { case (rows, phi) =>
      val df = rows.toDF("g", "le", "cnt")
      def run(p: Long) = Percentiles
        .histogramQuantile(df, Seq("g"), "le", "cnt", p)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
        .toMap
      val got = run(phi)
      val byG = rows.groupBy(_._1)
      byG.foreach { case (g, bs) =>
        val want = hqModel(bs.map(b => (b._2, b._3)), phi)
        assert(got(g) == want, s"$g phi=$phi")
        // bounds: within (0, max le]
        got(g)._2.foreach { q =>
          assert(q >= 0L && q <= bs.map(_._2).max)
        }
      }
      // monotone in phi (half the time phi2 < phi — both directions hit)
      val phi2 = math.max(1L, 1000000L - phi)
      val lowPhi = math.min(phi, phi2); val hiPhi = math.max(phi, phi2)
      val lo = run(lowPhi); val hi = run(hiPhi)
      byG.keys.foreach { g =>
        (lo(g)._2, hi(g)._2) match {
          case (Some(a), Some(b)) => assert(a <= b, s"$g monotonicity")
          case (None, None)       => ()
          case other => fail(s"$g null mismatch across phis: $other")
        }
      }
    }
  }

  // ------------------------------------------------------------ apdex

  test("apdexBy PROPERTY: equals direct bucket counting") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      t <- Gen.chooseNum(1, 50)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b")
        v <- Gen.chooseNum(0, 300)
      } yield (g, v.toLong))
    } yield (rows, t.toLong)
    forAll(gen) { case (rows, t) =>
      val out = TimeSeries.apdexBy(rows.toDF("g", "v"), Seq("g"),
          col("v"), t)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val total = rs.size.toLong
        val sat = rs.count(_._2 <= t).toLong
        val tol = rs.count(r => r._2 > t && r._2 <= 4 * t).toLong
        val want = (total, sat, tol, total - sat - tol,
          (2 * sat + tol) * 1000000L / (2 * total))
        assert(out(g) == want, s"$g T=$t")
      }
    }
  }
}
