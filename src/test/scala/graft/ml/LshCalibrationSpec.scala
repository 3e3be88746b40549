package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Similarity.lshRecallCurve]] / [[Similarity.calibrateLsh]] — the IVF
  * calibration discipline on the LSH frontier: the one-pass curve must
  * EQUAL the recall an actual [[Similarity.knnLsh]] run delivers at every
  * multiProbe count (reachable candidates are scored by exact cosine, so
  * the ceiling is attained), the sentinel row must complete the
  * distribution to exactly 10⁶, and the calibration must either pick the
  * cheapest probe count meeting the target or refuse with an honest
  * measured ceiling — the routing signal that sends recall-sensitive
  * callers to [[Similarity.annSearch]].
  */
class LshCalibrationSpec extends SparkSuite {
  import spark.implicits._

  // four clusters in the four sign quadrants of dims (0,1); dims (2,3)
  // carry deterministic small ± jitter so in-cluster neighbors disagree
  // on the HIGHER sign bits for some members — levels 0, 3, 4 and the
  // unreachable sentinel are all occupied. No RNG.
  private lazy val corpus = {
    val rows = for {
      c <- 0 until 4
      m <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.01f * ((c * 10 + m) % 5))
      v(0) = (if ((c & 1) == 0) 10f else -10f)
      v(1) = (if ((c & 2) == 0) 10f else -10f)
      v(2) = 0.5f * ((m % 3) - 1)
      v(3) = 0.5f * (((m + 1) % 3) - 1)
      ((c * 10 + m).toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private def queries = corpus.filter($"vec_id" % 7 === 0)

  test("the curve equals knnLsh's measured recall at EVERY probe level, " +
      "is monotone, and the sentinel row completes the distribution") {
    val k = 5
    val nBits = 4
    val curve = Similarity.lshRecallCurve(corpus, queries, "vec_id",
      "embedding", k, nBits).collect()
    val truth = AnnQuality.groundTruth(corpus, queries, "vec_id",
      "embedding", k)
    val total = truth.valuesIterator.map(_.size).sum.toDouble
    assert(curve.map(_.getAs[Long]("total_pairs")).distinct.toSeq ==
      Seq(total.toLong))
    val micros = curve.map(_.getAs[Long]("recall_micro")).toSeq
    assert(micros == micros.sorted && micros.last == 1000000L)
    // the jittered quadrant fixture occupies reachable levels AND the
    // sentinel — the ceiling is strictly below 1 or the test is vacuous
    val reachable = curve.filter(_.getAs[Int]("probe_level") <= nBits)
    assert(reachable.nonEmpty)
    assert(curve.exists(_.getAs[Int]("probe_level") == nBits + 1),
      "fixture must occupy the unreachable sentinel")
    // curve == measured search recall at each occupied reachable level
    for (row <- reachable) {
      val m = row.getAs[Int]("probe_level")
      val fromCurve = row.getAs[Long]("cum_pairs") / total
      val measured = AnnQuality.recallAtK(
        Similarity.knnLsh(corpus, queries, "vec_id", "embedding", k,
          nBits = nBits, multiProbe = m), truth, k)
      assert(math.abs(fromCurve - measured) < 1e-9,
        s"multiProbe=$m curve=$fromCurve search=$measured")
    }
    // levels BETWEEN occupied rows measure at the preceding row's value
    // (the curve is a complete description, not just its support)
    val ceiling = reachable.map(_.getAs[Long]("recall_micro")).max
    val atMax = AnnQuality.recallAtK(
      Similarity.knnLsh(corpus, queries, "vec_id", "embedding", k,
        nBits = nBits, multiProbe = nBits), truth, k)
    assert(math.abs(ceiling / 1e6 - atMax) < 1e-6,
      s"ceiling=$ceiling measured-at-max=$atMax")
  }

  test("calibrateLsh picks the cheapest probe count meeting the target, " +
      "is monotone, and refuses an unreachable target with the honest " +
      "measured ceiling — the annSearch routing signal") {
    val k = 5
    val lo = Similarity.calibrateLsh(corpus, "vec_id", "embedding", k,
      target = 0.3, nBits = 4, sampleSize = 40)
    val mid = Similarity.calibrateLsh(corpus, "vec_id", "embedding", k,
      target = 0.5, nBits = 4, sampleSize = 40)
    assert(lo.multiProbe.isDefined && mid.multiProbe.isDefined)
    assert(lo.multiProbe.get <= mid.multiProbe.get)
    assert(lo.ceilingMicro == mid.ceilingMicro) // same curve, same ceiling
    assert(lo.ceilingMicro < 1000000L,
      "quadrant fixture must have a sub-1 LSH ceiling")
    // the picked operating point really delivers the target ON THE
    // CALIBRATION SAMPLE (sampleSize = 40 over the 40-row corpus, so the
    // sample is exactly the full corpus — the guarantee is exact)
    val truth = AnnQuality.groundTruth(corpus, corpus, "vec_id",
      "embedding", k)
    val r = AnnQuality.recallAtK(
      Similarity.knnLsh(corpus, corpus, "vec_id", "embedding", k,
        nBits = mid.nBits, multiProbe = mid.multiProbe.get), truth, k)
    assert(r >= 0.5 - 1e-9, s"calibrated point must meet the target ($r)")
    // a target above the structural ceiling routes AWAY from LSH
    val no = Similarity.calibrateLsh(corpus, "vec_id", "embedding", k,
      target = 0.99, nBits = 4, sampleSize = 40)
    assert(no.multiProbe.isEmpty,
      "unreachable target must refuse, not silently under-deliver")
    assert(no.ceilingMicro == lo.ceilingMicro)
    // arg guards: bad target / bad bits fail loudly
    intercept[IllegalArgumentException] {
      Similarity.calibrateLsh(corpus, "vec_id", "embedding", k, 1.5)
    }
    intercept[IllegalArgumentException] {
      Similarity.calibrateLsh(corpus, "vec_id", "embedding", k, 0.5,
        nBits = 0)
    }
    // nBits = -1 auto-sizes from the corpus (40 rows → the 4-bit floor)
    val auto = Similarity.calibrateLsh(corpus, "vec_id", "embedding", k,
      target = 0.3)
    assert(auto.nBits == Similarity.autoLshBits(40))
  }
}
