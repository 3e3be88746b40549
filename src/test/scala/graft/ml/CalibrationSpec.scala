package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** [[Similarity.nProbeRecallCurve]] / [[Similarity.calibrateNProbe]] /
  * [[Similarity.annSearch]] — recall-targeted probe calibration: the
  * one-pass curve must EQUAL the recall an actual [[Similarity.ivfSearch]]
  * run delivers at every probe count (it is a ceiling the exact-scoring
  * search attains), calibration must be monotone in the target and the
  * calibrated search must meet it, and the annSearch default path must
  * hit its recall target end-to-end.
  */
class CalibrationSpec extends SparkSuite {
  import spark.implicits._

  // four tight clusters on orthogonal axis pairs of an 8-dim space:
  // 10 members each, deterministic small jitter so in-cluster cosines
  // dominate cross-cluster ones — real neighbor structure, no RNG
  private lazy val corpus = {
    val rows = for {
      c <- 0 until 4
      m <- 0 until 10
    } yield {
      val v = Array.fill(8)(0.05f * ((c * 10 + m) % 7))
      v(c * 2) = 10f
      v(c * 2 + 1) = 1f + 0.1f * m
      ((c * 10 + m).toLong, v)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  private def queries = corpus.filter($"vec_id" % 7 === 0)

  test("the curve equals ivfSearch's measured recall at EVERY probe " +
      "count (exact-scoring IVF attains its ceiling), is monotone, and " +
      "ends at recall 1") {
    val k = 5
    val cents = Similarity.seedCentroids(corpus, "vec_id", "embedding", 6)
    val curve = Similarity.nProbeRecallCurve(corpus, queries, "vec_id",
      "embedding", k, cents).collect()
    val truth = AnnQuality.groundTruth(corpus, queries, "vec_id",
      "embedding", k)
    val total = truth.valuesIterator.map(_.size).sum.toDouble
    assert(curve.map(_.getAs[Long]("total_pairs")).distinct.toSeq ==
      Seq(total.toLong))
    // monotone cum, closing at exactly 10⁶ micro-recall
    val micros = curve.map(_.getAs[Long]("recall_micro")).toSeq
    assert(micros == micros.sorted && micros.last == 1000000L)
    // ceiling == measured search recall at each occupied rank
    for (row <- curve) {
      val p = row.getAs[Int]("c_rank")
      val fromCurve = row.getAs[Long]("cum_pairs") / total
      val measured = AnnQuality.recallAtK(
        Similarity.ivfSearch(corpus, queries, "vec_id", "embedding", k,
          numCentroids = 6, nProbe = p), truth, k)
      assert(math.abs(fromCurve - measured) < 1e-9,
        s"nProbe=$p curve=$fromCurve search=$measured")
    }
  }

  test("calibrateNProbe is monotone in the target, meets the target " +
      "when searched, and a clustered corpus calibrates far below the " +
      "full probe count") {
    val k = 5
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding",
      8, 3)
    val lo = Similarity.calibrateNProbe(corpus, "vec_id", "embedding",
      cents, k, target = 0.5)
    val hi = Similarity.calibrateNProbe(corpus, "vec_id", "embedding",
      cents, k, target = 0.95)
    val full = Similarity.calibrateNProbe(corpus, "vec_id", "embedding",
      cents, k, target = 1.0)
    assert(lo <= hi && hi <= full)
    assert(full < 8, s"clustered corpus should not need every list ($full)")
    // the calibrated probe count really delivers the target on the sample
    val truth = AnnQuality.groundTruth(corpus, queries, "vec_id",
      "embedding", k)
    val r = AnnQuality.recallAtK(
      Similarity.ivfSearch(corpus, queries, "vec_id", "embedding", k,
        numCentroids = 8, nProbe = full, kmeansIters = 3), truth, k)
    assert(r == 1.0, s"target-1.0 calibration must be exhaustive ($r)")
    cents.unpersist()
    intercept[IllegalArgumentException] {
      Similarity.calibrateNProbe(corpus, "vec_id", "embedding", cents, k,
        target = 1.5)
    }
  }

  test("persisted calibration: calibrateIvfIndex stores the serving " +
      "probe count, nProbe = -1 serves at it, and the spilled curve " +
      "uses best-replica ranks") {
    val k = 5
    val dir = java.nio.file.Files.createTempDirectory("cal-idx").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding", 8, dir,
      spill = 2)
    val np = Similarity.calibrateIvfIndex(spark, dir, k, target = 1.0)
    assert(Similarity.storedNProbe(spark, dir).contains(np))
    assert(np >= 1 && np <= 8)
    val atStored = Similarity.ivfSearchPersisted(spark, dir, queries,
      "vec_id", "embedding", k, nProbe = -1)
    val explicit = Similarity.ivfSearchPersisted(spark, dir, queries,
      "vec_id", "embedding", k, nProbe = np)
    def triples(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Int]("rk"))).toSet
    assert(triples(atStored) == triples(explicit))
    // target-1.0 calibration over a spilled layout really is exhaustive
    val truth = AnnQuality.groundTruth(corpus, queries, "vec_id",
      "embedding", k)
    assert(AnnQuality.recallAtK(atStored, truth, k) == 1.0)
    // an uncalibrated index at -1 falls back to the fixed fraction
    val plain = java.nio.file.Files.createTempDirectory("cal-none").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding", 8, plain)
    val fallback = Similarity.ivfSearchPersisted(spark, plain, queries,
      "vec_id", "embedding", k, nProbe = -1)
    val fixed = Similarity.ivfSearchPersisted(spark, plain, queries,
      "vec_id", "embedding", k, nProbe = Similarity.autoNProbe(8))
    assert(triples(fallback) == triples(fixed))
    // the -1 contract holds on the RADIUS path too (no silent empties)
    val rad = Similarity.ivfRadiusSearchPersisted(spark, dir, queries,
      "vec_id", "embedding", minCosine = 0.5, nProbe = -1)
    assert(rad.count() > 0L)
    // a REBUILD clears the stored calibration: the marker was measured
    // against lists that no longer exist
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding", 4, dir)
    assert(Similarity.storedNProbe(spark, dir).isEmpty)
    // only -1 is the sentinel — a typo'd 0 (or -3) fails loudly instead
    // of silently serving at the stored calibration
    intercept[IllegalArgumentException] {
      Similarity.ivfSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k, nProbe = 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfRadiusSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", minCosine = 0.5, nProbe = -3)
    }
  }

  test("autoProbeForFilter: width follows measured selectivity exactly, " +
      "full-depth on no-match predicates, distinct ids under spill, and " +
      "the widened filtered search equals brute force over the matches") {
    val k = 3
    val dir = java.nio.file.Files.createTempDirectory("autoprobe").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding", 8, dir)
    // permissive predicate (all 40 rows): p = clamp(ceil(8·4·3/40)) = 3 —
    // the exact integer formula, not a guess
    assert(Similarity.autoProbeForFilter(spark, dir,
      col("v_id") >= 0, k, base = 2) == 3)
    // the base is a floor: a permissive predicate never narrows below it
    assert(Similarity.autoProbeForFilter(spark, dir,
      col("v_id") >= 0, k, base = 5) == 5)
    // highly selective (2 matches): ceil(96/2) = 48 → clamped to P = 8
    assert(Similarity.autoProbeForFilter(spark, dir,
      col("v_id") % 39 === 0, k, base = 2) == 8)
    // nothing matches → full probe depth (the only honest emptiness proof)
    assert(Similarity.autoProbeForFilter(spark, dir,
      col("v_id") < 0, k, base = 2) == 8)
    // the widened width makes the filtered search EXACT among matches:
    // p = P here, so results equal brute force over the filtered corpus
    val w = col("v_id") % 39 === 0
    val p = Similarity.autoProbeForFilter(spark, dir, w, k, base = 2)
    val got = Similarity.ivfSearchPersisted(spark, dir, queries,
        "vec_id", "embedding", k, nProbe = p, where = Some(w))
      .select("q_id", "n_id", "rk").as[(Long, Long, Int)].collect().toSet
    val want = Similarity.knnBruteForce(
        corpus.filter($"vec_id" % 39 === 0), queries,
        "vec_id", "embedding", k)
      .select("q_id", "n_id", "rk").as[(Long, Long, Int)].collect().toSet
    assert(got == want, s"widened filtered search != brute force: " +
      s"${got.diff(want)} / ${want.diff(got)}")
    // a spilled layout replicates rows — selectivity counts DISTINCT ids,
    // so the width matches the single-assignment index
    val dir2 = java.nio.file.Files.createTempDirectory("autoprobe2").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding", 8, dir2,
      spill = 2)
    assert(Similarity.autoProbeForFilter(spark, dir2,
      col("v_id") >= 0, k, base = 2) == 3)
    // arg guards fail loudly
    intercept[IllegalArgumentException] {
      Similarity.autoProbeForFilter(spark, dir, col("v_id") >= 0, 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.autoProbeForFilter(spark, dir, col("v_id") >= 0, k,
        safety = 0)
    }
  }

  test("annSearch default path (residual + exact re-rank + calibrated " +
      "probes) meets its recall target end-to-end") {
    val k = 5
    val truth = AnnQuality.groundTruth(corpus, queries, "vec_id",
      "embedding", k)
    val res = Similarity.annSearch(corpus, queries, "vec_id", "embedding",
      k, targetRecall = 0.9, dim = 8)
    // rerank output shape: (q_id, n_id, dist, rk), k rows per query
    assert(res.groupBy("q_id").count().select(max("count"))
      .as[Long].head() <= k)
    val r = AnnQuality.recallAtK(res, truth, k)
    assert(r >= 0.9, s"annSearch recall $r < 0.9 target")
  }
}
