package graft.ml

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Property tests for the sampling family: the laws every op claims
  * (determinism under repartitioning, append-stability, partition/
  * completeness, monotone rates) checked over randomized id sets instead
  * of hand-picked examples.
  */
class SamplingPropertySpec extends SparkSuite {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], iters: Int = 10)(check: T => Unit): Unit =
    (0 until iters).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  /** Random id sets with gaps/duplicates-free, plus a source label. */
  private val genIds: Gen[List[Long]] = for {
    n <- Gen.chooseNum(1, 60)
    ids <- Gen.listOfN(n, Gen.chooseNum(0L, 5000L))
  } yield ids.distinct

  private def frame(ids: List[Long]) =
    ids.map(i => (i, s"src${i % 3}")).toDF("id", "source")

  test("splitColumn partitions: every row in exactly one split, stable under repartition") {
    forAll(genIds) { ids =>
      val df = frame(ids)
      val assigned = df.withColumn("split",
        Sampling.splitColumn(col("id"), valFrac = 0.2, testFrac = 0.1))
      val rows = assigned.collect()
      assert(rows.length == ids.length) // total preservation
      assert(rows.forall(r =>
        Set("train", "val", "test")(r.getAs[String]("split"))))
      // identical assignment after a shuffle-inducing repartition
      val again = df.repartition(7).withColumn("split",
          Sampling.splitColumn(col("id"), 0.2, 0.1))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split"))
        .toMap
      rows.foreach(r =>
        assert(again(r.getAs[Long]("id")) == r.getAs[String]("split")))
    }
  }

  test("hashSample: monotone in rate, exact at 0 and 1, append-stable") {
    forAll(genIds) { ids =>
      val df = frame(ids)
      def kept(rate: Double): Set[Long] =
        Sampling.hashSample(df, "id", rate).select("id").collect()
          .map(_.getLong(0)).toSet
      assert(kept(0.0).isEmpty)
      assert(kept(1.0) == ids.toSet)
      val k3 = kept(0.3); val k7 = kept(0.7)
      assert(k3.subsetOf(k7)) // raising the rate only ADDS rows
      // append stability: sampling a superset never flips existing rows
      val extra = frame(ids.map(_ + 10000L))
      val sup = Sampling.hashSample(df.unionByName(extra), "id", 0.3)
        .select("id").collect().map(_.getLong(0)).toSet
      assert((sup & ids.toSet) == k3)
    }
  }

  test("mixtureSample: per-row copy count equals floor(w) or ceil(w)") {
    forAll(genIds) { ids =>
      val df = frame(ids)
      val weights = Map("src0" -> 2.3, "src1" -> 0.4, "src2" -> 1.0)
      val out = Sampling.mixtureSample(df, "id", "source", weights)
        .groupBy("id", "source").agg(count(lit(1)).as("n"),
          max(col("epoch")).as("maxe"))
        .collect()
      out.foreach { r =>
        val w = weights(r.getAs[String]("source"))
        val n = r.getAs[Long]("n")
        assert(n == math.floor(w).toLong || n == math.ceil(w).toLong,
          s"id=${r.getAs[Long]("id")} w=$w n=$n")
        assert(r.getAs[Long]("maxe") == n) // epochs are 1..n
      }
      // weight<1 sources: every surviving row appears exactly once
      val src1 = out.filter(_.getAs[String]("source") == "src1")
      assert(src1.forall(_.getAs[Long]("n") == 1L))
    }
  }

  test("perGroupSample: exactly min(k, |group|) rows, deterministic") {
    forAll(genIds) { ids =>
      val df = frame(ids)
      val k = 3
      val out = Sampling.perGroupSample(df, "source", "id", k)
      val sizes = out.groupBy("source").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
      val want = ids.groupBy(i => s"src${i % 3}").view
        .mapValues(g => math.min(k, g.size).toLong).toMap
      assert(sizes == want)
      val again = Sampling.perGroupSample(df.repartition(5), "source", "id", k)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
    }
  }

  test("weightedSample: k largest priorities, zero/negative weights excluded") {
    forAll(genIds, iters = 8) { ids =>
      val df = ids.map(i => (i, (i % 5).toDouble - 1.0)) // weights -1..3
        .toDF("id", "w")
      val k = 4
      val got = Sampling.weightedSample(df, "id", "w", k)
        .select("id").collect().map(_.getLong(0)).toSet
      val eligible = ids.filter(i => (i % 5).toDouble - 1.0 > 0)
      assert(got.size == math.min(k, eligible.size))
      assert(got.subsetOf(eligible.toSet))
      // determinism under repartition
      val again = Sampling.weightedSample(df.repartition(9), "id", "w", k)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(again == got)
    }
  }
}
