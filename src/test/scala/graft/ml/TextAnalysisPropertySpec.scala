package graft.ml

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Property tests for the corpus-level text operators against independent
  * Scala oracles over randomized corpora. (The per-row kernels have their
  * own pure-JVM property suite in `graft.functions`.)
  */
class TextAnalysisPropertySpec extends SparkSuite {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], iters: Int = 10)(check: T => Unit): Unit =
    (0 until iters).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  private val vocab =
    Vector("alpha", "beta", "gamma", "delta", "rain", "stone", "river")

  private val genCorpus: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 10)
    docs <- Gen.listOfN(n, Gen.chooseNum(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(vocab)).map(_.mkString(" "))))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("hashingFeatures: per-doc tf mass == token count, per-token slot " +
       "stable, repartition-invariant") {
    forAll(genCorpus) { corpus =>
      val df = corpus.toDF("doc_id", "text")
      val dim = 16
      val rows = TextAnalysis.hashingFeatures(df, dim = dim).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("slot"),
          r.getAs[Long]("tf")))
      rows.foreach { case (_, s, tf) =>
        assert(s >= 0 && s < dim); assert(tf >= 1)
      }
      // tf mass per doc equals its whitespace token count; docs with no
      // tokens produce no rows
      val mass = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      val expected = corpus
        .map { case (id, t) => id -> t.split("\\s+").count(_.nonEmpty).toLong }
        .filter(_._2 > 0).toMap
      assert(mass == expected, s"corpus=$corpus")
      // occurrences of one token always land in one slot: per-doc row
      // count is bounded by its distinct-token count
      val perDocRows = rows.groupBy(_._1).view.mapValues(_.length).toMap
      corpus.foreach { case (id, t) =>
        val distinct = t.split("\\s+").filter(_.nonEmpty).distinct.length
        perDocRows.get(id).foreach(n => assert(n <= math.min(distinct, dim)))
      }
      // physical layout must not change the result
      val repart = TextAnalysis.hashingFeatures(df.repartition(7), dim = dim)
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("slot"),
          r.getAs[Long]("tf"))).toSet
      assert(repart == rows.toSet)
    }
  }
}
