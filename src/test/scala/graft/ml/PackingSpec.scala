package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSuite

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("concatChunks: exclusive prefix offsets, pack ids, boundary flags") {
    // tokens: 3, 4, 5 with budget 6 -> offsets 0, 3, 7
    // doc 1: [0,3) pack 0; doc 2: [3,7) crosses the 6 boundary; doc 3: [7,12) pack 1..1
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 5L)).toDF("doc_id", "n")
    val r = Packing.concatChunks(docs, "doc_id", col("n"), budgetTokens = 6)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    assert(r.toSeq == Seq((1L, 0L, 0L, false), (2L, 3L, 0L, true), (3L, 7L, 1L, false)))
  }

  test("concatChunks offsets are independent of input partitioning") {
    val docs = (0L until 500L).map(i => (i, (i % 7) + 1)).toDF("doc_id", "n")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.concatChunks(df, "doc_id", col("n"), budgetTokens = 64)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val a = run(docs.repartition(1))
    val b = run(docs.repartition(13, col("n"))) // arbitrary reshuffle
    assert(a == b)
    // last doc's offset equals the sum of all earlier token counts
    val total = (0L until 499L).map(i => (i % 7) + 1).sum
    assert(a(499L)._1 == total)
  }
}
