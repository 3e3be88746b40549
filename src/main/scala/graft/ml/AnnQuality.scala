package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall measurement for the ANN family: every approximate variant scored
  * against exact brute-force ground truth on the same corpus/queries —
  * recall@k is THE quality axis of an ANN tradeoff (latency without recall
  * is meaningless), and none of the per-variant correctness oracles capture
  * it because each oracle replicates its own variant's approximation.
  *
  * recall@k = mean over queries of |variant top-k ∩ exact top-k| / k.
  * Variants may legitimately return fewer than k rows for a query (bucket
  * misses); the numerator just counts what they found.
  */
object AnnQuality {

  /** Ground-truth neighbor sets from [[Similarity.knnBruteForce]]. */
  def groundTruth(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int): Map[Long, Set[Long]] =
    neighborSets(
      Similarity.knnBruteForce(corpus, queries, idCol, vecCol, k))

  /** (q_id → neighbor ids) of any (q_id, n_id)-shaped result. */
  def neighborSets(result: DataFrame): Map[Long, Set[Long]] =
    result.select(col("q_id").cast("long"), col("n_id").cast("long"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

  /** Mean recall@k of `result` against `truth`. Queries absent from the
    * result (nothing found) contribute 0.
    */
  def recallAtK(result: DataFrame, truth: Map[Long, Set[Long]],
                k: Int): Double = {
    val pred = neighborSets(result)
    if (truth.isEmpty) return 1.0
    truth.map { case (q, t) =>
      pred.getOrElse(q, Set.empty).count(t).toDouble / k
    }.sum / truth.size
  }

  /** Evaluate a set of named variants: recall@k + wall seconds each
    * (timing includes the variant's own model/index build — this harness
    * measures QUALITY; the latency bench's build/search split is the
    * timing authority).
    */
  def evaluate(variants: Seq[(String, () => DataFrame)],
               truth: Map[Long, Set[Long]], k: Int)
      : Seq[(String, Double, Double)] =
    variants.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val r = recallAtK(fn(), truth, k)
      (name, r, (System.nanoTime() - t0) / 1e9)
    }
}
