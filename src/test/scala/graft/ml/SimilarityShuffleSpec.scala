package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Records the candidate-shuffle behavior of routing kNN top-k through
  * the TopKPerGroup heap operator vs `row_number().over(partitionBy)`.
  *
  * Measured honestly: Spark ≥ 3.5 plans a rank-filter window as
  * `WindowGroupLimitExec(partial) → Exchange → WindowGroupLimit(final) →
  * Window`, so the WINDOW path also caps shuffled rows at
  * ~partitions×groups×k — but only when the `rk <= k` filter sits
  * directly on a supported rank function, and it still pays a full
  * per-partition SORT of every scored candidate on the map side (and
  * again on the reduce side) to feed the group-limit. The heap operator
  * shuffles the same bounded row count with NO sort anywhere (O(n log k)
  * heap updates, O(groups×k) memory) and keeps that shape for arbitrary
  * downstream use where the filter-on-rank pattern wouldn't be
  * recognized. This spec pins both row counts so a regression in either
  * formulation (or a Spark behavior change) surfaces.
  */
class SimilarityShuffleSpec extends SparkSuite {
  import spark.implicits._

  /** Sum of rows written to every shuffle in the executed plan, walking
    * through AQE query stages (exchanges hide inside
    * `ShuffleQueryStageExec` after execution).
    */
  private def shuffledRows(df: DataFrame): Long = {
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Long = {
      val here = p match {
        case s: ShuffleExchangeExec =>
          s.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L)
        case _ => 0L
      }
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(s.plan)
        case _ => 0L
      }
      here + nested + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("TopKPerGroup candidate shuffle stays within the heap bound, no sorts") {
    val corpus = graft.engine.GraftSession
      .table(spark, sfDir, "embeddings") // 64 vectors at sf0.001
    val queries = corpus.filter($"vec_id" < 4)
    val k = 3

    val viaTopK = Similarity.knnBruteForce(corpus, queries,
      "vec_id", "embedding", k)

    // the old formulation, reconstructed verbatim for comparison
    val q = broadcast(queries.select($"vec_id".as("q_id"),
      $"embedding".as("q_vec")))
    val c = corpus.select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"n_id".asc)
    val viaWindow = c.crossJoin(q)
      .filter($"q_id" =!= $"n_id")
      .withColumn("cosine", Similarity.cosine($"q_vec", $"n_vec"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= k)
      .select($"q_id", $"n_id", $"cosine", $"rk")

    // identical results
    val a = viaTopK.select("q_id", "n_id", "rk")
      .as[(Long, Long, Int)].collect().toSet
    val b = viaWindow.select("q_id", "n_id", "rk")
      .as[(Long, Long, Int)].collect().toSet
    assert(a == b)

    // both paths cap shuffled candidate rows at ~partitions×groups×k;
    // assert the heap path's bound, and that it never exceeds the window
    // path (i.e. the rewrite can only reduce shuffle volume)
    val windowRows = shuffledRows(viaWindow)
    val topkRows = shuffledRows(viaTopK)
    val queryN = 4L
    val inputPartitions = corpus.rdd.getNumPartitions.toLong
      .max(spark.sparkContext.defaultParallelism.toLong)
    val bound = inputPartitions * queryN * k + queryN * k // + rk ranking rows
    assert(topkRows > 0L)
    assert(topkRows <= bound, s"heap path shuffled $topkRows > bound $bound")
    assert(topkRows <= windowRows + queryN * k,
      s"topk=$topkRows vs window=$windowRows")

    // the structural win: zero SortExec in the heap plan; the window plan
    // sorts every partition of scored candidates (map AND reduce side)
    def sortCount(df: DataFrame): Int = {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
        val here = p match {
          case _: org.apache.spark.sql.execution.SortExec => 1
          case _ => 0
        }
        val nested = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            walk(a.executedPlan)
          case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            walk(s.plan)
          case _ => 0
        }
        here + nested + p.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    // heap path: the only sort permitted is the tiny rk-ranking window
    // over ≤ queries×k rows AFTER the heaps — never over raw candidates.
    // Locate sorts relative to the TopKPerGroup final: all candidate-side
    // operators are below it, so assert the window plan sorts more.
    assert(sortCount(viaWindow) >= 2, "window plan lost its sorts?")
    assert(sortCount(viaTopK) < sortCount(viaWindow),
      s"heap plan should sort strictly less: ${sortCount(viaTopK)} vs ${sortCount(viaWindow)}")
  }
}
