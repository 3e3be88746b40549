package graft.ml

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkSuite

/** The persisted ANN indexes' IO contract: a search with `nProbe` lists
  * must OPEN only the probed centroid partitions — at 100 TB this is the
  * difference between scanning the whole index and nProbe/numCentroids
  * of it. Spark's dynamic partition pruning does NOT hold here (the
  * probe subquery's window+crossJoin makes its broadcast non-reusable
  * and the DPP filter falls back to a no-op — scan metrics showed every
  * partition read), so the readers collect the tiny probe set and push a
  * STATIC IN-list partition filter; these specs pin that contract with
  * the scan's own metrics.
  */
class PersistedPruningSpec extends SparkSuite {
  import spark.implicits._

  private def indexScanMetrics(df: org.apache.spark.sql.DataFrame,
                               pathPart: String): (Long, Long) = {
    df.collect()
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
      case s: QueryStageExec        => nodes(s.plan)
      case _                        => p +: p.children.flatMap(nodes)
    }
    val scans = nodes(df.queryExecution.executedPlan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains(pathPart)) => f
    }
    assert(scans.nonEmpty, "index scan not found in executed plan")
    val m = scans.head.metrics
    (m("numPartitions").value, m("numOutputRows").value)
  }

  private val corpus = (0L until 64L).map { i =>
    (i, Array.tabulate(4)(d => ((i * 7 + d * 3) % 13 - 6).toFloat))
  }.toDF("vec_id", "embedding")

  test("persisted IVF search opens only the probed partitions") {
    val dir = java.nio.file.Files.createTempDirectory("prune-ivf").toString
    Similarity.saveIvfIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, dir)
    val q = corpus.filter($"vec_id" < 2)
    val res = Similarity.ivfSearchPersisted(spark, dir, q, "vec_id",
      "embedding", k = 3, nProbe = 2)
    val (parts, rows) = indexScanMetrics(res, "prune-ivf")
    // 2 queries x 2 probes = at most 4 of the 8 lists opened
    assert(parts <= 4, s"opened $parts partitions, expected <= 4 of 8")
    assert(rows < 64, s"scanned $rows of 64 index rows — no pruning")
  }

  test("persisted IVF-PQ search opens only the probed partitions") {
    val dir = java.nio.file.Files.createTempDirectory("prune-ivfpq").toString
    Similarity.saveIvfPqIndex(corpus, "vec_id", "embedding",
      numCentroids = 8, path = dir, numSubspaces = 2, pqCentroids = 4,
      dim = 4, residual = true)
    val q = corpus.filter($"vec_id" < 2)
    val res = Similarity.ivfPqSearchPersisted(spark, dir, q, "vec_id",
      "embedding", k = 3, nProbe = 2)
    val (parts, rows) = indexScanMetrics(res, "prune-ivfpq")
    assert(parts <= 4, s"opened $parts partitions, expected <= 4 of 8")
    assert(rows < 64, s"scanned $rows of 64 index rows — no pruning")
  }

  test("persisted LSH search opens only the probed bucket partitions") {
    val dir = java.nio.file.Files.createTempDirectory("prune-lsh").toString
    Similarity.saveLshIndex(corpus, "vec_id", "embedding", dir, nBits = 4)
    val q = corpus.filter($"vec_id" < 2)
    // 2 queries x (1 + 1 probe) = at most 4 of the up-to-16 buckets
    val res = Similarity.lshSearchPersisted(spark, dir, q, "vec_id",
      "embedding", k = 3, multiProbe = 1)
    val (parts, rows) = indexScanMetrics(res, "prune-lsh")
    assert(parts <= 4, s"opened $parts bucket partitions, expected <= 4")
    assert(rows < 64, s"scanned $rows of 64 index rows — no pruning")
  }
}
