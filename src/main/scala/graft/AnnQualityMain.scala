package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.ml.{AnnQuality, Similarity}

/** ANN quality harness main: recall@10 of every ANN variant vs exact
  * brute force over the embeddings table, written to `ann_quality.json`
  * and printed as one JSON line. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.AnnQualityMain"
  */
object AnnQualityMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-ann-quality")
    spark.sparkContext.setLogLevel("WARN")
    val e = GraftSession.table(spark, sfDir, "embeddings")
    // deterministic held-out query set: every 10th vector, capped
    val queries = e.filter(col("vec_id") % 10 === 0)
      .orderBy(col("vec_id")).limit(50).cache()
    val k = 10
    val truth = AnnQuality.groundTruth(e, queries, "vec_id", "embedding", k)
    val variants: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "brute" -> (() =>
        Similarity.knnBruteForce(e, queries, "vec_id", "embedding", k)),
      "lsh" -> (() =>
        Similarity.knnLsh(e, queries, "vec_id", "embedding", k, nBits = 4)),
      "lsh_multiprobe" -> (() =>
        Similarity.knnLsh(e, queries, "vec_id", "embedding", k,
          nBits = 4, multiProbe = 2)),
      "ivf" -> (() =>
        Similarity.ivfSearch(e, queries, "vec_id", "embedding", k,
          numCentroids = 8, nProbe = 2)),
      "quantized_int8" -> (() =>
        Similarity.knnQuantized(e, queries, "vec_id", "embedding", k)),
      "projected_16d" -> (() =>
        Similarity.knnProjected(e, queries, "vec_id", "embedding", k,
          inDim = 64, outDim = 16)),
      "twostage" -> (() =>
        Similarity.knnTwoStage(e, queries, "vec_id", "embedding", k,
          candidates = 30, inDim = 64, outDim = 16)),
      "pq" -> (() =>
        Similarity.knnPq(e, queries, "vec_id", "embedding", k)),
      "pq_kmeans" -> (() =>
        Similarity.knnPq(e, queries, "vec_id", "embedding", k,
          refineIters = 3)),
      "ivfpq" -> (() =>
        Similarity.ivfPqSearch(e, queries, "vec_id", "embedding", k)),
      "ivf_kmeans" -> (() =>
        Similarity.ivfSearch(e, queries, "vec_id", "embedding", k,
          numCentroids = 8, nProbe = 2, kmeansIters = 3)),
      "ivfpq_refined" -> (() =>
        Similarity.ivfPqSearch(e, queries, "vec_id", "embedding", k,
          refineIters = 3, coarseIters = 3)))
    val rows = AnnQuality.evaluate(variants, truth, k)
    val json = rows.map { case (n, r, s) =>
      f""""$n":{"recall":$r%.4f,"sec":$s%.3f}"""
    }.mkString(
      s"""{"metric":"ann_recall@$k","sf":"$sfDir","queries":${truth.size},""",
      ",", "}")
    Files.write(Paths.get("ann_quality.json"),
      json.getBytes(StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
