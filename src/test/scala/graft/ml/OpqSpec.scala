package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** OPQ-style learned rotation ([[Similarity.opqRotation]] /
  * [[Similarity.knnPqOpq]]): parametric OPQ = PCA eigenbasis + balanced
  * eigenvalue allocation. The rotation must be orthonormal (so every
  * L2-based guarantee of the PQ stack survives it), deterministic, and
  * actually earn its keep on variance-concentrated data.
  */
class OpqSpec extends SparkSuite {
  import spark.implicits._

  // anisotropic corpus: dims 0-1 carry almost all variance, dims 2-3 are
  // near-constant — the shape where axis-aligned subspaces ({0,1} | {2,3})
  // put all information in one codebook and OPQ's allocation splits it
  private def aniso(n: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val big = (i % 17).toFloat - 8f
      val big2 = ((i * 7) % 13).toFloat - 6f
      (i.toLong, Array(10f * big, 10f * big2, 0.01f * (i % 3), 0.01f * (i % 2)))
    }

  private val vecs = aniso(60).toDF("vec_id", "embedding")

  test("rotation is orthonormal and deterministic") {
    val rot = Similarity.opqRotation(vecs, "vec_id", "embedding",
      dim = 4, numSubspaces = 2)
    assert(rot.length == 4 && rot.forall(_.length == 4))
    for (r <- 0 until 4; c <- 0 until 4) {
      val dot = (0 until 4).map(i => rot(r)(i) * rot(c)(i)).sum
      val want = if (r == c) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"R·Rᵀ[$r][$c] = $dot")
    }
    val rot2 = Similarity.opqRotation(vecs, "vec_id", "embedding",
      dim = 4, numSubspaces = 2)
    assert(rot == rot2, "same corpus must yield the same rotation")
  }

  test("rotation preserves pairwise L2 distances") {
    val rot = Similarity.opqRotation(vecs, "vec_id", "embedding",
      dim = 4, numSubspaces = 2)
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    val rotated = Similarity.opqRotate(vecs, "embedding", rot)
      .as[(Long, Seq[Double])].collect().toMap
    def l2sq(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- Seq(0L, 1L, 7L); j <- Seq(3L, 11L, 42L)) {
      val orig = l2sq(raw(i).map(_.toDouble).toSeq, raw(j).map(_.toDouble).toSeq)
      val rr = l2sq(rotated(i), rotated(j))
      assert(math.abs(orig - rr) < 1e-6 * (1.0 + orig), s"pair ($i,$j)")
    }
  }

  test("balanced allocation splits the variance across subspaces") {
    // with dims (100σ, 100σ, ~0, ~0) and 2 subspaces of width 2, each
    // subspace must receive exactly one high-variance direction — the
    // allocation that makes both codebooks informative
    val rot = Similarity.opqRotation(vecs, "vec_id", "embedding",
      dim = 4, numSubspaces = 2)
    val rotated = Similarity.opqRotate(vecs, "embedding", rot)
      .as[(Long, Seq[Double])].collect().map(_._2)
    def variance(d: Int): Double = {
      val xs = rotated.map(_(d))
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val sub0 = variance(0) + variance(1)
    val sub1 = variance(2) + variance(3)
    val ratio = math.max(sub0, sub1) / math.min(sub0, sub1)
    assert(ratio < 3.0,
      s"subspace variance must be balanced, got $sub0 vs $sub1")
    // the UNROTATED axis split is maximally unbalanced on this corpus —
    // the property OPQ exists to fix
    val rawCols = vecs.as[(Long, Array[Float])].collect().map(_._2)
    def rawVar(d: Int): Double = {
      val xs = rawCols.map(_(d).toDouble)
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val rawRatio = (rawVar(0) + rawVar(1)) / (rawVar(2) + rawVar(3))
    assert(rawRatio > 100.0, s"test corpus must be anisotropic: $rawRatio")
  }

  test("full-depth rerank through the rotation is exact (L2 guarantees survive)") {
    val queries = vecs.filter($"vec_id" < 2)
    val rr = Similarity.knnPqOpq(vecs, queries, "vec_id", "embedding",
        k = 3, numSubspaces = 2, numCentroids = 4, dim = 4,
        refineIters = 2, rerank = 60)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"),
        r.getAs[Int]("rk"))).toSet
    val corpus = aniso(60)
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val truth = corpus.filter(_._1 < 2).flatMap { case (qid, qv) =>
      corpus.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, l2sq(qv, nv)) }
        .sortBy { case (nid, d) => (d, nid) }.take(3)
        .zipWithIndex.map { case ((nid, _), i) => (qid, nid, i + 1) }
    }.toSet
    assert(rr == truth)
  }

  test("OPQ beats axis-aligned PQ on variance-concentrated data") {
    // both high-variance dims land in subspace 0 under the axis split, so
    // plain PQ's second codebook encodes noise; OPQ reallocates — recall
    // against exact L2 truth must improve (this is the keep/drop data for
    // the harness, reproduced in miniature)
    val queries = vecs.filter($"vec_id" % 10 === 0)
    val corpus = aniso(60)
    def l2sq(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      s
    }
    val k = 5
    val truth = corpus.filter(_._1 % 10 == 0).map { case (qid, qv) =>
      qid -> corpus.filter(_._1 != qid)
        .map { case (nid, nv) => (nid, l2sq(qv, nv)) }
        .sortBy { case (nid, d) => (d, nid) }.take(k).map(_._1).toSet
    }.toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().groupBy(_.getAs[Long]("q_id"))
        .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
      truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).count(t).toDouble / k
      }.sum / truth.size
    }
    val plain = recall(Similarity.knnPq(vecs, queries, "vec_id",
      "embedding", k, numSubspaces = 2, numCentroids = 8, dim = 4,
      refineIters = 3))
    val opq = recall(Similarity.knnPqOpq(vecs, queries, "vec_id",
      "embedding", k, numSubspaces = 2, numCentroids = 8, dim = 4,
      refineIters = 3))
    assert(opq > plain,
      s"OPQ recall $opq must beat axis-aligned $plain on anisotropic data")
  }
}
