package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Hybrid lexical+vector retrieval ([[Hybrid]]): RRF arithmetic on the
  * integer grid, leg-consistency of the ad-hoc fusion, persisted-path
  * parity at full probe depth, and per-index deletion visibility.
  */
class HybridSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark streams join tables with filters"),
    (1L, "a join of two streams under a filter"),
    (2L, "gardens bloom in spring rain"),
    (3L, "filter pushdown and join reorder in the planner"),
    (4L, "rain on the window pane"),
    (5L, "stream processing with stateful joins"),
    (6L, "completely unrelated prose about cooking"),
    (7L, "the filter keeps the stream clean"))
    .toDF("doc_id", "text")

  // embeddings: cluster ids 0,1,3,5,7 near each other, 2,4,6 elsewhere
  private val embeddings = (0L until 8L).map { i =>
    val base = if (Set(0L, 1L, 3L, 5L, 7L).contains(i)) 1.0f else -1.0f
    (i, Array.tabulate(8)(d => base * (1.0f + 0.01f * (i * 3 + d) % 7)))
  }.toDF("vec_id", "embedding")

  private val terms = Seq("stream", "join", "filter")

  test("rrfFuse2: grid arithmetic and missing-leg handling, by hand") {
    val lex = Seq((10L, 1L), (11L, 2L)).toDF("doc_id", "rk")
    val vec = Seq((11L, 1L), (12L, 2L)).toDF("doc_id", "rk")
    val out = Hybrid.rrfFuse2(lex, vec, "doc_id", k = 10)
      .orderBy($"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // contributions: rank1 → floor(1e6/61)=16393, rank2 → floor(1e6/62)=16129
    assert(out.toSeq == Seq(
      (11L, 16393L + 16129L, 2L, 1L, 1L), // both legs fused
      (10L, 16393L, 1L, 0L, 2L),          // lex-only survivor
      (12L, 16129L, 0L, 2L, 3L)))         // vec-only survivor
  }

  test("rrfFuseN: three weighted legs by hand; rrfFuse2 delegation keeps " +
      "the classic column names") {
    val a = Seq((10L, 1L), (11L, 2L)).toDF("doc_id", "rk")
    val b = Seq((11L, 1L)).toDF("doc_id", "rk")
    val p = Seq((12L, 1L), (10L, 2L)).toDF("doc_id", "rk")
    val out = Hybrid.rrfFuseN(Seq(a, b, p), "doc_id", k = 10,
        weights = Seq(1.0, 1.0, 0.5))
      .orderBy($"rk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // contributions: w=1: rank1 16393, rank2 16129; w=0.5: rank1
    // floor(5e5/61)=8196, rank2 floor(5e5/62)=8064
    assert(out.toSeq == Seq(
      (11L, 16129L + 16393L, 2L, 1L, 0L, 1L), // legs a + b = 32522
      (10L, 16393L + 8064L, 1L, 0L, 2L, 2L),  // legs a + prior = 24457
      (12L, 8196L, 0L, 0L, 1L, 3L)))          // prior-only survivor
    // delegation: same fixture through rrfFuse2 keeps lex_rk/vec_rk
    val two = Hybrid.rrfFuse2(a, b, "doc_id", k = 10)
    assert(two.columns.toSeq ==
      Seq("doc_id", "rrf_micro", "lex_rk", "vec_rk", "rk"))
  }

  test("hybridSearch equals a by-hand fusion of its two legs") {
    val fused = Hybrid.hybridSearch(docs, "doc_id", "text",
        embeddings, "vec_id", "embedding", terms, queryVecId = 0L,
        kLex = 5, kVec = 5, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // recompute the legs independently
    val lexTop = TextRank.bm25Scores(docs, "doc_id", "text", terms)
      .orderBy($"score_micro".desc, $"doc_id".asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val vecTop = Similarity.knnBruteForce(embeddings,
        embeddings.filter($"vec_id" === 0L), "vec_id", "embedding", 5)
      .orderBy($"rk").collect().map(_.getLong(1)).toSeq
    def c(r: Long) = math.floor(1000000.0 / (60.0 + r)).toLong
    val lexRk = lexTop.zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
    val vecRk = vecTop.zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
    val ids = (lexRk.keySet ++ vecRk.keySet).toSeq
    val expect = ids.map { d =>
      (d, lexRk.get(d).map(c).getOrElse(0L) + vecRk.get(d).map(c).getOrElse(0L),
        lexRk.getOrElse(d, 0L), vecRk.getOrElse(d, 0L))
    }.sortBy { case (d, s, _, _) => (-s, d) }
      .zipWithIndex.map { case ((d, s, l, v), i) => (d, s, l, v, i + 1L) }
    assert(fused == expect)
  }

  test("hybrid served from two STREAMING-MAINTAINED indexes (text + " +
      "IVF-PQ) with a CDC delete equals the by-hand fusion over the " +
      "live corpus") {
    import graft.streaming.StreamOps
    val tIdx = java.nio.file.Files.createTempDirectory("hybs-txt").toString
    val aIdx = java.nio.file.Files.createTempDirectory("hybs-ann").toString
    // three micro-batches per index: bootstrap, append, CDC-delete of
    // doc/vec 1 arriving together with fresh adds
    val dBatches = Seq(
      docs.filter($"doc_id" < 3).withColumn("op", lit("add")),
      docs.filter($"doc_id" >= 3 && $"doc_id" < 6)
        .withColumn("op", lit("add")),
      docs.filter($"doc_id" >= 6).withColumn("op", lit("add"))
        .unionByName(docs.filter($"doc_id" === 1L)
          .withColumn("op", lit("delete"))))
    val eBatches = Seq(
      embeddings.filter($"vec_id" < 3).withColumn("op", lit("add")),
      embeddings.filter($"vec_id" >= 3 && $"vec_id" < 6)
        .withColumn("op", lit("add")),
      embeddings.filter($"vec_id" >= 6).withColumn("op", lit("add"))
        .unionByName(embeddings.filter($"vec_id" === 1L)
          .withColumn("op", lit("delete"))))
    dBatches.zipWithIndex.foreach { case (b, i) =>
      StreamOps.processTextIndexBatch(b, i.toLong, "doc_id", "text",
        tIdx, numBuckets = 8, opCol = Some("op")) }
    eBatches.zipWithIndex.foreach { case (b, i) =>
      StreamOps.processAnnIndexBatch(b, i.toLong, "vec_id", "embedding",
        aIdx, numCentroids = 2, numSubspaces = 4, pqCentroids = 2,
        dim = 8, residual = false, opCol = Some("op")) }
    val liveEmb = embeddings.filter($"vec_id" =!= 1L)
    val q = embeddings.filter($"vec_id" === 0L)
    // exact vector leg: full probes + full-depth exact rerank against
    // the live raw vectors (the PQ index stores codes only)
    val fused = Hybrid.hybridSearchPersistedPq(spark, tIdx, aIdx, terms,
        q, "vec_id", "embedding", nProbe = 2, kLex = 5, kVec = 5, k = 8,
        rerank = 8, rerankCorpus = Some(liveEmb))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(!fused.exists(_._1 == 1L), "CDC-deleted doc in fused result")
    // expected: BM25 ranks over live docs (ad-hoc) + exact L2 ranks over
    // live embeddings, RRF-fused by hand
    val liveDocs = docs.filter($"doc_id" =!= 1L)
    val lexTop = TextRank.bm25Scores(liveDocs, "doc_id", "text", terms)
      .orderBy($"score_micro".desc, $"doc_id".asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val qv = q.collect()(0).getAs[Seq[Float]]("embedding").toArray
    val vecTop = liveEmb.filter($"vec_id" =!= 0L).collect()
      .map { r =>
        val v = r.getAs[Seq[Float]]("embedding").toArray
        val d = v.indices.map(i => (qv(i) - v(i)).toDouble)
          .map(x => x * x).sum
        (r.getLong(0), d)
      }.sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSeq
    def c(r: Long) = math.floor(1000000.0 / (60.0 + r)).toLong
    val lexRk = lexTop.zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
    val vecRk = vecTop.zipWithIndex.map { case (d, i) => d -> (i + 1L) }.toMap
    val expect = (lexRk.keySet ++ vecRk.keySet).toSeq.map { d =>
      (d, lexRk.get(d).map(c).getOrElse(0L) + vecRk.get(d).map(c).getOrElse(0L),
        lexRk.getOrElse(d, 0L), vecRk.getOrElse(d, 0L))
    }.sortBy { case (d, s, _, _) => (-s, d) }
      .zipWithIndex.map { case ((d, s, l, v), i) => (d, s, l, v, i + 1L) }
    assert(fused == expect)
  }

  test("filtered hybrid: every fused result satisfies the predicate and " +
      "equals fusing the two filtered legs") {
    val tIdx = java.nio.file.Files.createTempDirectory("hybf-txt").toString
    val aIdx = java.nio.file.Files.createTempDirectory("hybf-ann").toString
    val tagged = docs.withColumn("grp", (col("doc_id") % 2).cast("int"))
    TextIndex.saveTextIndex(tagged, "doc_id", "text", tIdx, numBuckets = 8,
      attrCols = Seq("grp"))
    val embTagged = embeddings.withColumn("grp",
      (col("vec_id") % 2).cast("int"))
    Similarity.saveIvfIndex(embTagged, "vec_id", "embedding",
      numCentroids = 2, aIdx, attrCols = Seq("grp"))
    val q = embeddings.filter($"vec_id" === 0L)
    val pred = col("grp") === 1
    val fused = Hybrid.hybridSearchPersisted(spark, tIdx, aIdx, terms, q,
        "vec_id", "embedding", nProbe = 2, kLex = 5, kVec = 5, k = 8,
        where = Some(pred))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(fused.nonEmpty)
    assert(fused.forall(_._1 % 2 == 1), s"non-matching doc in $fused")
    // leg-consistency: fusing the two separately-filtered legs agrees
    val lex = TextIndex.bm25SearchPersisted(spark, tIdx, terms, 5,
        where = Some(pred)).select($"doc_id", $"rk")
    val vec = Similarity.ivfSearchPersisted(spark, aIdx, q, "vec_id",
        "embedding", k = 5, nProbe = 2, where = Some(pred))
      .select($"n_id".as("doc_id"), $"rk")
    val manual = Hybrid.rrfFuse2(lex, vec, "doc_id", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(fused == manual)
  }

  test("batched hybrid: per-query slices equal the single-query batch; " +
      "a lex-only query fuses with rank-0 vec leg") {
    val tIdx = java.nio.file.Files.createTempDirectory("hybb-txt").toString
    val aIdx = java.nio.file.Files.createTempDirectory("hybb-ann").toString
    TextIndex.saveTextIndex(docs, "doc_id", "text", tIdx, numBuckets = 8)
    Similarity.saveIvfIndex(embeddings, "vec_id", "embedding",
      numCentroids = 2, aIdx)
    val qt = Seq((0L, "stream"), (0L, "join"), (0L, "filter"),
      (2L, "rain"), (4L, "gardens")).toDF("q_id", "term")
    def run(qsel: Long => Boolean, tsel: Long => Boolean) =
      Hybrid.hybridSearchPersistedBatch(spark, tIdx, aIdx,
          qt.filter($"q_id".isin(Seq(0L, 2L, 4L).filter(tsel): _*)),
          embeddings.filter($"vec_id".isin(Seq(0L, 2L).filter(qsel): _*)),
          "vec_id", "embedding", nProbe = 2, kLex = 5, kVec = 5, k = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq.sorted
    // full batch: queries 0 and 2 have both legs, 4 is lex-only
    val full = run(_ => true, _ => true)
    // amortization must not change answers: each query alone reproduces
    // exactly its slice of the batch (df/N stats are corpus-global, so
    // the lex scores don't depend on the batch composition)
    for (q <- Seq(0L, 2L, 4L)) {
      val alone = run(_ == q, _ == q)
      assert(alone == full.filter(_._1 == q),
        s"query $q batch slice != single-query run")
    }
    // the lex-only query (4) exists with vec_rk = 0 on every row
    val q4 = full.filter(_._1 == 4L)
    assert(q4.nonEmpty && q4.forall(_._5 == 0L))
    // both-leg query rows carry at least one non-zero leg rank
    assert(full.filter(_._1 == 0L).exists(_._5 > 0L))
  }

  test("hybridSearchPersistedWithPrior at full probe depth equals the " +
      "ad-hoc three-leg blend; prior-only docs can enter the fusion") {
    val tIdx = java.nio.file.Files.createTempDirectory("hybp-txt").toString
    val aIdx = java.nio.file.Files.createTempDirectory("hybp-ann").toString
    TextIndex.saveTextIndex(docs, "doc_id", "text", tIdx, numBuckets = 8)
    Similarity.saveIvfIndex(embeddings, "vec_id", "embedding",
      numCentroids = 2, aIdx)
    // prior: a bounded recency-style list — doc 6 prior-only (matches
    // neither leg's top-k), docs 2 and 0 re-weighted
    val prior = Seq((6L, 1L), (2L, 2L), (0L, 3L)).toDF("doc_id", "rk")
    val q = embeddings.filter($"vec_id" === 0L)
    val persisted = Hybrid.hybridSearchPersistedWithPrior(spark, tIdx,
        aIdx, terms, q, "vec_id", "embedding", prior, nProbe = 2,
        kLex = 5, kVec = 5, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val adhoc = Hybrid.hybridSearchWithPrior(docs, "doc_id", "text",
        embeddings, "vec_id", "embedding", terms, queryVecId = 0L,
        prior, kLex = 5, kVec = 5, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(persisted == adhoc)
    // doc 6 ("cooking") misses the lexical leg entirely; the prior leg
    // carries it at rank 1 (kVec = 5 of 7 candidates does reach it)
    val d6 = persisted.filter(_._1 == 6L)
    assert(d6.size == 1 && d6.head._3 == 0L && d6.head._5 == 1L)
  }

  test("hybridSearchPersisted at full probe depth equals the ad-hoc " +
      "fusion; per-index deletion hides a doc from the fused result") {
    val tIdx = java.nio.file.Files.createTempDirectory("hyb-txt").toString
    val aIdx = java.nio.file.Files.createTempDirectory("hyb-ann").toString
    TextIndex.saveTextIndex(docs, "doc_id", "text", tIdx, numBuckets = 8)
    Similarity.saveIvfIndex(embeddings, "vec_id", "embedding",
      numCentroids = 2, aIdx)
    val q = embeddings.filter($"vec_id" === 0L)
    def persisted() = Hybrid.hybridSearchPersisted(spark, tIdx, aIdx,
        terms, q, "vec_id", "embedding", nProbe = 2,
        kLex = 5, kVec = 5, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    val adhoc = Hybrid.hybridSearch(docs, "doc_id", "text",
        embeddings, "vec_id", "embedding", terms, queryVecId = 0L,
        kLex = 5, kVec = 5, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(persisted() == adhoc)
    // takedown of doc 1 across both indexes: it must leave the fusion,
    // and surviving ranks re-derive from the live legs
    TextIndex.deleteFromTextIndex(spark, tIdx, Seq(1L).toDF("doc_id"),
      "doc_id")
    Similarity.deleteFromAnnIndex(spark, aIdx, Seq(1L).toDF("vec_id"),
      "vec_id")
    val after = persisted()
    assert(!after.exists(_._1 == 1L), "deleted doc still in fused result")
    val live = docs.filter($"doc_id" =!= 1L)
    val liveEmb = embeddings.filter($"vec_id" =!= 1L)
    val adhocLive = Hybrid.hybridSearch(live, "doc_id", "text",
        liveEmb, "vec_id", "embedding", terms, queryVecId = 0L,
        kLex = 5, kVec = 5, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(after == adhocLive)
  }
}
