package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HYBRID retrieval: fuse a lexical (BM25) ranking with a vector
  * (embedding-cosine) ranking of the same corpus — the standard
  * two-tower search shape (keyword recall + semantic recall), fused by
  * RECIPROCAL RANK FUSION (Cormack et al., SIGIR 2009):
  *
  *   rrf(d) = Σ_lists w · 1/(kk + rank_list(d)),   kk = 60 by default.
  *
  * RRF over raw-score mixing because ranks are scale-free: BM25 scores
  * and cosines live on incomparable scales, and any min-max/z-score
  * normalization is corpus-dependent and float-fragile. Ranks are small
  * integers; each list's contribution is floored onto the 10⁻⁶ grid
  * BEFORE the sum (`floor(w·10⁶/(kk+rk))`), so the fused score is an
  * exact BIGINT in any evaluation order — the house convention for
  * cross-engine determinism.
  *
  * Scale shape: both legs are top-k retrievals (index-served in the
  * persisted variant); fusion itself touches ≤ kLex + kVec rows — a
  * broadcast-trivial join regardless of corpus size. Nothing here ever
  * re-scans the corpus.
  */
object Hybrid {

  /** One leg's fused contribution on the integer micro-grid. */
  private def contrib(rk: Column, kk: Int, w: Double) =
    coalesce(
      floor(lit(w * 1000000.0) / (lit(kk.toDouble) + rk.cast("double")))
        .cast("long"),
      lit(0L))

  /** Fuse N rank lists by weighted RRF — each leg `(idCol, rk)` with
    * 1-based ranks (anything beyond that leg's top-k must already be
    * absent), weight w_i. ONE union + ONE hash aggregation regardless
    * of N — never a chain of N−1 outer joins — so at scale the fusion
    * is a single keyed shuffle of Σ|leg_i| ≤ Σ k_i rows with map-side
    * partials. Returns (idCol, rrf_micro, leg0_rk … leg{N−1}_rk, rk ≤
    * k); a doc absent from leg i carries leg{i}_rk = 0 (RRF's standard
    * missing-rank treatment), ties broken by id.
    */
  def rrfFuseN(legs: Seq[DataFrame], idCol: String, k: Int,
               kk: Int = 60, weights: Seq[Double] = Nil): DataFrame = {
    require(legs.nonEmpty, "at least one leg")
    val ws = if (weights.isEmpty) Seq.fill(legs.size)(1.0) else weights
    require(ws.size == legs.size, "one weight per leg")
    val tagged = legs.zip(ws).zipWithIndex.map { case ((df, w), i) =>
      df.select(col(idCol).as("_id"), col("rk").cast("long").as("_rk"),
        lit(i).as("_leg"), contrib(col("rk"), kk, w).as("_c"))
    }.reduce(_ unionByName _)
    val aggCols = sum(col("_c")).as("rrf_micro") +:
      legs.indices.map(i =>
        coalesce(max(when(col("_leg") === i, col("_rk"))), lit(0L))
          .as(s"leg${i}_rk"))
    val fused = tagged.groupBy(col("_id"))
      .agg(aggCols.head, aggCols.tail: _*)
    // window-free ranked top-k (quiet form of the bounded-input
    // unpartitioned window — see TopK.rankedLimit)
    graft.operators.TopK.rankedLimit(fused,
        Seq(col("rrf_micro").desc, col("_id").asc), k)
      .withColumnRenamed("_id", idCol)
  }

  /** Two-leg RRF with the classic (lex_rk, vec_rk) output names —
    * delegates to [[rrfFuseN]]. Returns (idCol, rrf_micro, lex_rk,
    * vec_rk, rk), ranks 0 where a leg missed, ties broken by id.
    */
  def rrfFuse2(lex: DataFrame, vec: DataFrame, idCol: String, k: Int,
               kk: Int = 60, wLex: Double = 1.0,
               wVec: Double = 1.0): DataFrame =
    rrfFuseN(Seq(lex.select(col(idCol), col("rk")),
        vec.select(col(idCol), col("rk"))), idCol, k, kk,
        Seq(wLex, wVec))
      .withColumnRenamed("leg0_rk", "lex_rk")
      .withColumnRenamed("leg1_rk", "vec_rk")

  /** Rank the ad-hoc BM25 scores: (doc_id, rk), deterministic ties on
    * the gridded score then the id. Ranks assigned over the ≤ kLex
    * survivors of a distributed TakeOrderedAndProject.
    */
  private def lexRanks(docs: DataFrame, idCol: String, textCol: String,
                       queryTerms: Seq[String], kLex: Int): DataFrame = {
    val scored = TextRank.bm25Scores(docs, idCol, textCol, queryTerms)
    graft.operators.TopK.rankedLimit(scored,
        Seq(col("score_micro").desc, col("doc_id").asc), kLex)
      .select(col("doc_id"), col("rk"))
  }

  /** Ad-hoc hybrid search: BM25 leg over `docs`, exact-cosine leg over
    * `embeddings` (the query = the embedding row with id `queryVecId`,
    * self excluded by [[Similarity.knnBruteForce]]), RRF-fused. The two
    * tables share the id space (doc_id ↔ vec_id).
    *
    * Returns (doc_id, rrf_micro, lex_rk, vec_rk, rk) — top `k` fused.
    */
  def hybridSearch(docs: DataFrame, docIdCol: String, textCol: String,
                   embeddings: DataFrame, vecIdCol: String, vecCol: String,
                   queryTerms: Seq[String], queryVecId: Long,
                   kLex: Int = 20, kVec: Int = 20, k: Int = 10,
                   kk: Int = 60, wLex: Double = 1.0,
                   wVec: Double = 1.0): DataFrame = {
    val lex = lexRanks(docs, docIdCol, textCol, queryTerms, kLex)
    val vec = Similarity.knnBruteForce(embeddings,
        embeddings.filter(col(vecIdCol) === queryVecId),
        vecIdCol, vecCol, kVec)
      .select(col("n_id").as("doc_id"), col("rk"))
    rrfFuse2(lex, vec, "doc_id", k, kk, wLex, wVec)
  }

  /** Three-leg ad-hoc blend: lexical + vector + a STATIC PRIOR — any
    * query-independent per-doc ranking (recency, quality score,
    * popularity, length) supplied as `(docIdCol, rk)` rows. The
    * standard search-engine shape: two dynamic relevance signals fused
    * with a corpus prior at a lower weight, all through the same
    * [[rrfFuseN]] grid arithmetic. Returns (docIdCol, rrf_micro,
    * leg0_rk=lex, leg1_rk=vec, leg2_rk=prior, rk).
    */
  def hybridSearchWithPrior(docs: DataFrame, docIdCol: String,
                            textCol: String, embeddings: DataFrame,
                            vecIdCol: String, vecCol: String,
                            queryTerms: Seq[String], queryVecId: Long,
                            prior: DataFrame, kLex: Int = 20,
                            kVec: Int = 20, k: Int = 10, kk: Int = 60,
                            wLex: Double = 1.0, wVec: Double = 1.0,
                            wPrior: Double = 0.5): DataFrame = {
    val lex = lexRanks(docs, docIdCol, textCol, queryTerms, kLex)
    val vec = Similarity.knnBruteForce(embeddings,
        embeddings.filter(col(vecIdCol) === queryVecId),
        vecIdCol, vecCol, kVec)
      .select(col("n_id").as(docIdCol), col("rk"))
    rrfFuseN(Seq(lex, vec, prior.select(col(docIdCol), col("rk"))),
      docIdCol, k, kk, Seq(wLex, wVec, wPrior))
  }

  /** The production shape: both legs served from PERSISTED indexes — the
    * [[TextIndex]] inverted file (bucket-pruned postings reads) and a
    * [[Similarity.saveIvfIndex]] layout (probed-partition reads), so a
    * hybrid query's cost is two index probes + a ≤(kLex+kVec)-row fusion.
    * Deletions apply per index (each leg filters its own tombstones).
    *
    * `queries` must hold exactly one row (vecIdCol, vecCol) — the vector
    * half of the query; `nProbe = numCentroids` makes the vector leg
    * exact (every list probed) and the whole fusion equal to
    * [[hybridSearch]] — the parity the spec pins.
    *
    * `where` = FILTERED hybrid search over attribute columns BOTH
    * indexes persisted at build (`attrCols` on each): the predicate
    * restricts each leg's candidates under that leg's global scoring
    * statistics (the per-index filtered-search convention), so the
    * fusion ranks only matching documents — metadata-scoped retrieval
    * ("only lang = 'en'", "only this tenant") without a corpus pass.
    */
  def hybridSearchPersisted(spark: SparkSession, textIndexPath: String,
                            annIndexPath: String, queryTerms: Seq[String],
                            queries: DataFrame, vecIdCol: String,
                            vecCol: String, nProbe: Int,
                            kLex: Int = 20, kVec: Int = 20, k: Int = 10,
                            kk: Int = 60, wLex: Double = 1.0,
                            wVec: Double = 1.0,
                            where: Option[Column] = None,
                            excludeSelf: Boolean = true): DataFrame = {
    val lex = TextIndex.bm25SearchPersisted(spark, textIndexPath,
        queryTerms, kLex, where = where)
      .select(col("doc_id"), col("rk"))
    val vec = Similarity.ivfSearchPersisted(spark, annIndexPath, queries,
        vecIdCol, vecCol, k = kVec, nProbe = nProbe, where = where,
        excludeSelf = excludeSelf)
      .select(col("n_id").as("doc_id"), col("rk"))
    rrfFuse2(lex, vec, "doc_id", k, kk, wLex, wVec)
  }

  /** [[hybridSearchPersisted]] plus a STATIC PRIOR leg — the production
    * shape of [[hybridSearchWithPrior]]: recency/quality/popularity
    * blended retrieval where BOTH dynamic legs are index-served (bucket-
    * pruned postings probe + probed-partition ANN read) and the prior is
    * any precomputed `(doc_id, rk)` rank list at a lower weight. The
    * prior must be a BOUNDED top-R list (rrfFuseN's leg contract —
    * anything beyond a leg's top-R is absent and contributes rank 0), so
    * the fusion stays a ≤(kLex+kVec+R)-row aggregation regardless of
    * corpus size; at 100 TB the prior is a small derived table (e.g.
    * "top 10k most recent"), never a corpus-wide ranking.
    *
    * `nProbe = numCentroids` makes the vector leg exact and the whole
    * blend equal to [[hybridSearchWithPrior]] (spec-pinned parity).
    * `where` filters both index legs (per-index filtered-search
    * convention); the prior is the caller's table and is NOT filtered —
    * a non-matching prior doc can still enter ranked by prior alone, so
    * pre-filter the prior when `where` must scope it.
    *
    * Returns (doc_id, rrf_micro, leg0_rk=lex, leg1_rk=vec,
    * leg2_rk=prior, rk ≤ k).
    */
  def hybridSearchPersistedWithPrior(spark: SparkSession,
                                     textIndexPath: String,
                                     annIndexPath: String,
                                     queryTerms: Seq[String],
                                     queries: DataFrame, vecIdCol: String,
                                     vecCol: String, prior: DataFrame,
                                     nProbe: Int, kLex: Int = 20,
                                     kVec: Int = 20, k: Int = 10,
                                     kk: Int = 60, wLex: Double = 1.0,
                                     wVec: Double = 1.0,
                                     wPrior: Double = 0.5,
                                     where: Option[Column] = None)
      : DataFrame = {
    val lex = TextIndex.bm25SearchPersisted(spark, textIndexPath,
        queryTerms, kLex, where = where)
      .select(col("doc_id"), col("rk"))
    val vec = Similarity.ivfSearchPersisted(spark, annIndexPath, queries,
        vecIdCol, vecCol, k = kVec, nProbe = nProbe, where = where)
      .select(col("n_id").as("doc_id"), col("rk"))
    rrfFuseN(Seq(lex, vec, prior.select(col("doc_id"), col("rk"))),
      "doc_id", k, kk, Seq(wLex, wVec, wPrior))
  }

  /** Hybrid over a STREAMING-MAINTAINED vector index: the
    * [[graft.streaming.StreamOps.annIndexStream]] layout is IVF-PQ
    * (codes only), so the vector leg ranks by ADC
    * ([[Similarity.ivfPqSearchPersisted]]). RRF consumes rank-only
    * information, so the fusion contract is unchanged — the ADC
    * approximation moves ranks, not the algebra. `rerank` +
    * `rerankCorpus` upgrades the leg to exact (L2²) ranks over an
    * R-deep shortlist when recall matters more than the codes-only read.
    * Together with [[graft.streaming.StreamOps.textIndexStream]] this
    * serves hybrid queries from two indexes that were never batch-built.
    */
  def hybridSearchPersistedPq(spark: SparkSession, textIndexPath: String,
                              annPqIndexPath: String,
                              queryTerms: Seq[String], queries: DataFrame,
                              vecIdCol: String, vecCol: String,
                              nProbe: Int, kLex: Int = 20, kVec: Int = 20,
                              k: Int = 10, kk: Int = 60,
                              wLex: Double = 1.0, wVec: Double = 1.0,
                              rerank: Int = 0,
                              rerankCorpus: Option[DataFrame] = None)
      : DataFrame = {
    val lex = TextIndex.bm25SearchPersisted(spark, textIndexPath,
        queryTerms, kLex)
      .select(col("doc_id"), col("rk"))
    val vec = Similarity.ivfPqSearchPersisted(spark, annPqIndexPath,
        queries, vecIdCol, vecCol, k = kVec, nProbe = nProbe,
        rerank = rerank, rerankCorpus = rerankCorpus)
      .select(col("n_id").as("doc_id"), col("rk"))
    rrfFuse2(lex, vec, "doc_id", k, kk, wLex, wVec)
  }

  /** Per-query RRF fusion of two BATCHED rank lists — each
    * (q_id, idCol, rk) with 1-based per-query ranks. Same missing-rank
    * treatment and integer micro-grid as [[rrfFuse2]]; every stage is
    * per-q_id bounded: full outer on the (q_id, id) equi-key, per-query
    * top-k via the TopKPerGroup heap, ranks over ≤ k survivors per query
    * (partitioned window — never the unpartitioned single-query shape).
    */
  def rrfFuse2PerQuery(lex: DataFrame, vec: DataFrame, idCol: String,
                       k: Int, kk: Int = 60, wLex: Double = 1.0,
                       wVec: Double = 1.0): DataFrame = {
    val l = lex.select(col("q_id").as("_lq"), col(idCol).as("_id"),
      col("rk").as("_lex_rk"))
    val v = vec.select(col("q_id").as("_vq"), col(idCol).as("_vid"),
      col("rk").as("_vec_rk"))
    val fused = l.join(v,
        l("_lq") === v("_vq") && l("_id") === v("_vid"), "full_outer")
      .select(coalesce(col("_lq"), col("_vq")).as("q_id"),
        coalesce(col("_id"), col("_vid")).as(idCol),
        (contrib(col("_lex_rk"), kk, wLex) +
          contrib(col("_vec_rk"), kk, wVec)).as("rrf_micro"),
        coalesce(col("_lex_rk").cast("long"), lit(0L)).as("lex_rk"),
        coalesce(col("_vec_rk").cast("long"), lit(0L)).as("vec_rk"))
    val top = graft.operators.TopK.perGroup(fused, Seq(col("q_id")),
      Seq(col("rrf_micro").desc, col(idCol).asc), k)
    top.withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("rrf_micro").desc, col(idCol).asc)).cast("long"))
      .select(col("q_id"), col(idCol), col("rrf_micro"), col("lex_rk"),
        col("vec_rk"), col("rk"))
  }

  /** Batched production retrieval: both persisted-index legs amortized
    * over a QUERY SET — ONE union-pruned postings pass
    * ([[TextIndex.bm25SearchPersistedBatch]], per-term micro-grid
    * contract) and ONE probed-partition ANN pass
    * ([[Similarity.ivfSearchPersisted]] already batches query sets),
    * fused per query. `queryTerms` = (q_id, term) rows; `queries` =
    * (vecIdCol, vecCol) rows whose id IS the q_id (shared id space, as
    * in [[hybridSearchPersisted]]). A query may be lex-only or vec-only;
    * its missing leg contributes rank 0 per the RRF convention.
    *
    * Returns (q_id, doc_id, rrf_micro, lex_rk, vec_rk, rk ≤ k).
    */
  def hybridSearchPersistedBatch(spark: SparkSession, textIndexPath: String,
                                 annIndexPath: String,
                                 queryTerms: DataFrame, queries: DataFrame,
                                 vecIdCol: String, vecCol: String,
                                 nProbe: Int, kLex: Int = 20,
                                 kVec: Int = 20, k: Int = 10, kk: Int = 60,
                                 wLex: Double = 1.0, wVec: Double = 1.0,
                                 where: Option[Column] = None): DataFrame = {
    val lex = TextIndex.bm25SearchPersistedBatch(spark, textIndexPath,
        queryTerms, kLex, where = where)
      .select(col("q_id"), col("doc_id"), col("rk"))
    val vec = Similarity.ivfSearchPersisted(spark, annIndexPath, queries,
        vecIdCol, vecCol, k = kVec, nProbe = nProbe, where = where)
      .select(col("q_id"), col("n_id").as("doc_id"), col("rk"))
    rrfFuse2PerQuery(lex, vec, "doc_id", k, kk, wLex, wVec)
  }
}
