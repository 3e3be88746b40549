package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV ("k minimum values") theta sketch: distinct-count SET ALGEBRA the
  * HLL field stats can't do — union AND intersection estimates across
  * named cohorts ("users who erred ∩ users who purchased") from tiny
  * mergeable per-group summaries.
  *
  * The sketch of a set is its k smallest DISTINCT 48-bit hashes
  * (reference stats keep per-field HLL registers —
  * `src/stats.rs` / field-stats endpoint — which union fine but cannot
  * intersect; KMV adds the missing algebra at the same tiny size).
  * θ = the k-th smallest hash when the set has ≥ k distinct values,
  * else the full hash space (the sketch is then EXHAUSTIVE and every
  * estimate below is exact by construction). Estimators (Beyer 2007):
  *   - cardinality: n < k → n (exact); else (k−1)·2⁴⁸ div θ
  *   - intersection: θ∩ = min(θ_a, θ_b); D = |A_sk ∩ B_sk ∩ [0, θ∩)|;
  *     est = D·2⁴⁸ div θ∩
  *   - union: bottom-k is MERGEABLE — the k smallest of A ∪ B are
  *     computable from the two k-smallest lists alone, so the merged
  *     sketch IS the union's sketch and the cardinality rule applies.
  *
  * Determinism: the hash is [[graft.ml.Dedup.hash60]] (md5-prefix —
  * DuckDB-mirrorable) truncated to 48 bits, all estimates are BIGINT
  * `div` with non-negative numerators, and every bound is chosen so the
  * arithmetic cannot wrap: k ≤ 2¹⁴ keeps (k−1)·2⁴⁸ < 2⁶², and θ ≥ 1
  * whenever the estimation branch runs (k ≥ 2 distinct values ⇒ the
  * k-th smallest ≥ 1), so the division is never by zero in EITHER
  * engine (DuckDB `//` by zero raises; Spark nulls — a silent
  * cross-engine mismatch this construction makes unreachable).
  *
  * Scale shape: one distinct-hash aggregate + one per-group bottom-k
  * window (≤ k rows survive per group) builds the sketch; the algebra
  * then runs on sketch rows only — G groups cost G·k rows however large
  * the underlying sets. [[pairwiseSetAlgebra]] is for a HANDFUL of
  * named cohorts (alert populations, event types, experiment arms):
  * its pair frame is G², never data-sized.
  */
object ThetaSketch {

  /** 48-bit hash space: (k−1)·Space must fit a BIGINT for k ≤ 2¹⁴. */
  val Space: Long = 1L << 48

  val MaxK: Int = 1 << 14

  // md5 hashes the value's STRING form (a bigint won't cast to binary
  // under ANSI, and DuckDB mirrors CAST(x AS VARCHAR) exactly);
  // hash60 is non-negative, so the shift IS the div-4096 truncation
  private def h48(v: Column): Column =
    shiftright(graft.ml.Dedup.hash60(v.cast("string")), 12)

  /** KMV sketch per group: the k smallest distinct 48-bit hashes of
    * `value`, as rows (groupCols…, h). ≤ k rows per group survive.
    */
  def kmv(df: DataFrame, groupCols: Seq[String], value: Column,
          k: Int): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k must be in [2, $MaxK]")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("h").asc)
    df.select(g :+ h48(value).as("h"): _*)
      // NULL values hash to NULL; Spark sorts NULL first ASC (it would
      // take rank 1 and displace a real hash) while DuckDB sorts NULL
      // last — drop them so the sketch counts only real values and the
      // θ > 0 guarantee holds even at k = 2
      .filter(col("h").isNotNull)
      .groupBy(g :+ col("h"): _*).agg(count(lit(1)).as("__c"))
      .drop("__c")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Bottom-k fold over ALREADY-HASHED sketch rows (groupCols…, h) —
    * the merge step streaming maintenance and sketch unions share:
    * distinct h per group, keep the k smallest. Because bottom-k is
    * exactly mergeable, folding partials through this equals [[kmv]]
    * over the concatenated raw data.
    */
  def bottomKHashes(sk: DataFrame, groupCols: Seq[String],
                    k: Int): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k must be in [2, $MaxK]")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("h").asc)
    sk.select(g :+ col("h"): _*).filter(col("h").isNotNull).distinct()
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Per-group stats of a [[kmv]] sketch: (groupCols…, n_sketch, theta,
    * est_distinct). `n_sketch < k` means the sketch is exhaustive and
    * the estimate is the exact distinct-hash count.
    */
  def cardinality(sk: DataFrame, groupCols: Seq[String],
                  k: Int): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k must be in [2, $MaxK]")
    val g = groupCols.map(col)
    sk.groupBy(g: _*)
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("__mx"))
      .withColumn("theta",
        when(col("n_sketch") >= k, col("__mx")).otherwise(lit(Space)))
      .withColumn("est_distinct",
        when(col("n_sketch") < k, col("n_sketch"))
          .otherwise(expr(s"${(k - 1).toLong * Space} div theta")))
      .drop("__mx")
  }

  /** Set algebra over every ordered pair (g_a < g_b) of the sketch's
    * groups: (g_a, g_b, n_common, intersect_est, union_est). Pure
    * sketch-row arithmetic — equi-joins and ≤ 2k-row windows per pair.
    */
  def pairwiseSetAlgebra(sk0: DataFrame, groupCol: String,
                         k: Int): DataFrame = {
    require(k >= 2 && k <= MaxK, s"k must be in [2, $MaxK]")
    // ONE sketch pass: this algebra consumes the sketch rows through four
    // differently-pruned branches (per-group stats, the h-keyed
    // intersection self-join, two union legs), so an unmaterialized
    // producer — the corpus-wide KMV window — would re-run once per
    // branch. The sketch is ≤ k·groups rows by construction; checkpoint
    // it (the same shape the KMV HTTP endpoint already uses).
    val sk = sk0.localCheckpoint()
    val stats = cardinality(sk, Seq(groupCol), k)
    val pairs = stats.select(col(groupCol).as("g_a"),
        col("theta").as("__ta"))
      .join(stats.select(col(groupCol).as("g_b"),
        col("theta").as("__tb")), col("g_a") < col("g_b"))
      .withColumn("__tp", least(col("__ta"), col("__tb")))
    // intersection: common hashes below the pair's θ
    val common = sk.select(col(groupCol).as("g_a"), col("h"))
      .join(sk.select(col(groupCol).as("g_b"), col("h")), Seq("h"))
      .filter(col("g_a") < col("g_b"))
    val inter = common.join(pairs, Seq("g_a", "g_b"))
      .filter(col("h") < col("__tp"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_common"))
    // union: the merged bottom-k is the union's own KMV sketch
    val tagged = pairs.select(col("g_a"), col("g_b"))
      .join(sk.select(col(groupCol).as("g_a"), col("h")), Seq("g_a"))
      .unionByName(pairs.select(col("g_a"), col("g_b"))
        .join(sk.select(col(groupCol).as("g_b"), col("h")), Seq("g_b"))
        .select(col("g_a"), col("g_b"), col("h")))
      .distinct()
    val wu = Window.partitionBy(col("g_a"), col("g_b"))
      .orderBy(col("h").asc)
    val merged = tagged.withColumn("__rk", row_number().over(wu))
      .filter(col("__rk") <= k).drop("__rk")
    val unionEst = merged.groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("__nu"), max(col("h")).as("__mxu"))
      .withColumn("union_est",
        when(col("__nu") < k, col("__nu"))
          .otherwise(expr(s"${(k - 1).toLong * Space} div __mxu")))
      .select(col("g_a"), col("g_b"), col("union_est"))
    pairs.join(inter, Seq("g_a", "g_b"), "left")
      .join(unionEst, Seq("g_a", "g_b"), "left")
      .select(col("g_a"), col("g_b"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(expr("n_common * " + Space + " div __tp"), lit(0L))
          .as("intersect_est"),
        col("union_est"))
  }
}
