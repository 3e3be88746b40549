package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * All variants key off the portable 60-bit md5 hash ([[Dedup.hash60]]) of a
  * stable id — so samples are (a) reproducible across runs/engines,
  * (b) consistent under re-partitioning (no RNG seeded per partition, which
  * changes with parallelism — the classic `df.sample` pitfall at scale),
  * and (c) stable under incremental appends (a row's in/out never flips).
  * Every variant is a narrow filter or one window — no extra shuffle beyond
  * what the grouping itself requires.
  */
object Sampling {

  private val Buckets = 1000000L

  /** The sampling key: uniform bucket in [0, Buckets) from the id hash.
    * Salt separates independent samples over the same ids.
    */
  def bucket(idCol: Column, salt: String = ""): Column =
    Dedup.hash60(concat(idCol.cast("string"), lit(salt))) % Buckets

  /** Bernoulli keep-predicate at `rate` over an arbitrary id column —
    * the reusable core of [[hashSample]] (trace tail-sampling, per-row
    * gating inside larger expressions).
    */
  def keepAtRate(idCol: Column, rate: Double, salt: String = ""): Column =
    bucket(idCol, salt) < (rate * Buckets).toLong

  /** Bernoulli sample at `rate` — keep iff bucket < rate·Buckets. */
  def hashSample(df: DataFrame, idCol: String, rate: Double,
                 salt: String = ""): DataFrame =
    df.filter(keepAtRate(col(idCol), rate, salt))

  /** Per-stratum Bernoulli rates (e.g. language balancing): strata absent
    * from `rates` fall back to `defaultRate`. The rate lookup is a CASE
    * expression — broadcast-free, codegen'd.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Double], defaultRate: Double = 0.0,
                       salt: String = ""): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(bucket(col(idCol), salt).cast("double") <
      rateCol * Buckets.toDouble)
  }

  /** Deterministic train/val/test assignment from the id hash: stable under
    * appends and repartitioning (a row's split never flips), fractions in
    * [0,1] with train = the remainder. One codegen'd CASE — no shuffle.
    */
  def splitColumn(idCol: Column, valFrac: Double, testFrac: Double,
                  salt: String = ""): Column = {
    val b = bucket(idCol, salt)
    when(b < (valFrac * Buckets).toLong, "val")
      .when(b < ((valFrac + testFrac) * Buckets).toLong, "test")
      .otherwise("train")
  }

  /** Leakage-free train/val/test split: near-duplicate documents must land
    * on the SAME side of a split, or the held-out sets leak training
    * content (the classic eval-hygiene failure near-dup detection exists to
    * prevent). Every near-dup connected component ([[Dedup.clusters]] over
    * `pairs`) is split as one unit: the split key is the doc's cluster
    * canonical (its own id when it is in no pair), fed through the same
    * deterministic [[splitColumn]] hash as the plain split — so unpaired
    * docs keep exactly the assignment a plain split would give them.
    *
    * Scale: the cluster table is sized by the near-dup PAIR set (orders of
    * magnitude smaller than the corpus), so the label join is
    * broadcast-able; everything else is the narrow hash predicate.
    */
  def leakFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                    valFrac: Double, testFrac: Double,
                    salt: String = ""): DataFrame = {
    val cl = Dedup.clusters(pairs)
      .select(col("id").as(idCol), col("cluster_id"))
    df.join(cl, Seq(idCol), "left")
      .withColumn("split", splitColumn(
        coalesce(col("cluster_id"), col(idCol).cast("long")),
        valFrac, testFrac, salt))
      .drop("cluster_id")
  }

  /** Weighted source mixing for training-data pipelines: each source gets a
    * target weight (epochs); a row from a source with weight `w` appears
    * `floor(w)` or `ceil(w)` times — the fractional epoch is a deterministic
    * per-row Bernoulli from the id hash, so weight 2.3 means every row
    * appears twice and a stable 30% of rows appear a third time. Weights
    * below 1 downsample (0.3 = keep 30%, once); sources absent from
    * `weights` default to 1.0. Output repeats rows with `epoch` = 1..n.
    *
    * This is the standard mixture step (e.g. The Pile / LLaMA data recipes:
    * upsample small high-quality sources, downsample the crawl). Shape:
    * narrow CASE + one `explode(sequence(...))` — no shuffle, no RNG;
    * stable under repartitioning and appends like every op here.
    */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    weights: Map[String, Double], defaultWeight: Double = 1.0,
                    salt: String = ""): DataFrame = {
    val wCol = weights.foldLeft(lit(defaultWeight)) { case (acc, (k, w)) =>
      when(col(sourceCol) === k, lit(w)).otherwise(acc)
    }
    val whole = floor(wCol).cast("long")
    val frac = wCol - whole
    val extra = when(
      bucket(col(idCol), salt).cast("double") < frac * Buckets.toDouble, 1L)
      .otherwise(0L)
    df.withColumn("__n", whole + extra)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** TEMPERATURE-balanced source mixing at α = ½ — [[mixtureSample]]
    * with the weights COMPUTED from the source sizes instead of
    * hand-tuned: sampling mass p_s ∝ √n_s (the multilingual-training
    * rebalance rule — smaller sources upsample, the crawl downsamples,
    * total volume stays ≈ N). The per-row multiplier is
    * `m_s = N·√n_s / (n_s·Σ√n_t)`; epochs replicate exactly as
    * mixtureSample (floor(m) copies + deterministic fractional extra
    * from the id hash).
    *
    * α is fixed at ½ because √ is the one power IEEE requires correctly
    * rounded — per-source √n floors to the 10⁻⁶ grid BEFORE the
    * cross-source normalizer sums (exact BIGINTs, order-free), so the
    * oracle reproduces m_s bit-for-bit; a general α would need exp/ln
    * in the output path. Shape: one tiny per-source aggregate broadcast
    * back over a narrow projection — no corpus shuffle, no RNG, stable
    * under repartitioning and appends.
    */
  def temperatureMixture(df: DataFrame, idCol: String, sourceCol: String,
                         salt: String = ""): DataFrame = {
    val sq = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
      .withColumn("sq_micro",
        floor(sqrt(col("n_s").cast("double")) * lit(1000000.0)).cast("long"))
    val tot = sq.agg(sum(col("sq_micro")).as("z_micro"),
      sum(col("n_s")).as("n_total"))
    val m = (col("n_total").cast("double") * col("sq_micro").cast("double")) /
      (col("n_s").cast("double") * col("z_micro").cast("double"))
    val whole = floor(m).cast("long")
    val frac = m - floor(m)
    val extra = when(
      bucket(col(idCol), salt).cast("double") < frac * Buckets.toDouble, 1L)
      .otherwise(0L)
    df.join(broadcast(sq), sourceCol).crossJoin(broadcast(tot))
      .withColumn("__n", whole + extra)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__n"))))
      .select(df.columns.map(col) :+ col("epoch"): _*)
  }

  /** Weighted sample without replacement (Efraimidis–Spirakis A-Res,
    * priority sampling): row i gets priority u_i^(1/w_i) with u_i uniform;
    * the k largest priorities are a weighted uniform sample. Here u_i is
    * the deterministic hash bucket midpoint ((bucket + 0.5)/10⁶) and the
    * ordering key is the monotone-equivalent ln(u)/w, truncated to the
    * 10⁻⁶ grid (`priority_micro` BIGINT) so engines order identically
    * despite ln's last-ulp variance; ties break on id. No RNG, stable
    * under repartitioning.
    *
    * Scale shape: a narrow projection plus ONE TakeOrdered(k) — no global
    * sort, no window; executors keep k-row heaps and the driver merges.
    *
    * Contract: rows with weight ≤ 0 (or null) are EXCLUDED before
    * sampling — they carry zero probability mass in A-Res (w→0⁺ drives
    * ln(u)/w to −∞), and a negative weight would invert the priority
    * order; silently ranking them on ±Inf/NaN would corrupt the sample.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, salt: String = ""): DataFrame = {
    val u = (bucket(col(idCol), salt).cast("double") + 0.5) / Buckets.toDouble
    df.filter(col(weightCol).cast("double") > 0d)
      .withColumn("priority_micro",
        floor(log(u) / col(weightCol).cast("double") * lit(1000000.0))
          .cast("long"))
      .orderBy(col("priority_micro").desc, col(idCol).asc)
      .limit(k)
  }

  /** Exactly `k` rows per group (fewer if the group is smaller), chosen as
    * the k smallest hash values — a deterministic uniform-without-
    * replacement sample. One shuffle on the group key.
    */
  def perGroupSample(df: DataFrame, groupCol: String, idCol: String, k: Int,
                     salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(bucket(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic global shuffle + sharding for training: each row gets a
    * `shard` in [0, numShards) and a `shard_pos` giving its position within
    * the shard under the hash order — together they define a reproducible
    * corpus-wide permutation (read shards in order, rows by position) that
    * no downstream consumer has to re-shuffle. `salt` selects independent
    * permutations per epoch.
    *
    * Scale shape: shard = a narrow hash projection; position = ONE window
    * partitioned by shard and ordered by (hash, id) — one shuffle on the
    * shard key, each shard sorts independently (no global ordering
    * bottleneck, no driver involvement). Deterministic under
    * repartitioning because the hash, not the input order, decides both
    * shard and position. Uses the full 60-bit hash (not the 10⁶-bucket
    * sampling key) so the within-shard order is collision-free for
    * corpora far beyond 10⁶ rows.
    */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
                    salt: String = ""): DataFrame = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    val h = Dedup.hash60(concat(col(idCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % numShards).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1L)
      .drop("__h")
  }

  /** Token-budget selection (the data-recipe "take the best N tokens per
    * source" step): within each group, take rows in descending `priority`
    * order (ties broken by id) until the group's cost budget is reached.
    * Greedy fill — the row that CROSSES the budget line is kept, so a
    * group's selection is never empty when its budget is positive.
    * Costs must be non-negative: a negative cost makes the running sum
    * non-monotonic, and the binned path's contiguous-prefix contract (and
    * greedy selection itself) stops being meaningful.
    *
    * `bins = 0` runs the direct formulation: ONE window per group with an
    * exclusive running cost sum. Correct, but the window imposes a global
    * per-group sort — with a handful of huge sources that is one sort
    * partition per source, a skew bottleneck at 100 TB.
    *
    * `bins > 0` is the scale path and returns the IDENTICAL result:
    *   1. per-group priority histogram (`groupBy(group, bin)` — map-side
    *      combinable, tiny result: groups × bins rows);
    *   2. cumulative cost over the histogram picks, per group, the bins
    *      fully inside the budget and the single BOUNDARY bin that crosses
    *      it;
    *   3. broadcast the per-bin verdicts back: fully-inside rows pass with
    *      no sort at all; only the boundary bin's rows — one bin's worth
    *      per group — go through the exact window, seeded with the exact
    *      cost of all better bins.
    * Bins are contiguous priority ranges, so the (priority, id) order
    * within the boundary bin extends the global order exactly; equality
    * with the direct path is spec-asserted.
    */
  def budgetSelect(df: DataFrame, groupCol: String, costCol: String,
                   priorityCol: String, budgets: Map[String, Long],
                   defaultBudget: Long, idCol: String,
                   bins: Int = 0): DataFrame = {
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (k, v)) =>
      when(col(groupCol) === k, lit(v)).otherwise(acc)
    }
    if (bins <= 0) {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col(priorityCol).desc, col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("__prev",
          coalesce(sum(col(costCol).cast("long")).over(w), lit(0L)))
        .filter(col("__prev") < budget)
        .drop("__prev")
    } else {
      // per-group priority range → bin width (groups are sources: the
      // range frame is metadata-sized by contract)
      val ranges = df.groupBy(col(groupCol))
        .agg(min(col(priorityCol).cast("double")).as("__lo"),
          max(col(priorityCol).cast("double")).as("__hi"))
      // bin 0 holds the HIGHEST priorities (descending fill order)
      def binOf(p: Column, lo: Column, hi: Column): Column =
        least(lit(bins - 1), greatest(lit(0),
          floor((hi - p) / ((hi - lo + lit(1e-12)) / lit(bins)))
            .cast("int")))
      val binned = df.join(broadcast(ranges), groupCol)
        .withColumn("__bin",
          binOf(col(priorityCol).cast("double"), col("__lo"), col("__hi")))
      val hist = binned.groupBy(col(groupCol), col("__bin"))
        .agg(sum(col(costCol).cast("long")).as("__binCost"))
      val hw = Window.partitionBy(col(groupCol)).orderBy(col("__bin").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      // per bin: exact cost of all better bins, and the verdict
      val verdicts = hist
        .withColumn("__before", coalesce(sum(col("__binCost")).over(hw),
          lit(0L)))
        .withColumn("__b", budget)
        .withColumn("__verdict",
          // STRICT <: a bin landing exactly on the budget goes through the
          // boundary (exact window) path — a trailing zero-cost row whose
          // exclusive prefix sum equals the budget must be dropped there,
          // exactly as the direct path's (__prev < budget) drops it
          when(col("__before") + col("__binCost") < col("__b"), "all")
            .when(col("__before") < col("__b"), "boundary")
            .otherwise("none"))
        .select(col(groupCol), col("__bin"), col("__before"),
          col("__verdict"))
      val tagged = binned.join(broadcast(verdicts), Seq(groupCol, "__bin"))
      val keptWhole = tagged.filter(col("__verdict") === "all")
      // only the boundary bin pays a sort — one bin's rows per group
      val bw = Window.partitionBy(col(groupCol))
        .orderBy(col(priorityCol).desc, col(idCol).asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val keptBoundary = tagged.filter(col("__verdict") === "boundary")
        .withColumn("__prev", col("__before") +
          coalesce(sum(col(costCol).cast("long")).over(bw), lit(0L)))
        .filter(col("__prev") < budget)
        .drop("__prev")
      keptWhole.unionByName(keptBoundary)
        .select(df.columns.map(col).toSeq: _*) // joins moved the key first
    }
  }
}
