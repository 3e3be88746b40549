package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.engine.GraftSession

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR with
  * the engine's tuned session (AQE, broadcast threshold, parquet pushdown)
  * and prints ONE JSON line for the driver.
  *
  * The driver captures only the LAST ~2000 characters of stdout, so the
  * printed line must stay under that budget even as the query set grows:
  * per-query times are emitted slowest-first, truncated to 3 decimals, and
  * greedily packed until the line would exceed the budget ("nq" always
  * records how many queries the totals cover). The untruncated full-precision
  * map is written to bench_full.json next to the repo for offline reading.
  */
object Bench {
  /** Max characters for the printed JSON line. The driver keeps the last
    * 2000 chars of output; sbt appends a "[success] Total time …" line
    * (~80 chars) after ours and Spark may emit a stray WARN, so leave slack.
    */
  private val LineBudget = 1600

  /** Task-level scan accounting: bytes/records read from the sources,
    * accumulated across all tasks between two [[reset]] calls — the
    * Spark-metrics equivalent of the reference's per-query bytes_scanned
    * (`src/query/mod.rs:465-481`).
    */
  private final class ScanAccumulator
      extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val tm = e.taskMetrics
      if (tm != null) {
        bytes.addAndGet(tm.inputMetrics.bytesRead)
        records.addAndGet(tm.inputMetrics.recordsRead)
      }
    }
    def reset(): Unit = { bytes.set(0); records.set(0) }
  }

  /** Fingerprint of the input corpus: md5 over the sorted
    * (name, size, mtime) of the sf dir's parquet files, truncated to 12 hex
    * chars. Stamped into every bench line so cross-round per-query
    * comparisons are only made between IDENTICAL corpora — a regenerated
    * corpus mid-round otherwise reads as a phantom perf regression
    * (r9: sf0.1 was rebuilt between two rounds' bench runs and two queries
    * "regressed" ~40% with no code change).
    */
  private[graft] def corpusId(sfDir: String): String = {
    try {
      val files = new java.io.File(sfDir).listFiles()
      if (files == null) return "absent"
      val desc = files.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .mkString("|")
      java.security.MessageDigest.getInstance("MD5")
        .digest(desc.getBytes(StandardCharsets.UTF_8))
        .take(6).map(b => f"$b%02x").mkString
    } catch { case _: Throwable => "unknown" }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cores = cpus, appName = "graft-bench")
    val scan = new ScanAccumulator
    spark.sparkContext.addSparkListener(scan)
    // Build/search split (SparkEntry.prepared): one-time artifact builds
    // (IVF index write, PQ codebook+encode, BPE merge train) run ONCE per
    // process and are timed separately as build_sec — the per-query figure
    // is the search a deployment repeats, so round-over-round regression
    // signal isn't drowned by build I/O (r9 verdict #1: q_sim_ivf_persisted
    // read 4.9 s of which ~4 s was index build + temp-dir write).
    // optional query-name filter (comma-separated) for local iteration —
    // the bench twin of Verify's 3rd arg
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val preparedDefs = SparkEntry.prepared
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val builds = preparedDefs.map { case (name, p) =>
      val t0 = System.nanoTime()
      val artifact = p.build(spark, sfDir)
      name -> (artifact, (System.nanoTime() - t0) / 1e9)
    }
    def body(name: String,
             fn: (org.apache.spark.sql.SparkSession, String) =>
               org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      builds.get(name) match {
        case Some((artifact, _)) => preparedDefs(name).search(spark, sfDir, artifact)
        case None => fn(spark, sfDir)
      }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Materialize EVERY row end-to-end, not `count()`: Catalyst prunes
    // projections under a bare count, so a count-timed query whose cost sits
    // in the final projection (scalar kernels, wide selects) would be
    // under-measured. Driving the executed RDD evaluates the full physical
    // plan including the result projection, without driver-side collect.
    def materialize(df: org.apache.spark.sql.DataFrame): Long =
      Bench.materialize(df)
    // min of two measured passes per query, with one unmeasured warm pass
    // IMMEDIATELY before each query's timed passes (not one global warm
    // sweep up front: warming all ~131 queries first evicts the early
    // entries from the bounded codegen/plan caches, so an early query's
    // timed pass silently pays recompilation — the r10 ghost-regression
    // class, q_agg_pricing 1.06→1.76 s with no code change). Adjacent
    // warm+measure keeps this query's generated classes hot and the OS
    // page cache filled with exactly its inputs. The min of the timed
    // passes is the query's cost, not whichever GC pause / contention
    // spike happened to land on it (driver-observed run-to-run variance
    // was up to 2.5× on a busy box). Scan metrics come from the first
    // timed pass — bytes/records are deterministic across passes.
    val measuredPasses = 2
    val results = ordered.map { case (name, fn) =>
      try { materialize(body(name, fn)) } catch { case _: Throwable => () }
      var best = Double.MaxValue
      var rows = -1L
      var bytes = 0L
      var records = 0L
      var pass = 0
      while (pass < measuredPasses) {
        org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
        scan.reset()
        val t0 = System.nanoTime()
        val r = try { materialize(body(name, fn)) } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
        if (pass == 0) { bytes = scan.bytes.get(); records = scan.records.get() }
        // a fast-FAILING pass must not override a successful slower one
        if (r >= 0 && (rows < 0 || sec < best)) { best = sec; rows = r }
        else if (r < 0 && rows < 0 && sec < best) best = sec
        pass += 1
      }
      (name, best, rows, bytes, records)
    }
    val total = results.map(_._2).sum

    val fullQs = results.map { case (k, v, _, _, _) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, v, rows, b, r) =>
      val buildSec = builds.get(k).map { case (_, bs) => s""","build_sec":$bs""" }.getOrElse("")
      s""""$k":{"sec":$v,"rows":$rows,"bytes_scanned":$b,"records_scanned":$r$buildSec}"""
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","nq":${results.size},"corpus_id":"${corpusId(sfDir)}","queries":$fullQs,"detail":$detail,"sf":"$sfDir"}"""
    // a filtered run must never overwrite the canonical full record
    if (only.isEmpty)
      try Files.write(Paths.get("bench_full.json"), (fullLine + "\n").getBytes(StandardCharsets.UTF_8))
      catch { case _: Throwable => () }

    // Compact line: slowest queries first so whatever fits is the most
    // informative subset; pack greedily up to the budget.
    val header = f"""{"metric":"total","value":$total%.3f,"unit":"sec","nq":${results.size},"corpus_id":"${corpusId(sfDir)}","sf":"$sfDir","queries":{"""
    val footer = "}}"
    val sb = new StringBuilder(header)
    var first = true
    results.sortBy(-_._2).foreach { case (k, v, _, _, _) =>
      val entry = (if (first) "" else ",") + f""""$k":$v%.3f"""
      if (sb.length + entry.length + footer.length <= LineBudget) {
        sb.append(entry); first = false
      }
    }
    sb.append(footer)
    println(sb.toString)
    spark.stop()
  }

  /** Materialize EVERY row end-to-end without a driver collect: drives
    * the executed RDD so the full physical plan runs, including the final
    * projection a bare `count()` would prune. Shared with [[BenchScale]]
    * so the two benches measure identically.
    */
  private[graft] def materialize(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.mapPartitions { it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single(n)
    }.collect().sum
}
