package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Persisted shingle index ([[Dedup.saveShingleIndex]] /
  * [[Dedup.jaccardAgainstIndex]]) and the per-doc contamination report
  * ([[Dedup.contaminationOverlap]]).
  */
class DedupIndexSpec extends SparkSuite {
  import spark.implicits._

  private val refDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely different reference text lives here now"),
    (3L, "another unrelated reference document about gardens and rain"))
    .toDF("doc_id", "text")
  private val newDocs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"), // dup of ref 1
    (11L, "the quick brown fox jumps over the lazy cat"), // near-dup of ref 1
    (12L, "novel content with no reference overlap at all"))
    .toDF("doc_id", "text")

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("jaccardAgainstIndex matches jaccardAgainstReference exactly") {
    val idx = tmp("shidx")
    Dedup.saveShingleIndex(refDocs, "doc_id", "text", idx, n = 3)
    val viaIndex = Dedup.jaccardAgainstIndex(spark, idx, newDocs,
        "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("new_id", "ref_id").collect().map(_.toSeq).toSeq
    val direct = Dedup.jaccardAgainstReference(newDocs, refDocs,
        "doc_id", "text", n = 3, threshold = 0.5)
      .orderBy("new_id", "ref_id").collect().map(_.toSeq).toSeq
    assert(viaIndex.nonEmpty)
    assert(viaIndex == direct)
  }

  test("deleteFromShingleIndex: a removed reference doc stops matching; " +
      "others unaffected; compaction purges; rebuild resets") {
    val idx = tmp("shdel")
    Dedup.saveShingleIndex(refDocs, "doc_id", "text", idx, n = 3)
    def refHits(): Set[Long] = Dedup.jaccardAgainstIndex(spark, idx,
        newDocs, "doc_id", "text", n = 3, threshold = 0.5)
      .select($"ref_id").collect().map(_.getLong(0)).toSet
    assert(refHits().contains(1L))
    // takedown of ref doc 1: its near-dups must no longer be suppressed
    Dedup.deleteFromShingleIndex(spark, idx, Seq(1L).toDF("doc_id"),
      "doc_id")
    assert(!refHits().contains(1L), "deleted reference doc still matching")
    // an unrelated ref appended AFTER the delete is visible (epoch rule)
    Dedup.appendToShingleIndex(
      Seq((4L, "the quick brown fox jumps over the lazy dog"))
        .toDF("doc_id", "text"), "doc_id", "text", idx, n = 3)
    assert(refHits().contains(4L))
    assert(!refHits().contains(1L))
    // compaction purges the dead rows and clears the log; answers stable
    val before = refHits()
    Dedup.compactShingleIndex(spark, idx)
    assert(refHits() == before)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(idx, "deletes")))
    assert(spark.read.parquet(Dedup.activeShingleDir(spark, idx))
      .filter($"ref_id" === 1L).count() == 0, "purge left dead rows")
    // post-compaction delete still works (epoch stayed monotone)
    Dedup.deleteFromShingleIndex(spark, idx, Seq(4L).toDF("doc_id"),
      "doc_id")
    assert(!refHits().contains(4L),
      "post-compaction delete missed an appended doc")
    // rebuild forgets deletions AND resets the generation pointer (the
    // pointer was at shingles.gen1 after the compaction above)
    Dedup.saveShingleIndex(refDocs, "doc_id", "text", idx, n = 3)
    assert(Dedup.activeShingleDir(spark, idx) == s"$idx/shingles",
      "rebuild must reset the generation pointer")
    assert(!new java.io.File(s"$idx/shingles.gen1").exists())
    assert(refHits().contains(1L), "rebuild must forget prior deletions")
  }

  test("index probe prunes untouched buckets and broadcasts the batch side") {
    val idx = tmp("shidx")
    Dedup.saveShingleIndex(refDocs, "doc_id", "text", idx, n = 3,
      numBuckets = 16)
    // one short probe doc → few shingles → few touched buckets
    val probe = Seq((10L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val df = Dedup.jaccardAgainstIndex(spark, idx, probe, "doc_id", "text",
      n = 3, threshold = 0.1, numBuckets = 16)
    val plan = df.queryExecution.executedPlan.toString
    // batch side broadcasts: the index side joins in place, no shuffle of
    // the (corpus-sized) index before the join
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast join of the batch side:\n$plan")
    // the probed buckets become PARTITION filters on the index scan —
    // untouched bucket directories are never read
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected bucket partition filters on the index scan:\n$plan")
    // 3 distinct probe shingles can touch at most 3 of the 16 buckets on
    // disk — assert actual pruning, not just the filter's presence
    // (walk through AQE wrappers: the scan hides inside query stages)
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[Int] = {
      val here = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          Seq(f.selectedPartitions.partitionCount)
        case _ => Nil
      }
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(s.plan)
        case _ => Nil
      }
      here ++ nested ++ p.children.flatMap(scans)
    }
    val scanned = scans(df.queryExecution.executedPlan)
    assert(scanned.nonEmpty && scanned.forall(_ <= 3),
      s"expected <=3 of 16 bucket partitions scanned, got $scanned")
  }

  test("maxShingleFreq at build time keeps hot shingles out of the index") {
    val hot = Seq(
      (1L, "common common common shared phrase one"),
      (2L, "common common common shared phrase two"),
      (3L, "common common common shared phrase three"))
      .toDF("doc_id", "text")
    val idx = tmp("shidx")
    Dedup.saveShingleIndex(hot, "doc_id", "text", idx, n = 3,
      maxShingleFreq = Some(2L))
    val stored = spark.read.parquet(s"$idx/shingles")
    // "common common common" appears in all 3 docs → dropped at build
    val freq = stored.groupBy("shingle").count().agg(max("count")).head.getLong(0)
    assert(freq <= 2L)
  }

  test("append + compact: lifecycle keeps probes correct, restores layout") {
    val idx = tmp("shidx")
    Dedup.saveShingleIndex(refDocs, "doc_id", "text", idx, n = 3,
      numBuckets = 8)
    // append a batch of kept docs; a later probe must see them
    val kept = Seq((20L, "fresh survivors join the reference corpus today"))
      .toDF("doc_id", "text")
    Dedup.appendToShingleIndex(kept, "doc_id", "text", idx, n = 3,
      numBuckets = 8)
    val probe = Seq((30L, "fresh survivors join the reference corpus today"))
      .toDF("doc_id", "text")
    def hits() = Dedup.jaccardAgainstIndex(spark, idx, probe, "doc_id",
        "text", n = 3, threshold = 0.5, numBuckets = 8)
      .select("new_id", "ref_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits() == Set((30L, 20L)))
    // appends accumulate small files; compaction restores 1 file/bucket,
    // publishing a NEW generation via the pointer file (no dir rename —
    // the object-store-safe protocol)
    Dedup.compactShingleIndex(spark, idx, numBuckets = 8)
    val active = Dedup.activeShingleDir(spark, idx)
    assert(active.endsWith("shingles.gen1"), active)
    assert(!new java.io.File(s"$idx/shingles").exists()) // superseded dir gone
    val bucketDirs = new java.io.File(active).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    assert(bucketDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    assert(hits() == Set((30L, 20L))) // identical results after the swap
    // append lands in the ACTIVE generation; a second compaction chains
    Dedup.appendToShingleIndex(
      Seq((40L, "late arrival text keeps the lifecycle going"))
        .toDF("doc_id", "text"), "doc_id", "text", idx, n = 3, numBuckets = 8)
    Dedup.compactShingleIndex(spark, idx, numBuckets = 8,
      keepPrevious = true)
    assert(Dedup.activeShingleDir(spark, idx).endsWith("shingles.gen2"))
    assert(new java.io.File(s"$idx/shingles.gen1").exists()) // grace kept
    assert(hits() == Set((30L, 20L)))
  }

  test("probes run concurrently with repeated compactions never crash") {
    val idx = tmp("shidx")
    Dedup.saveShingleIndex(refDocs, "doc_id", "text", idx, n = 3,
      numBuckets = 4)
    val probe = Seq((30L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      try {
        while (!stop) {
          val r = Dedup.jaccardAgainstIndex(spark, idx, probe, "doc_id",
              "text", n = 3, threshold = 0.5, numBuckets = 4)
            .select("ref_id").collect().map(_.getLong(0)).toSet
          assert(r == Set(1L), r) // every generation gives the same answer
        }
      } catch { case t: Throwable => failure = Some(t) }
    })
    reader.start()
    try {
      // keepPrevious: readers mid-scan of the superseded generation must
      // not lose their files (the documented grace contract)
      (0 until 3).foreach(_ =>
        Dedup.compactShingleIndex(spark, idx, numBuckets = 4,
          keepPrevious = true))
    } finally { stop = true; reader.join(30000) }
    assert(failure.isEmpty, s"concurrent probe failed: $failure")
    assert(Dedup.activeShingleDir(spark, idx).endsWith("shingles.gen3"))
  }

  test("appendToIvfIndex: persisted searches see appended vectors") {
    import graft.ml.Similarity
    val base = (0 until 12).map(i =>
      (i.toLong, Array.tabulate(4)(d => if (d == i % 2) 1.0f else 0.01f * i)))
      .toDF("vec_id", "embedding")
    val idx = tmp("ivfidx")
    Similarity.saveIvfIndex(base, "vec_id", "embedding", numCentroids = 2, idx)
    // a new vector identical to vec 0's direction, appended post-build
    val extra = Seq((100L, Array(1.0f, 0.0f, 0f, 0f))).toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(spark, extra, "vec_id", "embedding", idx)
    val q = Seq((0L, Array(1.0f, 0.0f, 0f, 0f))).toDF("vec_id", "embedding")
    val top = Similarity.ivfSearchPersisted(spark, idx, q, "vec_id",
        "embedding", k = 1, nProbe = 1).collect()
    assert(top.length == 1 && top.head.getAs[Long]("n_id") == 100L,
      top.mkString(","))
  }

  test("appendToIvfPqIndex: frozen-quantizer append, residual-aware, " +
      "searches see new vectors") {
    import graft.ml.Similarity
    val base = Seq(
      (1L, Array(4f, 2f, 0f, 0f)),
      (2L, Array(0f, 0f, 100f, 100f)),
      (3L, Array(5f, 4f, 0f, 0f)),
      (4L, Array(1f, 2f, 100f, 100f)),
    ).toDF("vec_id", "embedding")
    val idx = tmp("ivfpqidx-append")
    Similarity.saveIvfPqIndex(base, "vec_id", "embedding",
      numCentroids = 2, path = idx, numSubspaces = 2, pqCentroids = 3,
      dim = 4, residual = true)
    // append a vector whose residual (1,2,0,0) is an existing codebook
    // cell: the frozen quantizer encodes it exactly
    val extra = Seq((100L, Array(1f, 2f, 100f, 100f)))
      .toDF("vec_id", "embedding")
    Similarity.appendToIvfPqIndex(spark, extra, "vec_id", "embedding", idx)
    val q = Seq((0L, Array(2f, 3f, 100f, 100f))).toDF("vec_id", "embedding")
    val top = Similarity.ivfPqSearchPersisted(spark, idx, q, "vec_id",
        "embedding", k = 3, nProbe = 2).collect()
    val ids = top.map(_.getAs[Long]("n_id")).toSet
    assert(ids.contains(100L), s"appended vector missing: ${top.mkString(",")}")
    // the appended copy of vec 4 must score the IDENTICAL adc — the
    // append path used the same frozen codebook and residual flag
    val byId = top.map(r =>
      r.getAs[Long]("n_id") -> r.getAs[Double]("adc")).toMap
    assert(byId(100L) == byId(4L), byId.toString)
  }

  test("contaminationOverlap reports per-doc fractions, zero-overlap included") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // 3 of 3 4-grams hit
      (2L, "alpha beta gamma delta unrelated tail words"), // partial overlap
      (3L, "totally disjoint text with no shared grams at all"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val r = Dedup.contaminationOverlap(train, bench, "doc_id", "text", n = 4)
      .orderBy("train_id").collect()
    assert(r.length == 3) // every train doc reports, including zero-overlap
    val byId = r.map(x => x.getAs[Long]("train_id") ->
      (x.getAs[Long]("total_ngrams"), x.getAs[Long]("contaminated"),
        x.getAs[Double]("overlap_frac"))).toMap
    assert(byId(1L) == ((3L, 3L, 1.0)))
    assert(byId(2L)._1 == 4L && byId(2L)._2 == 1L) // "alpha beta gamma delta"
    assert(byId(3L)._2 == 0L && byId(3L)._3 == 0.0)
  }

  test("saveIvfIndex with kmeansIters persists refined centroids that " +
      "route searches consistently") {
    import graft.ml.Similarity
    // two tight clusters far from the lowest-id seeds
    val data = Seq(
      (1L, Array(1f, 1f, 0f, 0f)), (2L, Array(1.2f, 0.9f, 0f, 0f)),
      (3L, Array(0f, 0f, 1f, 1f)), (4L, Array(0f, 0f, 0.9f, 1.2f)),
      (5L, Array(1.1f, 1.1f, 0f, 0f)), (6L, Array(0f, 0f, 1.1f, 1.1f)),
    ).toDF("vec_id", "embedding")
    val idx = tmp("ivfidx-kmeans")
    Similarity.saveIvfIndex(data, "vec_id", "embedding", numCentroids = 2,
      idx, kmeansIters = 3)
    // persisted search equals the ad-hoc refined search row-for-row
    val q = data.filter($"vec_id" === 1L)
    val adhoc = Similarity.ivfSearch(data, q, "vec_id", "embedding",
        k = 2, numCentroids = 2, nProbe = 1, kmeansIters = 3)
      .orderBy("rk").collect().map(_.toSeq).toSeq
    val pers = Similarity.ivfSearchPersisted(spark, idx, q, "vec_id",
        "embedding", k = 2, nProbe = 1)
      .orderBy("rk").collect().map(_.toSeq).toSeq
    assert(pers == adhoc)
    // and the single-probe search stays inside the query's own cluster
    assert(pers.map(_(1).asInstanceOf[Long]).forall(Set(2L, 5L)))
  }
}
