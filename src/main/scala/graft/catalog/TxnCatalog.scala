package graft.catalog

import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned, atomically-committed stats catalog — the transaction-log
  * layer over [[StatsCatalog]]'s per-file statistics table.
  *
  * The reference updates its snapshot/manifest catalog in place under a
  * process-wide lock (parseable `src/catalog/mod.rs:108-187`); that breaks
  * down the moment two writers (ingest sync + compaction + retention) race.
  * This is the Iceberg/Delta-shaped fix, built from first principles:
  *
  *   - each catalog version's data lives in a writer-unique immutable
  *     parquet snapshot dir (`v<N>-<uuid>/`) — concurrent writers can never
  *     scribble on each other's data;
  *   - a version becomes visible only when its marker `_commits/<N>.json`
  *     appears. The marker is published with `Files.createLink` (hard link
  *     to a fully-written temp file): atomic, fails if the version is
  *     already claimed, and the name appears with complete content — so
  *     readers never see a half commit. (NOT a rename: POSIX rename()
  *     silently replaces an existing target, letting two writers both
  *     "win".)
  *   - writers use optimistic concurrency: read latest N, write snapshot
  *     for N+1, try to publish the marker; on conflict, re-apply the update
  *     function on the new latest and retry;
  *   - readers pin a version for their whole operation → snapshot isolation
  *     (a concurrent compaction can't make a query's file list dangle).
  *
  * Scale note: snapshots are stats rows (one per data file) — small even at
  * millions of files — and time travel is free (old versions stay until
  * [[vacuum]]).
  */
object TxnCatalog {

  private def commitsDir(root: String): Path = Paths.get(root, "_commits")

  /** Latest committed version, or None for an empty/uninitialized catalog. */
  def latestVersion(root: String): Option[Long] = {
    val d = commitsDir(root)
    if (!Files.isDirectory(d)) None
    else {
      val vs = Files.list(d).toArray.toSeq
        .map(p => p.asInstanceOf[Path].getFileName.toString)
        .flatMap { name =>
          if (name.endsWith(".json"))
            scala.util.Try(name.stripSuffix(".json").toLong).toOption
          else None
        }
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** The committed snapshot dir for a version (from its marker). */
  private def snapshotDir(root: String, v: Long): Option[String] = {
    val marker = commitsDir(root).resolve(s"$v.json")
    if (!Files.exists(marker)) None
    else {
      val txt = Files.readString(marker)
      // marker JSON is flat; pull "dir" without a JSON dependency
      "\"dir\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
        .map(m => Paths.get(root, m.group(1)).toString)
    }
  }

  /** Read a snapshot: the given version, or the latest committed one.
    * None if the catalog has no commits yet.
    */
  def snapshot(spark: SparkSession, root: String,
               version: Option[Long] = None): Option[DataFrame] =
    version.orElse(latestVersion(root))
      .flatMap(v => snapshotDir(root, v))
      .map(spark.read.parquet(_))

  /** Atomically commit `update(current)` as the next version. The update
    * function is re-applied on conflict (optimistic concurrency), so it must
    * be a pure function of the current snapshot. Returns the committed
    * version number.
    */
  def commit(spark: SparkSession, root: String, maxRetries: Int = 10)(
      update: Option[DataFrame] => DataFrame): Long = {
    var attempt = 0
    while (true) {
      val base = latestVersion(root)
      val next = base.getOrElse(-1L) + 1
      val updated = update(snapshot(spark, root, base))
      // writer-unique snapshot data, invisible until the marker lands
      val dirName = f"v$next%06d-${UUID.randomUUID().toString.take(8)}"
      updated.coalesce(1).write.mode("overwrite")
        .parquet(Paths.get(root, dirName).toString)
      Files.createDirectories(commitsDir(root))
      val tmp = Files.createTempFile(commitsDir(root), s".v$next-", ".tmp")
      Files.writeString(tmp,
        s"""{"version": $next, "dir": "$dirName", "ts": ${System.currentTimeMillis()}}""")
      try {
        Files.createLink(commitsDir(root).resolve(s"$next.json"), tmp)
        Files.deleteIfExists(tmp)
        return next
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // lost the race — another writer committed <next>; our orphan data
          // dir is invisible (no marker references it); clean it up and
          // re-apply on top of the new latest
          Files.deleteIfExists(tmp)
          deleteRecursively(Paths.get(root, dirName))
          attempt += 1
          if (attempt > maxRetries)
            throw new IllegalStateException(
              s"catalog commit contention: gave up after $maxRetries retries")
      }
    }
    -1L // unreachable
  }

  /** Incremental stats refresh: compute [[StatsCatalog]] rows ONLY for data
    * files not yet in the catalog and append them as a new version. The full
    * `StatsCatalog.refresh` rescans every file — O(table); this diffs the
    * file listing against the catalog and runs the stats job over just the
    * new paths — O(new data), the only refresh economics that survive
    * 100 TB. (Catalog paths are `file:`-scheme URIs, as `_metadata` emits.)
    */
  def appendNewFiles(spark: SparkSession, tableRoot: String, root: String,
                     statCols: Seq[String]): Long =
    commit(spark, root) { current =>
      val known: Set[String] = current
        .map(_.select("file_path").collect().map(_.getString(0)).toSet)
        .getOrElse(Set.empty)
      val onDisk = listParquet(Paths.get(tableRoot))
      val fresh = onDisk.filterNot(p => known.contains(p))
      val freshStats =
        if (fresh.isEmpty)
          current.getOrElse(
            StatsCatalog.collect(spark, tableRoot, statCols).limit(0))
            .limit(0)
        else StatsCatalog.collectFiles(spark, fresh, statCols)
      current.map(_.unionByName(freshStats, allowMissingColumns = true))
        .getOrElse(freshStats)
    }

  /** [[appendNewFiles]] with partition-watermark discovery: instead of
    * walking the whole table to diff against the catalog, only partition
    * directories lexically ≥ the highest partition already cataloged are
    * listed — O(new partitions + files in the newest partition), not
    * O(table). With date-encoded partition names (`date=YYYY-MM-DD/…`, the
    * ingest layout) lexical order IS time order.
    *
    * Assumes partitions arrive in non-decreasing order (true for the
    * arrival-time-derived ingest path). For out-of-order backfill into old
    * partitions use [[appendNewFiles]] — its full diff is the safe path.
    */
  def appendNewFilesWatermarked(spark: SparkSession, tableRoot: String,
                                root: String, statCols: Seq[String]): Long =
    commit(spark, root) { current =>
      val tableUri = Paths.get(tableRoot).toUri.toString
        .replaceFirst("^file:///", "file:/")
      // top-level partition of a cataloged file = first path segment under
      // the table root ("" for unpartitioned files)
      def partOf(uri: String): String = {
        val rel = uri.stripPrefix(tableUri).stripPrefix("/")
        val slash = rel.indexOf('/')
        if (slash < 0) "" else rel.substring(0, slash)
      }
      val watermark: Option[String] =
        current.flatMap(c => partitionWatermark(c, tableUri))
      val fresh = watermark match {
        case None => listParquet(Paths.get(tableRoot)) // empty catalog: full list
        case Some(wm) =>
          // only the known files of the single watermark partition are
          // needed for the diff — filtered in Spark, so the driver only
          // materializes one partition's paths, never the whole catalog
          val knownInWm: Set[String] = current
            .map(_.filter(partitionOfExpr(tableUri) === wm)
              .select("file_path").collect().map(_.getString(0)).toSet)
            .getOrElse(Set.empty)
          val dirs = Files.list(Paths.get(tableRoot)).toArray.toSeq
            .map(_.asInstanceOf[Path])
            .filter(p => Files.isDirectory(p) &&
              p.getFileName.toString >= wm)
          dirs.flatMap(d => listParquet(d))
            .filterNot(p => partOf(p) < wm || knownInWm.contains(p))
      }
      val freshStats =
        if (fresh.isEmpty)
          current.getOrElse(
            StatsCatalog.collect(spark, tableRoot, statCols).limit(0))
            .limit(0)
        else StatsCatalog.collectFiles(spark, fresh, statCols)
      current.map(_.unionByName(freshStats, allowMissingColumns = true))
        .getOrElse(freshStats)
    }

  /** Top-level partition of a cataloged `file_path` as a Spark expression:
    * first path segment under the table root, "" for unpartitioned files.
    * Mirrors the driver-side `partOf` in [[appendNewFilesWatermarked]].
    */
  private[catalog] def partitionOfExpr(
      tableUri: String): org.apache.spark.sql.Column = {
    val rel = regexp_replace(col("file_path"),
      "^" + java.util.regex.Pattern.quote(tableUri) + "/?", "")
    when(rel.contains("/"), substring_index(rel, "/", 1)).otherwise(lit(""))
  }

  /** Highest cataloged partition, computed as a single-row `max` aggregate —
    * the driver fetches ONE row regardless of catalog size. (The previous
    * shape collected every `file_path` to the driver per ingest append:
    * O(total files) driver memory — hundreds of MB of strings at ~10⁶
    * files.) Partition names on the ingest path are ASCII (`date=…`), where
    * Spark's UTF-8 binary string max and the JVM's lexical max agree.
    */
  private[catalog] def partitionWatermark(snapshot: DataFrame,
                                          tableUri: String): Option[String] = {
    val row = snapshot.agg(max(partitionOfExpr(tableUri)).as("wm")).head()
    if (row.isNullAt(0)) None else Some(row.getString(0))
  }

  /** Full bidirectional reconcile as one atomic version: stat files the
    * catalog doesn't know (backfill into old partitions included — the
    * case [[appendNewFilesWatermarked]] deliberately skips) AND drop rows
    * whose files are gone (retention, compaction, manual deletes). O(table
    * listing) + a stats job over new files only — the occasional-repair
    * path; the per-append hot path stays [[appendNewFilesWatermarked]].
    */
  def reconcile(spark: SparkSession, tableRoot: String, root: String,
                statCols: Seq[String]): Long =
    commit(spark, root) { current =>
      val onDisk = listParquet(Paths.get(tableRoot))
      val onDiskSet = onDisk.toSet
      val known: Set[String] = current
        .map(_.select("file_path").collect().map(_.getString(0)).toSet)
        .getOrElse(Set.empty)
      val fresh = onDisk.filterNot(known.contains)
      val kept = current.map(_.filter(col("file_path").isInCollection(
        // isin over a big list builds a wide predicate; for catalog-sized
        // row counts this is fine (driver-bounded metadata)
        onDiskSet))).getOrElse(
        StatsCatalog.collect(spark, tableRoot, statCols).limit(0))
      if (fresh.isEmpty) kept
      else kept.unionByName(
        StatsCatalog.collectFiles(spark, fresh, statCols),
        allowMissingColumns = true)
    }

  /** Recursive parquet listing as `file:`-scheme URIs (matching the
    * `_metadata.file_path` format the stats rows carry).
    */
  private def listParquet(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Nil
    else Files.walk(dir).toArray.toSeq.map(_.asInstanceOf[Path])
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(_.toUri.toString.replaceFirst("^file:///", "file:/"))

  /** Rewrite the catalog after a compaction: drop rows for `removed` data
    * files and append stats for the replacement files — one atomic version.
    */
  def replaceFiles(spark: SparkSession, root: String, removed: Seq[String],
                   added: DataFrame): Long =
    replaceWhere(spark, root, col("file_path").isin(removed: _*), added)

  /** As [[replaceFiles]] with a predicate over `file_path` (e.g. "every
    * file under this rewritten partition dir").
    */
  def replaceWhere(spark: SparkSession, root: String,
                   removeCond: org.apache.spark.sql.Column,
                   added: DataFrame): Long =
    commit(spark, root) { current =>
      val kept = current.map(_.filter(!removeCond))
      kept.map(_.unionByName(added, allowMissingColumns = true))
        .getOrElse(added)
    }

  /** Drop versions older than the latest `keep` (marker first, then data:
    * a version without a marker is invisible, so readers can't pick up a
    * half-deleted snapshot; readers already pinned to it fail fast — run
    * vacuum outside query windows).
    */
  def vacuum(root: String, keep: Int = 2): Unit = {
    val latest = latestVersion(root).getOrElse(return)
    val cutoff = latest - keep + 1
    (0L until cutoff).foreach { v =>
      snapshotDir(root, v).foreach { dir =>
        Files.deleteIfExists(commitsDir(root).resolve(s"$v.json"))
        deleteRecursively(Paths.get(dir))
      }
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
    }
}
