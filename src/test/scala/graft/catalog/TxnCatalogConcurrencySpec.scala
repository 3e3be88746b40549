package graft.catalog

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import graft.SparkSuite

/** Snapshot-isolation properties of [[TxnCatalog]] under real thread races —
  * the concurrency the reference's in-place, process-locked catalog update
  * cannot survive (parseable `src/catalog/mod.rs:108-187`). Two invariants:
  *
  *   1. LINEARIZABLE APPENDS: racing committers may retry, but every commit's
  *      logical update lands exactly once — no lost updates, no duplicates,
  *      contiguous versions, and no orphan snapshot dirs left behind by
  *      losers.
  *   2. TORN-READ FREEDOM: a reader that pins a version observes a snapshot
  *      that is exactly the prefix of commits up to that version — never a
  *      half-published write, never rows from two versions mixed.
  */
class TxnCatalogConcurrencySpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("txncc").toString

  test("racing committers: every append lands exactly once, versions " +
       "contiguous, loser snapshot dirs cleaned up") {
    val root = tmp()
    val writers = 3
    val perWriter = 3
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    (0 until writers).foreach { w =>
      pool.execute { () =>
        start.await()
        try {
          (0 until perWriter).foreach { k =>
            TxnCatalog.commit(spark, root, maxRetries = 100) { cur =>
              val mine = Seq((s"w$w-k$k", 1L)).toDF("file_path", "num_rows")
              cur.map(_.unionByName(mine)).getOrElse(mine)
            }
          }
        } catch { case t: Throwable => failures.add(t) }
      }
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS), "writers hung")
    assert(failures.isEmpty, failures.asScala.map(_.getMessage).toSeq)

    val total = writers * perWriter
    assert(TxnCatalog.latestVersion(root).contains(total - 1L))
    val rows = TxnCatalog.snapshot(spark, root).get
      .select("file_path").as[String].collect().toSeq
    assert(rows.size == total, s"lost/duplicated updates: $rows")
    assert(rows.toSet ==
      (for (w <- 0 until writers; k <- 0 until perWriter)
        yield s"w$w-k$k").toSet)
    // every version marker resolves to a live dir; every v* dir on disk is
    // referenced by some marker (race losers removed their orphans)
    val referenced = (0L until total.toLong).map { v =>
      val snap = TxnCatalog.snapshot(spark, root, Some(v))
      assert(snap.isDefined, s"version $v lost its snapshot")
      assert(snap.get.count() == v + 1, s"version $v is not a $v+1-row prefix")
      v
    }
    assert(referenced.size == total)
    val dirsOnDisk = Files.list(Paths.get(root)).toArray.toSeq
      .map(_.asInstanceOf[java.nio.file.Path].getFileName.toString)
      .filter(_.startsWith("v"))
    assert(dirsOnDisk.size == total,
      s"orphan snapshot dirs left behind: $dirsOnDisk")
  }

  test("readers racing writers always see a consistent committed prefix " +
       "(seq = 1..v+1), never a torn or mixed snapshot") {
    val root = tmp()
    // seed so readers always have something to pin
    TxnCatalog.commit(spark, root)(_ => Seq(1L).toDF("seq"))
    val writers = 2
    val perWriter = 4
    val pool = Executors.newFixedThreadPool(writers + 2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val writersDone = new java.util.concurrent.atomic.AtomicInteger(0)
    val snapshotsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    (0 until writers).foreach { _ =>
      pool.execute { () =>
        try {
          // each commit appends the next seq — a PURE function of the
          // current snapshot, so version v must hold exactly seqs 1..v+1
          (0 until perWriter).foreach { _ =>
            TxnCatalog.commit(spark, root, maxRetries = 100) { cur =>
              val n = cur.map(_.count()).getOrElse(0L)
              cur.map(_.unionByName(Seq(n + 1).toDF("seq")))
                .getOrElse(Seq(n + 1).toDF("seq"))
            }
          }
        } catch { case t: Throwable => failures.add(t) }
        finally { writersDone.incrementAndGet(); () }
      }
    }
    (0 until 2).foreach { _ =>
      pool.execute { () =>
        try {
          while (writersDone.get() < writers) {
            val v = TxnCatalog.latestVersion(root).get
            val seqs = TxnCatalog.snapshot(spark, root, Some(v)).get
              .as[Long].collect().sorted.toSeq
            assert(seqs == (1L to v + 1).toSeq,
              s"torn snapshot at v$v: $seqs")
            snapshotsSeen.incrementAndGet()
          }
        } catch { case t: Throwable => failures.add(t) }
      }
    }
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS), "threads hung")
    assert(failures.isEmpty, failures.asScala.map(_.toString).toSeq)
    val finalSeqs = TxnCatalog.snapshot(spark, root).get
      .as[Long].collect().sorted.toSeq
    assert(finalSeqs == (1L to (writers * perWriter + 1)).toSeq)
    assert(snapshotsSeen.get() > 0, "readers never overlapped the writers")
  }

  test("vacuum racing latest-readers: the current snapshot never breaks; " +
       "a reader pinned to a vacuumed version fails fast, not silently") {
    val root = tmp()
    (0 until 3).foreach { i =>
      TxnCatalog.commit(spark, root) { _ =>
        Seq((s"f$i", i.toLong)).toDF("file_path", "num_rows")
      }
    }
    val pool = Executors.newFixedThreadPool(2)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reads = new java.util.concurrent.atomic.AtomicInteger(0)
    // reader: always resolve LATEST, read it fully. A read can straddle a
    // vacuum that retires the version it just pinned — the DOCUMENTED
    // contract is fail-FAST there (missing files), never silently-wrong
    // data, so a missing-file error is tolerated and anything else
    // (including a row count that shrinks) is a real failure
    pool.execute { () =>
      try {
        while (!done.get()) {
          try {
            val rows = TxnCatalog.snapshot(spark, root).get.count()
            assert(rows >= 1)
            reads.incrementAndGet()
          } catch {
            case e: Throwable
                if Option(e.getMessage).exists(m =>
                  m.contains("does not exist") ||
                    m.contains("PATH_NOT_FOUND") ||
                    m.contains("FileNotFound")) => () // documented fail-fast
          }
        }
      } catch { case t: Throwable => failures.add(t) }
    }
    // writer: commit then immediately vacuum down to 2 versions, 5 cycles
    pool.execute { () =>
      try {
        (3 until 8).foreach { i =>
          TxnCatalog.commit(spark, root) { cur =>
            cur.get.unionByName(
              Seq((s"f$i", i.toLong)).toDF("file_path", "num_rows"))
          }
          TxnCatalog.vacuum(root, keep = 2)
        }
      } catch { case t: Throwable => failures.add(t) }
      finally { done.set(true); () }
    }
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS), "threads hung")
    assert(failures.isEmpty, failures.asScala.map(_.toString).toSeq)
    assert(reads.get() > 0, "reader never ran")
    // old versions are gone: pinning one resolves to no snapshot (marker
    // deleted first), or a read of it fails fast — never a silent empty
    assert(TxnCatalog.snapshot(spark, root, Some(0L)).isEmpty)
    assert(TxnCatalog.latestVersion(root).contains(7L))
    // seeds v0-v2 each REPLACED the snapshot (1 row); v3-v7 appended one
    // row each onto v2's single row -> 6 rows at v7
    assert(TxnCatalog.snapshot(spark, root).get.count() == 6L)
  }
}
