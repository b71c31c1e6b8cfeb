package graft

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.ops.Ann

/** Day-2 index operations under concurrency (VERDICT r11 item 6): a
  * reader racing [[Ann.compactIvf]]'s staged swap must never observe a
  * partially-swapped layout, and an append racing a compaction must be
  * either refused (retryable) or preserved — never silently lost or
  * doubled. The enforcement is the `_layout_lock` + `_appends_inflight`
  * marker protocol in Ann (the seqlock shape: marker visible before
  * the appender's lock check, compactor re-checks markers + the file
  * listing immediately before the swap).
  *
  * Reference behavior being improved on: the Go engine documents
  * at-most-once delivery with drop windows
  * (`internal/partitioner/partition.go:26-27`); here concurrent layout
  * maintenance must not reintroduce a loss window. */
class IndexConcurrencySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  private def fs =
    new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshIndex(): (Ann.IvfIndex, String) = {
    val index = Ann.buildIvf(emb, "embedding", k = 8)
    val path = Files.createTempDirectory("ivfconc").toString
    Ann.persistIvf(index, path)
    (Ann.loadIvf(spark, path), path)
  }

  /** New rows with ids shifted out of the fixture's range so every
    * appended row is identifiable in the final layout. */
  private def shifted(lo: Int, n: Int) = emb
    .filter($"vec_id" < n).withColumn("vec_id", $"vec_id" + lit(lo))

  test("append refuses a held layout lock (retryable), and nothing lands") {
    val (index, path) = freshIndex()
    val before = spark.read.parquet(s"$path/assigned").count()
    fs.create(new Path(s"$path/_layout_lock"), false).close()
    try {
      intercept[Ann.CompactionInFlightException] {
        Ann.appendToIvf(index, shifted(10000, 10), "embedding", path)
      }
      // refused append wrote no files and left no inflight marker
      assert(spark.read.parquet(s"$path/assigned").count() === before)
      assert(!fs.exists(new Path(s"$path/_appends_inflight")) ||
        fs.listStatus(new Path(s"$path/_appends_inflight")).isEmpty)
    } finally fs.delete(new Path(s"$path/_layout_lock"), false)
    // lock released → the retry succeeds
    Ann.appendToIvf(index, shifted(10000, 10), "embedding", path)
    assert(spark.read.parquet(s"$path/assigned").count() === before + 10)
  }

  test("compaction refuses to swap while an append is announced inflight") {
    val (_, path) = freshIndex()
    val before = spark.read.parquet(s"$path/assigned").count()
    val marker = new Path(s"$path/_appends_inflight/zombie-append")
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
    val e = intercept[IllegalStateException] {
      Ann.compactIvf(spark, path, appendDrainMs = 300L)
    }
    assert(e.getMessage.contains("inflight"))
    // aborted drain swapped nothing and released the lock
    assert(spark.read.parquet(s"$path/assigned").count() === before)
    assert(!fs.exists(new Path(s"$path/_layout_lock")))
    fs.delete(marker, false)
    Ann.compactIvf(spark, path) // and a clean retry compacts fine
    assert(spark.read.parquet(s"$path/assigned").count() === before)
  }

  test("concurrent appends racing compactions: every append lands exactly once") {
    val (index, path) = freshIndex()
    val baseIds = spark.read.parquet(s"$path/assigned")
      .select($"vec_id").as[Long].collect().toSet
    val batches = 4
    val perBatch = 15
    val appended = new AtomicInteger(0)
    val failed = new AtomicBoolean(false)
    val appender = new Thread(() => {
      try {
        (0 until batches).foreach { b =>
          val rows = shifted(10000 + b * 1000, perBatch)
          var done = false
          while (!done) {
            try {
              // the streaming scaffold's per-batch body: marker-guarded
              // append; a CompactionInFlightException fails the batch,
              // which at-least-once replays — modeled here as a retry
              // of the SAME batchId (idempotence must hold)
              Ann.appendBatchIdempotent(index, rows, "embedding", path,
                batchId = b.toLong, runToken = "conc-spec")
              done = true
            } catch {
              case _: Ann.CompactionInFlightException => Thread.sleep(100L)
            }
          }
          appended.incrementAndGet()
        }
      } catch { case _: Throwable => failed.set(true) }
    })
    appender.start()
    // compactor loop: keep compacting until the appender is done; a
    // concurrent-append abort is the protocol working, not a failure
    val deadline = System.currentTimeMillis() + 180000L
    while (appender.isAlive && System.currentTimeMillis() < deadline) {
      try Ann.compactIvf(spark, path)
      catch { case _: Ann.CompactionInFlightException => () }
      Thread.sleep(300L) // a lock-free window so retrying appenders make progress
    }
    assert(appender.isAlive === false || {
      appender.join(30000L); !appender.isAlive
    }, "appender starved behind the compaction loop")
    appender.join()
    assert(!failed.get(), "appender thread died")
    assert(appended.get() === batches)
    // replayed batch after everything settled: recognized, not doubled
    assert(!Ann.appendBatchIdempotent(index, shifted(10000, perBatch),
      "embedding", path, batchId = 0L, runToken = "conc-spec"))
    Ann.compactIvf(spark, path)
    val finalIds = spark.read.parquet(s"$path/assigned")
      .select($"vec_id").as[Long].collect().toSeq
    val expected = baseIds ++ (0 until batches).flatMap(b =>
      (0 until perBatch).map(i => (10000 + b * 1000 + i).toLong))
    assert(finalIds.size === finalIds.toSet.size, "an append was doubled")
    assert(finalIds.toSet === expected, "an append was lost")
  }

  test("reader racing the staged swap: every successful read sees the full layout") {
    val (_, path) = freshIndex()
    val n = spark.read.parquet(s"$path/assigned").count()
    val stop = new AtomicBoolean(false)
    val goodReads = new AtomicInteger(0)
    val badCounts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val c = spark.read.parquet(s"$path/assigned").count()
          if (c == n) goodReads.incrementAndGet() else badCounts.add(c)
        } catch {
          // the swap's two renames leave a sub-ms no-directory window:
          // a CLEAN transient failure (caller retries) is acceptable —
          // the invariant under test is that a read that SUCCEEDS never
          // returns a partial/mixed layout
          case _: Throwable => ()
        }
      }
    })
    reader.start()
    try (1 to 3).foreach(_ => Ann.compactIvf(spark, path))
    finally {
      // vitality, not invariant: under a loaded host every in-flight
      // read can overlap one of the three back-to-back swaps and fail
      // cleanly, leaving zero completed reads at stop time — so after
      // the last swap, give the reader a window with nothing racing it
      // (post-swap reads always succeed: probed empirically, fresh
      // listings see the new layout) before stopping
      val vitality = System.currentTimeMillis() + 30000L
      while (goodReads.get() == 0 && System.currentTimeMillis() < vitality)
        Thread.sleep(50L)
      stop.set(true); reader.join()
    }
    assert(goodReads.get() > 0, "reader never completed a read")
    assert(badCounts.isEmpty,
      s"reader observed partial layouts with counts ${badCounts}")
  }

  test("repairIvf restores a mid-swap crash immediately, even under a fresh lock") {
    // kill-9 between compactIvf's two renames: assigned missing,
    // assigned_old staged, tmp half-written, lock FRESH (finally never
    // ran). The restore must run before any staleness gate — gating it
    // on lock age would keep the index unreadable for tmpStaleMs.
    val (_, path) = freshIndex()
    val n = spark.read.parquet(s"$path/assigned").count()
    assert(fs.rename(new Path(s"$path/assigned"), new Path(s"$path/assigned_old")))
    fs.mkdirs(new Path(s"$path/assigned_compacting"))
    fs.create(new Path(s"$path/_layout_lock"), false).close()
    assert(Ann.repairIvf(spark, path))
    assert(spark.read.parquet(s"$path/assigned").count() === n)
    assert(!fs.exists(new Path(s"$path/assigned_compacting")))
    assert(!fs.exists(new Path(s"$path/_layout_lock")))
    // and the layout is fully operable again
    Ann.compactIvf(spark, path)
    assert(spark.read.parquet(s"$path/assigned").count() === n)
  }

  test("repairIvf clears stale lock and markers but refuses fresh ones") {
    val (_, path) = freshIndex()
    val lock = new Path(s"$path/_layout_lock")
    val marker = new Path(s"$path/_appends_inflight/crashed")
    fs.create(lock, false).close()
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
    // fresh lock → a compaction may be live → refuse
    intercept[IllegalStateException] { Ann.repairIvf(spark, path) }
    assert(fs.exists(lock))
    // age both past the staleness gate → cleared
    val old = System.currentTimeMillis() - 60 * 60 * 1000L
    fs.setTimes(lock, old, old)
    fs.setTimes(marker, old, old)
    Ann.repairIvf(spark, path)
    assert(!fs.exists(lock) && !fs.exists(marker))
    // and the layout is operable again end to end
    Ann.compactIvf(spark, path)
  }
}
