package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Streaming-plane helpers: the reference's streaming semantics (S1/S2
  * snapshot-then-tail, CDC materialization, Q10 queued micro-batching)
  * plus the roadmap features (windows, watermarks, session state —
  * ROADMAP.md:95-106) that are Spark built-ins.
  */
object Streaming {

  /** S2: bootstrap-then-tail — a batch snapshot unioned ahead of the
    * stream (mongo.go:146-204's LoadInitialData + Read). With Spark the
    * union is a single plan; exactly-once dedup across the seam comes
    * from the id column.
    *
    * Caveat when the sink is a file sink: batch-appending the snapshot
    * into the streaming sink directory leaves it outside the sink's
    * `_spark_metadata` commit log, so later reads of the sink root
    * won't see it. Bootstrap by placing snapshot files in the stream
    * SOURCE directory (the file source picks them up as batch 0)
    * rather than writing to the sink out-of-band. */
  def snapshotThenTail(snapshot: DataFrame, tail: DataFrame): DataFrame =
    snapshot.unionByName(tail, allowMissingColumns = true)

  /** S1: streaming latest-per-key CDC materialization with a watermark
    * bound on state. */
  def cdcLatest(df: DataFrame, keyCol: String, timeCol: String,
      watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Tumbling window aggregate with watermark (roadmap "tumbling
    * windows + watermarks"). */
  def tumblingCounts(df: DataFrame, timeCol: String, width: String,
      watermark: String, groupCols: Column*): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), width) +: groupCols: _*)
      .agg(count(lit(1)).as("n"))

  /** Sliding window aggregate. */
  def slidingCounts(df: DataFrame, timeCol: String, width: String,
      slide: String, watermark: String, groupCols: Column*): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), width, slide) +: groupCols: _*)
      .agg(count(lit(1)).as("n"))

  /** Session window aggregate (gap-based; roadmap "session windows"). */
  def sessionCounts(df: DataFrame, timeCol: String, gap: String,
      watermark: String, groupCols: Column*): DataFrame =
    df.withWatermark(timeCol, watermark)
      .groupBy(session_window(col(timeCol), gap) +: groupCols: _*)
      .agg(count(lit(1)).as("n"))

  /** Deterministic training-mixture sampling (the sample_weighted
    * catalog operator), usable VERBATIM on batch or streaming frames:
    * keep a row iff its salted-FNV hash bucket (of `buckets`) falls
    * below the per-row `rateSql` threshold. The decision is a pure
    * function of the row — no state, no watermark, no rand() — so a
    * re-processed micro-batch, a task retry, or a backfill selects the
    * SAME rows, and the batch and streaming paths of one pipeline
    * agree row-for-row (StreamingSpec proves set equality). `buckets`
    * should stay a power of two so signed/unsigned hash views agree. */
  def sampleWeighted(df: DataFrame, idCol: String, rateSql: String,
      buckets: Int = 16384, salt: String = "mix:"): DataFrame = {
    // `bucket` is part of the OUTPUT contract (the catalog and its
    // oracle both read it), so it cannot be __graft_-prefixed away —
    // refuse inputs that already carry one instead of silently
    // overwriting the caller's column
    require(!df.columns.contains("bucket"),
      "sampleWeighted: input already has a 'bucket' column (it would be " +
        "overwritten by the sampling bucket output); rename it first")
    df.withColumn("bucket",
        pmod(graft.functions.fnv64(concat(lit(salt), col(idCol))),
          lit(buckets)))
      .filter(col("bucket") < expr(rateSql))
  }

  /** Q10 queued-writes semantics: micro-batch the stream through a
    * user function; the batchId is the reference's `sequence_number`
    * (service.go:1106-1159). Caller starts the returned writer. */
  def queuedWrites(df: DataFrame, triggerMs: Long)(
      f: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(triggerMs))
      .foreachBatch(f)

  /** Custom keyed state: running per-key counters via
    * mapGroupsWithState (roadmap "stateful transformations /
    * AggregatingState"). Exposed as a reusable primitive. */
  def runningCountState(count: Long, newRows: Long): Long = count + newRows
  def countPerKey(key: String, rows: Iterator[org.apache.spark.sql.Row],
      state: GroupState[Long]): (String, Long) = {
    val updated = state.getOption.getOrElse(0L) + rows.size
    state.update(updated)
    (key, updated)
  }
}
