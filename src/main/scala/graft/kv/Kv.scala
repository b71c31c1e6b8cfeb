package graft.kv

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's three-verb KV statement language, re-expressed over
  * a keyed DataFrame.
  *
  * Statement grammar and quirks (all deliberately preserved):
  *  - tokenization is whitespace-fields (`strings.Fields`,
  *    `/root/reference/internal/store/store.go:1671,1324`)
  *  - `SET <key> [<value>...]`: value is the space-joined remainder and
  *    may be empty (`store.go:1682-1705`); reports rows_affected=1,
  *    last_insert_id=0
  *  - `DELETE <key>`: idempotent, always reports rows_affected=1
  *    (`store.go:1706-1730`)
  *  - `GET <key>`: returns a typed table `columns=[key,value],
  *    types=[text,blob]`; a miss is an empty table, not an error
  *    (`store.go:1300-1395`)
  */
sealed trait Statement
final case class SetStmt(key: String, value: String) extends Statement
final case class DeleteStmt(key: String) extends Statement
final case class GetStmt(key: String) extends Statement

/** Mirrors the reference's ExecuteQueryResponse for write statements
  * (`store.go:1697-1704`). */
final case class ExecResult(
    lastInsertId: Long = 0L,
    rowsAffected: Long = 1L,
    error: Option[String] = None)

/** Q9: read-consistency options (`internal/http/query_params.go:152-166`,
  * `store.go:2096-2118`). Spark has a single source of truth, so these
  * are accepted and recorded but have no effect — documented parity
  * per SURVEY §2.5 Q9. */
final case class ReadConsistency(
    level: String = "none", // none | weak | strong | auto
    freshness: Option[java.time.Duration] = None,
    freshnessStrict: Boolean = false) {
  require(Set("none", "weak", "strong", "auto").contains(level),
    s"invalid consistency level '$level'")
}

object StatementParser {
  /** Whitespace-fields tokenization, as in Go's `strings.Fields`. */
  def parse(stmt: String): Either[String, Statement] = {
    val fields = stmt.trim.split("\\s+").filter(_.nonEmpty).toSeq
    fields match {
      case Seq() => Left("empty statement")
      case verb +: rest =>
        verb.toUpperCase match {
          case "SET" =>
            rest match {
              case key +: value => Right(SetStmt(key, value.mkString(" ")))
              case _            => Left(s"SET requires a key: '$stmt'")
            }
          case "DELETE" =>
            rest match {
              case Seq(key) => Right(DeleteStmt(key))
              case _        => Left(s"DELETE requires exactly a key: '$stmt'")
            }
          case "GET" =>
            rest match {
              case Seq(key) => Right(GetStmt(key))
              case _        => Left(s"GET requires exactly a key: '$stmt'")
            }
          case other => Left(s"unknown verb '$other' in '$stmt'")
        }
    }
  }
}

/** A batch KV engine over a `DataFrame[key: string, value: string]`.
  *
  * Scale design: applying a batch of N statements is ONE distributed
  * merge — the statements become a small DataFrame, last-write-wins per
  * key is a window over that (tiny) side, and the merge into the
  * (potentially huge, 100 TB-scale) state table is a broadcast
  * left-anti join (drop touched keys) plus a union of the SET rows —
  * no per-statement pass over the state, no driver-side loop over
  * state rows, and no shuffle of the state side.
  */
final class KvEngine(spark: SparkSession, initial: DataFrame,
    compactEvery: Int = 32) {
  import KvEngine._
  require(compactEvery > 0, "compactEvery must be positive")

  private var stateDf: DataFrame = initial.select(
    col("key").cast(StringType), col("value").cast(StringType))
  private var batchesSinceCompact = 0

  def state: DataFrame = stateDf

  /** Apply SET/DELETE statements (last-write-wins within the batch) and
    * return one ExecResult per statement, in order. GETs embedded in the
    * batch are rejected like the reference's Execute path. */
  def execute(stmts: Seq[Statement]): Seq[ExecResult] = {
    val writes = stmts.collect {
      case s: SetStmt    => s: Statement
      case d: DeleteStmt => d: Statement
    }
    if (writes.nonEmpty) {
      stateDf = applyBatch(spark, stateDf, writes)
      // Each batch deepens the plan by an anti-join + union; a
      // long-lived session applying thousands of batches would re-plan
      // an ever-growing tree (and re-execute it per query). Compact via
      // localCheckpoint every `compactEvery` batches: materializes the
      // current state as cached blocks and resets lineage to a leaf.
      // Superseded checkpoints are dropped here and reclaimed by
      // Spark's ContextCleaner once unreferenced. localCheckpoint is
      // deliberate here (r11 verdict): the KV state is tiny, driver-
      // adjacent, and rebuilt from the statement log on any failure —
      // a reliable-FS checkpoint per compaction would be pure
      // overhead. The shared analytics subtrees use [[graft.queries
      // .Reuse]] instead, where executor loss must not kill queries.
      batchesSinceCompact += 1
      if (batchesSinceCompact >= compactEvery) {
        stateDf = stateDf.localCheckpoint(true)
        batchesSinceCompact = 0
      }
    }
    stmts.map {
      case _: SetStmt    => ExecResult()
      case _: DeleteStmt => ExecResult() // idempotent "1 affected", store.go:1725
      case _: GetStmt    => ExecResult(error = Some("GET not valid in execute"))
    }
  }

  /** Point lookup: `columns=[key,value]`, empty on miss. The
    * consistency option is accepted-and-ignored (Q9; Spark is the
    * single source of truth). */
  def query(get: GetStmt,
      consistency: ReadConsistency = ReadConsistency()): DataFrame =
    stateDf.filter(col("key") === lit(get.key)).select(col("key"), col("value"))

  /** Swap in a full replacement state (the `/db/load` restore path —
    * a dump is a complete database, so loading one REPLACES, exactly
    * like restoring a BadgerDB backup would in the reference's
    * commented-out handleLoad, `internal/http/service.go:762`). */
  def replaceState(newState: DataFrame): Unit = {
    stateDf = newState.select(
      col("key").cast(StringType), col("value").cast(StringType))
    batchesSinceCompact = 0
  }
}

object KvEngine {
  def empty(spark: SparkSession): KvEngine = {
    val schema = StructType(Seq(
      StructField("key", StringType), StructField("value", StringType)))
    new KvEngine(spark, spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
  }

  def apply(spark: SparkSession, state: DataFrame): KvEngine =
    new KvEngine(spark, state)

  /** One-shot distributed merge of a write batch into a keyed state
    * table. Exposed for direct use over arbitrary state DataFrames.
    * The Seq shape is the HTTP Execute path (statements arrive at the
    * driver); for high-volume loads use [[applyBatchDf]] — a driver
    * Seq re-encodes every row on the driver per action, which caps
    * throughput and cannot hold a 100 TB-scale restore. */
  def applyBatch(spark: SparkSession, state: DataFrame,
      writes: Seq[Statement]): DataFrame = {
    import spark.implicits._
    val rows = writes.zipWithIndex.map {
      case (SetStmt(k, v), i)  => (i.toLong, k, v, "set")
      case (DeleteStmt(k), i)  => (i.toLong, k, null: String, "delete")
      case (GetStmt(k), i)     => (i.toLong, k, null: String, "get")
    }
    applyBatchDf(state, rows.toDF("seq", "key", "value", "op"))
  }

  /** The bulk-load twin of [[applyBatch]]: the same last-write-wins +
    * broadcast-anti-join merge, with the statement batch arriving as
    * a DataFrame `(seq BIGINT, key STRING, value STRING, op STRING
    * in 'set'|'delete'|'get')` instead of a driver-side Seq. This is
    * the reference's chunked bulk-load shape (`internal/command/
    * chunking/chunker.go:17,30` streams 1 MiB gzip chunks into the
    * same FSM apply) re-expressed scale-first: statements stay
    * distributed end-to-end (never a driver Seq), and ties within
    * the batch still resolve by `seq` (statement order), exactly as
    * the Seq path. The forced broadcast sizes this for incremental
    * batches (touched keys fit a broadcast); a FULL restore replaces
    * state wholesale via [[KvEngine.replaceState]]/[[load]] instead
    * of merging, so the broadcast bound is never the restore path's
    * bottleneck. */
  def applyBatchDf(state: DataFrame, writes: DataFrame): DataFrame = {
    // Last write per key within the batch wins (statement order =
    // seq). max_by instead of a window + row_number: the aggregate
    // gets MAP-SIDE partial aggregation, so a hot-key batch collapses
    // to one row per key per input partition BEFORE the shuffle — the
    // window shuffled and sorted every write row. (The var-length
    // struct buffer makes this a SortAggregate, not HashAggregate —
    // local key-sorts on already-collapsing inputs; the shuffle-volume
    // win is the partial combine, pinned in KvSpec.) CONTRACT: a NULL
    // `seq` ranks below every real one (coalesced to Long.MinValue in
    // lastWrites, so an all-null key keeps a real row instead of being
    // silently dropped — see the guard note there); `seq`
    // must be unique per key within a batch (it is the statement
    // order; the Seq path derives it from position) — with duplicate
    // seqs "the last write" is ill-defined and either plan picks one
    // nondeterministically.
    // `last` feeds BOTH merge branches (the broadcast of touched keys
    // and the union of surviving SETs); without materialization the
    // batch scan+shuffle+window subtree executes once per branch —
    // column pruning makes the two exchanges non-identical, so
    // ReuseExchange cannot deduplicate them (measured: 2 un-reused
    // hashpartitioning exchanges). A LAZY localCheckpoint computes
    // the window once (the broadcast branch runs first and caches the
    // blocks; the union branch reads them) without an eager job at
    // call time. Size is bounded by the batch's distinct keys — the
    // same bound the broadcast already imposes — and the
    // truncated-lineage tradeoff is the one KvEngine's compaction
    // already accepts for this state (rebuilt from the statement log
    // on failure).
    val last = lastWrites(writes).localCheckpoint(false)
    // Merge = drop every touched key from state (broadcast anti join —
    // a full-outer join could NOT broadcast and would sort-merge-shuffle
    // the entire state table per batch), then union the surviving SETs
    // back in. Both halves keep the huge state side shuffle-free.
    val touched = last.select(col("key"))
    val setRows = last.filter(col("op") === "set")
      .select(col("key"), col("value"))
    state.join(broadcast(touched), Seq("key"), "left_anti")
      .unionByName(setRows)
  }

  /** The batch's last-write set, pre-checkpoint — exposed
    * private[graft] so KvSpec can pin the plan shape (partial+final
    * max_by aggregate — a SortAggregate, the struct buffer is
    * var-length — never a window). */
  private[graft] def lastWrites(writes: DataFrame): DataFrame =
    writes
      .filter(col("op") =!= "get")
      .groupBy(col("key"))
      // NULL-seq guard (ADVICE r20): max_by IGNORES rows whose sort key
      // is null, so a key whose batch writes all carried null seqs
      // would yield a (key, null, null) row — dropped from state by the
      // anti-join with its SET never surviving — where the old
      // row_number window (seq desc, nulls last) kept a real row.
      // Coalescing null to Long.MinValue restores that contract: any
      // real seq outranks a null one, and an all-null key still keeps
      // one of its actual rows. As with duplicate seqs (documented on
      // applyBatchDf), WHICH all-null row wins is unspecified.
      .agg(max_by(struct(col("value"), col("op")),
        coalesce(col("seq"), lit(Long.MinValue))).as("__lw"))
      .select(col("key"), col("__lw.value").as("value"), col("__lw.op").as("op"))

  /** Persist / reload state between batches (parquet round-trip). */
  def save(state: DataFrame, path: String): Unit =
    state.write.mode("overwrite").parquet(path)
  def load(spark: SparkSession, path: String): KvEngine =
    new KvEngine(spark, spark.read.parquet(path))
}
