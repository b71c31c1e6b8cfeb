package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.kv._
import graft.queries.Catalog.{Q, table, events}

/** Query batch 2: the KV statement plane, the roadmap SQL plane
  * (rollup, set ops, semi/anti joins, windows, sessionization), and the
  * text-analysis plane over `documents`. Same numeric-determinism
  * policy as Catalog. */
object Batch2 {

  private val d4 = DecimalType(18, 4)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(d4)
  private def decSql(c: String) = s"CAST($c AS DECIMAL(18,4))"

  /** The fixed KV scenario shared by the kv_* queries: state built from
    * events (key `u<user_id>`, value = max event_id), then a statement
    * batch exercising upsert / insert / delete / empty-value /
    * last-write-wins quirks. */
  private def kvScenario(s: SparkSession, dir: String): KvEngine = {
    val base = events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(col("event_id")).as("maxid"))
      .select(concat(lit("u"), col("user_id")).as("key"),
        col("maxid").cast(StringType).as("value"))
    val eng = KvEngine(s, base)
    val stmts = Seq(
      "SET u3 999",            // overwrite existing
      "SET zz hello world",    // new key, space-joined value
      "SET u7",                // empty value (store.go:1693: value may be empty)
      "DELETE u5",             // delete existing
      "DELETE nosuch",         // idempotent delete of missing key
      "SET u3 1000"            // last-write-wins within the batch
    ).map(StatementParser.parse(_).fold(e => sys.error(e), identity))
    eng.execute(stmts)
    eng
  }

  private val kvOracleBase =
    """WITH base AS (
      |  SELECT 'u' || user_id AS key, CAST(max(event_id) AS VARCHAR) AS value
      |  FROM events GROUP BY user_id),
      |applied AS (
      |  SELECT key, value FROM base WHERE key NOT IN ('u3','u5','u7','zz')
      |  UNION ALL SELECT 'u3', '1000'
      |  UNION ALL SELECT 'zz', 'hello world'
      |  UNION ALL SELECT 'u7', '')""".stripMargin

  val entries: Seq[(String, Q)] = Seq(

    // ---- Q1-Q3: the KV statement language over a keyed table
    "kv_apply" -> Q(
      (s, dir) => kvScenario(s, dir).state.orderBy("key"),
      Some(s"$kvOracleBase SELECT key, value FROM applied ORDER BY key"),
      "SET/DELETE batch merge, last-write-wins (reference store.go:1633-1766)"),

    // ---- the bulk write path (r17): the same last-write-wins +
    // broadcast-anti-join merge with the statement batch arriving as
    // a DISTRIBUTED DataFrame (KvEngine.applyBatchDf) — the
    // reference's chunked bulk-load shape (chunker.go streams 1 MiB
    // gzip chunks into the same FSM apply). 600k lineitem-derived
    // statements (sf0.1) against the events-derived base state:
    // overlapping upserts, deletes of present AND missing keys, and
    // within-batch ties resolved by the globally-unique seq. The
    // driver-Seq twin (kv_apply) proves the statement grammar; this
    // proves the high-volume merge at ~425k stmts/sec on local[4]
    // (ThroughputSpec pins the reference's own 100k/sec target).
    "kv_bulk_apply" -> Q(
      (s, dir) => {
        val base = events(s, dir)
          .groupBy(col("user_id"))
          .agg(max(col("event_id")).as("maxid"))
          .select(concat(lit("u"), col("user_id")).as("key"),
            col("maxid").cast(StringType).as("value"))
        val writes = table(s, dir, "lineitem").select(
          (col("l_orderkey") * 10 + col("l_linenumber"))
            .cast(LongType).as("seq"),
          concat(lit("u"), col("l_partkey") % 2000).as("key"),
          (col("l_orderkey") * 10 + col("l_linenumber"))
            .cast(StringType).as("value"),
          when(col("l_partkey") % 11 === 0, lit("delete"))
            .otherwise(lit("set")).as("op"))
        KvEngine.applyBatchDf(base, writes).orderBy("key")
      },
      Some("""WITH base AS (
             |  SELECT 'u' || user_id AS key,
             |    CAST(max(event_id) AS VARCHAR) AS value
             |  FROM events GROUP BY user_id),
             |writes AS (
             |  SELECT l_orderkey*10 + l_linenumber AS seq,
             |    'u' || (l_partkey % 2000) AS key,
             |    CAST(l_orderkey*10 + l_linenumber AS VARCHAR) AS value,
             |    CASE WHEN l_partkey % 11 = 0 THEN 'delete'
             |      ELSE 'set' END AS op
             |  FROM lineitem),
             |last AS (
             |  SELECT key, value, op FROM (
             |    SELECT key, value, op, row_number() OVER (
             |      PARTITION BY key ORDER BY seq DESC) AS rn
             |    FROM writes) WHERE rn = 1),
             |merged AS (
             |  SELECT b.key, b.value FROM base b
             |  WHERE b.key NOT IN (SELECT key FROM last)
             |  UNION ALL
             |  SELECT key, value FROM last WHERE op = 'set')
             |SELECT key, value FROM merged ORDER BY key""".stripMargin),
      "bulk statement merge via a distributed write batch (KvEngine.applyBatchDf; reference chunking/chunker.go:17,30)"),

    "kv_get_hit" -> Q(
      (s, dir) => kvScenario(s, dir).query(GetStmt("u3")),
      Some(s"$kvOracleBase SELECT key, value FROM applied WHERE key = 'u3'"),
      "GET point lookup, hit (reference store.go:1300-1395)"),

    "kv_get_miss" -> Q(
      (s, dir) => kvScenario(s, dir).query(GetStmt("u5")),
      Some("SELECT 'x' AS key, 'y' AS value WHERE 1 = 0"),
      "GET miss returns empty typed table, not an error (store.go:1376-1380)"),

    // ---- kv_apply through the STREAMING KV plane (round 12): the
    // same events-derived base + statement batch, but every op travels
    // as a statement FEED through StatefulKv's flatMapGroupsWithState
    // (Spark-managed per-key state) under the replay scaffold's
    // idempotent-sink discipline. Base state rides as one SET op per
    // event with seq = event_id, so last-write-wins reproduces
    // max(event_id) per key exactly; the 6 statements follow at seqs
    // above every event. Shares kv_apply's oracle verbatim — the
    // GroupState path must land on the identical final state.
    "kv_apply_stream" -> Q(
      (s, dir) => {
        import s.implicits._
        val stmtSeq0 = Long.MaxValue - 6
        val feed = events(s, dir).select(
          concat(lit("u"), col("user_id")).as("key"),
          lit("set").as("op"),
          col("event_id").cast(StringType).as("value"),
          col("event_id").cast(LongType).as("seq"))
        val stmts = Seq(
          ("u3", "set", "999"), ("zz", "set", "hello world"),
          ("u7", "set", ""), ("u5", "delete", null),
          ("nosuch", "delete", null), ("u3", "set", "1000"))
          .zipWithIndex.map { case ((k, op, v), i) => (k, op, v, stmtSeq0 + i) }
          .toDF("key", "op", "value", "seq")
        Catalog.replayFeedToParquet(s, feed.unionByName(stmts),
          xform = raw => {
            val ops = raw.select(col("key"), col("op"), col("value"), col("seq"))
              .as[graft.streaming.StatefulKv.KvOp]
            graft.streaming.StatefulKv.materialize(s, ops).toDF()
          })
          .filter(col("exists"))
          .select(col("key"), col("value"))
          .orderBy("key")
      },
      Some(s"$kvOracleBase SELECT key, value FROM applied ORDER BY key"),
      "kv_apply through the streaming GroupState plane (flatMapGroupsWithState; shared oracle)"),

    // ---- rollup / grouping sets
    "agg_rollup" -> Q(
      (s, dir) => {
        table(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
              |  CAST(sum(${decSql("l_quantity")}) AS DOUBLE) AS sum_qty
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
              |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      "rollup grouping sets (roadmap aggregations)"),

    // ---- exact distinct aggregation
    "agg_distinct" -> Q(
      (s, dir) => {
        table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      "distinct aggregation"),

    // ---- set operations
    "set_intersect" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val a = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        val b = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
        a.intersect(b).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |INTERSECT
             |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
             |ORDER BY o_custkey""".stripMargin),
      "INTERSECT set op"),

    "set_except" -> Q(
      (s, dir) => {
        val o = table(s, dir, "orders")
        val a = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        val b = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
        a.except(b).orderBy("o_custkey")
      },
      Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
             |ORDER BY o_custkey""".stripMargin),
      "EXCEPT set op"),

    // ---- semi / anti joins
    "join_semi" -> Q(
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val o95 = table(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1995)
        cust.join(o95, cust("c_custkey") === o95("o_custkey"), "left_semi")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS n_cust FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |              AND year(o.o_orderdate) = 1995)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      "left-semi join (EXISTS)"),

    "join_anti" -> Q(
      (s, dir) => {
        val cust = table(s, dir, "customer")
        val o95 = table(s, dir, "orders")
          .filter(year(col("o_orderdate")) === 1995)
        cust.join(o95, cust("c_custkey") === o95("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey, count(*) AS n_cust FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
             |                  AND year(o.o_orderdate) = 1995)
             |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      "left-anti join (NOT EXISTS)"),

    // ---- scalar function library sampler
    "scalar_funcs" -> Q(
      (s, dir) => {
        table(s, dir, "part").selectExpr(
          "p_partkey",
          "substring(p_name, 1, 8) AS name8",
          "length(p_name) AS name_len",
          "upper(p_brand) AS brand_u",
          "replace(p_type, ' ', '_') AS type_u",
          "abs(p_size - 25) AS size_dist",
          "p_partkey % 7 AS k7",
          "concat_ws('|', p_brand, p_type) AS bt")
          .orderBy("p_partkey")
      },
      Some("""SELECT p_partkey, substring(p_name, 1, 8) AS name8,
             |  length(p_name) AS name_len, upper(p_brand) AS brand_u,
             |  replace(p_type, ' ', '_') AS type_u, abs(p_size - 25) AS size_dist,
             |  p_partkey % 7 AS k7, concat_ws('|', p_brand, p_type) AS bt
             |FROM part ORDER BY p_partkey""".stripMargin),
      "string/math scalar functions"),

    // ---- date/time function sampler
    "date_funcs" -> Q(
      (s, dir) => {
        table(s, dir, "orders").selectExpr(
          "o_orderkey",
          "year(o_orderdate) AS y",
          "month(o_orderdate) AS m",
          "day(o_orderdate) AS d",
          "dayofweek(o_orderdate) AS dow1",
          "date_trunc('month', o_orderdate) AS month_start",
          "datediff(DATE'2002-01-01', o_orderdate) AS days_to_2002")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
             |  day(o_orderdate) AS d, EXTRACT(dow FROM o_orderdate) + 1 AS dow1,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      "date part extraction / truncation / difference"),

    // ---- conditional bucketing
    "case_bucket" -> Q(
      (s, dir) => {
        events(s, dir).selectExpr(
          "CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS bucket")
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      },
      Some("""SELECT CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid'
             |  ELSE 'high' END AS bucket, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin),
      "CASE WHEN bucketing"),

    // ---- ordered string aggregation
    "string_agg_sorted" -> Q(
      (s, dir) => {
        table(s, dir, "customer")
          .groupBy(col("c_nationkey"))
          .agg(array_join(array_sort(collect_set(col("c_mktsegment"))), ",").as("segments"))
          .orderBy("c_nationkey")
      },
      Some("""SELECT c_nationkey,
             |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments
             |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin),
      "sorted distinct string aggregation"),

    // ---- running / sliding / offset window functions
    "win_running" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        table(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey,
              |  CAST(sum(${decSql("o_totalprice")}) OVER (
              |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
              |    AS running_spend
              |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
      "running-total window"),

    "win_lag" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        table(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            (dec(col("o_totalprice")) - lag(dec(col("o_totalprice")), 1).over(w))
              .cast("double").as("delta_prev"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey,
              |  CAST(${decSql("o_totalprice")} - lag(${decSql("o_totalprice")}, 1) OVER (
              |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
              |    AS delta_prev
              |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
      "lag offset window"),

    "win_moving_avg" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(-2, Window.currentRow)
        table(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            (sum(dec(col("o_totalprice"))).over(w).cast("double") /
              count(lit(1)).over(w)).as("mavg3"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey,
              |  CAST(sum(${decSql("o_totalprice")}) OVER w AS DOUBLE) /
              |    count(*) OVER w AS mavg3
              |FROM orders
              |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
              |ORDER BY o_custkey, o_orderkey""".stripMargin),
      "sliding-frame moving average"),

    // ---- streaming-plane semantics, batch-expressed (tumbling window)
    "stream_tumbling" -> Q(
      (s, dir) => {
        events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("value"))).cast("double").as("sum_value"))
          .orderBy("win_start", "event_type")
      },
      Some(s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS win_start,
              |  event_type, count(*) AS n,
              |  CAST(sum(${decSql("value")}) AS DOUBLE) AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin),
      "tumbling event-time window (roadmap windowing; streaming twin in graft.streaming)"),

    // ---- sessionization (30-min inactivity gap per user)
    "stream_session" -> Q(
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val flagged = events(s, dir)
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
              .otherwise(0))
        flagged
          .withColumn("session_id", sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
          .orderBy("user_id", "session_id")
      },
      // Version-proof oracle: CAST(ts AS TIMESTAMP) truncates the
      // parquet ns timestamps to the same us values Spark computes
      // with; the gap test uses plain INTERVAL arithmetic instead of
      // epoch_us (dialect-moving); and the window sum is CAST to
      // BIGINT because DuckDB's sum(INTEGER) returns HUGEINT while
      // Spark returns BIGINT (driver hash divergence otherwise).
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tsu,
             |    CASE WHEN lag(CAST(ts AS TIMESTAMP), 1) OVER w IS NULL
             |      OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP), 1) OVER w
             |        > INTERVAL 1800 SECOND
             |      THEN 1 ELSE 0 END AS new_session
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
             |sessioned AS (
             |  SELECT user_id, event_id,
             |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY tsu, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM flagged)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(event_id) AS first_event
             |FROM sessioned GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin),
      "session windows via gap detection (roadmap session windows, ROADMAP.md:97)"),

    // ---- streaming dedup semantics (first event per key)
    "dedup_first_event" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        events(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"))
          .orderBy("user_id", "event_type")
      },
      Some("""SELECT user_id, event_type, event_id FROM (
             |  SELECT user_id, event_type, event_id,
             |    row_number() OVER (PARTITION BY user_id, event_type
             |      ORDER BY ts, event_id) AS rn
             |  FROM events) WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin),
      "keep-first dedup (dropDuplicatesWithinWatermark batch twin)"),

    // ---- Q8: parameterized statements (request_parser.go:28-229) via
    //      Spark's named-parameter SQL
    "param_sql" -> Q(
      (s, dir) => {
        events(s, dir).createOrReplaceTempView("events_v")
        s.sql(
          """SELECT event_id, event_type, value FROM events_v
            |WHERE value >= :lo AND value < :hi AND event_type = :t
            |ORDER BY event_id""".stripMargin,
          Map("lo" -> Int.box(50), "hi" -> Int.box(150), "t" -> "purchase"))
      },
      Some("""SELECT event_id, event_type, value FROM events
             |WHERE value >= 50 AND value < 150 AND event_type = 'purchase'
             |ORDER BY event_id""".stripMargin),
      "named-parameter SQL (reference Q8, typed params int/float/bool/bytes/string/null)"),
  )
}
