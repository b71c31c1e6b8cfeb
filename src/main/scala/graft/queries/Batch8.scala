package graft.queries

import org.apache.spark.sql.functions._

import graft.queries.Catalog.{Q, events}

/** Query batch 8: the interval/range-join pattern and grouping-set
  * aggregation — the last two standard relational shapes on the
  * catalog.
  */
object Batch8 {

  val entries: Seq[(String, Q)] = Seq(

    // ---- interval join: each purchase matched to the same user's
    // clicks in the preceding 6 hours. Spark-first shape: a raw
    // time-inequality join would plan as a per-user cartesian
    // (O(clicks × purchases) per user — the as-of-join trap at 100 TB);
    // instead both sides bucket to interval-width grains, the purchase side
    // EXPLODES to its two candidate buckets (an interval of width w
    // spans ≤ 2 buckets of width w), and the join is an EQUI-join on
    // (user, bucket) with the exact inequality as a residual filter.
    // Shuffle keys are (user, bucket) — partitionable, skew-safe, and
    // each click meets only the purchases of two adjacent buckets.
    // The streaming twin (stream-stream join with watermarks + the
    // same time bounds) is replayed in StreamingSpec.
    "interval_join" -> Q(
      (s, dir) => {
        val ev = events(s, dir).select(col("event_id"), col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("us"))
        val w = 21600L * 1000000L
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("us").as("c_us"), floor(col("us") / w).as("bucket"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("us").as("p_us"))
          .withColumn("bucket",
            explode(array(floor(col("p_us") / w), floor(col("p_us") / w) - 1)))
        purchases.join(clicks, Seq("user_id", "bucket"))
          .filter(col("c_us") >= col("p_us") - w && col("c_us") < col("p_us"))
          .select(col("purchase_id"), col("click_id"), col("user_id"))
          .orderBy("purchase_id", "click_id")
      },
      Some("""SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
             |FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |      FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
             |      FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             | AND c.ts >= p.ts - INTERVAL 21600 SECOND
             | AND c.ts < p.ts
             |ORDER BY purchase_id, click_id""".stripMargin),
      "interval join via bucketized equi-join (≤2 buckets/interval) + residual filter"),

    // ---- explicit GROUPING SETS with grouping_id: the generalization
    // of the existing rollup/cube entries, including the flag that
    // disambiguates real NULLs from subtotal rows.
    "grouping_sets" -> Q(
      (s, dir) => {
        events(s, dir).createOrReplaceTempView("events_gs")
        s.sql(
          """SELECT event_type, user_id, count(*) AS n,
            |  CAST(grouping_id(event_type, user_id) AS BIGINT) AS gid
            |FROM events_gs
            |GROUP BY GROUPING SETS ((event_type, user_id), (event_type))
            |ORDER BY gid, event_type, user_id, n""".stripMargin)
      },
      Some("""SELECT event_type, user_id, count(*) AS n,
             |  CAST(grouping_id(event_type, user_id) AS BIGINT) AS gid
             |FROM events
             |GROUP BY GROUPING SETS ((event_type, user_id), (event_type))
             |ORDER BY gid, event_type, user_id NULLS FIRST, n""".stripMargin),
      "GROUPING SETS with grouping_id (subtotal rows disambiguated from real NULLs)"),
  )
}
