package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Catalog.{Q, events, table}

/** Query batch 5: streaming-analytics attribution (the as-of-join
  * pattern) and corpus featurization (TF-IDF). */
object Batch5 {

  val entries: Seq[(String, Q)] = Seq(

    // ---- last-click attribution: for each purchase, the same user's
    // most recent strictly-earlier click. This is the AS-OF JOIN
    // pattern — expressed Spark-first as ONE window over a
    // partition-by-user sort instead of a time-inequality self-join
    // (which Spark would plan as a per-user cartesian: O(clicks ×
    // purchases) per user at 100 TB, vs one sort here). Total order
    // (ts, event_id) makes the answer deterministic under ties.
    "asof_attribution" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        events(s, dir)
          .filter(col("event_type").isin("click", "purchase"))
          .withColumn("last_click_id",
            last(when(col("event_type") === "click", col("event_id")),
              ignoreNulls = true).over(w))
          .withColumn("last_click_ts",
            last(when(col("event_type") === "click", col("ts")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(
            col("event_id").as("purchase_id"),
            col("user_id"),
            col("ts").as("purchase_ts"),
            col("last_click_id"),
            (unix_micros(col("ts")) - unix_micros(col("last_click_ts")))
              .as("gap_us"))
          .orderBy("purchase_id")
      },
      Some("""SELECT purchase_id, user_id, purchase_ts, last_click_id, gap_us FROM (
             |  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
             |    event_type,
             |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
             |      OVER w AS last_click_id,
             |    date_diff('microsecond',
             |      last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
             |        OVER w, ts) AS gap_us
             |  FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type
             |        FROM events WHERE event_type IN ('click', 'purchase'))
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |WHERE event_type = 'purchase' ORDER BY purchase_id""".stripMargin),
      "last-click attribution: as-of-join pattern as one partitioned window (no inequality self-join)"),

    // ---- TF-IDF corpus featurization. Two aggregations + a dimension
    // join — tf is partial-aggregated map-side; document frequency is
    // an aggregate OVER the tf result (already one row per (doc, tok)),
    // so no second pass over the corpus. N arrives from parquet footer
    // metadata (count-only scan), inlined as a literal.
    "tf_idf" -> Q(
      (s, dir) => {
        val docs = table(s, dir, "documents")
        val n = docs.count().toDouble
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        // Math.log and DuckDB ln disagree by 1 ulp on some arguments;
        // quantize through DECIMAL(18,8) in BOTH engines (the repo's
        // decimal-exact oracle policy) — deterministic and far above
        // the ulp noise floor.
        tf.join(dfreq, "tok")
          .select(col("doc_id"), col("tok"), col("tf"), col("df"),
            (col("tf").cast("double") * log(lit(n) / col("df")))
              .cast(org.apache.spark.sql.types.DecimalType(18, 8))
              .cast("double").as("tfidf"))
          .orderBy("doc_id", "tok")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, tok, count(*) AS tf
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY doc_id, tok),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok)
             |SELECT doc_id, tok, tf, df,
             |  CAST(CAST(CAST(tf AS DOUBLE) *
             |    ln((SELECT CAST(count(*) AS DOUBLE) FROM documents) / df)
             |    AS DECIMAL(18,8)) AS DOUBLE) AS tfidf
             |FROM tf JOIN dfreq USING (tok)
             |ORDER BY doc_id, tok""".stripMargin),
      "TF-IDF term scores (two-level aggregation, df over the tf result)"),

    // ---- exact percentiles per group. Spark `percentile` and DuckDB
    // `quantile_cont` share the definition (sort, index p·(n-1),
    // linear interpolation); the interpolation arithmetic can drift an
    // ulp → decimal-quantized like tf_idf. Exact percentile must sort
    // each group — at 100 TB the right tool is approx_percentile
    // (t-digest sketch, mergeable, O(1) memory), whose error bound vs
    // this exact answer is asserted in FunctionsSpec.
    "quantiles_by_type" -> Q(
      (s, dir) => {
        events(s, dir).groupBy(col("event_type"))
          .agg(
            expr("percentile(value, 0.5D)")
              .cast(org.apache.spark.sql.types.DecimalType(18, 8))
              .cast("double").as("p50"),
            expr("percentile(value, 0.95D)")
              .cast(org.apache.spark.sql.types.DecimalType(18, 8))
              .cast("double").as("p95"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,8)) AS DOUBLE) AS p50,
             |  CAST(CAST(quantile_cont(value, 0.95) AS DECIMAL(18,8)) AS DOUBLE) AS p95,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      "exact per-group percentiles (approx_percentile sketch is the 100TB path; error bound spec'd)"),
  )
}
