package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass dataset profiling — the "what is in this corpus" check a
  * training-data pipeline runs before and after every transform (row
  * counts drifting, a column going all-null, a language column sprouting
  * a new value are all caught by diffing two profiles).
  *
  * One aggregation pass over the table computes every metric for every
  * profiled column, then a `stack` of the single aggregated row yields
  * the long (column_name, stats) shape — nothing per-row ever reaches
  * the driver, and the output is O(#columns) rows regardless of table
  * size.
  *
  * `exact = true` uses `countDistinct` (Spark's multi-distinct rewrite
  * expands the input ×#distinct-aggs — fine to a few columns, and
  * DuckDB-oracle-able). At 100 TB profile with `exact = false`:
  * `approx_count_distinct` (HLL++, rel. error `rsd`) keeps the pass a
  * plain one-shot aggregation with map-side partials and NO Expand —
  * the same plan shape however many columns are profiled. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true,
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "Profile.profile: no columns given")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"Profile.profile: not in schema: ${missing.mkString(",")}")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_nn"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"${c}_dc"),
        min(col(c)).cast("string").as(s"${c}_min"),
        max(col(c)).cast("string").as(s"${c}_max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${cols.size}, " + cols.map(c =>
      s"'$c', ${c}_nn, ${c}_dc, ${c}_min, ${c}_max").mkString(", ") +
      ") AS (column_name, non_nulls, distinct_cnt, min_str, max_str)"
    one.select(expr(stackExpr))
  }
}
