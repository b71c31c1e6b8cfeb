package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass dataset profiling — the "what is in this corpus" check a
  * training-data pipeline runs before and after every transform (row
  * counts drifting, a column going all-null, a language column sprouting
  * a new value are all caught by diffing two profiles).
  *
  * One aggregation pass over the table computes every metric for every
  * profiled column, then a posexplode of the single aggregated row
  * yields the long (column_name, stats) shape — nothing per-row ever
  * reaches the driver, and the output is O(#columns) rows regardless
  * of table size.
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
    // aggregate aliases are POSITIONAL internal names, never derived
    // from user column names: interpolating a name like `doc-id` into
    // a stack() SQL string would parse as arithmetic (r12 review) —
    // the real name travels only as data, inside a literal array
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(col(c)).as(s"__p${i}_nn"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c), rsd)).as(s"__p${i}_dc"),
        min(col(c)).cast("string").as(s"__p${i}_min"),
        max(col(c)).cast("string").as(s"__p${i}_max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.indices.map(i => struct(
      col(s"__p${i}_nn").as("non_nulls"),
      col(s"__p${i}_dc").as("distinct_cnt"),
      col(s"__p${i}_min").as("min_str"),
      col(s"__p${i}_max").as("max_str")))
    one.select(posexplode(array(stacked: _*)).as(Seq("__pos", "__s")))
      .select(element_at(typedLit(cols), col("__pos") + 1).as("column_name"),
        col("__s.non_nulls"), col("__s.distinct_cnt"),
        col("__s.min_str"), col("__s.max_str"))
  }
}
