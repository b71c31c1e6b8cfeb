package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The one `private[sql]` doorway graft needs: materializing a
  * DataFrame from a hand-built resolved LogicalPlan (for the custom
  * operators that have no public constructor path, e.g.
  * [[graft.plans.AsOfJoinPlan]]). Lives under `org.apache.spark.sql`
  * solely for access; no Spark internals are modified. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
