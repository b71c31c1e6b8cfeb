package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * moved `Column` to an opaque node representation; `classic.
  * ExpressionUtils` is the supported in-JVM converter but is
  * package-private). This is the only place the library reaches into
  * Spark internals. */
object GraftSql {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-root a DataFrame's (analyzed) plan under another session of
    * the SAME SparkContext — the isolation primitive for operators
    * that must run under session-conf overrides without mutating the
    * caller's session (a `newSession()` clone has its own SQLConf).
    * The plan is re-planned under the target session's conf; analyzed
    * input means temp views/UDFs of the source session are already
    * resolved away. */
  def inSession(target: SparkSession, df: DataFrame): DataFrame = {
    require(target.sparkContext eq df.sparkSession.sparkContext,
      "inSession: target must share the source's SparkContext")
    org.apache.spark.sql.classic.Dataset.ofRows(
      target.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)
  }
}
