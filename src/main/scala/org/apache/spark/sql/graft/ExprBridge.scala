package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge for graft's custom expressions.
  *
  * Spark's `ExpressionUtils.column/expression` are `private[sql]`, so
  * this two-line adapter lives inside the `org.apache.spark.sql`
  * namespace — the standard pattern for libraries that ship custom
  * codegen'd expressions (the alternative, registering through
  * SparkSessionExtensions.injectFunction, binds to sessions the library
  * doesn't control; the driver contract here hands us arbitrary
  * sessions). Nothing else in the repo lives outside the graft package.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an already-resolved logical plan — needed by the
    * materialized-view rewriter to hand back a rewritten plan as a
    * Dataset (`Dataset.ofRows` is `private[sql]`, same situation as
    * `ExpressionUtils` above). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Stable per-session identity (`sessionUUID` is `private[sql]`). */
  def sessionKey(spark: SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
