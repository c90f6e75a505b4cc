package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column factory so graft's native
  * Catalyst expressions compose as ordinary `Column`s without a
  * FunctionRegistry round-trip. Standard extension-library pattern (cf.
  * public Spark extensions that open org.apache.spark.sql for the same
  * purpose); no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a (possibly custom) logical plan; and the analyzed
    * plan behind a DataFrame — the two hooks a whole-operator extension
    * needs (cf. public Spark extension libraries exposing Dataset.ofRows
    * the same way). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzedPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** EAGER Column → catalyst Expression conversion. `expression(c)` above
    * returns a lazy ColumnNodeExpression placeholder that only standard
    * Dataset operators convert during construction; expressions embedded
    * in CUSTOM logical nodes must be converted up front or they reach
    * execution unevaluable. */
  def eagerExpression(spark: org.apache.spark.sql.SparkSession, c: Column): Expression =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].expression(c)
}
