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
}
