package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 detached the public Column API from Catalyst Expressions
  * (Spark Connect refactor); the classic bridge (`ExpressionUtils`) is
  * `private[sql]`. This shim — placed inside the sql package tree, the
  * established pattern for Catalyst-level extension libraries — is the
  * one place graft touches non-public API, kept to two forwarders.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
