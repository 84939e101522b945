package org.apache.spark.sql.graftcompat

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters so the
  * graft library can expose native Catalyst expressions as `Column`s (the
  * same pattern every Spark extension library uses for custom expressions;
  * the underlying API is `org.apache.spark.sql.classic.ExpressionUtils`,
  * public bytecode but Scala-private to package sql). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
