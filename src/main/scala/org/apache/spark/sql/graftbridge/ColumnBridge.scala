package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's `private[sql]` Column <-> Expression
  * converters (`org.apache.spark.sql.classic.ExpressionUtils`), needed
  * to expose custom Catalyst expressions (graft.functions.*) through
  * the public Column API on Spark 4's column-node architecture. This is
  * the standard extension-library technique: one tiny object inside the
  * `org.apache.spark.sql` namespace, nothing else.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
