package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression conversions for
  * the engine's native Catalyst expressions (graft.expressions.*). Lives in
  * the spark.sql package purely for access; the standard pattern for
  * libraries that add codegen'd expressions without a fork. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
