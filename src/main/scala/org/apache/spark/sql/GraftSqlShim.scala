package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversions (Spark 4 moved
  * them behind `org.apache.spark.sql.classic.ExpressionUtils`). Standard
  * practice for libraries that ship custom Catalyst expressions: one shim
  * object inside the sql package, nothing else reaches into internals. */
object GraftSqlShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
