package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression conversions, for graft's
  * native Catalyst expressions. Lives in the org.apache.spark.sql package
  * solely to cross the access boundary — the standard pattern for
  * libraries that ship custom expressions against the classic API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
