package org.apache.spark.sql
package graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access shim: Expression ⇄ Column conversion became
  * private[sql] in Spark 4 (ExpressionUtils), so native-expression
  * libraries expose it through a module inside the org.apache.spark.sql
  * package — the standard pattern for Catalyst extension libraries.
  * Everything else in graft lives in its own namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
