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

  /** Register a SQL function on a live session (the programmatic
    * complement to configuring `spark.sql.extensions=graft.GraftExtensions`
    * at session build time). Goes through the session's FunctionRegistry,
    * which is private[sql] — hence this bridge. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.expressions", name),
        builder)
}
