package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Expression <-> Column converters of the
  * classic Spark SQL API. Spark 4 removed the public `new Column(expr)`
  * constructor; `classic.ExpressionUtils` is `private[sql]`, so this
  * one-file shim in the sql package re-exports the two converters the
  * engine needs to expose custom Catalyst expressions as `Column`s.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
