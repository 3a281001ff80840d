package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made `classic.ExpressionUtils`
  * `private[sql]`; custom Catalyst expressions (graft.functions.VecDot)
  * still need to surface as `Column`s, so this one-object shim lives in
  * the `org.apache.spark.sql` package to reach it. No Spark internals are
  * modified or shadowed. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
