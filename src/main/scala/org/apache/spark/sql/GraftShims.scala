package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for extension libraries: `ExpressionUtils` (the Column ⇄
  * Catalyst `Expression` adapter in Spark 4's classic API) is
  * `private[sql]`, so custom-expression packages outside the Spark
  * tree re-export it from a shim in the `org.apache.spark.sql`
  * package — the standard pattern used by Spark connector/extension
  * projects. No Spark internals are modified.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
