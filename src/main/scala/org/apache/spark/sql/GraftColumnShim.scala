package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for building a Column from a raw Catalyst Expression — the
  * converters in `classic.ExpressionUtils` are `private[sql]` in Spark 4,
  * so custom expressions need this one-liner inside the sql package to be
  * usable from the Column API without a FunctionRegistry round-trip.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
