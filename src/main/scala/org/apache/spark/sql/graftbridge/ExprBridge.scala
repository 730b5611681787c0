package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sanctioned crossing between graft and Spark's `private[sql]`
  * surface: wrapping a custom Catalyst [[Expression]] into a [[Column]] (and
  * back) — the documented extension pattern for libraries that ship native
  * expressions without a SparkSessionExtensions registration round-trip.
  * Kept to exactly these two calls; nothing else reaches into internals. */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
