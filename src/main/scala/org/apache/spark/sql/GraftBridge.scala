package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Scala-visibility bridge for graft's custom Catalyst expressions:
  * Column↔Expression conversion lives behind `private[sql]` in
  * Spark 4 (org.apache.spark.sql.classic.ExpressionUtils), so this
  * one-file shim inside the sql package re-exports the two needed
  * calls. No Spark behavior is modified. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Nullability-insensitive type equality (DataType.asNullable is
    * private[spark]): containsNull / nested-field nullability
    * legitimately varies between writes of the same logical type. */
  def sameTypeIgnoreNullability(a: types.DataType, b: types.DataType): Boolean =
    a.asNullable == b.asNullable
}
