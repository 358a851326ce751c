package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), needed to expose a
  * custom Catalyst aggregate (`graft.functions.BoundedTopK`) as a user
  * `Column`. This is the conventional extension-point shim for libraries
  * that add native expressions; it contains no logic of its own.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Public alias of the `private[sql]` AbstractDataType so external
    * expressions can declare `inputTypes` (ImplicitCastInputTypes). */
  type SqlAbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
