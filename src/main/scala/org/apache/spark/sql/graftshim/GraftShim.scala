package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API (Spark 4.x ColumnNode-backed)
  * and Catalyst `Expression`s, for graft's custom expressions.
  *
  * Lives under `org.apache.spark.sql` to access the `private[sql]`
  * `ExpressionUtils` converters — the supported classic-mode conversion
  * path (see Spark's own `columnNodeSupport.scala`).
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** `AbstractDataType` is `private[sql]`, so expressions outside the Spark
  * package tree cannot override `ExpectsInputTypes.inputTypes` directly.
  * This trait narrows the declaration to the public `DataType`, keeping
  * implicit input casting (e.g. `array<double>` → `array<float>`).
  */
trait GraftImplicitCasts extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  def declaredInputTypes: Seq[org.apache.spark.sql.types.DataType]
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] = declaredInputTypes
}
