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

  /** Release the block-manager storage behind an EAGER
    * `Dataset.localCheckpoint` once the data is no longer needed.
    * `Dataset.unpersist` cannot do this (the checkpoint is an RDD-level
    * persist, invisible to the SQL cache manager), and waiting for the
    * ContextCleaner ties the storage footprint of iterative algorithms
    * to driver GC timing. Safe ONLY after every consumer of the
    * checkpointed frame has run — the blocks are the data.
    */
  def unpersistLocalCheckpoint(df: org.apache.spark.sql.Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ()
    }
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
