package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Physical storage behind a [[VectorStore]].
  *
  * The reference persists to a single SQLite file (reference:
  * schema.sql:3-7, vector_store.py:82-91); graft's native format is
  * Parquet — columnar at rest, so the `(id, vec)` index projection the
  * search path needs is a column-pruned scan instead of the reference's
  * explicit `SELECT id, vec` (vector_store.py:95).
  *
  * Kept behind a trait so the rewrite-on-delete Parquet strategy can be
  * swapped for a tombstone/transaction-log layout (Delta-style) when a
  * deployment needs concurrent writers or 100 TB-scale deletes without
  * full rewrites.
  */
trait StorageLayer {
  def exists: Boolean
  def initialize(schema: StructType): Unit
  def read(): DataFrame
  def append(df: DataFrame): Unit
  /** Atomically replace the table contents (stage → swap). */
  def overwrite(df: DataFrame): Unit
}

/** Parquet directory layout: parquet part-files under `<root>/data`.
  *
  * Overwrite stages to a sibling directory then swaps via FileSystem
  * rename — never reads and overwrites the same path in one job (Spark's
  * lazy evaluation would otherwise read from files being deleted).
  */
final class ParquetStorage(spark: SparkSession, root: String) extends StorageLayer {
  private val dataPath = new Path(root, "data")
  private def fs = dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def exists: Boolean = fs.exists(dataPath)

  override def initialize(schema: StructType): Unit = {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    empty.write.mode("overwrite").parquet(dataPath.toString)
  }

  override def read(): DataFrame = spark.read.parquet(dataPath.toString)

  override def append(df: DataFrame): Unit =
    df.write.mode("append").parquet(dataPath.toString)

  override def overwrite(df: DataFrame): Unit = {
    val staging = new Path(root, s"_staging-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(staging.toString)
    val backup = new Path(root, s"_old-${java.util.UUID.randomUUID()}")
    if (fs.exists(dataPath)) fs.rename(dataPath, backup)
    fs.rename(staging, dataPath)
    if (fs.exists(backup)) fs.delete(backup, true)
  }
}
