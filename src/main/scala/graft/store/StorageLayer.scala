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

  /** Remove rows whose `id` appears in `ids`. Default strategy: full
    * read-antijoin-rewrite (correct anywhere, O(table) IO). Layouts with
    * a cheaper path (tombstones) override.
    */
  def delete(ids: DataFrame): Unit =
    overwrite(read().join(
      org.apache.spark.sql.functions.broadcast(ids.select("id")), Seq("id"), "left_anti"))
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
    // Hadoop rename signals most failures by returning false, not
    // throwing — check every step and roll back rather than risk
    // deleting the only surviving copy of the data.
    if (fs.exists(dataPath) && !fs.rename(dataPath, backup))
      throw new java.io.IOException(s"overwrite: could not move $dataPath aside")
    if (!fs.rename(staging, dataPath)) {
      if (fs.exists(backup)) fs.rename(backup, dataPath) // restore
      throw new java.io.IOException(s"overwrite: could not activate $staging")
    }
    if (fs.exists(backup)) fs.delete(backup, true)
  }
}

/** Tombstone-log layout: `<root>/data` is append-only; deletes append the
  * dead ids to `<root>/tombstones` and reads anti-join them out.
  *
  * This is the 100 TB delete path: a delete batch costs O(batch) IO
  * instead of rewriting the table, at the price of an anti-join per read
  * (broadcast — the tombstone set is small relative to data) until
  * [[compact]] folds tombstones into a rewrite. Same single-writer model
  * as the rest of the store.
  */
final class TombstoneStorage(spark: SparkSession, root: String) extends StorageLayer {
  private val inner = new ParquetStorage(spark, root)
  private val tombPath = new Path(root, "tombstones")
  private def fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def exists: Boolean = inner.exists
  override def initialize(schema: StructType): Unit = inner.initialize(schema)
  override def append(df: DataFrame): Unit = inner.append(df)

  private def tombstones(): Option[DataFrame] =
    if (fs.exists(tombPath)) Some(spark.read.parquet(tombPath.toString)) else None

  override def read(): DataFrame = {
    val data = inner.read()
    tombstones() match {
      case Some(t) =>
        data.join(org.apache.spark.sql.functions.broadcast(t), Seq("id"), "left_anti")
      case None => data
    }
  }

  override def delete(ids: DataFrame): Unit =
    ids.select("id").write.mode("append").parquet(tombPath.toString)

  /** Rewrite minus tombstones, then clear the tombstone log. */
  def compact(): Unit = {
    inner.overwrite(read())
    if (fs.exists(tombPath)) fs.delete(tombPath, true)
  }

  /** Overwrite folds any pending tombstones (they described the old data). */
  override def overwrite(df: DataFrame): Unit = {
    inner.overwrite(df)
    if (fs.exists(tombPath)) fs.delete(tombPath, true)
  }

  /** Number of tombstoned ids (monitoring / compaction policy input). */
  def tombstoneCount(): Long = tombstones().map(_.count()).getOrElse(0L)
}
