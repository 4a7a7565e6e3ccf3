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
  *
  * A tombstone must mask only rows that existed WHEN THE DELETE RAN —
  * id-only masking would also hide a row appended later under the same
  * id (the upsert shape: delete id, append replacement; and the
  * reference's id reuse after deleting the max id,
  * vector_store.py:195-203 — the next insert re-reads max id from the
  * table the delete already shrank). So every write carries a monotone
  * version: appended rows get an internal `_graft_gen` column (stripped
  * from [[read]]), tombstones record `(id, gen)`, and the read mask is
  * `data.id = tomb.id AND data.gen < tomb.gen` — the Delta-style
  * ordering of deletes relative to appends, kept as a slim counter file
  * instead of a full transaction log.
  */
/** @param autoCompactFraction trigger [[compact]] automatically when
  *   pending tombstoned rows exceed this fraction of the LIVE row count
  *   (0 disables). Without a policy, weeks of O(batch) deletes silently
  *   degrade every read: the broadcast tombstone set grows unbounded
  *   and the masked fraction of data IO is wasted — reads must stay
  *   O(live data), not O(ever written).
  * @param autoCompactMinTombstones floor before the fraction check runs
  *   — the check needs a count job over the masked table, so it is
  *   gated on the cheap metadata-counter crossing this absolute floor
  *   first (a handful of tombstones never justifies a count of a 100 TB
  *   table, let alone a rewrite).
  */
final class TombstoneStorage(spark: SparkSession, root: String,
    autoCompactFraction: Double = 0.2,
    autoCompactMinTombstones: Long = 10000L) extends StorageLayer {
  import org.apache.spark.sql.functions.{broadcast, col, lit}
  require(autoCompactFraction >= 0.0,
    s"autoCompactFraction must be >= 0, got $autoCompactFraction")

  private val inner = new ParquetStorage(spark, root)
  private val tombPath = new Path(root, "tombstones")
  private val verPath = new Path(root, "_version")
  private def fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val GenCol = TombstoneStorage.GenCol

  private def readVersion(): Long =
    if (!fs.exists(verPath)) 0L
    else {
      val in = fs.open(verPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }

  /** Advance the write-version counter (single-writer model, like the
    * rest of the store): stage a new counter file, swap it in.
    */
  private def bumpVersion(): Long = {
    val v = readVersion() + 1
    val tmp = new Path(root, s"_version-tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(verPath)) fs.delete(verPath, false)
    if (!fs.rename(tmp, verPath))
      throw new java.io.IOException(s"could not advance version counter at $verPath")
    v
  }

  override def exists: Boolean = inner.exists

  override def initialize(schema: StructType): Unit =
    inner.initialize(StructType(schema.fields :+
      org.apache.spark.sql.types.StructField(GenCol, org.apache.spark.sql.types.LongType)))

  override def append(df: DataFrame): Unit =
    inner.append(df.withColumn(GenCol, lit(bumpVersion())))

  private def tombstones(): Option[DataFrame] =
    if (fs.exists(tombPath)) Some(spark.read.parquet(tombPath.toString)) else None

  /** Masked rows WITH the internal gen column (compact rewrites it). */
  private def readRaw(): DataFrame = {
    val data = inner.read()
    tombstones() match {
      case Some(t) =>
        data.join(broadcast(t),
          data("id") === t("id") && data(GenCol) < t("gen"), "left_anti")
      case None => data
    }
  }

  override def read(): DataFrame = readRaw().drop(GenCol)

  override def delete(ids: DataFrame): Unit = {
    ids.select(col("id"), lit(bumpVersion()).as("gen"))
      .write.mode("append").parquet(tombPath.toString)
    maybeAutoCompact()
  }

  /** The compaction policy: fire [[compact]] once pending tombstones
    * pass `autoCompactMinTombstones` AND exceed `autoCompactFraction`
    * of the live row count. Two-stage so the steady state pays only a
    * count of the (small) tombstone log per delete batch; the masked
    * count job — and the rewrite — run only when the log is already
    * big enough to matter. Tombstone rows are counted as written
    * (re-deleted or missing ids inflate the numerator slightly — a
    * conservative error: compaction fires a little early, never late).
    */
  private def maybeAutoCompact(): Unit =
    if (autoCompactFraction > 0.0) {
      val pending = tombstoneCount()
      if (pending >= autoCompactMinTombstones) {
        val live = readRaw().count()
        if (pending.toDouble >= autoCompactFraction * live.toDouble) compact()
      }
    }

  /** Rewrite minus tombstones, then clear the tombstone log. Advances
    * the snapshot floor to the current version: folding tombstones
    * destroys the mask history, so any older snapshot would silently
    * miss its deleted rows — after compaction, [[readAt]] refuses them
    * instead (the floor contract, shared with [[vacuum]]).
    */
  def compact(): Unit = {
    inner.overwrite(readRaw())
    if (fs.exists(tombPath)) fs.delete(tombPath, true)
    writeFloor(readVersion())
  }

  private val floorPath = new Path(root, "_snapshot_floor")

  /** Oldest version [[readAt]] can still reproduce faithfully — 0
    * until a [[vacuum]] or [[compact]] has discarded history.
    */
  def snapshotFloor(): Long =
    if (!fs.exists(floorPath)) 0L
    else {
      val in = fs.open(floorPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }

  private def writeFloor(v: Long): Unit = if (v > snapshotFloor()) {
    val tmp = new Path(root, s"_floor-tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(floorPath)) fs.delete(floorPath, false)
    if (!fs.rename(tmp, floorPath))
      throw new java.io.IOException(s"could not advance snapshot floor at $floorPath")
  }

  /** Retention vacuum (the Delta `VACUUM` analog, and the GDPR
    * true-delete [[readAt]] otherwise forbids): PERMANENTLY remove
    * data rows masked by tombstones at or below `beforeVersion`, drop
    * those tombstones, and raise the snapshot floor — versions below
    * it are no longer reproducible and [[readAt]] refuses them with an
    * explicit error instead of returning a silently-incomplete frame.
    * Newer history (tombstones above `beforeVersion`, and the
    * snapshots they support) is untouched, so retention can trail the
    * write head by a fixed window. Cost: one rewrite of the data
    * minus the purged rows (the [[compact]] IO shape) — O(live), not
    * O(history). Returns the purged row count.
    */
  def vacuum(beforeVersion: Long): Long = {
    val v = math.min(beforeVersion, readVersion())
    val purged = tombstones() match {
      case Some(t0) =>
        val told = t0.filter(col("gen") <= v)
          .select(col("id").as("_tid"), col("gen").as("_tgen"))
        val data = inner.read()
        val deadCond = data("id") === told("_tid") && data(GenCol) < told("_tgen")
        val nDead = data.join(broadcast(told), deadCond, "left_semi").count()
        if (nDead > 0)
          inner.overwrite(data.join(broadcast(told), deadCond, "left_anti"))
        // rewrite the log with only the still-active tombstones
        // (stage → swap, the overwrite discipline)
        val tnew = t0.filter(col("gen") > v)
        if (tnew.isEmpty) { if (fs.exists(tombPath)) fs.delete(tombPath, true) }
        else {
          val staging = new Path(root, s"_tomb-staging-${java.util.UUID.randomUUID()}")
          tnew.write.mode("overwrite").parquet(staging.toString)
          if (!fs.delete(tombPath, true) && fs.exists(tombPath))
            throw new java.io.IOException(s"vacuum: could not clear $tombPath")
          if (!fs.rename(staging, tombPath))
            throw new java.io.IOException(s"vacuum: could not activate $staging")
        }
        nDead
      case None => 0L
    }
    writeFloor(v)
    purged
  }

  /** Overwrite describes a NEW table: stamp it, fold any pending
    * tombstones (they described the old data), and advance the
    * snapshot floor — pre-overwrite versions are gone.
    */
  override def overwrite(df: DataFrame): Unit = {
    val v = bumpVersion()
    inner.overwrite(df.withColumn(GenCol, lit(v)))
    if (fs.exists(tombPath)) fs.delete(tombPath, true)
    writeFloor(v)
  }

  /** Number of tombstoned ids (monitoring / compaction policy input). */
  def tombstoneCount(): Long = tombstones().map(_.count()).getOrElse(0L)

  /** Live (masked) rows WITH the internal gen column — for derived
    * structures (the store's ANN index) that must replay the same
    * `data.gen < tomb.gen` delete ordering against their own rows.
    */
  private[store] def readLiveWithGen(): DataFrame = readRaw()

  /** The current tombstone set as `(id, gen)`, if any — the mask a
    * derived structure applies to its rows at query time.
    */
  private[store] def tombstoneFrame(): Option[DataFrame] = tombstones()

  /** The current write version — pass to [[readAt]] to pin a snapshot
    * while later writes land.
    */
  def currentVersion(): Long = readVersion()

  /** Snapshot read as of write-version `version`: rows appended at or
    * before it, minus deletes recorded at or before it — time travel
    * (reproduce the corpus a run trained on; audit what a delete
    * removed) paid for by the same gen column the delete ordering
    * already needs, no transaction log.
    *
    * History is bounded by [[compact]] (physically drops masked rows —
    * earlier snapshots lose them) and erased by [[overwrite]] (a new
    * table).
    */
  def readAt(version: Long): DataFrame = {
    val floor = snapshotFloor()
    if (version < floor)
      throw new IllegalArgumentException(
        s"version $version predates the snapshot floor $floor — its rows " +
          "were discarded by vacuum/compact/overwrite and a read would be " +
          "silently incomplete")
    val data = inner.read().filter(col(GenCol) <= version)
    val masked = tombstones() match {
      case Some(t0) =>
        val t = t0.filter(col("gen") <= version)
        data.join(broadcast(t),
          data("id") === t("id") && data(GenCol) < t("gen"), "left_anti")
      case None => data
    }
    masked.drop(GenCol)
  }
}

object TombstoneStorage {
  /** Internal write-version column (see class scaladoc). */
  private[store] val GenCol = "_graft_gen"
}
