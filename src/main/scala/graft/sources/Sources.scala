package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.store.VectorStore

/** Source/sink helpers beyond the native Parquet path.
  *
  * The reference supports exactly one source — its SQLite file (SURVEY.md
  * §2.1). graft is Parquet-native; these helpers cover the practical
  * import/export surfaces a store migration needs: CSV/JSON ingestion
  * into the store schema, and the reference's raw-blob vector encoding
  * (`FloatBlobDecode`/`Encode`) for lossless interchange with its BLOBs.
  */
object Sources {

  /** Read CSV with an explicit schema (never infer in production paths —
    * schema inference is a full extra pass over the data).
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Read newline-delimited JSON with an explicit schema. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Read ORC (Spark-native columnar, same pushdown/pruning as
    * parquet) with an explicit schema.
    */
  def orc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Raw-corpus ingestion: one row per text line, tagged with its
    * source file — the entry format of a crawl/dump before any
    * structure exists. Line order within a file is not a contract at
    * scale (files split across tasks); the source path is.
    */
  def textLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(
        input_file_name().as("source_file"),
        col("value").as("text"))

  /** Read a parquet file whose timestamp columns may be TIMESTAMP(NANOS)
    * — which Spark's reader rejects by default — or a plain
    * micro/second timestamp. The `nanosAsLong` legacy flag is scoped to
    * the read (schema is captured eagerly at load); each named column
    * is then normalized to a session-zone microsecond TIMESTAMP by
    * whatever its physical type turned out to be: int64 nanos via
    * integer division (double division loses precision above 2^53 ns),
    * TIMESTAMP_NTZ via a cast (identity under the UTC session zone the
    * pipeline pins), TIMESTAMP left as-is. One loader, any vintage of
    * the upstream writer.
    */
  def nanosTimestampParquet(spark: SparkSession, path: String, tsCols: String*): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      tsCols.foldLeft(spark.read.parquet(path)) { (df, c) => normalizeTs(df, c) }
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Normalize one possibly-raw timestamp column (see
    * [[nanosTimestampParquet]]); works on streaming frames too (the
    * decision reads only the schema).
    */
  def normalizeTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn(c, col(c).cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Write a table bucketed (and sorted) by a join key. Two tables
    * bucketed the same way join WITHOUT an Exchange on either side —
    * the co-located fact-fact join layout for keys too large to
    * broadcast: at 100 TB, pre-bucketing lineitem-sized tables on their
    * join key turns every recurring join into a map-side zip of
    * matching buckets (asserted exchange-free in SourcesSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Import rows shaped like the reference's table — `(id, vec BLOB,
    * doc)` with little-endian float32 blob vectors — into a graft store
    * DataFrame ready for [[VectorStore.insertDF]].
    */
  def fromReferenceBlobs(blobs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    import graft.expressions.FloatBlobDecode
    blobs.select(
      GraftShim.column(FloatBlobDecode(GraftShim.expression(col("vec")))).as("vec"),
      coalesce(col("doc"), lit("{}")).as("doc"))
  }

  /** Export a store's rows with vectors re-encoded as the reference's
    * blob format.
    */
  def toReferenceBlobs(store: VectorStore): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftShim
    import graft.expressions.FloatBlobEncode
    store.toDF.select(
      col("id"),
      GraftShim.column(FloatBlobEncode(GraftShim.expression(col("vec")))).as("vec"),
      col("doc"))
  }
}
