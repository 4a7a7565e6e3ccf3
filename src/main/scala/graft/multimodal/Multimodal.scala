package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded
  * batches.
  *
  * The decode kernels are DETERMINISTIC STUBS (`StubCodecs`) — the
  * container has no image/audio libraries — but everything Spark-side is
  * real and tested: the schema, the partition-parallel execution shape,
  * the batch signature, and the feature-vector contract downstream
  * operators (ANN, dedup) consume. Swapping a stub for a JNI/FFmpeg call
  * changes one function.
  */
object Multimodal {

  /** Canonical media schema: `meta` is typed, `payload` opaque. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  case class MediaMeta(width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], n_frames: Option[Int])
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
      meta: Option[MediaMeta])
  case class MediaFeature(media_id: Long, kind: String, feature: Array[Float])

  /** Deterministic fake decoders standing in for image/audio libs.
    * Each maps payload bytes to a fixed-length float feature via a
    * seeded hash expansion — stable across runs and partitionings.
    */
  object StubCodecs {
    // ??? in a real deployment: BufferedImage/FFmpeg decode goes here.
    def imageFeature(payload: Array[Byte], dim: Int): Array[Float] =
      pseudoFeature(payload, dim, seed = 0x1337L)
    def audioFeature(payload: Array[Byte], dim: Int): Array[Float] =
      pseudoFeature(payload, dim, seed = 0xbeefL)
    def videoFrameSample(payload: Array[Byte], nFrames: Int, dim: Int): Seq[Array[Float]] =
      (0 until nFrames).map(f => pseudoFeature(payload, dim, seed = 0xf00dL + f))

    private def pseudoFeature(payload: Array[Byte], dim: Int, seed: Long): Array[Float] = {
      var h = seed ^ 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) { h ^= payload(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      val out = new Array[Float](dim)
      var j = 0
      var s = h
      while (j < dim) {
        s ^= (s >>> 30); s *= 0xbf58476d1ce4e5b9L
        s ^= (s >>> 27); s *= 0x94d049bb133111ebL
        s ^= (s >>> 31)
        out(j) = ((s & 0xffffff).toFloat / 0xffffff.toFloat) - 0.5f
        j += 1
      }
      out
    }
  }

  /** Partition-parallel feature extraction over a media DataFrame.
    *
    * `mapPartitions` (not a per-row UDF) so a real decoder can amortize
    * native init per partition and process rows in bounded batches —
    * the same execution shape a Python pipeline gets from `mapInPandas`.
    */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init of a (stub) codec happens here, once
        rows.map { case (id, kind, payload) =>
          val feat = kind match {
            case "audio" => StubCodecs.audioFeature(payload, dim)
            case "video" => StubCodecs.videoFrameSample(payload, 1, dim).head
            case _ => StubCodecs.imageFeature(payload, dim)
          }
          MediaFeature(id, kind, feat)
        }
      }
  }

  /** Frame sampling for video payloads: one row per sampled frame. */
  def sampleFrames(media: DataFrame, nFrames: Int, dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          StubCodecs.videoFrameSample(payload, nFrames, dim).zipWithIndex.map {
            case (f, i) => (id, i, f)
          }
        }
      }
      .toDF("media_id", "frame_no", "feature")
  }

  /** Wrap a text/binary table into the canonical media schema — used to
    * exercise the pipeline with the synthetic fixtures (documents bytes
    * as stand-in payloads).
    */
  def fromBinary(df: DataFrame, idCol: String, payloadCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("int").as("n_frames")).as("meta"))
}
