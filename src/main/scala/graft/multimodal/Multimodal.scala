package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded
  * batches.
  *
  * The image and audio decoders are REAL pure-JVM codecs ([[Codecs]]):
  * images go through `javax.imageio.ImageIO` (BMP/PNG/GIF/JPEG, all
  * bundled with the JDK) and WAV through a hand-rolled RIFF/PCM parser.
  * Payloads that fail to decode fall back to a deterministic hash
  * feature so heterogeneous corpora never poison a batch. Only video
  * remains a documented stub (no pure-JVM video codec exists); swapping
  * it for an FFmpeg JNI call changes one function. Everything
  * Spark-side — schema, partition-parallel execution shape, batch
  * signature, feature-vector contract — is real and tested.
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

  /** Decoded image summary: header fields plus pixel statistics.
    * Channel means and the 8-bin luminance histogram are normalized to
    * [0, 1]; the histogram bins sum to 1.
    */
  case class DecodedImage(width: Int, height: Int,
      meanR: Float, meanG: Float, meanB: Float, grayHist: Array[Float])

  /** Decoded PCM audio summary: header fields plus amplitude
    * statistics. `rms` and the 8-bin |amplitude| histogram are over
    * samples normalized to [-1, 1].
    */
  case class DecodedAudio(sampleRate: Int, channels: Int, nSamples: Int,
      rms: Float, ampHist: Array[Float])

  /** Pure-JVM media codecs. Image decode is `javax.imageio.ImageIO`
    * (JDK-bundled readers: BMP, PNG, GIF, JPEG); WAV decode is a
    * hand-rolled RIFF/PCM chunk parser (8/16-bit). Both return None for
    * payloads they can't parse — the feature extractors then fall back
    * to a deterministic hash feature so a corrupt or foreign payload
    * degrades to a stable pseudo-vector instead of failing the batch.
    */
  object Codecs {

    // One-time per-JVM ImageIO config (no temp-file cache in executors);
    // a lazy val so the static mutation happens once, not per decoded row.
    private lazy val imageIoConfigured: Unit = javax.imageio.ImageIO.setUseCache(false)

    /** Feature layout (zero-padded / truncated to `dim`):
      * image → [width, height, meanR, meanG, meanB, grayHist×8].
      */
    def imageFeature(payload: Array[Byte], dim: Int): Array[Float] =
      decodeImage(payload) match {
        case Some(d) =>
          pack(dim, Array(d.width.toFloat, d.height.toFloat,
            d.meanR, d.meanG, d.meanB) ++ d.grayHist)
        case None => pseudoFeature(payload, dim, seed = 0x1337L)
      }

    /** Feature layout (zero-padded / truncated to `dim`):
      * audio → [sampleRate, channels, nSamples, rms, ampHist×8].
      */
    def audioFeature(payload: Array[Byte], dim: Int): Array[Float] =
      decodeWav(payload) match {
        case Some(d) =>
          pack(dim, Array(d.sampleRate.toFloat, d.channels.toFloat,
            d.nSamples.toFloat, d.rms) ++ d.ampHist)
        case None => pseudoFeature(payload, dim, seed = 0xbeefL)
      }

    /** STUB: no pure-JVM video codec exists — frame features are a
      * deterministic hash expansion of the payload. A real deployment
      * swaps this for an FFmpeg/JavaCV frame grab; the per-partition
      * execution shape in [[sampleFrames]] is unchanged by that swap.
      */
    def videoFrameSample(payload: Array[Byte], nFrames: Int, dim: Int): Seq[Array[Float]] =
      (0 until nFrames).map(f => pseudoFeature(payload, dim, seed = 0xf00dL + f))

    /** Decode any JDK-supported image format (sniffed by magic bytes,
      * not metadata). Pixel statistics subsample large images with a
      * fixed stride so decode cost is bounded by ~64k sampled pixels.
      */
    def decodeImage(payload: Array[Byte]): Option[DecodedImage] =
      try {
        imageIoConfigured // one-time static config, not per-row
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val stride = math.max(1, math.round(math.sqrt(w.toLong * h / 65536.0)).toInt)
          var (sr, sg, sb) = (0L, 0L, 0L)
          val hist = new Array[Long](8)
          var n = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
              sr += r; sg += g; sb += b
              // ITU-R BT.601 integer luma, binned into 8 buckets
              hist(((r * 299 + g * 587 + b * 114) / 1000) >> 5) += 1
              n += 1
              x += stride
            }
            y += stride
          }
          val denom = (n * 255).toFloat
          Some(DecodedImage(w, h, sr / denom, sg / denom, sb / denom,
            hist.map(_ / n.toFloat)))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Minimal 24-bpp uncompressed BMP encoder (`rgb` is row-major,
      * top-down, 3 bytes per pixel). Exists so pipelines and tests can
      * synthesize REAL image payloads and prove the decode round-trip.
      */
    def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"need ${w * h * 3} RGB bytes, got ${rgb.length}")
      val rowPad = (4 - (w * 3) % 4) % 4
      val dataSize = (w * 3 + rowPad) * h
      val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putShort(0).putShort(0).putInt(54) // reserved, pixel offset
      buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
      var y = h - 1 // BMP rows are bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val i = (y * w + x) * 3
          buf.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i)) // BGR on disk
          x += 1
        }
        var p = 0
        while (p < rowPad) { buf.put(0.toByte); p += 1 }
        y -= 1
      }
      buf.array()
    }

    /** Hand-rolled RIFF/WAVE parser for PCM 8/16-bit payloads: walks
      * the chunk list for `fmt ` and `data`, then computes amplitude
      * statistics over normalized samples.
      */
    def decodeWav(payload: Array[Byte]): Option[DecodedAudio] =
      try {
        if (payload.length < 44 ||
          payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F' ||
          payload(8) != 'W' || payload(9) != 'A' || payload(10) != 'V' || payload(11) != 'E')
          return None
        val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        var pos = 12
        var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bitsPerSample)
        var data: Option[(Int, Int)] = None     // (offset, length)
        while (pos + 8 <= payload.length && (fmt.isEmpty || data.isEmpty)) {
          val id = new String(payload, pos, 4, "US-ASCII")
          val size = buf.getInt(pos + 4)
          if (size < 0) return None // corrupt size would stall the walk
          if (id == "fmt " && size >= 16) {
            val audioFormat = buf.getShort(pos + 8).toInt
            if (audioFormat != 1) return None // PCM only
            fmt = Some((buf.getShort(pos + 10).toInt, buf.getInt(pos + 12),
              buf.getShort(pos + 22).toInt))
          } else if (id == "data") {
            data = Some((pos + 8, math.min(size, payload.length - pos - 8)))
          }
          pos += 8 + size + (size & 1) // chunks are word-aligned
        }
        for ((channels, rate, bits) <- fmt; (off, len) <- data) yield {
          require(bits == 8 || bits == 16, s"PCM $bits-bit unsupported")
          val bytesPer = bits / 8
          val n = len / bytesPer
          var sumSq = 0.0
          val hist = new Array[Long](8)
          var i = 0
          while (i < n) {
            val amp =
              if (bits == 16) buf.getShort(off + i * 2) / 32768f
              else ((payload(off + i) & 0xff) - 128) / 128f
            sumSq += amp.toDouble * amp
            hist(math.min(7, (math.abs(amp) * 8).toInt)) += 1
            i += 1
          }
          DecodedAudio(rate, channels, n / math.max(1, channels),
            if (n == 0) 0f else math.sqrt(sumSq / n).toFloat,
            hist.map(x => if (n == 0) 0f else x.toFloat / n))
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Minimal PCM-16 mono/stereo WAV encoder (interleaved samples) —
      * the synthesis counterpart of [[decodeWav]].
      */
    def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(sampleRate)
        .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(buf.putShort)
      buf.array()
    }

    private def pack(dim: Int, values: Array[Float]): Array[Float] =
      java.util.Arrays.copyOf(values, dim)

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
            case "audio" => Codecs.audioFeature(payload, dim)
            case "video" => Codecs.videoFrameSample(payload, 1, dim).head
            case _ => Codecs.imageFeature(payload, dim)
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
          Codecs.videoFrameSample(payload, nFrames, dim).zipWithIndex.map {
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
