package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in bounded
  * batches.
  *
  * The image, audio, and video decoders are REAL pure-JVM codecs
  * ([[Codecs]]): images go through `javax.imageio.ImageIO`
  * (BMP/PNG/GIF/JPEG, all bundled with the JDK), WAV through a
  * hand-rolled RIFF/PCM parser, and video through a hand-rolled AVI
  * demuxer covering the MJPEG/DIB profile (per-frame decode reuses
  * ImageIO — MJPEG frames are baseline JPEGs). Codecs beyond that
  * profile (H.264 etc.) would need an FFmpeg JNI swap of one
  * function. Payloads that fail to decode fall back to a
  * deterministic hash feature so heterogeneous corpora never poison a
  * batch. Everything Spark-side — schema, partition-parallel
  * execution shape, batch signature, feature-vector contract — is
  * real and tested.
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

  /** Demuxed AVI summary: main-header fields plus the per-frame image
    * statistics of every frame that decoded. `nFramesDeclared` is the
    * container's `avih.dwTotalFrames`; `frames.length` is what actually
    * decoded.
    */
  case class DecodedVideo(width: Int, height: Int, microSecPerFrame: Int,
      nFramesDeclared: Int, frames: IndexedSeq[DecodedImage])

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

    /** Frame features for AVI video payloads: demux the container
      * ([[decodeAvi]]), sample up to `nFrames` frames evenly across the
      * stream, and emit per-frame image statistics in the
      * [[imageFeature]] layout ([width, height, meanR, meanG, meanB,
      * grayHist×8]). Non-AVI / undecodable payloads fall back to the
      * deterministic hash feature (exactly `nFrames` rows) so foreign
      * payloads never fail a batch.
      */
    def videoFrameSample(payload: Array[Byte], nFrames: Int, dim: Int): Seq[Array[Float]] =
      decodeAvi(payload) match {
        case Some(v) =>
          val idx =
            if (nFrames >= v.frames.length) v.frames.indices
            else (0 until nFrames).map(i => i * v.frames.length / nFrames)
          idx.map { i =>
            val f = v.frames(i)
            pack(dim, Array(f.width.toFloat, f.height.toFloat,
              f.meanR, f.meanG, f.meanB) ++ f.grayHist)
          }
        case None =>
          (0 until nFrames).map(f => pseudoFeature(payload, dim, seed = 0xf00dL + f))
      }

    /** Whole-video feature: container header plus first-frame pixel
      * statistics — [width, height, nFramesDecoded, meanR, meanG,
      * meanB, grayHist×8] of frame 0.
      */
    def videoFeature(payload: Array[Byte], dim: Int): Array[Float] =
      decodeAvi(payload) match {
        case Some(v) =>
          val f = v.frames.head
          pack(dim, Array(v.width.toFloat, v.height.toFloat,
            v.frames.length.toFloat, f.meanR, f.meanG, f.meanB) ++ f.grayHist)
        case None => pseudoFeature(payload, dim, seed = 0xf00dL)
      }

    /** AVI (RIFF) demuxer for the MJPEG/DIB profile: walks the chunk
      * tree for the `avih` main header (LIST/hdrl) and the frame chunks
      * (`##dc`/`##db` inside LIST/movi), then decodes each frame
      * through [[decodeImage]] — MJPEG frames ARE baseline JPEGs, and
      * the JDK's ImageIO reads those (and DIB/BMP frames) natively.
      * Frames that fail image decode are skipped; a payload with no
      * readable header or zero decodable frames returns None.
      */
    def decodeAvi(payload: Array[Byte]): Option[DecodedVideo] =
      try {
        if (payload.length < 24 ||
          payload(0) != 'R' || payload(1) != 'I' || payload(2) != 'F' || payload(3) != 'F' ||
          payload(8) != 'A' || payload(9) != 'V' || payload(10) != 'I' || payload(11) != ' ')
          return None
        val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fourcc(at: Int) = new String(payload, at, 4, "US-ASCII")
        var width = -1; var height = -1; var uspf = -1; var declared = -1
        val frames = Vector.newBuilder[DecodedImage]
        var pos = 12
        while (pos + 8 <= payload.length) {
          val id = fourcc(pos)
          val size = buf.getInt(pos + 4)
          if (size < 0 || pos + 8 + size > payload.length) return None // corrupt
          if (id == "LIST" && size >= 4) {
            val sub = fourcc(pos + 8)
            val end = pos + 8 + size
            if (sub == "hdrl") {
              // 'avih': µs/frame(0) … totalFrames(16) … width(32) height(36);
              // nested LIST/strl chunks advance over as ordinary chunks
              var p = pos + 12
              while (p + 8 <= end) {
                val cid = fourcc(p)
                val csz = buf.getInt(p + 4)
                if (csz < 0 || p + 8 + csz > payload.length) return None
                if (cid == "avih" && csz >= 40) {
                  uspf = buf.getInt(p + 8)
                  declared = buf.getInt(p + 8 + 16)
                  width = buf.getInt(p + 8 + 32)
                  height = buf.getInt(p + 8 + 36)
                }
                p += 8 + csz + (csz & 1)
              }
            } else if (sub == "movi") {
              // frame chunks may sit directly in movi or be grouped in
              // 'LIST rec ' sub-lists (the interleaved layout many
              // muxers emit) — walk one level into those
              var ok = true
              def walkFrames(from: Int, to: Int, depth: Int): Unit = {
                var p = from
                while (ok && p + 8 <= to) {
                  val cid = fourcc(p)
                  val csz = buf.getInt(p + 4)
                  if (csz < 0 || p + 8 + csz > payload.length) { ok = false }
                  else {
                    if (cid == "LIST" && csz >= 4 && depth == 0 &&
                      fourcc(p + 8) == "rec ") {
                      walkFrames(p + 12, p + 8 + csz, depth + 1)
                    } else if (cid(2) == 'd' && (cid(3) == 'c' || cid(3) == 'b') && csz > 0) {
                      decodeImage(java.util.Arrays.copyOfRange(payload, p + 8, p + 8 + csz))
                        .foreach(frames += _)
                    }
                    p += 8 + csz + (csz & 1)
                  }
                }
              }
              walkFrames(pos + 12, end, 0)
              if (!ok) return None
            }
          }
          pos += 8 + size + (size & 1)
        }
        val fs = frames.result()
        if (width <= 0 || height <= 0 || fs.isEmpty) None
        else Some(DecodedVideo(width, height, uspf, declared, fs))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Minimal AVI writer for the profile [[decodeAvi]] reads:
      * RIFF/AVI → LIST/hdrl(avih + LIST/strl(strh,strf)) → LIST/movi
      * with one `00dc` chunk per already-encoded frame (JPEG for
      * MJPEG; BMP/DIB payloads for the uncompressed profile). The
      * synthesis counterpart for pipelines and decode-proof tests.
      */
    def encodeAvi(w: Int, h: Int, microSecPerFrame: Int,
        frames: Seq[Array[Byte]], handler: String = "MJPG"): Array[Byte] = {
      require(frames.nonEmpty, "encodeAvi requires at least one frame")
      val framesPadded = frames.map(f => 8 + f.length + (f.length & 1))
      val moviSize = 4 + framesPadded.sum
      val strlSize = 4 + (8 + 56) + (8 + 40)
      val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
      val buf = java.nio.ByteBuffer.allocate(8 + riffSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def cc(s: String) = buf.put(s.getBytes("US-ASCII"))
      cc("RIFF"); buf.putInt(riffSize); cc("AVI ")
      cc("LIST"); buf.putInt(hdrlSize); cc("hdrl")
      cc("avih"); buf.putInt(56)
      buf.putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0)
        .putInt(frames.length).putInt(0).putInt(1).putInt(0)
        .putInt(w).putInt(h).putInt(0).putInt(0).putInt(0).putInt(0)
      cc("LIST"); buf.putInt(strlSize); cc("strl")
      cc("strh"); buf.putInt(56)
      cc("vids"); cc(handler)
      buf.putInt(0).putShort(0).putShort(0).putInt(0)
        .putInt(microSecPerFrame).putInt(1000000) // scale/rate = fps
        .putInt(0).putInt(frames.length).putInt(0).putInt(-1).putInt(0)
        .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort)
      cc("strf"); buf.putInt(40)
      buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      cc(handler)
      buf.putInt(w * h * 3).putInt(0).putInt(0).putInt(0).putInt(0)
      cc("LIST"); buf.putInt(moviSize); cc("movi")
      frames.foreach { f =>
        cc("00dc"); buf.putInt(f.length); buf.put(f)
        if ((f.length & 1) == 1) buf.put(0.toByte)
      }
      buf.array()
    }

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

    /** Block-averaged integer-luma grid (`gh` rows × `gw` cols,
      * row-major): the shared downscale for perceptual hashes. Cell
      * (gx, gy) covers pixel x ∈ [gx·w/gw, (gx+1)·w/gw) (min 1 px) and
      * the analogous y range; its value is the INTEGER mean of the
      * BT.601 integer luma `(299r + 587g + 114b) / 1000` over the cell
      * — all-integer arithmetic, so an external engine can replay the
      * hash bit-for-bit from known pixels (the mm_phash gate does).
      */
    private[multimodal] def grayGrid(payload: Array[Byte], gw: Int, gh: Int): Option[Array[Int]] =
      try {
        imageIoConfigured
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new Array[Int](gw * gh)
          var gy = 0
          while (gy < gh) {
            val y0 = gy * h / gh
            val y1 = math.max(y0 + 1, (gy + 1) * h / gh)
            var gx = 0
            while (gx < gw) {
              val x0 = gx * w / gw
              val x1 = math.max(x0 + 1, (gx + 1) * w / gw)
              var s = 0L; var n = 0L
              var y = y0
              while (y < math.min(y1, h)) {
                var x = x0
                while (x < math.min(x1, w)) {
                  val rgb = img.getRGB(x, y)
                  val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                  s += (r * 299 + g * 587 + b * 114) / 1000
                  n += 1
                  x += 1
                }
                y += 1
              }
              out(gy * gw + gx) = if (n == 0) 0 else (s / n).toInt
              gx += 1
            }
            gy += 1
          }
          Some(out)
        }
      } catch { case scala.util.control.NonFatal(_) => None }

    /** FNV-1a 64 over raw payload bytes — the deterministic fallback
      * hash for payloads the image decoder rejects (same philosophy as
      * [[imageFeature]]'s pseudo-feature: a foreign payload degrades to
      * a stable value instead of failing the batch; its hash is
      * content-derived, so exact byte-duplicates still collide).
      */
    private[multimodal] def fnv1a64(payload: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) {
        h ^= payload(i) & 0xffL
        h *= 0x100000001b3L
        i += 1
      }
      h
    }

    /** 64-bit difference hash (dHash, Krawetz 2013): 9×8 block-averaged
      * luma grid; bit `gy·8 + gx` is set iff cell (gx+1, gy) is
      * strictly brighter than cell (gx, gy). TOTAL: undecodable
      * payloads get the [[fnv1a64]] content hash. All-integer, so the
      * mm_phash gate replays every bit in DuckDB from synthesized
      * pixels.
      */
    def dHash64(payload: Array[Byte]): Long =
      grayGrid(payload, 9, 8) match {
        case Some(g) =>
          var bits = 0L
          var gy = 0
          while (gy < 8) {
            var gx = 0
            while (gx < 8) {
              if (g(gy * 9 + gx + 1) > g(gy * 9 + gx)) bits |= 1L << (gy * 8 + gx)
              gx += 1
            }
            gy += 1
          }
          bits
        case None => fnv1a64(payload)
      }

    /** 64-bit perceptual hash (pHash): 32×32 luma grid → 2D DCT-II →
      * the 8×8 lowest-frequency block; bit `v·8 + u` is set iff the
      * coefficient exceeds the median of the block's 63 non-DC
      * coefficients (DC itself compares against the same median —
      * effectively always set — keeping a stable 64-bit layout).
      * Robust to resizing/blur/small edits where [[dHash64]] is the
      * cheaper gradient test; float DCT, so cross-engine parity is
      * spec-level (tolerance on Hamming), not a bit-replay gate.
      */
    def pHash64(payload: Array[Byte]): Long =
      grayGrid(payload, 32, 32) match {
        case Some(g) =>
          val n = 32
          val cosTab = Array.tabulate(8, n)((u, x) =>
            math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)))
          val block = Array.tabulate(8, 8) { (v, u) =>
            var s = 0.0
            var y = 0
            while (y < n) {
              var x = 0
              while (x < n) {
                s += g(y * n + x) * cosTab(u)(x) * cosTab(v)(y)
                x += 1
              }
              y += 1
            }
            s
          }
          val nonDc = (for (v <- 0 until 8; u <- 0 until 8 if u != 0 || v != 0)
            yield block(v)(u)).sorted
          val median = nonDc(nonDc.length / 2)
          var bits = 0L
          for (v <- 0 until 8; u <- 0 until 8)
            if (block(v)(u) > median) bits |= 1L << (v * 8 + u)
          bits
        case None => fnv1a64(payload)
      }

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
    /** The shared RIFF/WAVE chunk walk: (channels, sampleRate,
      * bitsPerSample, dataOffset, dataLength) for PCM 8/16-bit
      * payloads, None for anything else — used by [[decodeWav]] and
      * [[audioHash64]].
      */
    private def wavPcm(payload: Array[Byte]): Option[(Int, Int, Int, Int, Int)] =
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
        for ((channels, rate, bits) <- fmt; (off, len) <- data
          if bits == 8 || bits == 16)
          yield (channels, rate, bits, off, len)
      } catch { case scala.util.control.NonFatal(_) => None }

    def decodeWav(payload: Array[Byte]): Option[DecodedAudio] =
      try {
        val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        for ((channels, rate, bits, off, len) <- wavPcm(payload)) yield {
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

    /** 64-bit audio fingerprint: the [[dHash64]] idea on the time
      * axis. The PCM sample stream (channel-interleaved, treated flat
      * — deterministic and mixdown-free) is cut into 65 equal frames;
      * each frame's energy is the INTEGER mean |amplitude| in raw PCM
      * units; bit `f` is set iff frame f+1 is louder than frame f.
      * Robust to gain-preserving re-encodes and small edits (energy
      * envelope shape), all-integer so the mm_audiohash gate replays
      * every bit in DuckDB from synthesized samples. Non-WAV or
      * shorter-than-65-sample payloads get the [[fnv1a64]] content
      * hash (TOTAL, like the image hashes).
      */
    def audioHash64(payload: Array[Byte]): Long =
      wavPcm(payload) match {
        case Some((_, _, bits, off, len)) if len / (bits / 8) >= 65 =>
          val buf = java.nio.ByteBuffer.wrap(payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = len / (bits / 8)
          val e = new Array[Long](65)
          var f = 0
          while (f < 65) {
            val i0 = f * n / 65
            val i1 = math.max(i0 + 1, (f + 1) * n / 65)
            var s = 0L
            var i = i0
            while (i < i1) {
              val a =
                if (bits == 16) math.abs(buf.getShort(off + i * 2).toInt)
                else math.abs((payload(off + i) & 0xff) - 128)
              s += a
              i += 1
            }
            e(f) = s / (i1 - i0)
            f += 1
          }
          var bitsOut = 0L
          f = 0
          while (f < 64) {
            if (e(f + 1) > e(f)) bitsOut |= 1L << f
            f += 1
          }
          bitsOut
        case _ => fnv1a64(payload)
      }

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
        // per-partition codec init happens here, once
        rows.map { case (id, kind, payload) =>
          val feat = kind match {
            case "audio" => Codecs.audioFeature(payload, dim)
            case "video" => Codecs.videoFeature(payload, dim)
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

  /** Scene-change detection over decoded video frames: a boundary is a
    * frame whose mean-luma jump from its predecessor exceeds
    * `threshold` (0–255 scale) — the shot-segmentation primitive a
    * video-curation pipeline keys clip extraction and per-scene
    * dedup/captioning on. Runs on [[sampleFrames]] output, so the
    * decode is the same real AVI demux path; the lag window partitions
    * per video (state bounded by frames-per-video, never corpus size).
    *
    * Returns boundary rows (media_id, frame_no, prev_mean_255,
    * mean_255, delta) with integer 0–255 means; frame 0 is never a
    * boundary (no predecessor).
    */
  def sceneChanges(media: DataFrame, nFrames: Int,
      threshold: Int, dim: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = sampleFrames(media, nFrames, dim)
      .select(col("media_id"), col("frame_no"),
        graft.functions.hround(element_at(col("feature"), 3) * 255, 0)
          .cast("long").as("mean_255"))
    val w = Window.partitionBy("media_id").orderBy("frame_no")
    frames
      .withColumn("prev_mean_255", lag("mean_255", 1).over(w))
      .withColumn("delta", abs(col("mean_255") - col("prev_mean_255")))
      .filter(col("delta") > threshold)
      .select(col("media_id"), col("frame_no"), col("prev_mean_255"),
        col("mean_255"), col("delta"))
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
