package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def mediaFixture = {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    Multimodal.fromBinary(docs, "doc_id", "text", "image")
  }

  test("fromBinary produces the canonical media schema") {
    val media = mediaFixture
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() == 50)
  }

  test("perceptual hashes: invariance, sensitivity, resize robustness, fallback") {
    val C = Multimodal.Codecs
    def gradient(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
      C.encodeBmp(w, h, Array.tabulate(w * h * 3) { i =>
        val p = i / 3; (f(p % w, p / w) & 0xff).toByte
      })
    // textured pattern with a rich spectrum: a flat gradient would park
    // every AC coefficient at the pHash median and make the bits noise
    def tex(x: Int, y: Int) = (x * x * 3 + y * y * 7 + x * y * 5) % 256
    val base = gradient(36, 32, tex)
    val same = gradient(36, 32, tex)
    val nearDup = gradient(36, 32, (x, y) =>
      if (x == 5 && y == 5) 250 else tex(x, y))
    val different = gradient(36, 32, (x, y) => (251 - tex(x, y)) & 0xff)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(C.dHash64(base) == C.dHash64(same))
    assert(C.pHash64(base) == C.pHash64(same))
    // a one-pixel edit moves a couple of cell means: a few bits at most
    assert(ham(C.dHash64(base), C.dHash64(nearDup)) <= 4)
    assert(ham(C.pHash64(base), C.pHash64(nearDup)) <= 4)
    assert(ham(C.dHash64(base), C.dHash64(different)) > 16)
    assert(ham(C.pHash64(base), C.pHash64(different)) > 16)
    // resize robustness: the same gradient at 2x resolution — block
    // averaging sees (near-)identical cells
    val big = gradient(72, 64, (x, y) => tex(x / 2, y / 2))
    assert(ham(C.dHash64(base), C.dHash64(big)) <= 8)
    assert(ham(C.pHash64(base), C.pHash64(big)) <= 8)
    // undecodable payloads: deterministic content hash, no failure
    val junk = Array.tabulate[Byte](64)(i => (i * 37).toByte)
    assert(C.dHash64(junk) == C.dHash64(junk.clone()))
    assert(C.dHash64(junk) == C.pHash64(junk)) // both fall back to FNV-1a
  }

  test("audioHash64: invariance, edit sensitivity, gain robustness, fallback") {
    val C = Multimodal.Codecs
    def wav(f: Int => Int, n: Int = 1300): Array[Byte] =
      C.encodeWavPcm16(8000, 1, Array.tabulate[Short](n)(t => (f(t) & 0xffff).toShort))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    def tone(t: Int) = ((t * t * 3 + t * 17) % 9000) - 4500
    val base = wav(tone)
    assert(C.audioHash64(base) == C.audioHash64(wav(tone)))
    // a short dropout perturbs a couple of frames, not the envelope
    val edited = wav(t => if (t >= 100 && t < 110) 0 else tone(t))
    assert(ham(C.audioHash64(base), C.audioHash64(edited)) <= 6)
    // uniform gain change preserves EVERY louder-than comparison
    val louder = wav(t => tone(t) * 3)
    assert(C.audioHash64(base) == C.audioHash64(louder))
    // a different envelope is far
    val other = wav(t => ((t * 31) % 11000) - 5500)
    assert(ham(C.audioHash64(base), C.audioHash64(other)) > 16)
    // non-WAV payloads: deterministic content fallback (same as images)
    val junk = Array.tabulate[Byte](80)(i => (i * 53).toByte)
    assert(C.audioHash64(junk) == C.audioHash64(junk.clone()))
    assert(C.audioHash64(junk) == C.dHash64(junk)) // shared FNV-1a fallback
  }

  test("image near-dup: dhash + quarter-block LSH pairs ≡ brute force; clusters form") {
    import graft.operators.Dedup
    val C = Multimodal.Codecs
    // 3 groups of near-identical images (one-pixel variants) + noise
    def img(group: Int, variant: Int): Array[Byte] =
      C.encodeBmp(36, 32, Array.tabulate(36 * 32 * 3) { i =>
        val p = i / 3; val x = p % 36; val y = p / 36
        val v = (x * (7 + group * 5) + y * (3 + group * 2) + group * 40) % 251
        ((if (x == variant && y == variant) v + 2 else v) & 0xff).toByte
      })
    val rows = for (g <- 0 until 3; v <- 0 until 3) yield (g * 10L + v, img(g, v))
    val media = rows.toDF("media_id", "payload")
    val hashed = media.select(col("media_id"),
      graft.functions.image_dhash64(col("payload")).as("dh"))
    val pairs = Dedup.hash64NearDupPairs(hashed, "media_id", "dh", maxHamming = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // brute force over the collected hashes
    val hs = hashed.as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs
      if a < b && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(pairs == brute, s"LSH pairs $pairs != brute $brute")
    // the within-group pairs exist; connected components find 3 groups
    assert((0 until 3).forall(g => pairs.contains((g * 10L, g * 10L + 1))))
    val comps = Dedup.connectedComponents(
        media.select(col("media_id")), "media_id",
        pairs.toSeq.toDF("a_id", "b_id"))
      .as[(Long, Long)].collect().groupBy(_._2)
    assert(comps.size == 3 && comps.values.forall(_.length == 3))
  }

  test("hash64NearDupPairs: giant buckets hub-star to O(m) yet still merge") {
    import graft.operators.Dedup
    // 20 identical sketches: every (block, value) bucket is size 20
    val same = (0L until 20L).map(i => (i, 0x1234567890abcdefL))
    val df = same.toDF("id", "h")
    // threshold below the bucket size: hub-star only, m-1 pairs
    val starred = Dedup.hash64NearDupPairs(df, "id", "h",
      maxHamming = 3, giantBucketThreshold = 8)
      .as[(Long, Long, Long)].collect()
    assert(starred.length == 19 && starred.forall(p => p._1 == 0L && p._3 == 0L))
    // threshold above: the full self-join, m·(m-1)/2 pairs
    val full = Dedup.hash64NearDupPairs(df, "id", "h",
      maxHamming = 3, giantBucketThreshold = 100)
    assert(full.count() == 190)
    // either way connected components see ONE cluster
    val comp = Dedup.connectedComponents(df.select(col("id")), "id",
      starred.map(p => (p._1, p._2)).toSeq.toDF("a_id", "b_id"))
      .select("comp").distinct().count()
    assert(comp == 1)
  }

  test("extractFeatures: fixed-dim vectors, deterministic across partitionings") {
    val media = mediaFixture
    val f1 = Multimodal.extractFeatures(media, dim = 16)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), dim = 16)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    assert(f1.size == 50)
    assert(f1.values.forall(_.size == 16))
    assert(f1 == f2) // partitioning-independent (stub codec is pure)
    assert(f1.values.flatten.forall(v => v >= -0.5f && v <= 0.5f))
  }

  test("audio/video kinds route to their codecs; features differ by kind") {
    val media = mediaFixture
    val img = Multimodal.extractFeatures(media, dim = 8).collect().head
    val aud = Multimodal.extractFeatures(
      media.withColumn("kind", lit("audio")), dim = 8).collect()
      .find(_.media_id == img.media_id).get
    assert(img.feature.toSeq != aud.feature.toSeq)
  }

  test("sampleFrames: n rows per video, stable frame numbering") {
    val media = mediaFixture.withColumn("kind", lit("video"))
    val frames = Multimodal.sampleFrames(media, nFrames = 3, dim = 8)
    assert(frames.count() == 150)
    assert(frames.groupBy("media_id").count().filter($"count" =!= 3).count() == 0)
    assert(frames.select("frame_no").distinct().orderBy("frame_no")
      .as[Int].collect().toSeq == Seq(0, 1, 2))
  }

  test("sceneChanges: jump frames flagged, flat video silent, frame 0 never") {
    import Multimodal.Codecs
    // video A: luma 10 for frames 0-3, 200 for 4-7, back to 10 for 8-9
    // video B: constant luma — no scenes
    val shades = Map(
      1L -> Seq(10, 10, 10, 10, 200, 200, 200, 200, 10, 10),
      2L -> Seq.fill(10)(80))
    val media = shades.toSeq.map { case (id, ss) =>
      (id, "video", Codecs.encodeAvi(6, 3, 40000,
        ss.map(sh => Codecs.encodeBmp(6, 3, Array.fill(54)(sh.toByte)))))
    }.toDF("media_id", "kind", "payload")
    val b = Multimodal.sceneChanges(media, nFrames = 10, threshold = 50)
      .select($"media_id", $"frame_no", $"prev_mean_255", $"mean_255",
        $"delta")
      .as[(Long, Int, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(b.toSeq == Seq(
      (1L, 4, 10L, 200L, 190L), (1L, 8, 200L, 10L, 190L)))
    // threshold above the jump: nothing flagged
    assert(Multimodal.sceneChanges(media, nFrames = 10, threshold = 200)
      .count() == 0)
  }

  test("AVI round-trip (DIB profile): demux recovers header and per-frame stats") {
    import Multimodal.Codecs
    // two solid-shade 6x3 BMP frames wrapped in a real AVI container
    val frames = Seq(40, 200).map(sh => Codecs.encodeBmp(6, 3, Array.fill(54)(sh.toByte)))
    val v = Codecs.decodeAvi(Codecs.encodeAvi(6, 3, 40000, frames)).get
    assert(v.width == 6 && v.height == 3)
    assert(v.microSecPerFrame == 40000 && v.nFramesDeclared == 2)
    assert(v.frames.length == 2)
    assert(math.abs(v.frames(0).meanR - 40f / 255f) < 1e-6f)
    assert(math.abs(v.frames(1).meanR - 200f / 255f) < 1e-6f)
    // frame sampling: more requested than present caps at what decoded
    val sampled = Codecs.videoFrameSample(Codecs.encodeAvi(6, 3, 40000, frames), 5, 16)
    assert(sampled.length == 2 && sampled(0)(0) == 6f)
    // whole-video feature carries the frame count
    val feat = Codecs.videoFeature(Codecs.encodeAvi(6, 3, 40000, frames), 16)
    assert(feat(0) == 6f && feat(1) == 3f && feat(2) == 2f)
  }

  test("AVI round-trip (MJPEG profile): JPEG frames demux and decode") {
    import Multimodal.Codecs
    // real baseline JPEGs via ImageIO — the frames an actual MJPEG AVI carries
    def jpegFrame(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(shade, shade, shade))
      g.fillRect(0, 0, 8, 4); g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val v = Codecs.decodeAvi(Codecs.encodeAvi(8, 4, 33367, Seq(
      jpegFrame(64), jpegFrame(192)))).get
    assert(v.width == 8 && v.height == 4 && v.frames.length == 2)
    assert(v.frames.forall(f => f.width == 8 && f.height == 4))
    // JPEG is lossy but a solid gray decodes within a few shades
    assert(math.abs(v.frames(0).meanR * 255f - 64f) < 4f)
    assert(math.abs(v.frames(1).meanR * 255f - 192f) < 4f)
  }

  test("AVI demuxer finds frames grouped in LIST/rec sub-lists") {
    import Multimodal.Codecs
    // the interleaved layout many muxers emit: each frame chunk wrapped
    // in its own 'LIST rec ' inside movi — built by hand since
    // encodeAvi writes the flat layout
    val frames = Seq(30, 90).map(sh => Codecs.encodeBmp(6, 3, Array.fill(54)(sh.toByte)))
    val flat = Codecs.encodeAvi(6, 3, 40000, frames)
    // splice: reuse the header from the flat container, rebuild movi
    val recChunks = frames.map { f =>
      val pad = f.length & 1
      val b = java.nio.ByteBuffer.allocate(12 + 8 + f.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + 8 + f.length + pad)
        .put("rec ".getBytes("US-ASCII"))
      b.put("00dc".getBytes("US-ASCII")).putInt(f.length).put(f)
      if (pad == 1) b.put(0.toByte)
      b.array()
    }
    val hdrlEnd = 12 + 8 + 192 // RIFF(12) + LIST hdrl chunk (8 + 192)
    val moviSize = 4 + recChunks.map(_.length).sum
    val out = java.nio.ByteBuffer
      .allocate(hdrlEnd + 8 + moviSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(flat, 0, hdrlEnd)
    out.put("LIST".getBytes("US-ASCII")).putInt(moviSize).put("movi".getBytes("US-ASCII"))
    recChunks.foreach(out.put)
    val avi = out.array()
    // patch the RIFF size to the rebuilt payload
    java.nio.ByteBuffer.wrap(avi).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, avi.length - 8)
    val v = Codecs.decodeAvi(avi).get
    assert(v.frames.length == 2)
    assert(math.abs(v.frames(0).meanR - 30f / 255f) < 1e-6f)
    assert(math.abs(v.frames(1).meanR - 90f / 255f) < 1e-6f)
  }

  test("AVI demuxer rejects corrupt and non-AVI payloads") {
    import Multimodal.Codecs
    assert(Codecs.decodeAvi(Array[Byte](1, 2, 3)).isEmpty)
    assert(Codecs.decodeAvi(
      Codecs.encodeWavPcm16(8000, 1, Array.fill(10)(5.toShort))).isEmpty)
    // truncated container: declared chunk size overruns the payload
    val frames = Seq(Codecs.encodeBmp(6, 3, Array.fill(54)(9.toByte)))
    val avi = Codecs.encodeAvi(6, 3, 40000, frames)
    assert(Codecs.decodeAvi(avi.take(avi.length - 10)).isEmpty)
  }

  test("BMP round-trip: ImageIO decode recovers header fields and pixel stats") {
    import Multimodal.Codecs
    // 4x2 image: top row solid red, bottom row solid blue
    val rgb = Array.fill(4 * 2 * 3)(0.toByte)
    (0 until 4).foreach { x => rgb((0 * 4 + x) * 3) = 0xff.toByte }      // red row
    (0 until 4).foreach { x => rgb((1 * 4 + x) * 3 + 2) = 0xff.toByte } // blue row
    val d = Codecs.decodeImage(Codecs.encodeBmp(4, 2, rgb)).get
    assert(d.width == 4 && d.height == 2)
    assert(math.abs(d.meanR - 0.5f) < 1e-6f) // half the pixels fully red
    assert(math.abs(d.meanB - 0.5f) < 1e-6f)
    assert(d.meanG == 0f)
    // luma: red=76, blue=29 -> bins 2 and 0, half the mass each
    assert(d.grayHist(2) == 0.5f && d.grayHist(0) == 0.5f)
    // and through the feature layout
    val f = Codecs.imageFeature(Codecs.encodeBmp(4, 2, rgb), dim = 16)
    assert(f(0) == 4f && f(1) == 2f && f(2) == d.meanR && f(13) == 0f)
  }

  test("WAV round-trip: RIFF parser recovers rate, channels, samples, rms") {
    import Multimodal.Codecs
    // constant half-scale amplitude -> rms = 0.5, all mass in bin 4
    val samples = Array.fill(800)(16384.toShort)
    val d = Codecs.decodeWav(Codecs.encodeWavPcm16(8000, 1, samples)).get
    assert(d.sampleRate == 8000 && d.channels == 1 && d.nSamples == 800)
    assert(math.abs(d.rms - 0.5f) < 1e-6f)
    assert(d.ampHist(4) == 1.0f && d.ampHist(0) == 0f)
    // stereo: nSamples counts frames, not interleaved samples
    val st = Codecs.decodeWav(Codecs.encodeWavPcm16(44100, 2, samples)).get
    assert(st.sampleRate == 44100 && st.channels == 2 && st.nSamples == 400)
  }

  test("undecodable payloads fall back to the deterministic pseudo-feature") {
    import Multimodal.Codecs
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(Codecs.decodeImage(junk).isEmpty && Codecs.decodeWav(junk).isEmpty)
    val f1 = Codecs.imageFeature(junk, 16)
    assert(f1.toSeq == Codecs.imageFeature(junk, 16).toSeq)
    assert(f1.forall(v => v >= -0.5f && v <= 0.5f))
  }

  test("extractFeatures decodes real BMP payloads distributed (header fields in features)") {
    val media = (0L until 20L).map { id =>
      val shade = (id * 12 % 256).toInt.toByte
      (id, "image", Multimodal.Codecs.encodeBmp(6, 3, Array.fill(6 * 3 * 3)(shade)))
    }.toDF("media_id", "kind", "payload")
    val feats = Multimodal.extractFeatures(media, dim = 16).collect()
    assert(feats.length == 20)
    feats.foreach { f =>
      assert(f.feature(0) == 6f && f.feature(1) == 3f) // decoded header dims
      val expected = ((f.media_id * 12 % 256) & 0xff) / 255f
      assert(math.abs(f.feature(2) - expected) < 1e-6f) // decoded pixel mean
    }
  }

  test("features feed downstream ANN (cosine near-dup over media features)") {
    val media = mediaFixture
    val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
    val pairs = graft.operators.SimilarityJoin.cosineNearDupPairs(
      feats, "media_id", "feature", threshold = 0.999)
    // stub features are pseudo-random: only exact byte-duplicates (none
    // here) would be near-identical
    assert(pairs.count() == 0)
  }
}
