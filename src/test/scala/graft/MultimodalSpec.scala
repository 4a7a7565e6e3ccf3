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
