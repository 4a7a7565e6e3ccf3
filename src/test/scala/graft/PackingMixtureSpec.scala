package graft

import org.apache.spark.sql.functions._

import graft.operators.{Mixture, Packing}

/** Sequence packing (two-level prefix sum) and mixture-balanced
  * sampling.
  */
class PackingMixtureSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "a b c"),          // 3 tokens, start 0
    (1L, "d e"),            // 2 tokens, start 3
    (2L, "f g h i j"),      // 5 tokens, start 5
    (3L, "k"),              // 1 token,  start 10
    (4L, "l m n o")         // 4 tokens, start 11 .. 14
  ).toDF("id", "text")

  test("packing: spans match the hand cumsum and seq coordinates (seqLen=4)") {
    val out = Packing.tokenSpans(corpus, "id", "text", seqLen = 4)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_tok", "first_seq", "last_seq", "seq_offset")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 3L, 0L, 0L, 0L, 0L),   // tokens 0-2 in seq 0
      (1L, 2L, 3L, 0L, 1L, 3L),   // tokens 3-4 straddle seqs 0-1
      (2L, 5L, 5L, 1L, 2L, 1L),   // tokens 5-9 straddle seqs 1-2
      (3L, 1L, 10L, 2L, 2L, 2L),
      (4L, 4L, 11L, 2L, 3L, 3L)))
  }

  test("packing: duplicate doc ids fail fast instead of corrupting the cumsum") {
    val dup = corpus.union(Seq((2L, "x y")).toDF("id", "text"))
    val e = intercept[Exception] {
      Packing.tokenSpans(dup, "id", "text", seqLen = 4).collect()
    }
    // raise_error surfaces wrapped in SparkException layers — match text
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate id values")), msgs(e).mkString(" | "))
  }

  test("packing: bucketed prefix sum is invariant to bucketSize") {
    val big = Packing.tokenSpans(corpus, "id", "text", 4, bucketSize = 1 << 20)
      .orderBy("doc_id").collect().toSeq
    val tiny = Packing.tokenSpans(corpus, "id", "text", 4, bucketSize = 2)
      .orderBy("doc_id").collect().toSeq
    assert(big == tiny)
  }

  test("packing: spans tile the token stream exactly (real corpus, many buckets)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Packing.tokenSpans(docs, "doc_id", "text", 512, bucketSize = 64)
      .orderBy("doc_id")
      .select("start_tok", "n_tokens").as[(Long, Long)].collect()
    out.sliding(2).foreach {
      case Array((s0, n0), (s1, _)) => assert(s1 == s0 + n0, "contiguous spans")
      case _ =>
    }
    assert(out.head._1 == 0L)
  }

  test("packing: sequenceCount is ceil(total/seqLen); empty corpus is 0") {
    assert(Packing.sequenceCount(corpus, "text", 4) == 4L) // 15 tokens / 4
    assert(Packing.sequenceCount(corpus, "text", 15) == 1L)
    assert(Packing.sequenceCount(corpus, "text", 16) == 1L)
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Packing.sequenceCount(empty, "text", 4) == 0L)
  }

  test("lengthBatches: same-width docs batch together, batches fill in id order") {
    val docs = Seq(
      (0L, "a b c"), (1L, "x y z"), (2L, "p q r"),      // bucket 1 (width 2)
      (3L, "a"), (4L, "b"),                             // bucket 0
      (5L, "one two three four five"))                  // bucket 2
      .toDF("id", "text")
    val out = Packing.lengthBatches(docs, "id", "text", bucketWidth = 2, batchSize = 2)
      .select("doc_id", "bucket", "batch_id", "slot")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(0L) == ((1L, 0L, 0L)))
    assert(out(1L) == ((1L, 0L, 1L)))
    assert(out(2L) == ((1L, 1L, 0L))) // third 3-token doc overflows to batch 1
    assert(out(3L) == ((0L, 0L, 0L)))
    assert(out(4L) == ((0L, 0L, 1L)))
    assert(out(5L) == ((2L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Packing.lengthBatches(docs, "id", "text", 0, 2)
    }
  }

  test("curriculumBatches: tiers by threshold, best-first within tier, hand-checked") {
    val docs = Seq(
      (0L, 950L), (1L, 980L), (2L, 920L),   // tier 0 (>= 900)
      (3L, 500L), (4L, 500L),               // tier 1 (>= 400) — tie breaks by id
      (5L, 100L))                           // tier 2
      .toDF("id", "score")
    val out = Packing.curriculumBatches(docs, "id", "score",
        thresholds = Seq(900L, 400L), batchSize = 2)
      .select("doc_id", "tier", "batch_id", "slot")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((0L, 0L, 0L))) // best score leads tier 0
    assert(out(0L) == ((0L, 0L, 1L)))
    assert(out(2L) == ((0L, 1L, 0L))) // overflows to the tier's next batch
    assert(out(3L) == ((1L, 0L, 0L))) // score tie -> lower id first
    assert(out(4L) == ((1L, 0L, 1L)))
    assert(out(5L) == ((2L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Packing.curriculumBatches(docs, "id", "score", Seq(400L, 900L), 2)
    }
    // the window must be tier-partitioned — never a global sort of the corpus
    val plan = Packing.curriculumBatches(docs, "id", "score", Seq(900L, 400L), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(tier"),
      s"expected tier-partitioned window exchange:\n$plan")
  }

  test("chunking: hand-checked windows, clipped full-length tail") {
    // 10 tokens, chunkLen=4, stride=3 → starts 0,3,6 (6 = 10-4 exactly)
    val d1 = Seq((0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("id", "text")
    val out1 = Packing.chunkSpans(d1, "id", "text", chunkLen = 4, stride = 3)
      .select("chunk_id", "tok_start", "tok_len")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out1 == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L)))
    // 9 tokens, chunkLen=4, stride=3 → starts 0,3,then clip 6→5 (full 4)
    val d2 = Seq((0L, "t0 t1 t2 t3 t4 t5 t6 t7 t8")).toDF("id", "text")
    val out2 = Packing.chunkSpans(d2, "id", "text", 4, 3)
      .select("chunk_id", "tok_start", "tok_len")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out2 == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 5L, 4L)))
    // short doc: one clipped chunk; null text: no chunks
    val d3 = Seq((0L, "a b"), (1L, null)).toDF("id", "text")
    val out3 = Packing.chunkSpans(d3, "id", "text", 4, 3)
      .select("doc_id", "chunk_id", "tok_start", "tok_len")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out3 == Seq((0L, 0L, 0L, 2L)))
  }

  test("chunking: every token is covered and windows stay in bounds") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val chunks = Packing.chunkSpans(docs, "doc_id", "text", 64, 16)
      .select("doc_id", "tok_start", "tok_len").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
    val nTok = docs.select($"doc_id",
        size(graft.operators.TextAnalysis.tokens($"text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    chunks.foreach { case (id, cs) =>
      val n = nTok(id)
      assert(cs.forall { case (_, s, l) => s >= 0 && l >= 1 && s + l <= n })
      assert(cs.head._2 == 0, "first window starts at 0")
      assert(cs.map(c => c._2 + c._3).max == n, "last window ends at n")
      // successive windows overlap or abut — no token gap
      val sorted = cs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, s0, l0), (_, s1, _)) => assert(s1 <= s0 + l0)
        case _ =>
      }
    }
  }

  private def mixDf = (0L until 200L).map { i =>
    (i, s"cls${(i % 4).toInt}")
  }.toDF("id", "cls") // 50 rows per class

  test("mixture: rates give the binding class exactly 1.0, others proportional") {
    val rates = Mixture.mixtureRates(mixDf,
      "cls", Map("cls0" -> 0.4, "cls1" -> 0.3, "cls2" -> 0.2, "cls3" -> 0.1))
    // uniform 50s: T = 50/0.4 = 125 → rates 1.0, .75, .5, .25
    assert(rates("cls0") == 1.0)
    assert(math.abs(rates("cls1") - 0.75) < 1e-12)
    assert(math.abs(rates("cls2") - 0.5) < 1e-12)
    assert(math.abs(rates("cls3") - 0.25) < 1e-12)
  }

  test("mixture: binding class fully kept, unlisted classes dropped, deterministic") {
    val shares = Map("cls0" -> 0.5, "cls1" -> 0.5) // cls2/cls3 unlisted
    val out = Mixture.mixtureSample(mixDf, "id", "cls", shares, salt = "s")
    val kept = out.select("id", "cls").as[(Long, String)].collect().toSet
    assert(kept.forall { case (_, c) => c == "cls0" || c == "cls1" })
    // uniform counts + equal shares → both classes bind at rate 1.0
    assert(kept.size == 100)
    val again = Mixture.mixtureSample(mixDf, "id", "cls", shares, salt = "s")
      .select("id", "cls").as[(Long, String)].collect().toSet
    assert(kept == again)
  }

  test("mixture: sampled class ratio tracks the target shares") {
    val skew = Map("cls0" -> 0.1, "cls1" -> 0.9)
    val out = Mixture.mixtureSample(mixDf, "id", "cls", skew, salt = "r")
      .groupBy("cls").count().as[(String, Long)].collect().toMap
    // T = 50/0.9 = 55.6 → cls1 keeps all 50, cls0 expects ~5.6
    assert(out("cls1") == 50)
    assert(out.getOrElse("cls0", 0L) <= 15, s"cls0 kept ${out.get("cls0")}")
  }

  test("mixture: validation — shares must sum to 1, classes must exist") {
    intercept[IllegalArgumentException] {
      Mixture.mixtureRates(mixDf, "cls", Map("cls0" -> 0.5, "cls1" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Mixture.mixtureRates(mixDf, "cls", Map("nope" -> 1.0))
    }
  }

  test("mixture: prefixThresholdHex matches printf('%015x') semantics") {
    assert(Mixture.prefixThresholdHex(0.5) == "800000000000000")
    assert(Mixture.prefixThresholdHex(0.0) == "000000000000000")
    intercept[IllegalArgumentException](Mixture.prefixThresholdHex(1.0))
  }

  test("weightedHashSample: weight 0 drops all, 1 keeps all, mid tracks rate") {
    import graft.operators.Sampling
    val df = spark.range(2000).toDF("id")
    assert(Sampling.weightedHashSample(df, "id", lit(0.0)).count() == 0L)
    assert(Sampling.weightedHashSample(df, "id", lit(1.0)).count() == 2000L)
    assert(Sampling.weightedHashSample(df, "id", lit(1.5)).count() == 2000L) // clamp
    val mid = Sampling.weightedHashSample(df, "id", lit(0.3), "s").count()
    assert(mid > 450 && mid < 750, s"~600 expected, got $mid")
  }

  test("weightedHashSample: per-row column threshold matches scalar semantics") {
    import graft.operators.{Mixture, Sampling}
    val df = spark.range(1000).toDF("id")
    // constant column weight must reproduce the scalar-threshold sample
    val viaCol = Sampling.weightedHashSample(df, "id", lit(0.25), "t")
      .select("id").as[Long].collect().toSet
    val h = substring(Sampling.keyHash(col("id"), "t"), 1, 15)
    val viaScalar = df.filter(h < lit(Mixture.prefixThresholdHex(0.25)))
      .select("id").as[Long].collect().toSet
    assert(viaCol == viaScalar && viaCol.nonEmpty)
  }

  test("zValue2 matches a bit-by-bit reference interleave incl. 32-bit edges") {
    import graft.operators.Layout
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 32) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val rnd = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL),
      (0xFFFFFFFFL, 0xFFFFFFFFL), (1L, 2L)) ++
      Seq.fill(50)((rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    val got = cases.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue2(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == ref(x, y), s"($x, $y)") }
    // z-order preserves grid locality direction: (0,0) < (1,0) < (0,1) interleaved
    assert(ref(1, 0) == 1L && ref(0, 1) == 2L && ref(1, 1) == 3L)
  }

  test("zorderBy: partitions cover disjoint contiguous z intervals") {
    import graft.operators.Layout
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(4000)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .toDF("x", "y")
    val parts = Layout.zorderBy(df, "x", "y", numPartitions = 8)
      .withColumn("z", Layout.zValue2(col("x"), col("y")))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"))
      .as[(Int, Long, Long)].collect().sortBy(_._2)
    assert(parts.length > 1)
    parts.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 <= lo2, "partition z ranges must not interleave")
      case _ =>
    }
  }

  test("withHilbertValue: bijection on the grid, unit-step adjacency, " +
      "reference first quadrant") {
    import graft.operators.Layout
    // full 8×8 grid at bits=3: h must be a bijection onto 0..63 and
    // every successive curve step must move by EXACTLY one Manhattan
    // unit — the property Z-order lacks (its seam jumps are long)
    val grid = (for (x <- 0 until 8; y <- 0 until 8)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val walk = Layout.withHilbertValue(grid, "x", "y", "h", bits = 3)
      .select($"h", $"x", $"y").as[(Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(walk.map(_._1).toSeq == (0L until 64L))
    walk.sliding(2).foreach {
      case Array((_, x1, y1), (_, x2, y2)) =>
        assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1L,
          s"non-unit step at ($x1,$y1)->($x2,$y2)")
      case _ =>
    }
    // bits=1 base case, the canonical U shape: (0,0)=0 (0,1)=1
    // (1,1)=2 (1,0)=3
    val base = Layout.withHilbertValue(
      Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y"),
      "x", "y", "h", bits = 1)
      .select($"x", $"y", $"h").as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(base((0L, 0L)) == 0L && base((0L, 1L)) == 1L &&
      base((1L, 1L)) == 2L && base((1L, 0L)) == 3L)
    // locality beats Z-order on the same grid: total Manhattan jump
    // along the curve is 63 (all unit steps) vs Z's seam jumps
    val zWalk = grid
      .select($"x", $"y", Layout.zValue2($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val zJump = zWalk.sliding(2).collect {
      case Array((x1, y1, _), (x2, y2, _)) =>
        math.abs(x2 - x1) + math.abs(y2 - y1)
    }.sum
    assert(zJump > 63L)
  }

  test("hilbertBy layout: a 2-D range predicate touches few files, " +
      "no more than the Z-order layout needs") {
    import graft.operators.Layout
    // full 64x64 grid, 16 range partitions -> each file covers one
    // contiguous curve segment (~256 cells). The probe rectangle is
    // deliberately NOT power-of-two aligned: it straddles Z-order's
    // big seams, where Morton locality falls apart and Hilbert holds.
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def overlappingFiles(laid: org.apache.spark.sql.DataFrame): Long = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-layout").toString
      laid.write.mode("overwrite").parquet(dir)
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"x").as("x0"), max($"x").as("x1"),
          min($"y").as("y0"), max($"y").as("y1"))
      // files whose min/max bounding box intersects the probe rect —
      // exactly the files parquet row-group stats pruning must read
      perFile.filter($"x1" >= 20 && $"x0" <= 43 && $"y1" >= 20 && $"y0" <= 43)
        .count()
    }
    val nH = overlappingFiles(Layout.hilbertBy(grid, "x", "y", 16, bits = 6))
    val nZ = overlappingFiles(Layout.zorderBy(grid, "x", "y", 16))
    // both prune: the 24x24 probe is 14% of the area, and neither
    // layout should touch all 16 files; Hilbert never needs more
    assert(nH < 16 && nZ < 16, s"pruning failed: hilbert=$nH zorder=$nZ")
    assert(nH <= nZ, s"hilbert=$nH should not exceed zorder=$nZ")
  }
}
