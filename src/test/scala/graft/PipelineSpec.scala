package graft

import graft.operators.{Dedup, Sampling, TextAnalysis}
import graft.pipelines.TrainingDataPipeline
import graft.pipelines.TrainingDataPipeline.Config
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val bench = docs.filter($"doc_id" < 20)
  private lazy val corpus = docs.filter($"doc_id" >= 20)

  test("stages shrink monotonically and each enforces its invariant") {
    val cfg = Config(nearDupJaccard = 0.5, maxContamination = 0.3, testFraction = 0.25)
    val q = TrainingDataPipeline.qualityFilter(corpus, "doc_id", "text", cfg)
    assert(q.count() <= corpus.count() && q.count() > 0)
    assert(q.filter(TextAnalysis.repetitionRatio($"text") > cfg.maxRepetition).count() == 0)

    val d = TrainingDataPipeline.dedup(q, "doc_id", "text", cfg)
    assert(d.count() <= q.count() && d.count() > 0)
    // no surviving pair above the near-dup threshold
    assert(Dedup.jaccardPairs(d, "doc_id", "text", cfg.nearDupJaccard).count() == 0)

    val c = TrainingDataPipeline.decontaminate(
      d, "doc_id", "text", bench, "doc_id", "text", cfg)
    assert(c.count() <= d.count())
    assert(Dedup.ngramContamination(c, "doc_id", "text", bench, "doc_id", "text",
      cfg.contaminationNgram, cfg.maxContamination).count() == 0)
  }

  test("new stages: redact removes PII, filters enforce their gates, pack tiles") {
    import graft.operators.{LangModel, Pii, Packing}
    // seed PII into a copy so redact has something to remove
    val dirty = corpus.withColumn("text",
      concat($"text", lit(" contact owner"), $"doc_id", lit("@example.com")))
    val red = TrainingDataPipeline.redact(dirty, "text")
    assert(red.filter(Pii.hasPii($"text")).count() == 0)
    assert(red.filter($"text".contains("[EMAIL]")).count() == dirty.count())

    val g = TrainingDataPipeline.gopherFilter(red, "text")
    assert(g.count() > 0 && g.count() < red.count())
    assert(g.filter(!TextAnalysis.gopherPass($"text")).count() == 0)

    val lm = LangModel.fitUnigram(g, "text", vocabSize = 30)
    val maxPpl = 40.0
    val p = TrainingDataPipeline.perplexityFilter(g, "text", lm, maxPpl)
    assert(p.count() > 0 && p.count() <= g.count())
    assert(LangModel.perplexity(p, "doc_id", "text", lm)
      .filter($"perplexity" > maxPpl).count() == 0)

    val packed = TrainingDataPipeline.pack(p, "doc_id", "text", seqLen = 256)
    val spans = packed.orderBy("doc_id")
      .select("start_tok", "n_tokens").as[(Long, Long)].collect()
    spans.sliding(2).foreach {
      case Array((s0, n0), (s1, _)) => assert(s1 == s0 + n0)
      case _ =>
    }
    assert(Packing.sequenceCount(p, "text", 256) ==
      (spans.last._1 + spans.last._2 + 255) / 256)
  }

  test("prepare: train/test disjoint, exhaustive over the cleaned set, deterministic") {
    val cfg = Config(nearDupJaccard = 0.5, maxContamination = 0.3, testFraction = 0.25)
    val (train, test) = TrainingDataPipeline.prepare(
      corpus, "doc_id", "text", bench, "doc_id", "text", cfg)
    val tr = train.select($"doc_id").as[Long].collect().toSet
    val te = test.select($"doc_id").as[Long].collect().toSet
    assert(tr.intersect(te).isEmpty && te.nonEmpty && tr.nonEmpty)
    // re-running yields the same membership (hash-based, no RNG)
    val (train2, test2) = TrainingDataPipeline.prepare(
      corpus, "doc_id", "text", bench, "doc_id", "text", cfg)
    assert(train2.select($"doc_id").as[Long].collect().toSet == tr)
    assert(test2.select($"doc_id").as[Long].collect().toSet == te)
    // test membership is a pure function of (id, derived split salt) —
    // re-applying the same predicate to the test side keeps every row
    te.foreach { id =>
      assert(Sampling.hashSample(test, "doc_id", cfg.testFraction, cfg.salt + "|split")
        .filter($"doc_id" === id).count() == 1)
    }
    // and the split salt is decorrelated from the sampling salt: at
    // sampleFraction = testFraction the train side must NOT be empty
    // (the old same-salt bug made test swallow the whole sample)
    val tiny = cfg.copy(sampleFraction = 0.5, testFraction = 0.5)
    val (tr2, te2) = TrainingDataPipeline.prepare(
      corpus, "doc_id", "text", bench, "doc_id", "text", tiny)
    assert(tr2.count() > 0 && te2.count() > 0)
  }

  test("validate report: hand counts, NULL counts as violation, one scan") {
    import graft.operators.Validate
    val d = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (15L, "a"), (null, "c"))
      .toDF("v", "s")
    val r = Validate.report(d, Seq(
      "v_small" -> ($"v" <= 10),     // 15 violates; NULL violates
      "s_domain" -> $"s".isin("a", "b"),
      // a dotted rule name must stay a plain label, not resolve as a
      // nested-field reference (positional internal columns)
      "v.not.null" -> $"v".isNotNull))
      .select($"rule", $"n_rows", $"n_violations", $"violation_rate")
      .as[(String, Long, Long, Double)].collect().map(t => t._1 -> t).toMap
    assert(r("v_small")._2 == 4L && r("v_small")._3 == 2L)
    assert(r("v_small")._4 == 0.5)
    assert(r("s_domain")._3 == 1L)
    assert(r("v.not.null")._3 == 1L)
    // single aggregate: the plan has exactly one Exchange (final agg)
    val plan = Validate.report(d, Seq("x" -> $"v".isNotNull))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "rules must not multiply scans")
  }

  test("benfordDigits: hand histogram, non-positives excluded") {
    import graft.operators.Validate
    val d = Seq(("g", 123L), ("g", 19L), ("g", 2L), ("g", 250L),
      ("g", 0L), ("g", -7L), ("h", 900L)).toDF("g", "v")
    val r = Validate.benfordDigits(d, Seq("g"), "v")
      .as[(String, Int, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(r == Map(("g", 1) -> 2L, ("g", 2) -> 2L, ("h", 9) -> 1L))
  }

  test("topKWithOthers: cut ties on value, tail mass + cardinality, nulls to other") {
    import graft.operators.Reports
    val d = Seq("x", "x", "x", "y", "y", "z", "w", null, null)
      .map(Tuple1(_)).toDF("v")
    val r = Reports.topKWithOthers(d, "v", k = 2)
      .as[(String, Long, Long)].collect().toSeq
    // top: x(3), y(2); other: z(1) + w(1) + null(2) = 4 mass, 3 values
    assert(r == Seq(("x", 3L, 1L), ("y", 2L, 1L), ("<other>", 4L, 3L)))
    // k >= distinct values: no other row at all
    val all = Reports.topKWithOthers(d.filter($"v".isNotNull), "v", k = 10)
      .as[(String, Long, Long)].collect().toSeq
    assert(all == Seq(("x", 3L, 1L), ("y", 2L, 1L), ("w", 1L, 1L), ("z", 1L, 1L)))
  }

  test("referentialIntegrity: orphans, unused parents, nulls orphan") {
    import graft.operators.Validate
    val child = Seq[Tuple1[java.lang.Long]](Tuple1(1L), Tuple1(1L),
      Tuple1(2L), Tuple1(9L), Tuple1(null)).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Validate.referentialIntegrity(child, "fk", parent, "pk")
      .as[(Long, Long, Long, Long)].head()
    // 5 children; orphans = {9, null}; 3 parents; unused = {3}
    assert(r == ((5L, 2L, 3L, 1L)))
  }

  test("validate uniqueness: dupes counted, empty frame, null keys group") {
    import graft.operators.Validate
    val d = Seq(("a", 1), ("a", 1), ("a", 2), ("b", 1)).toDF("k", "n")
    val u = Validate.uniqueness(d, Seq("k", "n"))
      .as[(Long, Long, Long, Long)].head()
    assert(u == ((4L, 3L, 1L, 2L)))
    val e = Validate.uniqueness(d.filter($"n" > 99), Seq("k"))
      .as[(Long, Long, Long, Long)].head()
    assert(e == ((0L, 0L, 0L, 0L)))
    val nulls = Seq[(String, Integer)](("x", null), ("y", null))
      .toDF("k", "n")
    assert(Validate.uniqueness(nulls, Seq("n"))
      .as[(Long, Long, Long, Long)].head() == ((2L, 1L, 1L, 2L)))
  }
}
