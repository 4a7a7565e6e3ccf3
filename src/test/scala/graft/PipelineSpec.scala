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
}
