package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSuite {
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String)]) = rows.toDF("id", "text")

  test("featureCounts: multiplicity kept, sorted, bigrams included") {
    val fs = docsDF(Seq((1L, "a b a")))
      .select(Dsir.featureCounts($"text").as("fs"))
      .as[Seq[Int]].collect()(0)
    // unigrams a, b, a + bigrams "a b", "b a" = 5 features, with the
    // duplicate 'a' preserved (bag, not set) and the array sorted
    assert(fs.length == 5)
    assert(fs == fs.sorted)
    assert(fs.groupBy(identity).values.exists(_.length >= 2),
      "duplicate token must contribute twice")
    assert(fs.forall(f => f >= 0 && f < Dsir.NumBuckets))
    // empty/whitespace text has no features
    val empty = docsDF(Seq((1L, "  ")))
      .select(Dsir.featureCounts($"text").as("fs")).as[Seq[Int]].collect()(0)
    assert(empty.isEmpty)
  }

  test("fitLogProbs: smoothed, normalized, counts where expected") {
    val p = Dsir.fitLogProbs(docsDF(Seq((1L, "x y"), (2L, "x"))), "text")
    assert(p.length == Dsir.NumBuckets)
    // probabilities sum to 1 (within fp error)
    assert(math.abs(p.map(math.exp).sum - 1.0) < 1e-9)
    // 4 feature occurrences (x, y, "x y", x) over 4096+4 mass: the
    // never-seen buckets all sit at the smoothing floor log(1/4100)
    val floor = math.log(1.0 / (4 + Dsir.NumBuckets))
    assert(p.count(v => math.abs(v - floor) < 1e-12) >= Dsir.NumBuckets - 3)
    assert(p.exists(v => v > floor + 0.5), "seen buckets must rise above the floor")
  }

  test("scoreAgainst: target-like docs outscore off-target docs") {
    val raw = docsDF(Seq(
      (1L, "alpha beta alpha beta gamma"),
      (2L, "omega psi chi omega psi"),
      (3L, "alpha beta gamma alpha")))
    val target = docsDF(Seq(
      (10L, "alpha beta gamma"), (11L, "alpha beta alpha")))
    val w = Dsir.scoreAgainst(raw, target, "text")
      .select($"id", $"dsir_logw").as[(Long, Double)].collect().toMap
    assert(w(1) > w(2), s"target-like doc must outscore off-target: $w")
    assert(w(3) > w(2), s"target-like doc must outscore off-target: $w")
    // off-target tokens never occur in target: every term's ratio is
    // negative (raw count > 0, target at the smoothing floor)
    assert(w(2) < 0.0)
  }

  test("select: k rows, no dupes, deterministic, weight-biased") {
    val raw = docsDF(
      (1L to 40L).map(i => i -> (if (i <= 20) "alpha beta gamma" else "omega psi chi")))
    val target = docsDF(Seq((100L, "alpha beta gamma alpha beta")))
    val got = Dsir.select(raw, target, "text", "id", k = 10)
      .select($"id", $"es_rank").as[(Long, Int)].collect()
    assert(got.length == 10)
    assert(got.map(_._1).distinct.length == 10)
    assert(got.map(_._2).sorted.toSeq == (1 to 10))
    // the 20 target-like docs carry e^(large positive) relative weight:
    // they must dominate the sample
    assert(got.count(_._1 <= 20) >= 9, s"selection not weight-biased: ${got.toSeq}")
    val again = Dsir.select(raw, target, "text", "id", k = 10)
      .select($"id", $"es_rank").as[(Long, Int)].collect()
    assert(again.toSet == got.toSet, "selection must be deterministic")
    // low temperature degenerates toward hard top-k by weight: all picks
    // from the target-like half
    val cold = Dsir.select(raw, target, "text", "id", k = 10,
      temperature = 0.05)
      .select($"id").as[Long].collect()
    assert(cold.forall(_ <= 20L), s"cold selection leaked off-target docs: ${cold.toSeq}")
  }

  test("select: empty raw corpus fails with a clear message, not an NPE") {
    val target = docsDF(Seq((100L, "alpha beta")))
    val ex1 = intercept[IllegalArgumentException](
      Dsir.select(docsDF(Seq.empty), target, "text", "id", k = 3))
    assert(ex1.getMessage.contains("raw corpus is empty"))
    // all-NULL text scores no rows either — same guard, not getDouble(NULL)
    val nullRaw = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val ex2 = intercept[IllegalArgumentException](
      Dsir.select(nullRaw, target, "text", "id", k = 1))
    assert(ex2.getMessage.contains("raw corpus is empty"))
  }

  test("ratio persistence: save/load round-trip is bit-identical, guards hold") {
    val raw = docsDF((1L to 20L).map(i => i -> s"tok$i alpha beta"))
    val target = docsDF(Seq((99L, "alpha beta alpha")))
    val ratio = Dsir.fitRatio(raw, target, "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    Dsir.saveRatio(spark, dir, ratio)
    val loaded = Dsir.loadRatio(spark, dir)
    assert(loaded.toSeq == ratio.toSeq, "round-trip must be bit-identical")
    // scoring with the loaded table equals the direct fit
    val direct = Dsir.scoreAgainst(raw, target, "text")
      .select($"id", $"dsir_logw").as[(Long, Double)].collect().toMap
    val viaLoad = Dsir.scoreWithRatio(raw, "text", loaded)
      .select($"id", $"dsir_logw").as[(Long, Double)].collect().toMap
    assert(viaLoad == direct)
    intercept[IllegalArgumentException] {
      Dsir.saveRatio(spark, dir, Array(1.0))
    }
  }

  test("select: scoring path is shuffle-free, selection is top-k") {
    val raw = docsDF((1L to 50L).map(i => i -> s"tok$i alpha"))
    val target = docsDF(Seq((99L, "alpha alpha beta")))
    val scored = Dsir.scoreAgainst(raw, target, "text")
    val scorePlan = scored.queryExecution.executedPlan.toString
    assert(!scorePlan.contains("Exchange"),
      s"scoring must be a pure projection scan:\n$scorePlan")
    val selPlan = Dsir.select(raw, target, "text", "id", k = 5)
      .queryExecution.executedPlan.toString
    assert(selPlan.contains("TakeOrderedAndProject"),
      s"selection must plan as distributed top-k:\n$selPlan")
  }
}
