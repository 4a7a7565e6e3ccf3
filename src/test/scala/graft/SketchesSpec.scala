package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private lazy val skewed = spark.range(0, 20000)
    .select(
      col("id"),
      // genuinely skewed: key 0 holds half the rows (the heavy hitter
      // a CMS audit exists for), the rest spread over a 500-key tail
      when(col("id") < 10000, lit("0"))
        .otherwise((col("id") % 500).cast("string")).as("key"))
    .cache()

  test("count-min estimates dominate true counts and respect the eps bound") {
    val candidates = Seq("0", "1", "42", "499", "no_such_key")
    val (estDf, total) = Sketches.countMinEstimatesWithTotal(skewed, "key", candidates,
      eps = 0.001, confidence = 0.99, seed = 7)
    val est = estDf.as[(String, Long)].collect().toMap
    val exact = skewed.groupBy("key").count().as[(String, Long)].collect().toMap
    assert(total == skewed.count(), "sketch totalCount = item count")
    val slack = math.ceil(0.001 * total).toLong
    assert(est("0") >= 10000L, "the heavy hitter must register at its true mass")
    candidates.foreach { k =>
      val truth = exact.getOrElse(k, 0L)
      assert(est(k) >= truth, s"CMS must overestimate: key=$k est=${est(k)} true=$truth")
      assert(est(k) <= truth + slack, s"eps bound: key=$k est=${est(k)} true=$truth")
    }
  }

  test("bloom-prefiltered semi join equals the plain semi join") {
    val probe = spark.range(0, 50000).select(col("id").as("k"), (col("id") * 3).as("v"))
    val build = spark.range(0, 50000).filter(col("id") % 97 === 0)
      .select(col("id").as("bk"))
    val plain = probe.join(build.select(col("bk").as("k")), Seq("k"), "left_semi")
    val bloom = Sketches.bloomPrefilteredSemiJoin(probe, "k", build, "bk",
      expectedItems = 1000, fpp = 0.01)
    assert(bloom.select("k").as[Long].collect().sorted.toSeq ==
      plain.select("k").as[Long].collect().sorted.toSeq)
    // the bloom probe must sit in the scan stage as a filter predicate,
    // before any exchange
    val s = bloom.queryExecution.executedPlan.toString
    assert(s.contains("might_contain"), s"expected bloom predicate in plan:\n$s")
  }

  test("bloom pre-filter actually sheds non-matching rows before the shuffle") {
    val probe = spark.range(0, 100000).select(col("id").as("k"))
    val build = Seq(1L, 2L, 3L).toDF("bk")
    val bf = build.stat.bloomFilter(col("bk").cast("long"), 100, 0.01)
    val survivors = probe.filter(
      udf((k: Long) => bf.mightContainLong(k)).apply(col("k"))).count()
    // 3 true keys + ~1% false positives of 100k
    assert(survivors < 3000, s"bloom should shed ~99%, kept $survivors of 100000")
  }
}
