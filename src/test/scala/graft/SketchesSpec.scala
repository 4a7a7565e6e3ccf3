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

  test("kmv: exact below k, estimate within tolerance above, merge = union re-take") {
    import graft.operators.Sketches
    // small group: fewer than k distinct values -> exact count
    val small = (1 to 10).map(i => ("g", i.toLong)).toDF("g", "k")
    val exact = Sketches.kmvDistinct(small, "k", Seq("g"), k = 64).head()
    assert(exact.getAs[Boolean]("is_exact"))
    assert(exact.getAs[Long]("n_kept") == 10L)
    assert(exact.getAs[Double]("est_distinct") == 10.0)
    // large group: estimator path; KMV relative error ~ 1/sqrt(k-1),
    // allow 4 sigma
    val n = 20000
    val large = (1 to n).map(i => ("g", i.toLong)).toDF("g", "k")
    val est = Sketches.kmvDistinct(large, "k", Seq("g"), k = 256).head()
    assert(!est.getAs[Boolean]("is_exact"))
    val rel = math.abs(est.getAs[Double]("est_distinct") - n) / n
    assert(rel < 4.0 / math.sqrt(255.0), s"rel err $rel")
    // duplicates do not move the sketch: distinct hashes only
    val dup = large.union(large)
    val est2 = Sketches.kmvDistinct(dup, "k", Seq("g"), k = 256).head()
    assert(est2.getAs[Double]("est_distinct") == est.getAs[Double]("est_distinct"))
    // mergeability: sketch(A ∪ B) == re-take-k of sketch(A) ∪ sketch(B).
    // Verified through the operator: the k smallest hashes of the union
    // equal the k smallest of the two parts' k-smallest sets.
    val a = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "k")
    val b = (4000 to 9000).map(i => ("g", i.toLong)).toDF("g", "k")
    val whole = Sketches.kmvDistinct(a.union(b), "k", Seq("g"), k = 128).head()
    // simulate a merge: each part keeps its own k smallest (the sketch
    // state), union the states, re-run the same operator over them
    val h = org.apache.spark.sql.functions.conv(
      substring(graft.operators.Sampling.keyHash(col("k"), "kmv"), 1, 15), 16, 10)
      .cast("long")
    def state(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("_h"))
      df.select(col("g"), h.as("_h")).distinct()
        .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_rn") <= 128).select("g", "_h")
    }
    val mergedState = state(a).union(state(b)).distinct()
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy(col("_h"))))
      .filter(col("_rn") <= 128)
      .groupBy("g").agg(count(lit(1)).as("n_kept"), max(col("_h")).as("hk"))
      .head()
    val wholeEst = whole.getAs[Double]("est_distinct")
    val mergedEst = 127.0 * math.pow(2, 60) / mergedState.getAs[Long]("hk").toDouble
    assert(math.abs(wholeEst - mergedEst) < 1e-9,
      s"merged sketch estimate $mergedEst != whole-data estimate $wholeEst")
  }

  test("kmvDistinctCumulative: final bucket = whole-data sketch, curve monotone") {
    import graft.operators.Sketches
    // 3 buckets, overlapping keys across buckets (dedup must apply)
    val rows = ((1 to 300).map(i => ("g", 1, i.toLong)) ++
      (200 to 600).map(i => ("g", 2, i.toLong)) ++
      (500 to 900).map(i => ("g", 3, i.toLong))).toDF("g", "b", "k")
    val cum = Sketches.kmvDistinctCumulative(rows, "k", Seq("g"),
        col("b"), k = 64)
      .orderBy("bucket").collect()
    assert(cum.length == 3)
    // the cumulative estimate at the last bucket must equal the plain
    // sketch over ALL data — the merge is exactly union + re-take-k
    val whole = Sketches.kmvDistinct(rows, "k", Seq("g"), k = 64).head()
    assert(cum.last.getAs[Double]("est_distinct")
      == whole.getAs[Double]("est_distinct"))
    // distinct-to-date can only grow (hash set only gains members)
    val ests = cum.map(_.getAs[Double]("est_distinct")).toSeq
    assert(ests == ests.sorted, s"cumulative curve must be monotone: $ests")
    // all three buckets exceed k=64 distinct -> estimator path
    assert(cum.forall(!_.getAs[Boolean]("is_exact")))
    intercept[IllegalArgumentException](
      Sketches.kmvDistinctCumulative(rows, "k", Seq.empty, col("b"), 64))
  }
}
