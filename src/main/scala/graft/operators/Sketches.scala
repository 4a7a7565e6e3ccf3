package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** Mergeable-sketch operators. Both sketches build distributedly (one
  * partial sketch per partition, merged associatively — the only
  * aggregation shape that survives 100 TB) through Spark's public
  * `DataFrameStatFunctions`, and both probe without a shuffle: the
  * Count-Min estimates are driver-side planner state over caller-named
  * candidate keys, and the Bloom probe is a codegen'd scan predicate.
  */
object Sketches {

  /** Count-Min frequency estimates for `candidates` of `keyCol`.
    * Returns (key, est) with the CMS guarantees: est ≥ true count, and
    * est ≤ true + eps·N with probability ≥ confidence.
    *
    * `candidates` is planner state (the keys you are auditing — heavy
    * hitter suspects, benchmark labels), NOT a distinct scan; the
    * sketch itself is O(1/eps · ln(1/confidence)) however large `df` is.
    */
  def countMinEstimates(
      df: DataFrame, keyCol: String, candidates: Seq[String],
      eps: Double = 0.0001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame =
    countMinEstimatesWithTotal(df, keyCol, candidates, eps, confidence, seed)._1

  /** [[countMinEstimates]] plus the sketch's own item total — the N in
    * the eps·N error bound, read off the merged sketch rather than paid
    * for with a separate count scan.
    */
  def countMinEstimatesWithTotal(
      df: DataFrame, keyCol: String, candidates: Seq[String],
      eps: Double = 0.0001, confidence: Double = 0.99,
      seed: Int = 42): (DataFrame, Long) = {
    val cms = df.stat.countMinSketch(keyCol, eps, confidence, seed)
    val spark = df.sparkSession
    import spark.implicits._
    (candidates.map(k => (k, cms.estimateCount(k))).toDF(keyCol, "est"),
      cms.totalCount)
  }

  /** Semi join with a Bloom pre-filter: build a Bloom filter over the
    * build side's key set (distributed, merged), push `might_contain`
    * into the probe side's SCAN as a codegen'd predicate, then finish
    * with the exact semi join. Results are identical to a plain semi
    * join (Bloom has no false negatives); what changes is the volume
    * entering the shuffle — at fpp=1% the probe side sheds ~99% of its
    * non-matching rows before the exchange, the same trick Spark's own
    * runtime row-level filtering applies when it can.
    *
    * Keys must be integral (probed as long); `expectedItems` sizes the
    * filter — overestimate freely, the cost is bits not correctness.
    */
  def bloomPrefilteredSemiJoin(
      probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(col(buildKey).cast("long"), expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain: Column = GraftShim.column(BloomFilterMightContain(
      Literal(bytes),
      GraftShim.expression(col(probeKey).cast("long"))))
    probe.filter(mightContain)
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }

  /** KMV (k-minimum-values) distinct-count estimate per group: keep the
    * `k` smallest distinct 60-bit md5-prefix hashes of `keyCol`
    * ([[Sampling.keyHash]] family — salt|key, so independent estimators
    * come free by re-salting) and estimate
    * `distinct ≈ (k−1) / U_(k)` with `U_(k)` the k-th smallest hash as
    * a fraction of the 2^60 space (Bar-Yossef et al. 2002; the
    * Theta/KMV sketch every warehouse ships). Groups with fewer than
    * `k` distinct hashes report their EXACT count (`is_exact`).
    *
    * Unlike `approx_count_distinct` (HLL), the sketch state is a plain
    * sorted hash list: deterministic for a given salt, mergeable by
    * "union then re-take the k smallest" (set semantics make merge
    * idempotent — the same property that lets two corpus snapshots'
    * sketches intersect for overlap estimates), and replayable by ANY
    * engine with md5 — the gate's DuckDB oracle reproduces estimate
    * bit-for-bit, which no RNG-seeded or HLL-register sketch allows.
    *
    * Scale shape: the pre-aggregation `distinct` map-side combines to
    * the distinct keys per group, then ONE group-partitioned window
    * ranks hashes within each group — never a global sort. Output is
    * `|groups|` rows.
    */
  def kmvDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String],
      k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2 (the estimate divides by k-1), got $k")
    val g = groupCols.map(col)
    val h = conv(substring(Sampling.keyHash(col(keyCol), salt), 1, 15), 16, 10)
      .cast("long")
    val hashes = df.filter(col(keyCol).isNotNull)
      .select(g :+ h.as("_h"): _*).distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("_h"))
    hashes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("_h")).as("_hk"))
      .withColumn("is_exact", col("n_kept") < k)
      .withColumn("est_distinct",
        when(col("is_exact"), col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60))
            / col("_hk").cast("double")))
      .drop("_hk")
  }

  /** The MERGE side of [[kmvDistinct]], demonstrated along an ordered
    * dimension: per-(group, bucket) k-minimum-value partials folded
    * into a cumulative distinct-to-date curve — "how many unique users
    * has this event type accumulated by day d". This is the property
    * that makes KMV a 100 TB tool: the union's sketch is just the k
    * smallest of the partials' union (set semantics, idempotent), so
    * day d's estimate touches yesterday's PARTIALS, never yesterday's
    * data — exactly how a warehouse rolls daily sketches into
    * monthlies.
    *
    * Shape: one distinct + one (group, bucket)-partitioned window
    * builds the bounded partial frame (≤ |groups|·|buckets|·k rows);
    * the cumulative merge is a triangle equi-join ON THAT FRAME
    * (bucket' ≤ bucket within group), then a re-rank — the data is
    * scanned once, the merge cost is |buckets|²·k per group, bounded
    * by the calendar, not the corpus.
    *
    * Returns (groupCols…, bucket, n_kept, is_exact, est_distinct) per
    * (group, bucket) with estimates over everything ≤ bucket.
    */
  def kmvDistinctCumulative(df: DataFrame, keyCol: String,
      groupCols: Seq[String], bucketCol: Column, k: Int,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2 (the estimate divides by k-1), got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    val g = groupCols.map(col)
    val h = conv(substring(Sampling.keyHash(col(keyCol), salt), 1, 15), 16, 10)
      .cast("long")
    val hashes = df.filter(col(keyCol).isNotNull)
      .select(g :+ bucketCol.as("_b") :+ h.as("_h"): _*).distinct()
    val wpb = Window.partitionBy(g :+ col("_b"): _*).orderBy(col("_h"))
    val partials = hashes.withColumn("_rn", row_number().over(wpb))
      .filter(col("_rn") <= k)
      .select(g :+ col("_b") :+ col("_h"): _*)
    val targets = partials.select(g :+ col("_b").as("_tb"): _*).distinct()
    // same hash can sit in several buckets' partials (a key active on
    // many days) — the union dedups before the re-rank, like any KMV
    // merge
    val union = partials.join(targets, groupCols)
      .filter(col("_b") <= col("_tb"))
      .select(g :+ col("_tb").as("_b") :+ col("_h"): _*)
      .distinct()
    val wm = Window.partitionBy(g :+ col("_b"): _*).orderBy(col("_h"))
    union.withColumn("_rn", row_number().over(wm))
      .filter(col("_rn") <= k)
      .groupBy(g :+ col("_b"): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("_h")).as("_hk"))
      .withColumn("is_exact", col("n_kept") < k)
      .withColumn("est_distinct",
        when(col("is_exact"), col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60))
            / col("_hk").cast("double")))
      .withColumnRenamed("_b", "bucket")
      .drop("_hk")
  }
}
