package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group outlier flagging for numeric telemetry (the events-table
  * cleaning pass a pipeline runs before aggregating engagement
  * signals).
  *
  * Scale shape: group stats are ONE map-side-combined aggregation to a
  * `k`-groups frame (k = distinct group keys, orders of magnitude
  * smaller than the fact table), broadcast-joined back; the z-score
  * itself is a pure projection. Deliberately NOT a
  * `Window.partitionBy(group)` — an unbounded-frame window shuffles
  * and buffers every fact row per group, while this shape shuffles
  * only the tiny stats frame.
  *
  * A group with fewer than 2 rows or zero variance yields NULL z
  * (never NaN/Infinity), and such rows are never flagged.
  */
object Outliers {

  /** Append `z` and `is_outlier` columns: `z = (value - mean) / stddev`
    * per group (sample stddev), `is_outlier = |z| > threshold`.
    */
  def zScores(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      threshold: Double): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(threshold > 0.0, s"threshold must be positive, got $threshold")
    val keys = groupCols.map(col)
    val stats = df.groupBy(keys: _*).agg(
      avg(col(valueCol)).as("_mean"),
      stddev_samp(col(valueCol)).as("_sd"))
    val z = when(col("_sd").isNotNull && col("_sd") > 0.0,
      (col(valueCol) - col("_mean")) / col("_sd"))
    df.join(broadcast(stats), groupCols)
      .withColumn("z", z)
      .withColumn("is_outlier", coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("_mean", "_sd")
  }

  /** Winsorize: clip `valueCol` to its per-group [lo, hi] percentile
    * band — the robust alternative to z-dropping when downstream wants
    * every row kept. Same broadcast shape as [[zScores]]; the exact
    * `percentile` aggregate buffers each group's values, so at
    * open-web group sizes swap in `percentile_approx` (the bounds
    * frame is k rows either way). Appends `clipped` and `was_clipped`.
    */
  def winsorize(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(0.0 <= lo && lo < hi && hi <= 1.0, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val keys = groupCols.map(col)
    val bounds = df.groupBy(keys: _*).agg(
      percentile(col(valueCol), lit(lo)).as("_plo"),
      percentile(col(valueCol), lit(hi)).as("_phi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn("clipped", least(greatest(col(valueCol), col("_plo")), col("_phi")))
      .withColumn("was_clipped", col("clipped") =!= col(valueCol))
      .drop("_plo", "_phi")
  }

  /** Percentile tiers: append `tier` in [1, nTiers] — tier t covers
    * values in (bound_{t-1}, bound_t], computed against the exact
    * interpolated percentiles of the WHOLE column. The scalable
    * alternative to a global `ntile()` (which needs a single-partition
    * sort): bounds are nTiers-1 scalars of broadcast state, assignment
    * is a pure projection. Values equal to a bound take the lower tier
    * (ntile parity on continuous data, documented tie behavior).
    */
  /** Exact Spearman rank correlation: Pearson `corr` over midranks
    * (average rank across ties — the textbook tie treatment). Returns
    * ONE row (n, spearman); NULL/NaN rows in either column are dropped;
    * `spearman` is NULL below 2 rows or under zero variance.
    *
    * Ranking uses NO global window: distinct values aggregate once
    * (map-side combined), cumulative counts run bucket-partitioned, and
    * bucket base offsets broadcast back — the [[Evaluation.binaryAuc]]
    * two-level prefix-sum shape, so a 100 TB column ranks without a
    * single-partition sort. Midranks are integers-and-halves below
    * 2^52 — exact doubles, so both rank joins are exact equality.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int = 1024,
      targetPerBucket: Long = DefaultTargetPerBucket): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val d = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast("double").as("_x"), col(yCol).cast("double").as("_y"))
      .filter(!isnan(col("_x")) && !isnan(col("_y")))
      // four consumers below (each rank frame's valueCounts + both join
      // probes) re-scanned the source per use — persist the slim
      // (x, y) projection once (16 B/row, spills at scale)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the nested form — joinMidranks(joinMidranks(d, x), y) — ranked y
    // over the x-joined frame; the x-rank join is 1:1 (one rank row per
    // distinct value), so ranking y directly over d is row-identical
    // and lets both rank frames derive from the SAME persisted scan
    val ranksX = midranks(d, "_x", "_rx", nBuckets, targetPerBucket)
    val ranksY = midranks(d, "_y", "_ry", nBuckets, targetPerBucket)
    val row = d.join(ranksX, Seq("_x")).join(ranksY, Seq("_y"))
      .agg(count(lit(1)).as("n"), corr(col("_rx"), col("_ry")).as("spearman"))
      .head()
    d.unpersist()
    val spark = df.sparkSession
    import spark.implicits._
    Seq((row.getLong(0),
        if (row.isNullAt(1)) Option.empty[Double] else Some(row.getDouble(1))))
      .toDF("n", "spearman")
  }

  /** Hard ceiling on dynamic bucket counts: the per-bucket base-offset
    * frame is broadcast, and equi-depth boundary arrays ride the plan —
    * 64K buckets keeps both under a megabyte while still bounding a
    * 6.5×10^10-distinct column to ~10^6 rows per window partition.
    * Past that, partitions grow linearly again (10^12 distinct →
    * ~1.5×10^7 rows — one sortable task) instead of collapsing into one.
    */
  private val MaxDynamicBuckets = 65536L

  /** Default ceiling on rows per cumulative-window partition (~10^6
    * distinct values ≈ tens of MB of sort buffer — comfortably one
    * task).
    */
  private[graft] val DefaultTargetPerBucket = 1000000L

  /** Bucket-assignment column for the two-level prefix sums. Two paths:
    *
    *  - `nDistinct <= targetPerBucket`: uniform-width buckets over
    *    [lo, hi] — zero extra jobs, and even the degenerate
    *    everything-in-one-bucket case is a window partition within
    *    target. This is the only path test-scale data ever takes, so
    *    small-data plans carry no sketch job.
    *  - above target: equi-depth boundaries from ONE
    *    `percentile_approx` sketch job over the distinct-value frame
    *    (bounded GK-sketch state), assigned by codegen binary search
    *    ([[graft.expressions.BucketIndex]]). Uniform-width bucketing
    *    has no size guarantee under value skew — a heavy-tailed column
    *    at the 100 TB design point (n_distinct ≈ 10^11) would
    *    concentrate its mass into a handful of buckets and sort
    *    ~10^8-row window partitions in single tasks; rank-space
    *    boundaries bound every bucket to ≈ nDistinct/nBuckets·(1+ε)
    *    regardless of the value distribution.
    *
    * Bucket ids only need to be monotone in the value for the prefix
    * sum to be exact, so the path choice never changes results — only
    * the plan shape.
    */
  private def bucketColumn(per: DataFrame, vCol: String, nBuckets: Int,
      targetPerBucket: Long, nDistinct: Long, lo: Double, hi: Double): Column = {
    if (nDistinct <= targetPerBucket) {
      val width = if (hi > lo) hi - lo else 1.0
      least(
        floor((col(vCol) - lit(lo)) / lit(width) * nBuckets).cast("long"),
        lit(nBuckets - 1L))
    } else {
      val nB = math.min(
        math.ceil(nDistinct.toDouble / targetPerBucket.toDouble).toLong,
        MaxDynamicBuckets).toInt
      val ps = (1 until nB).map(_.toDouble / nB).toArray
      val acc = math.max(10000, 4 * nB)
      val bounds = per
        .agg(percentile_approx(col(vCol), lit(ps), lit(acc)).as("_b"))
        .head().getSeq[Double](0).toArray
      graft.functions.bucket_index(col(vCol), bounds)
    }
  }

  /** Per-distinct-value counts with exact strictly-below totals via the
    * bucketed two-level prefix sum (see [[spearman]]): one map-side-
    * combined aggregation over the data, then vocab-scale frames only.
    * Returns (vCol, _cnt, _below); empty input yields an empty frame.
    * `targetPerBucket` caps the rows any one cumulative-window
    * partition sorts (see [[bucketColumn]]).
    */
  private[graft] def valueCounts(d: DataFrame, vCol: String,
      nBuckets: Int, targetPerBucket: Long = DefaultTargetPerBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = d.groupBy(col(vCol)).agg(count(lit(1)).as("_cnt"))
    val mm = per.agg(min(col(vCol)), max(col(vCol)), count(lit(1))).head()
    if (mm.isNullAt(0))
      return per.select(col(vCol), col("_cnt"), lit(0L).as("_below")).limit(0)
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val bkt = bucketColumn(per, vCol, nBuckets, targetPerBucket,
      mm.getLong(2), lo, hi)
    val local = per.withColumn("_bkt", bkt)
      .withColumn("_cum",
        sum(col("_cnt")).over(Window.partitionBy("_bkt").orderBy(vCol)))
    val bases = local.groupBy("_bkt").agg(sum(col("_cnt")).as("_tot"))
      .withColumn("_base",
        sum(col("_tot")).over(Window.orderBy("_bkt")) - col("_tot"))
      .select("_bkt", "_base")
    local.join(broadcast(bases), Seq("_bkt"))
      .select(col(vCol), col("_cnt"),
        (col("_base") + col("_cum") - col("_cnt")).as("_below"))
  }

  /** Join per-row midranks of `vCol` onto `d` as `outCol` (bucketed
    * two-level prefix sum; see [[spearman]]). */
  /** (value, midrank) frame for one column — the join-free half of
    * [[joinMidranks]], for callers that attach several rank columns to
    * one shared scan.
    */
  private def midranks(d: DataFrame, vCol: String, outCol: String,
      nBuckets: Int,
      targetPerBucket: Long = DefaultTargetPerBucket): DataFrame =
    valueCounts(d, vCol, nBuckets, targetPerBucket)
      .select(col(vCol),
        (col("_below").cast("double")
          + (col("_cnt") + lit(1L)).cast("double") / 2.0).as(outCol))

  private def joinMidranks(d: DataFrame, vCol: String, outCol: String,
      nBuckets: Int,
      targetPerBucket: Long = DefaultTargetPerBucket): DataFrame =
    d.join(midranks(d, vCol, outCol, nBuckets, targetPerBucket), Seq(vCol))

  /** EXACT interpolated quantiles (type 7 / `quantile_cont`: position
    * p·(n-1), linear interpolation between the straddling order
    * statistics) WITHOUT a global sort: the [[valueCounts]] prefix sum
    * locates each needed order statistic with a bounded broadcast join
    * — a 100 TB column takes one shuffle plus vocab-scale work, where
    * the built-in `percentile` aggregate buffers every value in one
    * executor's memory. Driver state is |ps| interpolation pairs.
    *
    * Returns (p, n, value) per requested quantile, NULL value when no
    * rows survive the NULL/NaN filter.
    */
  def exactQuantiles(df: DataFrame, vCol: String, ps: Seq[Double],
      nBuckets: Int = 1024,
      targetPerBucket: Long = DefaultTargetPerBucket): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"quantile $p outside [0,1]"))
    val spark = df.sparkSession
    import spark.implicits._
    val d = df
      .filter(col(vCol).isNotNull)
      .select(col(vCol).cast("double").as("_v"))
      .filter(!isnan(col("_v")))
    val vc = valueCounts(d, "_v", nBuckets, targetPerBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nRow = vc.agg(sum(col("_cnt"))).head()
      if (nRow.isNullAt(0))
        return ps.map(p => (p, 0L, Option.empty[Double])).toDF("p", "n", "value")
      val n = nRow.getLong(0)
      // order statistics needed: ranks k+1 (and k+2 when interpolating)
      val wanted = ps.flatMap { p =>
        val pos = p * (n - 1).toDouble
        val k = math.floor(pos).toLong
        if (pos > k && k + 2 <= n) Seq(k + 1, k + 2) else Seq(k + 1)
      }.distinct
      val stats = vc
        .join(broadcast(wanted.toDF("_r")),
          col("_below") < col("_r") && col("_r") <= col("_below") + col("_cnt"))
        .select(col("_r"), col("_v"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      ps.map { p =>
        val pos = p * (n - 1).toDouble
        val k = math.floor(pos).toLong
        val frac = pos - k.toDouble
        val x1 = stats(k + 1)
        val v = if (frac > 0.0 && k + 2 <= n) x1 + (stats(k + 2) - x1) * frac else x1
        (p, n, Option(v))
      }.toDF("p", "n", "value")
    } finally vc.unpersist(false)
  }

  /** Pearson chi-squared test of independence between two categorical
    * columns — "is language distribution independent of source?" — the
    * audit that catches a crawler dumping one language into one shard.
    * χ² = Σ_cells (obs−exp)²/exp with exp = rowTotal·colTotal/n over
    * the FULL contingency table (unobserved cells contribute exp).
    *
    * One data shuffle (the cell count); marginals, the cells cross
    * join, and the final sum are all category-bounded. Returns ONE row
    * (n, dof, chi2), dof = (|A|−1)(|B|−1); NULL-valued rows drop.
    */
  def chiSquared(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("_a"), col(bCol).as("_b"))
    val o = d.groupBy("_a", "_b").agg(count(lit(1)).as("_obs"))
    val totRow = o.agg(sum(col("_obs"))).head()
    if (totRow.isNullAt(0))
      return Seq((0L, 0L, Option.empty[Double])).toDF("n", "dof", "chi2")
    val tot = totRow.getLong(0)
    val ra = o.groupBy("_a").agg(sum(col("_obs")).as("_ta"))
    val rb = o.groupBy("_b").agg(sum(col("_obs")).as("_tb"))
    val (nA, nB) = (ra.count(), rb.count())
    val cells = ra.crossJoin(broadcast(rb))
      .withColumn("_exp",
        col("_ta").cast("double") * col("_tb").cast("double") / lit(tot.toDouble))
    cells.join(o, Seq("_a", "_b"), "left_outer")
      .select(col("_exp"),
        coalesce(col("_obs"), lit(0L)).cast("double").as("_od"))
      .agg(sum((col("_od") - col("_exp")) * (col("_od") - col("_exp"))
        / col("_exp")).as("chi2"))
      .select(lit(tot).as("n"), lit((nA - 1L) * (nB - 1L)).as("dof"), col("chi2"))
  }

  /** Mutual information between two categorical columns, in nats,
    * with the marginal entropies and the normalized score
    * NMI = MI/√(H_a·H_b) — chi2's effect-size companion ("how MUCH
    * does source determine language", 0 = independent, 1 = bijective).
    * Same cost shape as [[chiSquared]]: one data shuffle for the joint
    * counts, category-scale everything after. Returns ONE row
    * (n, h_a, h_b, mi, nmi); nmi NULL when either entropy is 0.
    */
  def mutualInformation(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val o = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).as("_a"), col(bCol).as("_b"))
      .groupBy("_a", "_b").agg(count(lit(1)).as("_c"))
    val totRow = o.agg(sum(col("_c"))).head()
    if (totRow.isNullAt(0))
      return Seq((0L, Option.empty[Double], Option.empty[Double],
        Option.empty[Double], Option.empty[Double]))
        .toDF("n", "h_a", "h_b", "mi", "nmi")
    val n = totRow.getLong(0)
    val nd = lit(n.toDouble)
    val ra = o.groupBy("_a").agg(sum(col("_c")).as("_ca"))
    val rb = o.groupBy("_b").agg(sum(col("_c")).as("_cb"))
    def entropy(c: String): Column =
      -sum((col(c).cast("double") / nd) * log(col(c).cast("double") / nd))
    val ha = ra.agg(entropy("_ca").as("h")).head().getDouble(0)
    val hb = rb.agg(entropy("_cb").as("h")).head().getDouble(0)
    val mi = o.join(ra, "_a").join(rb, "_b")
      .select(((col("_c").cast("double") / nd)
        * log((col("_c").cast("double") * nd)
          / (col("_ca").cast("double") * col("_cb").cast("double")))).as("_t"))
      .agg(sum(col("_t"))).head().getDouble(0)
    val nmi = if (ha > 0.0 && hb > 0.0) Option(mi / math.sqrt(ha * hb)) else None
    Seq((n, Option(ha), Option(hb), Option(mi), nmi))
      .toDF("n", "h_a", "h_b", "mi", "nmi")
  }

  /** Jensen–Shannon divergence (nats) between the categorical value
    * distributions of two slices — the drift statistic for discrete
    * columns, where [[ksTest]] covers continuous ones: symmetric,
    * bounded by ln 2, defined even on disjoint supports (KL is not).
    * JS = ½KL(p‖m) + ½KL(q‖m), m = ½(p+q), zero-probability terms
    * contribute 0. One count shuffle per side + a category-scale
    * full-outer join. Returns ONE row (n1, n2, js).
    */
  def jensenShannon(df1: DataFrame, col1: String,
      df2: DataFrame, col2: String): DataFrame = {
    val spark = df1.sparkSession
    import spark.implicits._
    def counts(df: DataFrame, c: String, out: String) = df
      .filter(col(c).isNotNull)
      .select(col(c).as("_v")).groupBy("_v")
      .agg(count(lit(1)).as(out))
    val c1 = counts(df1, col1, "_c1")
    val c2 = counts(df2, col2, "_c2")
    val j = c1.join(c2, Seq("_v"), "full_outer")
      .select(coalesce(col("_c1"), lit(0L)).as("_c1"),
        coalesce(col("_c2"), lit(0L)).as("_c2"))
    val tot = j.agg(sum(col("_c1")), sum(col("_c2"))).head()
    if (tot.isNullAt(0))
      return Seq((0L, 0L, Option.empty[Double])).toDF("n1", "n2", "js")
    val (n1, n2) = (tot.getLong(0), tot.getLong(1))
    if (n1 == 0L || n2 == 0L)
      return Seq((n1, n2, Option.empty[Double])).toDF("n1", "n2", "js")
    val p = col("_c1").cast("double") / lit(n1.toDouble)
    val q = col("_c2").cast("double") / lit(n2.toDouble)
    val m = (p + q) / lit(2.0)
    val term = (c: Column, pr: Column) =>
      when(c > 0L, (pr / lit(2.0)) * log(pr / m)).otherwise(lit(0.0))
    j.select((term(col("_c1"), p) + term(col("_c2"), q)).as("_t"))
      .agg(sum(col("_t")).as("js"))
      .select(lit(n1).as("n1"), lit(n2).as("n2"), col("js"))
  }

  /** Gini coefficient of a per-group weight (e.g. documents per
    * source): 0 = perfectly even corpus, →1 = one group holds
    * everything — the one-number concentration audit before a mixture
    * rebalance. G = Σ_i (2i−n−1)·x_i / (n·Σx) over ascending x_i
    * (tie order cancels: equal values share identical weight sums).
    * The window runs over the GROUP frame (category-bounded), never
    * the data; the data pays one map-side-combined count.
    */
  def giniConcentration(df: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("_x"))
    val nRow = counts.agg(count(lit(1)), sum(col("_x"))).head()
    if (nRow.getLong(0) == 0L)
      return Seq((0L, 0L, Option.empty[Double])).toDF("n_groups", "total", "gini")
    val (n, tot) = (nRow.getLong(0), nRow.getLong(1))
    counts
      .withColumn("_i", row_number().over(Window.orderBy(col("_x"), col(groupCol))))
      .select(((lit(2L) * col("_i") - lit(n) - lit(1L)).cast("double")
        * col("_x").cast("double")).as("_w"))
      .agg(sum(col("_w")).as("_s"))
      .select(lit(n).as("n_groups"), lit(tot).as("total"),
        (col("_s") / (lit(n.toDouble) * lit(tot.toDouble))).as("gini"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic, EXACT: D = sup |F₁−F₂|
    * over the union of observed values — the scalar answer to "did
    * this batch's length/score/value distribution drift from the
    * reference corpus?" (complements the per-dimension
    * [[VectorOps.embeddingDrift]]). Both empirical CDFs are step
    * functions, so the sup is attained at an observed value and the
    * per-distinct-value cumulative counts — the same bucketed prefix
    * sum as [[spearman]], carrying BOTH sides' counts through one
    * frame — decide it exactly. One data shuffle per side, then
    * vocab-scale work; no global window.
    *
    * Returns ONE row (n1, n2, ks); ks NULL when either side is empty.
    */
  def ksTest(df1: DataFrame, col1: String, df2: DataFrame, col2: String,
      nBuckets: Int = 1024,
      targetPerBucket: Long = DefaultTargetPerBucket): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df1.sparkSession
    import spark.implicits._
    def side(df: DataFrame, c: String, tag: Int) = df
      .filter(col(c).isNotNull)
      .select(col(c).cast("double").as("_v"))
      .filter(!isnan(col("_v")))
      .select(col("_v"),
        lit(if (tag == 1) 1L else 0L).as("_c1"),
        lit(if (tag == 1) 0L else 1L).as("_c2"))
    val per = side(df1, col1, 1).unionAll(side(df2, col2, 2))
      .groupBy("_v").agg(sum(col("_c1")).as("_c1"), sum(col("_c2")).as("_c2"))
    val mm = per.agg(min(col("_v")), max(col("_v")),
      sum(col("_c1")), sum(col("_c2")), count(lit(1))).head()
    if (mm.isNullAt(0))
      return Seq((0L, 0L, Option.empty[Double])).toDF("n1", "n2", "ks")
    val (n1, n2) = (mm.getLong(2), mm.getLong(3))
    if (n1 == 0L || n2 == 0L)
      return Seq((n1, n2, Option.empty[Double])).toDF("n1", "n2", "ks")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val bkt = bucketColumn(per, "_v", nBuckets, targetPerBucket,
      mm.getLong(4), lo, hi)
    val w = Window.partitionBy("_bkt").orderBy("_v")
    val local = per.withColumn("_bkt", bkt)
      .withColumn("_k1", sum(col("_c1")).over(w))
      .withColumn("_k2", sum(col("_c2")).over(w))
    val bases = local.groupBy("_bkt")
      .agg(sum(col("_c1")).as("_t1"), sum(col("_c2")).as("_t2"))
      .withColumn("_b1", sum(col("_t1")).over(Window.orderBy("_bkt")) - col("_t1"))
      .withColumn("_b2", sum(col("_t2")).over(Window.orderBy("_bkt")) - col("_t2"))
      .select("_bkt", "_b1", "_b2")
    local.join(broadcast(bases), Seq("_bkt"))
      .select(abs(
        (col("_b1") + col("_k1")).cast("double") / lit(n1.toDouble)
          - (col("_b2") + col("_k2")).cast("double") / lit(n2.toDouble)).as("_d"))
      .agg(max(col("_d")).as("ks"))
      .select(lit(n1).as("n1"), lit(n2).as("n2"), col("ks"))
  }

  /** Median and MAD (median absolute deviation) — the robust
    * location/scale pair: two [[exactQuantiles]] passes (the second
    * over |v − median|), each a shuffle + vocab-scale lookup. Returns
    * ONE row (n, median, mad). */
  def madStats(df: DataFrame, vCol: String, nBuckets: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = exactQuantiles(df, vCol, Seq(0.5), nBuckets).head()
    if (m.isNullAt(2))
      return Seq((0L, Option.empty[Double], Option.empty[Double]))
        .toDF("n", "median", "mad")
    val med = m.getDouble(2)
    val dev = df.select(abs(col(vCol).cast("double") - lit(med)).as("_absdev"))
    val mad = exactQuantiles(dev, "_absdev", Seq(0.5), nBuckets).head().getDouble(2)
    Seq((m.getLong(1), Option(med), Option(mad))).toDF("n", "median", "mad")
  }

  /** Robust z-score: (v − median) / (1.4826·MAD) — outlier scoring
    * that a few extreme values cannot drag (mean/stddev z-scores
    * famously mask the very outliers they hunt). 1.4826 is the normal-
    * consistency constant. NULL z when MAD is 0 (over half the values
    * identical) or the column is empty. */
  def robustScale(df: DataFrame, vCol: String, outCol: String = "robust_z",
      nBuckets: Int = 1024): DataFrame =
    robustScaleFromStats(df, vCol, madStats(df, vCol, nBuckets).head(), outCol)

  /** [[robustScale]] from an already-computed [[madStats]] row — for
    * callers that also report the stats and would otherwise pay the
    * two exact-quantile passes twice.
    */
  def robustScaleFromStats(df: DataFrame, vCol: String,
      stats: org.apache.spark.sql.Row,
      outCol: String = "robust_z"): DataFrame = {
    if (stats.isNullAt(1) || stats.getDouble(2) == 0.0)
      return df.withColumn(outCol, lit(null).cast("double"))
    df.withColumn(outCol,
      (col(vCol).cast("double") - lit(stats.getDouble(1)))
        / lit(1.4826 * stats.getDouble(2)))
  }

  def percentileTiers(
      df: DataFrame, valueCol: String, nTiers: Int): DataFrame = {
    require(nTiers >= 2, s"nTiers must be >= 2, got $nTiers")
    val ps = (1 until nTiers).map(_.toDouble / nTiers)
    val bounds = df.agg(
      percentile(col(valueCol), typedLit(ps)).as("_bs"))
    // fold high→low so the OUTERMOST branch checks the lowest bound:
    // tier = smallest t with value <= bound_t
    val tier = (1 until nTiers).reverse.foldLeft(lit(nTiers)) { (acc, t) =>
      when(col(valueCol) <= element_at(col("_bs"), t), t).otherwise(acc)
    }
    df.join(broadcast(bounds))
      // a NULL value belongs to NO tier, not silently the top one
      .withColumn("tier", when(col(valueCol).isNotNull, tier))
      .drop("_bs")
  }

  /** Per-group z-scores from EXPLICIT exact moments — the
    * seasonality-aware anomaly primitive: group by a seasonal key
    * (e.g. (source, hour-of-day)) and score each observation against
    * its own group's baseline, so a busy-hour peak is not an outlier
    * and a quiet-hour spike is.
    *
    * Unlike [[zScores]] (which rides the built-in `stddev_samp`),
    * the moments here are raw (n, Σv, Σv²) integer-exact sums and the
    * variance is derived with a FIXED parenthesization
    * ((Σv² − Σv·Σv/n)/n — population) — when `v` is integer-valued
    * every engine computes the identical doubles, so the z itself can
    * sit in a hash-exact gate (the [[Resample.cusum]] determinism
    * contract). One map-side-combined aggregate + one equi-join of
    * the group frame back (AQE broadcasts it when small); z is NULL
    * when the group variance is 0.
    */
  def groupZScores(df: DataFrame, groupCols: Seq[String], valueCol: String,
      outCol: String = "z"): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val v = col(valueCol).cast("double")
    val g = df.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).cast("double").as("_n"),
      sum(v).as("_s"), sum(v * v).as("_ss"))
    val mean = col("_s") / col("_n")
    val varp = (col("_ss") - col("_s") * col("_s") / col("_n")) / col("_n")
    df.join(g, groupCols)
      .withColumn(outCol,
        when(varp > 0.0, (v - mean) / sqrt(varp)))
      .drop("_n", "_s", "_ss")
  }

  /** Population Stability Index between a baseline and a comparison
    * sample of the same metric — the drift monitor scorecards run
    * between corpus snapshots: PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) over
    * fixed-width buckets anchored on the BASELINE's [min, max] (two
    * tiny jobs; values outside clamp to the edge buckets). Rule of
    * thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    *
    * Determinism contract (the tx_distinctive lesson): the per-bucket
    * COUNTS are integers and hash-gate; `psi` is ln-derived and must
    * NOT enter a hashed projection — gate the counts plus a
    * `drifted` boolean against a threshold far from the data's psi
    * (the margin swamps cross-build libm ULP), and assert the psi
    * value in a spec with tolerance.
    *
    * Empty buckets get the standard 0.5-count floor so ln stays
    * finite. Returns one row per bucket (bucket, n_base, n_cmp) plus
    * the same `psi`/`drifted` on every row (a |buckets|-sized frame;
    * callers selecting only counts keep a pure integer projection).
    */
  def populationStability(base: DataFrame, cmp: DataFrame, vCol: String,
      nBuckets: Int = 10, threshold: Double = 0.2): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val b = base.select(col(vCol).cast("double").as("_v")).filter(col("_v").isNotNull)
    val c = cmp.select(col(vCol).cast("double").as("_v")).filter(col("_v").isNotNull)
    val mm = b.agg(min(col("_v")), max(col("_v"))).head()
    require(!mm.isNullAt(0), "baseline sample is empty")
    // empty comparison would make _tc = 0 and psi = Infinity — a
    // data-delivery outage must fail fast, not read as maximal drift
    require(!c.limit(1).isEmpty, "comparison sample is empty")
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = if (hi > lo) hi - lo else 1.0
    def bucketed(d: DataFrame, out: String): DataFrame = d
      .withColumn("bucket",
        least(greatest(
          floor((col("_v") - lit(lo)) / lit(width) * nBuckets).cast("long"),
          lit(0L)), lit(nBuckets - 1L)))
      .groupBy("bucket").agg(count(lit(1)).as(out))
    val grid = b.sparkSession.range(nBuckets).select(col("id").as("bucket"))
    val counts = grid
      .join(bucketed(b, "n_base"), Seq("bucket"), "left_outer")
      .join(bucketed(c, "n_cmp"), Seq("bucket"), "left_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cmp"), lit(0L)).as("n_cmp"))
    val tot = counts.agg(sum(col("n_base")).as("_tb"), sum(col("n_cmp")).as("_tc"))
    val terms = counts.crossJoin(broadcast(tot))
      .withColumn("_p",
        greatest(col("n_base").cast("double"), lit(0.5)) / col("_tb").cast("double"))
      .withColumn("_q",
        greatest(col("n_cmp").cast("double"), lit(0.5)) / col("_tc").cast("double"))
      .withColumn("_term", (col("_p") - col("_q")) * log(col("_p") / col("_q")))
    val psi = terms.agg(sum(col("_term")).as("psi"))
    terms.crossJoin(broadcast(psi))
      .select(col("bucket"), col("n_base"), col("n_cmp"),
        col("psi"), (col("psi") > lit(threshold)).as("drifted"))
  }

  /** Theil–Sen robust trend per group: slope = median of all pairwise
    * slopes (y_j − y_i)/(x_j − x_i) over x_i < x_j, intercept =
    * median of (y_i − slope·x_i) — the regression line that shrugs
    * off up to ~29% outliers where least squares chases them (Sen
    * 1968). The metric-drift fit for per-key daily series: "is this
    * source's quality trending down, ignoring the two crawl-glitch
    * days".
    *
    * Scale contract: the pair join is PER GROUP O(n²) — built for
    * series of bounded length (daily/hourly rollups: n ≤ a few
    * thousand, pairs ≤ millions per group); the distributed dimension
    * is the NUMBER of groups, each group's pairs co-located by the
    * group-key equi-join. Feed it raw event rows and you asked for
    * n² on purpose. `percentile` medians are exact and group-bounded.
    *
    * Returns one row per group: (groups..., n_points, n_pairs, slope,
    * intercept); slope NULL when n < 2 (no pairs). Ties in x are
    * skipped (vertical pairs have no slope), the standard Theil–Sen
    * convention.
    */
  def theilSen(df: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    require(groupCols.nonEmpty, "theilSen needs at least one group column")
    val gcols = groupCols.map(col)
    val pts = df.select(gcols :+ col(xCol).cast("double").as("_x") :+
      col(yCol).cast("double").as("_y"): _*)
    val a = pts.toDF(groupCols ++ Seq("_xi", "_yi"): _*)
    val b = pts.toDF(groupCols ++ Seq("_xj", "_yj"): _*)
    val slopes = a.join(b, groupCols)
      .filter(col("_xi") < col("_xj"))
      .withColumn("_m",
        (col("_yj") - col("_yi")) / (col("_xj") - col("_xi")))
    val slope = slopes.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_pairs"),
        percentile(col("_m"), lit(0.5)).as("slope"))
    val n = pts.groupBy(gcols: _*).agg(count(lit(1)).as("n_points"))
    val inter = pts.join(slope, groupCols)
      .groupBy(gcols: _*)
      .agg(percentile(col("_y") - col("slope") * col("_x"), lit(0.5))
        .as("intercept"))
    n.join(slope, groupCols.toSeq, "left_outer")
      .join(inter, groupCols.toSeq, "left_outer")
      .select(gcols :+ col("n_points") :+
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs") :+
        col("slope") :+ col("intercept"): _*)
  }

  /** Mann-Kendall trend test (Mann 1945; Kendall 1975) per group over
    * an ordered series: S = Σ_{i<j} sign(x_j − x_i), the nonparametric
    * "is there a monotone trend" companion to [[theilSen]]'s slope —
    * Theil-Sen says HOW steep, Mann-Kendall says WHETHER. Every output
    * is an INTEGER: S (ties contribute 0), n, and the tie-corrected
    * numerator of Var(S) = (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) / 18 over
    * tie groups of size t. Z = (S∓1)/sqrt(Var) and the p-value are
    * sqrt/erf of these integers — left to the caller or a spec so
    * nothing transcendental reaches a hashed projection.
    *
    * Per-group O(n²) pair join by contract (bounded rollup series,
    * exactly [[theilSen]]'s shape); the distributed dimension is the
    * group count.
    *
    * Returns (groupCols…, n, s, var_num) — Var(S) = var_num / 18.
    */
  def mannKendall(df: DataFrame, groupCols: Seq[String],
      orderCol: String, valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "mannKendall needs at least one group column")
    val gcols = groupCols.map(col)
    // the test is over observed (time, value) points: rows where either
    // coordinate is NULL (or fails the double cast) carry no ordering
    // and no comparable value, so they are excluded up front — before
    // NULLs could fire the duplicate-orderCol guard spuriously
    // (count_distinct ignores NULLs) or pad n and the tie term with
    // rows that contribute nothing to S
    val pts = df.select(gcols :+ col(orderCol).cast("double").as("_x") :+
      col(valueCol).cast("double").as("_y"): _*)
      .filter(col("_x").isNotNull && col("_y").isNotNull)
    val a = pts.toDF(groupCols ++ Seq("_xi", "_yi"): _*)
    val b = pts.toDF(groupCols ++ Seq("_xj", "_yj"): _*)
    val s = a.join(b, groupCols)
      .filter(col("_xi") < col("_xj"))
      .groupBy(gcols: _*)
      .agg(sum(signum(col("_yj") - col("_yi")).cast("long")).as("s"))
    // the test is defined over one observation per time point: pairs
    // tied in x are EXCLUDED from S but have no standard correction in
    // Var(S), so duplicate orderCol values per group would silently
    // inflate the variance — aggregate first (e.g. daily means), and
    // this guard makes the contract a hard error instead of a wrong Z.
    // It rides the consumed `n` column so pruning cannot elide it.
    val n = pts.groupBy(gcols: _*).agg((count(lit(1))
      + when(count(lit(1)) === count_distinct(col("_x")), lit(0L))
        .otherwise(raise_error(lit("mannKendall: duplicate orderCol " +
          "values within a group — aggregate to one observation per " +
          "time point first")).cast("long"))).as("n"))
    val tieTerm = pts.groupBy(gcols :+ col("_y"): _*)
      .agg(count(lit(1)).as("_t"))
      .groupBy(gcols: _*)
      .agg(sum(col("_t") * (col("_t") - 1L) * (lit(2L) * col("_t") + 5L))
        .as("_tie"))
    n.join(s, groupCols.toSeq, "left_outer")
      .join(tieTerm, groupCols.toSeq)
      .select(gcols :+ col("n") :+ coalesce(col("s"), lit(0L)).as("s") :+
        (col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L)
          - col("_tie")).as("var_num"): _*)
  }
  /** Two-variant proportion test — the A/B conversion-rate z-test:
    * pooled p̂ = (x_a+x_b)/(n_a+n_b),
    * z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)).
    * Every arithmetic step derives from FOUR INTEGERS via single
    * correctly-rounded IEEE ops (divide, multiply, sqrt) — unlike a
    * t-test over raw values there is no sum-order sensitivity
    * anywhere, so z replays bit-for-bit from the counts on any
    * engine. z is NULL when either arm is empty or p̂ ∈ {0, 1} (no
    * variance to test against); the significance threshold is the
    * caller's call. One scan, one 1-row aggregate; rows outside the
    * two named variants are ignored; NULL success counts as failure
    * (filter semantics).
    */
  def proportionTest(df: DataFrame, variantCol: String, successCol: Column,
      a: String, b: String): DataFrame = {
    require(a != b, "the two variant labels must differ")
    val s = when(coalesce(successCol, lit(false)), 1L).otherwise(0L)
    val agg = df.filter(col(variantCol).isin(a, b))
      .agg(
        coalesce(sum(when(col(variantCol) === a, 1L).otherwise(0L)), lit(0L))
          .as("n_a"),
        coalesce(sum(when(col(variantCol) === a, s).otherwise(0L)), lit(0L))
          .as("x_a"),
        coalesce(sum(when(col(variantCol) === b, 1L).otherwise(0L)), lit(0L))
          .as("n_b"),
        coalesce(sum(when(col(variantCol) === b, s).otherwise(0L)), lit(0L))
          .as("x_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("x_a").cast("double") / na
    val pb = col("x_b").cast("double") / nb
    val pp = (col("x_a") + col("x_b")).cast("double") / (na + nb)
    agg
      .select(lit(a).as("variant_a"), col("n_a"), col("x_a"),
        lit(b).as("variant_b"), col("n_b"), col("x_b"),
        when(col("n_a") > 0L && col("n_b") > 0L && pp > 0.0 && pp < 1.0,
          (pa - pb) / sqrt(pp * (lit(1.0) - pp)
            * (lit(1.0) / na + lit(1.0) / nb))).as("z"))
  }
}
