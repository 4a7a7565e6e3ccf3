package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed per-key hourly grid with forward fill — the feature-pipeline
  * step that turns raw telemetry into model-ready aligned series.
  *
  * Scale shape: bucket reduction is one map-side-combined aggregate
  * (deterministic last-per-bucket via a bounded per-bucket
  * WindowGroupLimit); the grid explode is bounded by `keys × span
  * hours`, orders of magnitude smaller than the event stream; the
  * forward-fill window shuffles only the GRID, partitioned by key. The
  * event table itself is never windowed.
  */
object Resample {

  /** Per-key hourly grid from each key's first to last active hour:
    * (key, hour, v — last observed value in that hour, NULL on gaps,
    * filled — forward-filled value, is_gap).
    *
    * "Last observed" ties break deterministically: latest `ts`, then
    * largest value.
    */
  def hourlyFfill(
      events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val key = col(keyCol)
    val perBucket = Window.partitionBy(keyCol, "hour")
      .orderBy(col(tsCol).desc, col(valueCol).desc)
    val hourly = events
      .withColumn("hour", date_trunc("hour", col(tsCol)))
      .withColumn("_rn", row_number().over(perBucket))
      .filter(col("_rn") === 1)
      .select(key, col("hour"), col(valueCol).as("v"))
    val grid = hourly.groupBy(key)
      .agg(min(col("hour")).as("_lo"), max(col("hour")).as("_hi"))
      .select(key, explode(
        sequence(col("_lo"), col("_hi"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val ffill = Window.partitionBy(keyCol).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "hour"), "left_outer")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(ffill))
      .withColumn("is_gap", col("v").isNull)
  }

  /** Per-key exponential moving average over time-ordered values:
    * `ema_1 = v_1`, `ema_i = (1-alpha)*ema_{i-1} + alpha*v_i` — the
    * classic smoothed-feature fold no window function expresses
    * (each step depends on the previous RESULT, not a frame of rows).
    *
    * Shape: one groupBy collects each key's (ts, value) series into a
    * sorted array (bounded by per-key activity — document your key
    * cardinality assumptions; for unbounded keys use the streaming
    * sessionize-style state machine instead) and a sequential
    * `aggregate` fold computes the EMA — deterministic order, ties on
    * ts break by value. Emits (key, ema, n_obs).
    */
  def emaPerKey(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val vals = transform(
      sort_array(collect_list(struct(col(tsCol), col(valueCol)))),
      x => x.getField(valueCol).cast("double"))
    events.groupBy(col(keyCol))
      .agg(vals.as("_vs"))
      .select(col(keyCol),
        aggregate(
          slice(col("_vs"), lit(2), size(col("_vs")) - 1),
          element_at(col("_vs"), 1),
          (acc, v) => acc * lit(1.0 - alpha) + v * lit(alpha)).as("ema"),
        size(col("_vs")).cast("long").as("n_obs"))
  }

  /** One-sided CUSUM drift detector (Page 1954) over a per-key ordered
    * series: flags sustained upward shifts of the level — the
    * data-freshness / pipeline-regression alarm a 100 TB ingest runs
    * per source on its hourly volume series.
    *
    * Uses the prefix-sum identity instead of the textbook recursion
    * s_i = max(0, s_{i-1} + x_i − target − slack): with
    * cum_i = Σ_{j≤i}(x_j − target − slack),
    *
    *   s_i = cum_i − min(0, min_{j≤i} cum_j)
    *
    * — TWO cumulative windows per key (sum + running min), no
    * recursion, no state. Every input is a plain ±/cumsum over an
    * explicit (key, order) window, so the statistic is bit-identical
    * in any IEEE engine when `x`, `target`, `slack` are exact — keep
    * x integer (counts) and target a ratio of integers for hash-exact
    * gates.
    *
    * Emits every input row with (cusum, alarm = cusum > threshold);
    * the first alarmed row per key is the estimated changepoint.
    */
  def cusum(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, target: org.apache.spark.sql.Column,
      slack: Double, threshold: Double): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_dev",
        col(valueCol).cast("double") - target.cast("double") - lit(slack))
      .withColumn("_cum", sum(col("_dev")).over(w))
      .withColumn("cusum",
        col("_cum") - least(lit(0.0), min(col("_cum")).over(w)))
      .withColumn("alarm", col("cusum") > lit(threshold))
      .drop("_dev", "_cum")
  }

  /** Linear interpolation of NULL gaps in a per-key ordered series —
    * the [[hourlyFfill]] complement for metrics where "hold the last
    * value" biases (gauges, rates): a missing point becomes
    * prev + (next − prev)·(t − t_prev)/(t_next − t_prev) between its
    * nearest known neighbors. Leading/trailing NULLs (no neighbor on
    * one side) stay NULL — extrapolation is a modeling decision, not
    * a fill.
    *
    * Shape: two per-key windows over the series (last-known-before
    * via ignoreNulls last, first-known-after via the mirrored frame) —
    * state bounded by the per-key grid length, the [[cusum]] contract;
    * keys scale out. With integer `orderCol` and exact values, the
    * interpolation is a ratio of exact doubles — hash-gateable.
    *
    * Returns every input row plus (known, value_filled).
    */
  def linearInterpolate(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val wb = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol).cast("double")
    val t = col(orderCol).cast("double")
    df
      .withColumn("_pv", last(v, ignoreNulls = true).over(wb))
      .withColumn("_pt",
        last(when(v.isNotNull, t), ignoreNulls = true).over(wb))
      .withColumn("_nv", first(v, ignoreNulls = true).over(wf))
      .withColumn("_nt",
        first(when(v.isNotNull, t), ignoreNulls = true).over(wf))
      .withColumn("known", v.isNotNull)
      .withColumn("value_filled",
        when(v.isNotNull, v)
          .when(col("_pv").isNotNull && col("_nv").isNotNull,
            col("_pv") + (col("_nv") - col("_pv"))
              * (t - col("_pt")) / (col("_nt") - col("_pt"))))
      .drop("_pv", "_pt", "_nv", "_nt")
  }

  /** Sample autocorrelation per key at lags 1..`maxLag` — the
    * seasonality/persistence fingerprint of a per-key metric series
    * (daily volume, quality drift): r_ℓ = Σ(x_t−x̄)(x_{t−ℓ}−x̄) /
    * Σ(x_t−x̄)², the standard biased estimator (one shared
    * denominator, so r_0 ≡ 1 and |r_ℓ| ≤ 1).
    *
    * Shape: one mean/denominator aggregate per key, then for each lag
    * an equi-join of the series on (key, order − ℓ) — per-key lag
    * windows would work too, but the join form keeps each lag a
    * map-side-combined shuffle with no per-key ordering state, and
    * maxLag is a literal fan-out (≤ a dozen), not a window frame.
    * Intended for bounded rollup series per key ([[cusum]] contract);
    * keys scale out, lags are cheap.
    *
    * Returns (key, lag, n_terms, acf) for lags with ≥1 overlapping
    * term; acf NULL when the series has zero variance.
    */
  def autocorrelation(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val base = df.select(col(keyCol).as("_k"),
      col(orderCol).cast("long").as("_t"), col(valueCol).cast("double").as("_x"))
    val stats = base.groupBy("_k").agg(
      avg(col("_x")).as("_mean"),
      sum(col("_x") * col("_x")).as("_sxx"),
      sum(col("_x")).as("_sx"),
      count(lit(1)).as("_n"))
      .withColumn("_den",
        col("_sxx") - col("_sx") * col("_sx") / col("_n").cast("double"))
    val centered = base.join(stats.select(col("_k"), col("_mean")), "_k")
      .select(col("_k"), col("_t"), (col("_x") - col("_mean")).as("_c"))
    val lags = (1 to maxLag).map { l =>
      val a = centered.select(col("_k"), col("_t"), col("_c").as("_ca"))
      val b = centered.select(col("_k"), (col("_t") + l).as("_t"),
        col("_c").as("_cb"))
      a.join(b, Seq("_k", "_t"))
        .groupBy("_k").agg(
          count(lit(1)).as("n_terms"),
          sum(col("_ca") * col("_cb")).as("_num"))
        .withColumn("lag", lit(l.toLong))
    }
    lags.reduce(_ unionAll _)
      .join(stats.select(col("_k"), col("_den")), "_k")
      .select(col("_k").as(keyCol), col("lag"), col("n_terms"),
        when(col("_den") > 0.0, col("_num") / col("_den")).as("acf"))
  }
  /** Missing-bucket (gap) detection per key over an integer bucket
    * axis: each maximal run of ABSENT buckets strictly inside the
    * key's observed range, as (gap_start, gap_end, gap_len) — the "we
    * stopped receiving this source's data for k days" audit that
    * interpolation ([[linearInterpolate]]) silently papers over and a
    * pipeline must instead ALARM on. Leading/trailing absence is not a
    * gap (there is no evidence the series existed there).
    *
    * Shape: distinct (key, bucket), one key-partitioned lead — the
    * window frame is a key's OBSERVED bucket list (calendar-bounded by
    * contract, like every per-key series op here), never the data.
    * All integers.
    */
  def gaps(df: DataFrame, keyCols: Seq[String],
      bucketCol: org.apache.spark.sql.Column): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val g = keyCols.map(col)
    val pres = df.select(g :+ bucketCol.cast("long").as("_b"): _*)
      .filter(col("_b").isNotNull)
      .distinct()
    val w = Window.partitionBy(g: _*).orderBy(col("_b"))
    pres.withColumn("_nb", lead(col("_b"), 1).over(w))
      .filter(col("_nb") > col("_b") + 1L)
      .select(g :+ (col("_b") + 1L).as("gap_start") :+
        (col("_nb") - 1L).as("gap_end") :+
        (col("_nb") - col("_b") - 1L).as("gap_len"): _*)
  }
}
