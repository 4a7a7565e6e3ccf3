package graft.operators

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture-balanced sampling: pick per-class keep rates so the sampled
  * corpus hits a target class mixture (e.g. language or source
  * proportions) at the largest feasible size, then decide membership
  * per row with the deterministic md5-threshold predicate of
  * [[Sampling]].
  *
  * The rates come from ONE tiny aggregate (class → count) collected as
  * driver state; membership is then a pure scan predicate — no
  * shuffle, engine-portable, reproducible under re-sharding. The
  * feasible total is `T = min_s(count_s / share_s)`: the binding class
  * keeps everything (rate exactly 1), every other class downsamples to
  * `T * share_s` rows in expectation.
  */
object Mixture {

  /** Per-class keep rates for the target `shares` (class → proportion,
    * must sum to 1). Classes outside `shares` are dropped; every listed
    * class must have at least one row.
    */
  def mixtureRates(
      df: DataFrame, classCol: String, shares: Map[String, Double]): Map[String, Double] = {
    require(shares.nonEmpty, "need at least one class share")
    require(shares.values.forall(_ > 0.0), s"shares must be positive: $shares")
    require(math.abs(shares.values.sum - 1.0) < 1e-9,
      s"shares must sum to 1, got ${shares.values.sum}")
    ratesFromCounts(classCounts(df, classCol, shares.keys.toSeq), shares)
  }

  /** One tiny aggregate: class → row count, collected as driver state. */
  private def classCounts(
      df: DataFrame, classCol: String, classes: Seq[String]): Map[String, Long] = {
    val counts: Map[String, Long] = df
      .filter(col(classCol).cast("string").isInCollection(classes))
      .groupBy(col(classCol).cast("string").as("cls")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = classes.toSet -- counts.keySet
    require(missing.isEmpty, s"classes with no rows: ${missing.toSeq.sorted}")
    counts
  }

  private def ratesFromCounts(
      counts: Map[String, Long], shares: Map[String, Double]): Map[String, Double] = {
    // Pin the binding class (argmin of count/share) to exactly 1.0:
    // the (c/s)*s/c round-trip is not guaranteed to return 1.0 in
    // floating point, and a 1-1ulp rate would wrongly send the binding
    // class through the threshold path. The argmin test is an exact
    // double comparison (t IS one of the ratios), so an external SQL
    // oracle can mirror it verbatim.
    val ratios = shares.map { case (s, sh) => s -> counts(s).toDouble / sh }
    val t = ratios.values.min
    shares.map { case (s, sh) =>
      s -> (if (ratios(s) == t) 1.0 else math.min(1.0, t * sh / counts(s)))
    }
  }

  /** Unnormalized temperature weights `w_c = (count_c/total)^α` — the
    * standard multilingual/multi-source rebalancing (α = 1 keeps the
    * natural mixture, α = 0 gives uniform, α ∈ (0,1) upsamples the
    * tail). Deliberately NOT normalized to sum 1: the normalizer
    * cancels out of the keep-rate formula in real arithmetic, and
    * skipping it keeps the arithmetic a chain of correctly-rounded
    * IEEE ops (no order-sensitive float summation), so an external SQL
    * engine reproduces the rates — and hence the 60-bit membership
    * thresholds — bit-for-bit. α = 0.5 computes via `sqrt` (correctly
    * rounded by IEEE 754); general `pow` is only within 1 ulp and is
    * fine for production but not for a hash-exact cross-engine gate.
    */
  def temperatureWeights(
      counts: Map[String, Long], alpha: Double): Map[String, Double] = {
    require(counts.nonEmpty, "need at least one class")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val total = counts.values.sum.toDouble
    def powA(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x) else math.pow(x, alpha)
    counts.map { case (c, n) => c -> powA(n / total) }
  }

  /** Deterministic temperature-balanced sample: per-class keep rates
    * from [[temperatureWeights]] via the same binding-class pinning as
    * [[mixtureRates]] (weights play the role of shares — the feasible
    * total is scale-free in them), applied as a scan predicate. One
    * tiny aggregate of driver state; everything else is per-row.
    */
  def temperatureSample(
      df: DataFrame, keyCol: String, classCol: String, classes: Seq[String],
      alpha: Double, salt: String = ""): DataFrame = {
    val counts = classCounts(df, classCol, classes)
    val rates = ratesFromCounts(counts, temperatureWeights(counts, alpha))
    mixtureSampleWithRates(df, keyCol, classCol, rates, salt)
  }

  /** Deterministic mixture sample: rows kept iff the 60-bit prefix of
    * `md5(salt|key)` falls under `rate_class * 2^60`. The 15-hex-digit
    * prefix keeps the threshold in exact 64-bit integer range, so any
    * engine with md5 + printf reproduces membership bit-for-bit
    * (rate >= 1 short-circuits to keep-all — its threshold would need a
    * 16th hex digit).
    */
  def mixtureSample(
      df: DataFrame, keyCol: String, classCol: String,
      shares: Map[String, Double], salt: String = ""): DataFrame =
    mixtureSampleWithRates(df, keyCol, classCol, mixtureRates(df, classCol, shares), salt)

  /** The persisted-state form: apply previously computed per-class keep
    * rates (from [[mixtureRates]], [[temperatureShares]]+rates, or an
    * external planner) as a pure scan predicate — no aggregate, so new
    * batches sample under frozen rates without re-scanning any corpus
    * (the [[Bm25.CorpusStats]] / k-means-centroid pattern).
    */
  def mixtureSampleWithRates(
      df: DataFrame, keyCol: String, classCol: String,
      rates: Map[String, Double], salt: String = ""): DataFrame = {
    require(rates.nonEmpty, "need at least one class rate")
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      s"rates must be in [0,1]: $rates")
    val h = substring(Sampling.keyHash(col(keyCol), salt), 1, 15)
    val keep = rates.toSeq.sortBy(_._1).foldLeft(lit(false)) { case (acc, (cls, r)) =>
      val pred = if (r >= 1.0) lit(true) else h < lit(prefixThresholdHex(r))
      acc || (col(classCol).cast("string") === cls && pred)
    }
    df.filter(keep)
  }

  /** 15-hex-digit membership threshold at `rate` of the 2^60 space —
    * public so external systems (and the DuckDB oracle) can reproduce
    * membership: `printf('%015x', floor(rate * 2^60))`.
    */
  def prefixThresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate < 1.0, s"rate must be in [0,1) for a 15-hex threshold: $rate")
    String.format(Locale.ROOT, "%015x",
      java.lang.Long.valueOf(math.floor(rate * 1152921504606846976.0).toLong))
  }
}
