package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.hround

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every raw document by how much more likely its
  * hashed-n-gram bag is under a TARGET corpus' bucket distribution than
  * under the RAW corpus' own, then sample proportionally to the
  * importance weights. The published recipe for "give me the slice of
  * CommonCrawl that looks like Wikipedia" — no labels, no classifier
  * training loop, just two count passes and a scan.
  *
  * Spark shape, built for the 100 TB regime:
  *   - Features are the same engine-portable md5-hashed unigram+bigram
  *     buckets as [[QualityModel.featureIds]] (4096 = 3 md5 nibbles),
  *     but WITH multiplicity — DSIR's generative model is a bag-of-
  *     features multinomial, so a token occurring 5× contributes 5×.
  *   - Each bucket distribution is ONE map-side-combined aggregation
  *     collapsing to ≤ 4096 rows; the smoothed log-ratio table is
  *     bounded driver state (the k-means-centroid / PQ-codebook
  *     pattern) broadcast back as a literal array.
  *   - Scoring is then a pure shuffle-free projection (sorted-array
  *     fold over literal lookups), and selection rides the existing
  *     Efraimidis-Spirakis race ([[Sampling.weightedSampleWithoutReplacement]])
  *     with w = exp(logw / temperature): Gumbel-top-k sampling of the
  *     softmax-tempered importance weights is EXACTLY the A-ES
  *     exponential race, so the selection stays a TakeOrdered top-k,
  *     never a global sort.
  *
  * Determinism: per-doc feature arrays are sorted, so the fold order is
  * fixed; the race key rounds the log-weight to `roundDigits` first so
  * ranking is reproducible across engines whose shuffle-sum orders
  * differ at the ulp level (the documented hround stability pin).
  */
object Dsir {

  val NumBuckets = 4096

  /** Sorted hashed unigram+bigram bucket ids WITH multiplicity for one
    * text (bag-of-features, not a set — [[QualityModel.featureIds]]'s
    * distinct form models presence, this models counts).
    */
  def featureCounts(textCol: Column): Column = {
    val toks = filter(split(lower(textCol), "\\s+"), t => t =!= "")
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    array_sort(transform(concat(toks, bigrams),
      t => conv(substring(md5(t), 1, 3), 16, 10).cast("int")))
  }

  /** Add-one-smoothed log bucket probabilities of a corpus:
    * `log((n_f + 1) / (N + 4096))`. One explode → map-side-combined
    * count aggregation; the result is ≤ 4096 rows of driver state.
    */
  def fitLogProbs(docs: DataFrame, textCol: String): Array[Double] = {
    val counts = docs
      .select(explode(featureCounts(col(textCol))).as("f"))
      .groupBy("f").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.valuesIterator.sum.toDouble + NumBuckets
    Array.tabulate(NumBuckets)(f =>
      math.log((counts.getOrElse(f, 0L) + 1).toDouble / total))
  }

  /** `Σ_f c_f(doc) · (log p_target(f) − log p_raw(f))` as a pure
    * projection: a sorted-array fold over a broadcast literal ratio
    * table. Engine-replayable verbatim given the two count tables.
    */
  def logWeightCol(featsCol: Column, logRatio: Array[Double]): Column = {
    require(logRatio.length == NumBuckets, "ratio table must cover all buckets")
    val rLit = typedLit(logRatio)
    aggregate(featsCol, lit(0.0), (acc, f) => acc + element_at(rLit, f + 1))
  }

  /** Append `outCol` = the DSIR log importance weight of every raw doc
    * against `target`'s bucket distribution. Two bounded aggregations
    * (one per corpus) + one scoring scan; no shuffle on the scoring
    * path.
    */
  def scoreAgainst(raw: DataFrame, target: DataFrame, textCol: String,
      outCol: String = "dsir_logw"): DataFrame =
    scoreWithRatio(raw, textCol, fitRatio(raw, target, textCol), outCol)

  /** Persist a fitted log-ratio table as a slim (bucket, log_ratio)
    * parquet — the "fit once on a corpus snapshot, score every
    * incoming batch" deployment shape: a streaming scorer loads the
    * table at start and applies [[logWeightCol]] per micro-batch with
    * NO count passes of its own, so scoring stays a pure projection
    * over the stream.
    */
  def saveRatio(spark: org.apache.spark.sql.SparkSession, path: String,
      logRatio: Array[Double]): Unit = {
    require(logRatio.length == NumBuckets, "ratio table must cover all buckets")
    import spark.implicits._
    logRatio.zipWithIndex.toSeq.map { case (lr, f) => (f, lr) }
      .toDF("bucket", "log_ratio")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a persisted ratio table (inverse of [[saveRatio]]). */
  def loadRatio(spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Double] = {
    val rows = spark.read.parquet(path)
      .select(org.apache.spark.sql.functions.col("bucket"),
        org.apache.spark.sql.functions.col("log_ratio"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    require(rows.size == NumBuckets,
      s"ratio table at $path has ${rows.size} buckets, expected $NumBuckets")
    Array.tabulate(NumBuckets)(rows)
  }

  /** Fit the target-vs-raw log-ratio table WITHOUT scoring — the half
    * of [[scoreAgainst]] that persists.
    */
  def fitRatio(raw: DataFrame, target: DataFrame,
      textCol: String): Array[Double] = {
    val pRaw = fitLogProbs(raw, textCol)
    val pTgt = fitLogProbs(target, textCol)
    Array.tabulate(NumBuckets)(f => pTgt(f) - pRaw(f))
  }

  /** Score docs against an already-fitted (possibly loaded) ratio
    * table: one shuffle-free projection, no count passes.
    */
  def scoreWithRatio(docs: DataFrame, textCol: String,
      logRatio: Array[Double], outCol: String = "dsir_logw"): DataFrame =
    docs.withColumn(outCol, logWeightCol(featureCounts(col(textCol)), logRatio))

  /** Select `k` raw docs without replacement with inclusion probability
    * ∝ `exp(logw / temperature)` — Gumbel-top-k over the tempered
    * importance weights, realized as the deterministic A-ES race.
    * `temperature → 0⁺` degenerates to hard top-k by weight;
    * `temperature = 1` is DSIR's published sampling.
    *
    * Numerics: the log-weight is rounded to `roundDigits` and shifted
    * by the (also-rounded) corpus max before exponentiation — the
    * softmax stabilization that keeps the race weight in (0, 1] however
    * long the documents get, and makes the key engine-stable (both
    * engines exponentiate the SAME double). Docs whose shifted weight
    * underflows to exactly 0 leave the race — consistent with their
    * ~e^-700 relative inclusion probability.
    */
  def select(raw: DataFrame, target: DataFrame, textCol: String,
      idCol: String, k: Int, temperature: Double = 1.0,
      salt: String = "dsir", roundDigits: Int = 6,
      outCol: String = "dsir_logw"): DataFrame = {
    require(temperature > 0.0, s"temperature must be > 0, got $temperature")
    // (id, logw) projection materialized ONCE: the max pass and the
    // A-ES race both consume the scored frame, and without the
    // checkpoint each re-runs the n-gram hashing kernel over every
    // text (the select path paid the scoring scan twice). Two slim
    // columns, so the checkpoint is k-independent metadata-sized
    // relative to the corpus.
    val scored = scoreAgainst(raw, target, textCol, outCol)
      .withColumn(outCol, hround(col(outCol), roundDigits))
      .select(col(idCol), col(outCol))
      .localCheckpoint(true)
    val mxRow = scored.agg(max(col(outCol))).collect()(0)
    require(!mxRow.isNullAt(0),
      "DSIR select: raw corpus is empty (or every text is NULL) — " +
      "nothing to score, max log-weight is undefined")
    val mx = mxRow.getDouble(0)
    Sampling.weightedSampleWithoutReplacement(
      scored, idCol, exp((col(outCol) - lit(mx)) / lit(temperature)), k,
      Nil, salt)
  }
}
