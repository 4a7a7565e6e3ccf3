package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Model-based quality filtering: a hashed-feature logistic classifier
  * (the fastText-style linear scorer every big-corpus pipeline distills
  * its heuristic quality rules into — score docs with a model, not a
  * rule cascade, then filter/weight on the probability).
  *
  * Features are md5-hashed unigram+bigram buckets (binary presence,
  * 4096-dim by default) so featurization is engine-portable; training
  * is full-batch gradient descent where EACH ITERATION IS ONE
  * AGGREGATION PASS: residuals are a projection against the current
  * weights (broadcast literals), the weight gradient is an explode →
  * map-side-combined (feature, Σresidual) aggregation — the weight
  * vector is bounded driver state (the k-means-centroid / PQ-codebook
  * pattern), and nothing row-sized ever reaches the driver.
  *
  * Scoring is a pure projection (sorted-feature literal lookups, an
  * order-deterministic sum, one sigmoid) — scan-speed, shuffle-free,
  * replayable verbatim by any engine holding the weights.
  */
object QualityModel {

  /** Fitted scorer: `weights(f)` for hashed feature f, plus bias.
    * Bounded driver state (`nFeatures` doubles).
    */
  case class Model(nFeatures: Int, bias: Double, weights: Array[Double]) {
    require(weights.length == nFeatures, "weight/feature count mismatch")
  }

  /** Sorted distinct hashed feature ids for one text: unigrams plus
    * adjacent bigrams, each mapped to `0 until nFeatures` via the first
    * 3 hex nibbles of md5 (4096 buckets — pass a power-of-16 sized
    * space to stay modulo-free and engine-portable). Sorting pins the
    * score's summation order across engines and partitionings.
    */
  def featureIds(textCol: Column, nFeatures: Int = 4096): Column = {
    require(nFeatures == 4096, "portable bucketing is defined for 4096 (3 md5 nibbles)")
    val toks = filter(split(lower(textCol), "\\s+"), t => t =!= "")
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(
      slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    array_sort(array_distinct(transform(concat(toks, bigrams),
      t => conv(substring(md5(t), 1, 3), 16, 10).cast("int"))))
  }

  /** `sigmoid(bias + Σ_{f ∈ feats} w_f)` as a literal-lookup projection
    * over an already-computed sorted feature array.
    */
  def scoreCol(featsCol: Column, model: Model): Column = {
    val wLit = typedLit(model.weights)
    val z = lit(model.bias) + aggregate(featsCol, lit(0.0),
      (acc, f) => acc + element_at(wLit, f + 1))
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Append `probCol` = the model probability of `textCol`. */
  def score(docs: DataFrame, textCol: String, model: Model,
      probCol: String = "quality_prob"): DataFrame =
    docs.withColumn(probCol,
      scoreCol(featureIds(col(textCol), model.nFeatures), model))

  /** Fit by full-batch gradient descent on logistic loss. `labelCol`
    * must be 0/1 (weak labels from a rule cascade work — the model
    * distills and smooths them). One featurization pass is persisted
    * and reused; each iteration costs one projection + two aggregation
    * jobs over it (bias/loss scalars, then the exploded per-feature
    * gradient), all map-side combined. Returns the model plus the
    * per-iteration mean losses (strictly decreasing on separable-ish
    * data — spec'd).
    */
  def fit(docs: DataFrame, textCol: String, labelCol: String,
      nFeatures: Int = 4096, iters: Int = 8,
      lr: Double = 0.5): (Model, Seq[Double]) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0.0, s"lr must be > 0, got $lr")
    val feats = docs.select(
      col(labelCol).cast("double").as("y"),
      featureIds(col(textCol), nFeatures).as("fs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var bias = 0.0
      var w = new Array[Double](nFeatures)
      val losses = Seq.newBuilder[Double]
      var it = 0
      while (it < iters) {
        val model = Model(nFeatures, bias, w)
        val p = scoreCol(col("fs"), model)
        val eps = 1e-12
        val scored = feats.select(col("y"), col("fs"), p.as("p"),
          (p - col("y")).as("r"),
          (-(col("y") * log(p + lit(eps)) +
            (lit(1.0) - col("y")) * log(lit(1.0) - p + lit(eps)))).as("l"))
        // ONE aggregation job per iteration (was two): a sentinel
        // feature −1 rides every row's explode, so its group carries
        // the scalar pass (n = count, Σr = bias gradient, Σl = loss)
        // while the real feature groups carry the per-feature gradient
        // — each iteration compiles and schedules one plan, not two
        // (both embedded the 4096-double weight literal).
        val rows = scored
          .select(col("r"), col("l"),
            explode(concat(array(lit(-1)), col("fs"))).as("f"))
          .groupBy("f").agg(sum(col("r")).as("g"),
            count(lit(1)).as("c"), sum(col("l")).as("ls"))
          .collect()
        val sentinel = rows.find(_.getInt(0) == -1).get
        val nRows = sentinel.getLong(2).toDouble
        val rSum = sentinel.getDouble(1)
        val loss = sentinel.getDouble(3) / nRows
        val w2 = w.clone()
        rows.foreach { r =>
          val f = r.getInt(0)
          if (f >= 0) w2(f) -= lr * r.getDouble(1) / nRows
        }
        bias -= lr * rSum / nRows
        w = w2
        losses += loss
        it += 1
      }
      (Model(nFeatures, bias, w), losses.result())
    } finally feats.unpersist()
  }
}
