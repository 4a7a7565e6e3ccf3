package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column utilities for training-data pipelines: L2
  * normalization and symmetric int8 quantization (the standard 4×
  * storage/bandwidth cut before large-scale similarity work).
  *
  * All pure per-row projections — zero shuffle, codegen'd HOFs. Scalar
  * statistics (norm, scale) are materialized as columns FIRST and only
  * referenced inside the per-element lambdas: a lambda that recomputes
  * an aggregate per element turns O(d) into O(d²) (the HOF
  * re-evaluation hazard).
  */
object VectorOps {

  /** Norm and scale are computed in double — float inputs widen
    * exactly, so the result is bit-reproducible in any engine that
    * computes in IEEE double (the gate's DuckDB oracle does).
    */
  private def l2NormD(v: Column): Column =
    sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x.cast("double") * x.cast("double")))

  private def absMaxD(v: Column): Column =
    aggregate(v, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Add `outCol` = L2-normalized `vecCol` (unit norm; zero vectors
    * pass through unchanged).
    */
  def withL2Normalized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("_norm", l2NormD(col(vecCol)))
      .withColumn(outCol,
        when(col("_norm") === 0.0d, col(vecCol))
          .otherwise(transform(col(vecCol),
            x => (x.cast("double") / col("_norm")).cast("float"))))
      .drop("_norm")

  /** Symmetric int8 quantization: `outCol` = round(x / scale) as
    * tinyint with scale = max|x| / 127 (`scaleCol`), so values span
    * [-127, 127] and reconstruction error is bounded by scale/2 per
    * element. Zero vectors get scale 0 and all-zero codes.
    */
  def withInt8Quantized(df: DataFrame, vecCol: String,
      outCol: String, scaleCol: String): DataFrame =
    df.withColumn(scaleCol, absMaxD(col(vecCol)) / 127.0d)
      .withColumn(outCol,
        when(col(scaleCol) === 0.0d,
          transform(col(vecCol), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col(vecCol),
            x => round(x.cast("double") / col(scaleCol)).cast("tinyint"))))

  /** Reconstruct float vectors from int8 codes + scale. */
  def dequantizedInt8(codes: Column, scale: Column): Column =
    transform(codes, q => (q.cast("double") * scale).cast("float"))

  // ------------------------ label centroids ---------------------------- //

  /** Mean-pool embeddings per label: (label, centroid `array<double>`,
    * n). ONE map-side-combined aggregation whose shuffle volume is
    * `labels × dim` doubles regardless of corpus size — the class-level
    * summary a pipeline uses for topic drift and mixture diagnostics.
    */
  def labelCentroids(
      df: DataFrame, labelCol: String, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    df.groupBy(col(labelCol).as("label"))
      .agg(
        array((0 until dim).map(i => avg(element_at(col(vecCol), i + 1))): _*)
          .as("centroid"),
        count(lit(1)).as("n"))
  }

  /** Pairwise cosine similarity between label centroids
    * (label_a < label_b). The centroid frame is label-cardinality-sized
    * — driver/broadcast scale — so the quadratic pair join is over k
    * rows, never the corpus. Double math end-to-end.
    */
  def centroidCosines(centroids: DataFrame): DataFrame = {
    val a = centroids.select(col("label").as("label_a"), col("centroid").as("_ca"))
    val b = centroids.select(col("label").as("label_b"), col("centroid").as("_cb"))
    val dot = aggregate(zip_with(col("_ca"), col("_cb"), _ * _), lit(0.0d), _ + _)
    val na = aggregate(col("_ca"), lit(0.0d), (acc, x) => acc + x * x)
    val nb = aggregate(col("_cb"), lit(0.0d), (acc, x) => acc + x * x)
    a.join(b, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        (dot / (sqrt(na) * sqrt(nb))).as("sim"))
  }

  /** Per-dimension moments of an embedding column: (pos, n, mean, m2)
    * with `m2` the population variance, double accumulation.
    *
    * Scale shape: posexplode fans each row out to `dim` slim
    * (pos, value) rows, but the groupBy(pos) aggregate map-side
    * combines to `dim` partials per task — output and shuffle are both
    * dim-bounded, never corpus-sized.
    */
  def dimensionStats(df: DataFrame, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col("pos"), col("v").cast("double").as("v"))
      .groupBy("pos")
      .agg(count(lit(1)).as("n"), avg(col("v")).as("mean"),
        (avg(col("v") * col("v")) - avg(col("v")) * avg(col("v"))).as("m2"))

  /** Embedding distribution drift between two corpus slices (an
    * embedding-model upgrade, a new crawl snapshot, a source mix
    * change): per dimension, the mean shift and the variance ratio —
    * the monitoring table that catches a broken encoder or a
    * distribution jump BEFORE an index is rebuilt on bad vectors.
    * Output is dim rows; the standardized shift
    * `|mean_b - mean_a| / sqrt(m2_a)` reads like a z-score per
    * dimension.
    */
  def embeddingDrift(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    val sa = dimensionStats(a, vecCol)
      .select(col("pos"), col("n").as("n_a"), col("mean").as("mean_a"), col("m2").as("m2_a"))
    val sb = dimensionStats(b, vecCol)
      .select(col("pos"), col("n").as("n_b"), col("mean").as("mean_b"), col("m2").as("m2_b"))
    sa.join(sb, Seq("pos"))
      .withColumn("shift", col("mean_b") - col("mean_a"))
      .withColumn("z_shift",
        when(col("m2_a") > 0, abs(col("shift")) / sqrt(col("m2_a"))))
      .withColumn("var_ratio", when(col("m2_a") > 0, col("m2_b") / col("m2_a")))
  }

  // ------------------------ sign-bit sketch ---------------------------- //

  /** Sign-bit sketch of a `dim`-element vector as `ceil(dim/32)` packed
    * 32-bit words (`array<long>`): bit `j` of word `w` is set iff
    * `vec[32w + j] > 0`. A 64-dim float vector (256 bytes) compresses to
    * 8 bytes — the 32× cut that makes a first-pass candidate scan
    * bandwidth-bound instead of FLOP-bound, with Hamming distance as the
    * (unbiased, Goemans-Williamson) angular-distance proxy.
    *
    * 32 bits per word (not 64) keeps every word non-negative, so the
    * packing is a plain integer SUM both here and in any SQL engine —
    * no signed-overflow edge at bit 63, and DuckDB's overflow-checked
    * BIGINT arithmetic replays it bit-for-bit.
    *
    * Strictly positive ⇒ 1; zero and negative ⇒ 0 (deterministic at the
    * boundary). Pure projection: unrolled `element_at` terms, whole-stage
    * codegen, zero shuffle.
    */
  def signSketch(vec: Column, dim: Int): Column = {
    require(dim > 0, s"signSketch needs a positive dim, got $dim")
    val words = (0 until dim by 32).map { base =>
      (base until math.min(base + 32, dim)).map { j =>
        when(element_at(vec, j + 1) > lit(0.0f), lit(1L << (j - base)))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(words: _*)
  }

  /** Hamming distance between two same-length sign sketches: summed
    * `bit_count` over XORed words. Codegen HOF over the (tiny) word
    * arrays.
    */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** TwoNN intrinsic-dimension estimate (Facco et al. 2017): with r1,
    * r2 the distances to each point's 1st and 2nd nearest neighbor,
    * mu = r2/r1 is Pareto(d)-distributed on a d-dimensional manifold
    * and the MLE is d = n / sum ln(mu) - the embedding-quality audit
    * that catches collapsed representations (d near 2-3 on a 64-dim
    * column means the encoder is using a sliver of the space).
    *
    * Returns ONE row (n, intrinsic_dim). Points with r1 = 0 (exact
    * duplicates) or fewer than 2 neighbors drop out of the MLE - the
    * estimator is undefined there; dedup first for a cleaner read.
    *
    * Scale: the default 2-NN is the brute-force
    * [[SimilarityJoin.knnL2]] (index crossJoin broadcast queries) over
    * the SAME frame - exact, right for small audit slices, but O(n·q)
    * distance pairs. Two bounded paths for everything else:
    *
    *  - `sample`: keep only a deterministic hash-sample of QUERY
    *    points (the index side stays whole, so each sampled point's
    *    (r1, r2) is still exact). The Pareto MLE is an i.i.d. estimator
    *    over per-point mu = r2/r1 ratios - a query subsample is an
    *    unbiased estimate of the same d, with ~1/sqrt(q) noise. 10^4
    *    sampled queries pin d to a few percent regardless of n.
    *  - [[intrinsicDimensionFromNN]]: inject any (qid, r1, r2) frame -
    *    e.g. from [[Ann.ivfSearchL2]] with k = 3 over an IVF layout -
    *    and pay no crossJoin at all.
    */
  def intrinsicDimension(df: DataFrame, idCol: String, vecCol: String,
      sample: Option[Double] = None, sampleSalt: String = "twonn"): DataFrame = {
    val qsAll = df.select(col(idCol).as("_qid"), col(vecCol).as("_qvec"))
    val qs = sample match {
      case Some(f) => Sampling.hashSample(qsAll, "_qid", f, sampleSalt)
      case None => qsAll
    }
    // aggregator top-k (guide §2.3 "aggregate before you shuffle"): the
    // window form shuffles every scored (n × q) row to rank it; the
    // UDAF reduces each map partition to ≤ 3 candidates per query
    // before the exchange, so shuffle volume is partitions × q × 3,
    // independent of n. Semantics identical to the window variant
    // (ascending (dist, id), SQL NaN/-0.0 ordering); the distance
    // arrives as double, which the MLE cast to double anyway.
    val scored = df
      .crossJoin(broadcast(qs))
      .withColumn("distance", graft.functions.l2_distance(col(vecCol), col("_qvec")))
      .select(col("_qid"), col(idCol), col("distance"))
    val nn = TopKAggregator.topKRows(scored, "_qid", idCol, "distance", k = 3)
      .filter(col(idCol) =!= col("_qid"))   // drop self-match
      .withColumn("_rn2",
        org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("_qid").orderBy(col("rn"))))
      .filter(col("_rn2") <= 2)
    val wide = nn.groupBy("_qid").agg(
      min(when(col("_rn2") === 1, col("distance"))).as("_r1"),
      min(when(col("_rn2") === 2, col("distance"))).as("_r2"))
    intrinsicDimensionFromNN(wide, "_qid", "_r1", "_r2")
  }

  /** The TwoNN MLE over an externally-supplied nearest-neighbor frame:
    * one row per query point with its 1st/2nd-NN distances. This is
    * the 100 TB path - feed it (r1, r2) from an ANN provider (e.g.
    * [[Ann.ivfSearchL2]] at k = 3 over a partition-pruned IVF layout,
    * self-matches dropped) and the audit never materializes a
    * crossJoin. Points with r1 = 0 (exact duplicates) or a missing r2
    * drop out, as in [[intrinsicDimension]].
    */
  def intrinsicDimensionFromNN(nn: DataFrame, qidCol: String,
      r1Col: String, r2Col: String): DataFrame =
    nn.filter(col(r1Col) > 0.0 && col(r2Col).isNotNull)
      .agg(count(lit(1)).as("n"),
        (count(lit(1)).cast("double") /
          sum(log(col(r2Col).cast("double") / col(r1Col).cast("double"))))
          .as("intrinsic_dim"))
}
