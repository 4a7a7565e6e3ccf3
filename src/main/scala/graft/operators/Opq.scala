package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.{l2_sq_distance, mat_vec}

/** Optimized Product Quantization (Ge et al., "Optimized Product
  * Quantization for Approximate Nearest Neighbor Search", CVPR 2013 /
  * TPAMI 2014; FAISS `OPQx` VectorTransform): learn an orthogonal
  * rotation `A` so that PQ's independent-subspace assumption fits the
  * data — rotate, THEN product-quantize. Because `A` is orthogonal, L2
  * distances are preserved exactly, so search semantics (and the
  * exact-refine stage over live vectors) are unchanged; only the
  * reconstruction error at a fixed (m, k) budget drops — the
  * quantization ladder's free lunch for correlated embedding dims.
  *
  * Training is the non-parametric OPQ alternation:
  *   1. fit PQ codebooks in the current rotated space;
  *   2. with codes fixed, solve the orthogonal Procrustes problem
  *      `min_A Σ ||A x − x̂||²` ⇒ `A = U Vᵀ` from the SVD of the
  *      cross-covariance `N = Σ x̂ xᵀ`.
  * The SVD runs driver-side on the dim×dim `N` via the shared Jacobi
  * eigensolver ([[Pca.jacobiEigen]] on `NᵀN`, then `u_l = N v_l / σ_l`
  * with Gram-Schmidt completion of any null directions).
  *
  * Scale shape (100 TB): each sweep costs the PQ fit's fused scans
  * plus ONE cross-covariance aggregation pass — a typed [[Aggregator]]
  * reducing every partition to a `dim²`-double buffer before the
  * shuffle (the [[Pca]] covariance pattern); the rotation itself is
  * bounded driver/plan state (`dim²` floats riding codegen as a
  * reference object, [[graft.expressions.MatVec]]) and its apply is a
  * pure projection. Like all codebook training, fit on a sample.
  */
object Opq {

  /** (count, row-major Σ x̂ xᵀ) — dim² doubles of bounded state. */
  case class XCovBuf(n: Long, m: Array[Double])

  private final class XCovAgg(dim: Int)
      extends Aggregator[(Seq[Float], Seq[Float]), XCovBuf, XCovBuf] {
    override def zero: XCovBuf = XCovBuf(0L, new Array[Double](dim * dim))
    override def reduce(b: XCovBuf, row: (Seq[Float], Seq[Float])): XCovBuf = {
      val (x, xhat) = row
      require(x.length == dim && xhat.length == dim,
        s"vector dims (${x.length}, ${xhat.length}) != fit dim $dim")
      var i = 0
      while (i < dim) {
        val xh = xhat(i).toDouble
        var j = 0
        while (j < dim) { b.m(i * dim + j) += xh * x(j).toDouble; j += 1 }
        i += 1
      }
      XCovBuf(b.n + 1, b.m)
    }
    override def merge(a: XCovBuf, b: XCovBuf): XCovBuf = {
      var i = 0
      while (i < dim * dim) { a.m(i) += b.m(i); i += 1 }
      XCovBuf(a.n + b.n, a.m)
    }
    override def finish(r: XCovBuf): XCovBuf = r
    override def bufferEncoder: Encoder[XCovBuf] = Encoders.product[XCovBuf]
    override def outputEncoder: Encoder[XCovBuf] = Encoders.product[XCovBuf]
  }

  /** The do-nothing rotation — the baseline [[reconError]] compares
    * OPQ against (plain PQ is OPQ at A = I).
    */
  def identityMat(dim: Int): Array[Array[Float]] =
    Array.tabulate(dim, dim)((i, j) => if (i == j) 1f else 0f)

  /** Seeded random orthogonal matrix (Gaussian entries, Gram-Schmidt):
    * the OPQ-NP INIT. Identity is a stationary point of the
    * alternation — after a codebook fit at A, (A, cb) is a local
    * minimum of the joint objective, so starting at I can learn
    * nothing; FAISS seeds OPQ with a random rotation for the same
    * reason. Deterministic for a fixed seed.
    */
  def randomRotation(dim: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new java.util.Random(seed)
    val a = Array.fill(dim, dim)(rnd.nextGaussian())
    var i = 0
    while (i < dim) {
      var p = 0
      while (p < i) {
        var d = 0.0
        var j = 0
        while (j < dim) { d += a(i)(j) * a(p)(j); j += 1 }
        j = 0
        while (j < dim) { a(i)(j) -= d * a(p)(j); j += 1 }
        p += 1
      }
      val norm = math.sqrt(a(i).map(x => x * x).sum)
      require(norm > 1e-12, "degenerate random rotation draw")
      var j = 0
      while (j < dim) { a(i)(j) /= norm; j += 1 }
      i += 1
    }
    a.map(_.map(_.toFloat))
  }

  /** Orthogonal Procrustes solve from the cross-covariance `N`
    * (row-major dim²): `A = U Vᵀ` with `N = U Σ Vᵀ`. SVD via Jacobi on
    * `NᵀN` (⇒ V, Σ²) and `u = N v / σ`; σ ≈ 0 directions (possible on
    * degenerate fixtures) are completed to an orthonormal basis by
    * Gram-Schmidt over the standard basis, keeping `A` orthogonal.
    */
  private[operators] def procrustes(nMat: Array[Double], dim: Int): Array[Array[Float]] = {
    val ntn = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        var s = 0.0
        var l = 0
        while (l < dim) { s += nMat(l * dim + i) * nMat(l * dim + j); l += 1 }
        ntn(i)(j) = s; ntn(j)(i) = s
        j += 1
      }
      i += 1
    }
    val (evals, evecs) = Pca.jacobiEigen(ntn)
    val order = evals.indices.sortBy(idx => (-evals(idx), idx))
    val v = order.map(idx => evecs(idx)).toArray // rows: right-singular vecs
    val scaleTol = 1e-9 * math.max(1.0, evals.map(math.abs).max)
    val u = Array.ofDim[Double](dim, dim)
    order.indices.foreach { l =>
      val sigma2 = evals(order(l))
      if (sigma2 > scaleTol) {
        val sigma = math.sqrt(sigma2)
        var r = 0
        while (r < dim) {
          var s = 0.0
          var c = 0
          while (c < dim) { s += nMat(r * dim + c) * v(l)(c); c += 1 }
          u(l)(r) = s / sigma
          r += 1
        }
      }
      // re-orthogonalize (numerical hygiene) / complete null directions
      var prev = 0
      while (prev < l) {
        var d = 0.0
        var r = 0
        while (r < dim) { d += u(l)(r) * u(prev)(r); r += 1 }
        r = 0
        while (r < dim) { u(l)(r) -= d * u(prev)(r); r += 1 }
        prev += 1
      }
      var norm = math.sqrt(u(l).map(x => x * x).sum)
      if (norm < 1e-9) {
        // null direction: seed from the standard basis vector least
        // covered so far, then re-orthogonalize
        var seed = 0
        var best = Double.MaxValue
        var e = 0
        while (e < dim) {
          var cover = 0.0
          var p = 0
          while (p < l) { cover += u(p)(e) * u(p)(e); p += 1 }
          if (cover < best) { best = cover; seed = e }
          e += 1
        }
        java.util.Arrays.fill(u(l), 0.0)
        u(l)(seed) = 1.0
        var p = 0
        while (p < l) {
          var d = 0.0
          var r = 0
          while (r < dim) { d += u(l)(r) * u(p)(r); r += 1 }
          r = 0
          while (r < dim) { u(l)(r) -= d * u(p)(r); r += 1 }
          p += 1
        }
        norm = math.sqrt(u(l).map(x => x * x).sum)
      }
      var r = 0
      while (r < dim) { u(l)(r) /= norm; r += 1 }
    }
    // A = U Vᵀ = Σ_l u_l v_lᵀ  (u_l, v_l as columns of U, V)
    Array.tabulate(dim, dim) { (r, c) =>
      var s = 0.0
      var l = 0
      while (l < dim) { s += u(l)(r) * v(l)(c); l += 1 }
      s.toFloat
    }
  }

  /** Learn the OPQ rotation on `df` (typically a sample): `sweeps`
    * alternations of codebook fit and Procrustes solve. Returns the
    * applied matrix `A` (`vec' = A · vec`); callers re-fit their final
    * codebooks/coarse quantizer on the rotated data (the store facade
    * does this inside `buildAnnIndexPq(opq = true)`).
    */
  def trainRotation(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int, sweeps: Int = 2,
      seed: Long = 42L): Array[Array[Float]] = {
    require(sweeps >= 1, s"sweeps must be >= 1, got $sweeps")
    val spark = df.sparkSession
    import spark.implicits._
    var a = randomRotation(dim, seed)
    (0 until sweeps).foreach { _ =>
      val rot = df.withColumn("_vr", mat_vec(col(vecCol), a))
      val cb = Pq.fit(rot, idCol, "_vr", dim, m, k, iters)
      val rec = Pq.encode(rot, "_vr", "_codes", cb)
        .withColumn("_xhat", Pq.reconstructCol(col("_codes"), cb))
      val buf = rec
        .select(col(vecCol).cast("array<float>"), col("_xhat").cast("array<float>"))
        .as[(Seq[Float], Seq[Float])]
        .select(new XCovAgg(dim).toColumn)
        .head()
      require(buf.n > 0, "trainRotation saw no rows")
      a = procrustes(buf.m, dim)
    }
    a
  }

  /** Mean squared PQ reconstruction error of `df(vecCol)` under
    * rotation `a` and a codebook fitted in the rotated space — the
    * number OPQ exists to lower (spec: OPQ ≤ identity rotation on
    * correlated data).
    */
  def reconError(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, k: Int, iters: Int, a: Array[Array[Float]]): Double = {
    val rot = df.withColumn("_vr", mat_vec(col(vecCol), a))
    val cb = Pq.fit(rot, idCol, "_vr", dim, m, k, iters)
    Pq.encode(rot, "_vr", "_codes", cb)
      .withColumn("_xhat", Pq.reconstructCol(col("_codes"), cb))
      .select(avg(l2_sq_distance(col("_vr"), col("_xhat"))
        .cast("double")).as("mse"))
      .head().getDouble(0)
  }

  /** Persist the rotation as (row, vals) parquet beside the codebook —
    * same self-describing-layout move, one source of truth for
    * search/append/rebuild.
    */
  def writeRotation(spark: SparkSession, path: String,
      a: Array[Array[Float]]): Unit = {
    import spark.implicits._
    a.indices.map(i => (i, a(i).toSeq)).toDF("row", "vals")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readRotation(spark: SparkSession, path: String): Array[Array[Float]] =
    spark.read.parquet(path).orderBy("row")
      .collect().map(_.getSeq[Float](1).toArray)

  /** Driver-side rotation apply for query vectors (dim² flops per
    * query — trivial next to the search itself).
    */
  def rotate(a: Array[Array[Float]], v: Array[Float]): Array[Float] =
    a.map { row =>
      var s = 0.0
      var j = 0
      while (j < row.length) { s += row(j).toDouble * v(j).toDouble; j += 1 }
      s.toFloat
    }
}
