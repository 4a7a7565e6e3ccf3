package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal component analysis over an embedding column — the standard
  * dimensionality-reduction / whitening step before clustering or
  * semantic dedup (SemDeDup clusters in PCA space; embedding drift
  * monitoring watches the top components).
  *
  * Scale shape: the fit is ONE map-side-combined aggregation pass — a
  * typed [[Aggregator]] accumulating (n, Σx, upper-triangle ΣxxT), so
  * each partition reduces to a `dim + dim(dim+1)/2`-double buffer
  * before the shuffle and the driver sees one buffer per partition,
  * never a row. The eigendecomposition runs on the driver over the
  * dim×dim covariance (bounded state — the k-means-centroid pattern),
  * and the projection is a pure literal expression: codegen'd
  * arithmetic, no UDF, no shuffle, scan-speed at any corpus size.
  */
object Pca {

  /** Fitted model: population mean, top-`nComponents` eigenvectors of
    * the population covariance (rows, each `dim` long, orthonormal,
    * eigenvalue-descending), and their eigenvalues (the variance each
    * component explains). Bounded driver state.
    */
  case class PcaModel(dim: Int, nComponents: Int, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    require(components.length == nComponents && eigenvalues.length == nComponents,
      "component count mismatch")
    require(mean.length == dim && components.forall(_.length == dim),
      "dimension mismatch")
  }

  /** (count, per-dim sums, upper-triangle sums of products) — primitive
    * arrays ride Spark's native unsafe-row encoder, no kryo.
    */
  case class CovBuf(n: Long, s: Array[Double], ss: Array[Double])

  /** Single-pass covariance accumulator. Upper triangle is stored
    * row-major: (i,j), i <= j, at offset i*dim - i(i-1)/2 + (j-i).
    */
  private final class CovAgg(dim: Int)
      extends Aggregator[Seq[Float], CovBuf, CovBuf] {
    private val tri = dim * (dim + 1) / 2

    override def zero: CovBuf =
      CovBuf(0L, new Array[Double](dim), new Array[Double](tri))

    override def reduce(b: CovBuf, v: Seq[Float]): CovBuf = {
      require(v.length == dim, s"vector dim ${v.length} != fit dim $dim")
      val x = new Array[Double](dim)
      var i = 0
      while (i < dim) { x(i) = v(i).toDouble; i += 1 }
      var k = 0
      i = 0
      while (i < dim) {
        b.s(i) += x(i)
        var j = i
        while (j < dim) { b.ss(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
      CovBuf(b.n + 1, b.s, b.ss)
    }

    override def merge(a: CovBuf, b: CovBuf): CovBuf = {
      var i = 0
      while (i < dim) { a.s(i) += b.s(i); i += 1 }
      i = 0
      while (i < tri) { a.ss(i) += b.ss(i); i += 1 }
      CovBuf(a.n + b.n, a.s, a.ss)
    }

    override def finish(r: CovBuf): CovBuf = r
    override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
    override def outputEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix — exact
    * enough at dim <= a few hundred (the embedding-dim regime; O(dim^3)
    * per sweep, converges quadratically). Returns (eigenvalues,
    * eigenvectors as rows), unsorted.
    */
  private[graft] def jacobiEigen(
      sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val m = Array.tabulate(n, n)((i, j) => sym(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += m(i)(j) * m(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 64 && offDiag() > 1e-20) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 // theta == 0 -> 45-degree rotation
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val mip = m(i)(p); val miq = m(i)(q)
              m(i)(p) = c * mip - s * miq
              m(i)(q) = s * mip + c * miq
              i += 1
            }
            i = 0
            while (i < n) {
              val mpi = m(p)(i); val mqi = m(q)(i)
              m(p)(i) = c * mpi - s * mqi
              m(q)(i) = s * mpi + c * mqi
              val vip = v(p)(i); val viq = v(q)(i)
              v(p)(i) = c * vip - s * viq
              v(q)(i) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => m(i)(i)), v)
  }

  /** Fit on `df(vecCol)` (array<float>, all `dim` long). One
    * aggregation job; the Jacobi solve is driver-side on the dim×dim
    * population covariance. Component sign convention: the coordinate
    * with the largest absolute loading is positive (deterministic
    * across runs and partitionings up to summation order).
    */
  def fit(df: DataFrame, vecCol: String, dim: Int, nComponents: Int): PcaModel = {
    require(nComponents >= 1 && nComponents <= dim,
      s"need 1 <= nComponents <= dim, got $nComponents (dim=$dim)")
    val spark = df.sparkSession
    import spark.implicits._
    val buf = df.select(col(vecCol).cast("array<float>").as("v"))
      .filter(col("v").isNotNull)
      .as[Seq[Float]]
      .select(new CovAgg(dim).toColumn)
      .head()
    require(buf.n >= 2, s"need >= 2 rows to fit PCA, got ${buf.n}")
    val n = buf.n.toDouble
    val mean = buf.s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = buf.ss(k) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; k += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val top = evals.zipWithIndex.sortBy { case (l, idx) => (-l, idx) }
      .take(nComponents)
    val comps = top.map { case (_, idx) =>
      val row = evecs(idx)
      val dom = row.indices.maxBy(i => (math.abs(row(i)), -i))
      if (row(dom) < 0) row.map(-_) else row.clone()
    }
    PcaModel(dim, nComponents, mean, comps, top.map(_._1))
  }

  /** The projection of `vecCol` onto component `c` as a literal
    * expression: `sum_i (x_i - mean_i) * comp_c_i`, left-to-right —
    * codegen'd per-row arithmetic, replayable verbatim by any engine
    * holding the same literals.
    */
  def projectCol(vecCol: Column, model: PcaModel, c: Int): Column =
    (0 until model.dim).map { i =>
      (element_at(vecCol, i + 1).cast("double") - lit(model.mean(i))) *
        lit(model.components(c)(i))
    }.reduce(_ + _)

  /** Append `pc1..pcK` projection columns. Pure projection — no
    * shuffle, no UDF.
    */
  def transform(df: DataFrame, vecCol: String, model: PcaModel,
      prefix: String = "pc"): DataFrame =
    (0 until model.nComponents).foldLeft(df) { (acc, c) =>
      acc.withColumn(s"$prefix${c + 1}", projectCol(col(vecCol), model, c))
    }

  /** Mahalanobis² score of `vecCol` in the model's principal subspace,
    * as a literal expression: Σ_c y_c² / λ_c with y_c the centered
    * projection onto component c — the whitened distance that scores
    * "how far outside the corpus's own covariance ellipsoid is this
    * embedding". Restricting to the top-k subspace is the standard
    * high-dim practice: the trailing eigenvalues are noise-scale, and
    * dividing by a near-zero λ would amplify noise into the score
    * (`epsilon` floors λ for the same reason). Under multivariate
    * normality the score is ~χ²(k), so flagging above the χ² tail
    * (e.g. 99th percentile) has a calibrated false-positive rate.
    *
    * Same execution shape as [[transform]]: pure codegen'd per-row
    * arithmetic from driver-held literals — no shuffle, scan-speed.
    */
  def mahalanobisSqCol(vecCol: Column, model: PcaModel,
      epsilon: Double = 1e-9): Column =
    (0 until model.nComponents).map { c =>
      val y = projectCol(vecCol, model, c)
      y * y / lit(math.max(model.eigenvalues(c), epsilon))
    }.reduce(_ + _)

  /** Flag embedding outliers: (score = Mahalanobis² in the top-k
    * subspace, is_outlier = score > threshold). One fit pass + one
    * projection pass.
    */
  def mahalanobisOutliers(df: DataFrame, vecCol: String, dim: Int,
      nComponents: Int, threshold: Double): DataFrame = {
    val model = fit(df, vecCol, dim, nComponents)
    df.withColumn("maha_sq", mahalanobisSqCol(col(vecCol), model))
      .withColumn("is_outlier", col("maha_sq") > lit(threshold))
  }
}
