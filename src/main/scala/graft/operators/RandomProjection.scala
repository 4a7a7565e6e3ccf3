package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection (Achlioptas-style ±1
  * signs): reduce `dim`-d embeddings to `k` dimensions as
  * `p_j = (1/√k) · Σ_i v_i · sign(i, j)` — the cheap pre-step before
  * LSH/clustering when the raw dimensionality is the cost driver.
  * Pairwise distances are preserved within the JL bound in
  * expectation.
  *
  * The sign matrix derives deterministically from a salt (md5 parity
  * per cell), so any engine — and any later run — reproduces the same
  * projection without shipping state. Projection is a pure
  * zip_with/aggregate fold per output dimension: shuffle-free,
  * scan-speed, `k × dim` multiply-adds per row.
  */
object RandomProjection {

  /** `signs(salt, dim, k)(i)(j)` ∈ {-1.0, +1.0}, md5-parity derived. */
  def signs(salt: String, dim: Int, k: Int): Array[Array[Double]] = {
    require(dim >= 1 && k >= 1, s"need dim, k >= 1 (got $dim, $k)")
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(dim, k) { (i, j) =>
      val h = md.digest(s"$salt|$i|$j".getBytes(StandardCharsets.UTF_8))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  /** Append `outPrefix`1..`outPrefix`k projected columns (doubles). */
  def project(
      df: DataFrame, vecCol: String, salt: String, dim: Int, k: Int,
      outPrefix: String = "rp"): DataFrame = {
    val m = signs(salt, dim, k)
    val invSqrtK = 1.0 / math.sqrt(k.toDouble)
    (0 until k).foldLeft(df) { (acc, j) =>
      val colSigns = (0 until dim).map(i => m(i)(j)).toArray
      acc.withColumn(s"$outPrefix${j + 1}",
        aggregate(
          zip_with(col(vecCol), lit(colSigns), (v, s) => v.cast("double") * s),
          lit(0.0d), (a, x) => a + x) * invSqrtK)
    }
  }
}
