package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout via the Z-order (Morton) curve: map
  * two sort dimensions onto one space-filling key so a range-partitioned
  * write clusters rows that are close in BOTH dimensions into the same
  * files. A table laid out this way serves selective two-column range
  * predicates from a small fraction of its files (min/max file stats
  * prune on the single z column), where a lexicographic sort only helps
  * the leading column — the standard layout trick for "filter by
  * (source, date)" or "(domain, quality-bucket)" curation scans over a
  * 100 TB corpus.
  *
  * Everything here is pure integer bit arithmetic on `functions._`
  * columns — whole-stage codegen'd, exactly reproducible in any engine.
  */
object Layout {

  private val masks = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 32 bits of `c` onto the even bit positions of a
    * long (classic 5-round mask-shift bit twiddle). */
  private def spread(c: Column): Column =
    masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (v, (s, m)) => v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** Z-value interleaving the low 32 bits of two non-negative integer
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * Total order on the Morton curve through the (x, y) grid. */
  def zValue2(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Range-partition `df` by the z-value of two columns — each output
    * partition covers a contiguous z interval, i.e. a compact region of
    * the (c1, c2) plane, so per-file min/max stats on BOTH columns stay
    * tight. One range-exchange (sampled bounds), no other shuffle. */
  def zorderBy(df: DataFrame, c1: String, c2: String,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    df.withColumn("_z", zValue2(col(c1), col(c2)))
      .repartitionByRange(numPartitions, col("_z"))
      .drop("_z")
  }

  /** Hilbert-curve index of (`xCol`, `yCol`) on the 2^bits × 2^bits
    * grid, added as column `out` — the space-filling curve with
    * strictly better locality than Z-order: successive curve positions
    * are always Manhattan-distance 1 apart (Z-order jumps across the
    * plane at power-of-two seams), so range-partitioned files cover
    * tighter (x, y) rectangles and min/max pruning cuts deeper on
    * two-column range predicates.
    *
    * Standard per-level rotate-and-accumulate (the quadrant walk of
    * Hilbert's construction), unrolled `bits` times as plain integer
    * column arithmetic: each level is its own projection so the level's
    * rx/ry quadrant bits are named attributes — reused, not re-derived,
    * keeping the codegen'd expression tree linear in `bits` rather than
    * exponential. No UDF, no driver work, bit-for-bit reproducible in
    * any engine.
    */
  def withHilbertValue(df: DataFrame, xCol: String, yCol: String,
      out: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    var d = df
      .withColumn("_hx", col(xCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("_hy", col(yCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn(out, lit(0L))
    for (k <- bits - 1 to 0 by -1) {
      val s = 1L << k
      d = d
        .withColumn("_rx",
          when(col("_hx").bitwiseAND(lit(s)) =!= 0L, lit(1L))
            .otherwise(lit(0L)))
        .withColumn("_ry",
          when(col("_hy").bitwiseAND(lit(s)) =!= 0L, lit(1L))
            .otherwise(lit(0L)))
      val flipX = when(col("_rx") === 1L, lit(s - 1) - col("_hx"))
        .otherwise(col("_hx"))
      val flipY = when(col("_rx") === 1L, lit(s - 1) - col("_hy"))
        .otherwise(col("_hy"))
      d = d
        .withColumn(out, col(out) + lit(s) * lit(s) *
          (lit(3L) * col("_rx")).bitwiseXOR(col("_ry")))
        // rotate: flip both coords when rx=1, then swap — only in the
        // ry=0 half; materialized as fresh columns so the next level
        // references attributes, not nested CASE trees
        .withColumn("_nx", when(col("_ry") === 0L, flipY)
          .otherwise(col("_hx")))
        .withColumn("_ny", when(col("_ry") === 0L, flipX)
          .otherwise(col("_hy")))
        .withColumn("_hx", col("_nx"))
        .withColumn("_hy", col("_ny"))
    }
    d.drop("_hx", "_hy", "_rx", "_ry", "_nx", "_ny")
  }

  /** Range-partition `df` by the Hilbert index of two columns — the
    * [[zorderBy]] layout with the tighter curve. One range-exchange
    * (sampled bounds), no other shuffle. */
  def hilbertBy(df: DataFrame, c1: String, c2: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    withHilbertValue(df, c1, c2, "_h", bits)
      .repartitionByRange(numPartitions, col("_h"))
      .drop("_h")
  }
}
