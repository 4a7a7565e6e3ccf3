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
}
