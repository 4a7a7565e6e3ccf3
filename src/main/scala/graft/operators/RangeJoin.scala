package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range joins.
  *
  * Spark plans a bare range predicate (`p BETWEEN s AND e`, interval
  * overlap) as BroadcastNestedLoopJoin — O(|left| × |right|) work that
  * only survives when one side broadcasts. The scalable form maps both
  * sides onto fixed-width buckets of the join dimension so the range
  * predicate rides an equi-join shuffle: intervals replicate to the
  * buckets they cover (replication = interval length / bucketWidth + 1),
  * points land in exactly one bucket, and the exact predicate filters
  * within the bucket. The same decomposition Databricks exposes as the
  * RANGE_JOIN hint and Flink/Beam implement for interval joins —
  * expressed here with `sequence` + `explode` over the public DataFrame
  * API.
  *
  * `bucketWidth` tunes replication vs bucket fan-in: pick it near the
  * typical interval length so each interval lands in O(1) buckets.
  */
object RangeJoin {

  /** Join each left row's point `pCol` to every right row whose
    * `[sCol, eCol]` interval contains it (inclusive bounds, long
    * arithmetic). Output = left columns ++ right columns.
    *
    * Each (point, interval) match shares exactly ONE bucket — the
    * point's — so no post-join dedup is needed.
    */
  def pointInInterval(
      points: DataFrame, pCol: String,
      intervals: DataFrame, sCol: String, eCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireDisjoint(points, intervals)
    val p = points.withColumn("_bucket", floorDiv(col(pCol), bucketWidth))
    val iv = intervals
      .where(col(sCol) <= col(eCol))
      .withColumn("_bucket",
        explode(sequence(floorDiv(col(sCol), bucketWidth),
          floorDiv(col(eCol), bucketWidth))))
    p.join(iv, Seq("_bucket"))
      .where(col(pCol) >= col(sCol) && col(pCol) <= col(eCol))
      .drop("_bucket")
  }

  /** Join interval sets on overlap: rows (a, b) where
    * `[aS, aE]` ∩ `[bS, bE]` ≠ ∅ (inclusive bounds). A pair can share
    * many buckets, so each pair is emitted ONLY from the first bucket
    * both cover — `max(floor(aS/w), floor(bS/w))` — which keeps the
    * output distinct without a shuffle-heavy `dropDuplicates`.
    */
  def intervalOverlap(
      left: DataFrame, lsCol: String, leCol: String,
      right: DataFrame, rsCol: String, reCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    requireDisjoint(left, right)
    def bucketed(df: DataFrame, s: String, e: String) = df
      .where(col(s) <= col(e))
      .withColumn("_first", floorDiv(col(s), bucketWidth))
      .withColumn("_bucket",
        explode(sequence(col("_first"), floorDiv(col(e), bucketWidth))))
    val a = bucketed(left, lsCol, leCol).withColumnRenamed("_first", "_a_first")
    val b = bucketed(right, rsCol, reCol).withColumnRenamed("_first", "_b_first")
    a.join(b, Seq("_bucket"))
      .where(col(lsCol) <= col(reCol) && col(rsCol) <= col(leCol))
      .where(col("_bucket") === greatest(col("_a_first"), col("_b_first")))
      .drop("_bucket", "_a_first", "_b_first")
  }

  // Output = both sides' columns joined, so shared names would be
  // ambiguous after the bucket join — and the internal working columns
  // must not collide with (and silently clobber) user data.
  private def requireDisjoint(a: DataFrame, b: DataFrame): Unit = {
    val shared = a.columns.toSet intersect b.columns.toSet
    require(shared.isEmpty,
      s"range join requires disjoint column names across sides; shared: ${shared.mkString(", ")}")
    val reserved = Set("_bucket", "_first", "_a_first", "_b_first")
    val clash = (a.columns.toSet ++ b.columns.toSet) intersect reserved
    require(clash.isEmpty,
      s"range join reserves ${clash.mkString(", ")} as working column names; rename the input column")
  }

  // Integer floor division rounding toward -Infinity, in exact long
  // arithmetic (a double round trip would lose exactness past 2^53;
  // bare SQL `div` truncates toward zero, splitting a bucket at the
  // origin). `c - pmod(c, w)` is an exact multiple of w, so the
  // integral divide is exact.
  private def floorDiv(c: org.apache.spark.sql.Column, w: Long) = {
    import org.apache.spark.sql.graftshim.GraftShim.{column, expression}
    val cl = c.cast("long")
    val num = cl - pmod(cl, lit(w))
    column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression(num), expression(lit(w))))
  }
}
