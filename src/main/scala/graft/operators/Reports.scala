package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reporting rollups — the presentation-layer shapes every dashboard
  * ends up hand-writing over a high-cardinality dimension.
  */
object Reports {

  /** Top-k categories plus an `<other>` rollup: counts per value, the
    * k biggest kept (ties by value ascending, so the cut is
    * deterministic on any engine), everything else folded into ONE
    * row carrying both its total count and how many distinct values
    * it swallowed — the long tail stays visible as mass without
    * exploding the report. NULL category values never compete for a
    * top slot; their mass goes straight to the other row (a NULL row
    * label would collide with rendering).
    *
    * Scale shape: one map-side-combined count per value, a
    * distributed top-k cut (rank over the |values|-row count frame),
    * and a single-row aggregate of the remainder — nothing
    * corpus-sized past the first aggregate.
    *
    * Returns (value: string, n, n_values) ordered by (n desc, value)
    * with the other row last regardless of its size.
    */
  def topKWithOthers(df: DataFrame, valueCol: String, k: Int,
      otherLabel: String = "<other>"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df
      .select(col(valueCol).cast("string").as("_v"))
      .groupBy("_v").agg(count(lit(1)).as("n"))
    val ranked = counts.filter(col("_v").isNotNull).withColumn("_rk",
      row_number().over(Window.orderBy(col("n").desc, col("_v"))))
    val top = ranked.filter(col("_rk") <= k)
      .select(col("_v").as("value"), col("n"), lit(1L).as("n_values"),
        lit(0).as("_ord"), col("_rk"))
    val tail = ranked.filter(col("_rk") > k).select(col("n"))
      .unionAll(counts.filter(col("_v").isNull).select(col("n")))
    val other = tail
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        count(lit(1)).as("n_values"))
      .filter(col("n_values") > 0L)
      .select(lit(otherLabel).as("value"), col("n"), col("n_values"),
        lit(1).as("_ord"), lit(0).as("_rk"))
    top.unionAll(other).orderBy("_ord", "_rk").drop("_ord", "_rk")
  }
}
