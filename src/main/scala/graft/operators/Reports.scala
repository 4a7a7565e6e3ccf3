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
    * Scale shape: one map-side-combined count per value, then a
    * DISTRIBUTED top-k cut — `orderBy(n desc, value).limit(k)` plans
    * as TakeOrderedAndProject (per-partition heaps), never a global
    * sort or a single-partition rank over the |values|-row frame (a
    * user-id dimension makes |values| corpus-scale, and a bare
    * `Window.orderBy` there would serialize it through one task).
    * The tail is an anti-join against the k-row (broadcast) winner
    * set plus one single-row aggregate; only the final cosmetic rank
    * over the k+1 output rows touches one partition.
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
      .localCheckpoint(true)
    val topK = counts.filter(col("_v").isNotNull)
      .orderBy(col("n").desc, col("_v")).limit(k)
    val top = topK
      .withColumn("_rk",
        row_number().over(Window.orderBy(col("n").desc, col("_v"))))
      .select(col("_v").as("value"), col("n"), lit(1L).as("n_values"),
        lit(0).as("_ord"), col("_rk"))
    val other = counts
      .join(broadcast(topK.select(col("_v"))), Seq("_v"), "left_anti")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        count(lit(1)).as("n_values"))
      .filter(col("n_values") > 0L)
      .select(lit(otherLabel).as("value"), col("n"), col("n_values"),
        lit(1).as("_ord"), lit(0).as("_rk"))
    top.unionAll(other).orderBy("_ord", "_rk").drop("_ord", "_rk")
  }
}
