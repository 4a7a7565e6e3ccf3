package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto
  * a fixed per-key hourly grid with forward fill — the feature-pipeline
  * step that turns raw telemetry into model-ready aligned series.
  *
  * Scale shape: bucket reduction is one map-side-combined aggregate
  * (deterministic last-per-bucket via a bounded per-bucket
  * WindowGroupLimit); the grid explode is bounded by `keys × span
  * hours`, orders of magnitude smaller than the event stream; the
  * forward-fill window shuffles only the GRID, partitioned by key. The
  * event table itself is never windowed.
  */
object Resample {

  /** Per-key hourly grid from each key's first to last active hour:
    * (key, hour, v — last observed value in that hour, NULL on gaps,
    * filled — forward-filled value, is_gap).
    *
    * "Last observed" ties break deterministically: latest `ts`, then
    * largest value.
    */
  def hourlyFfill(
      events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val key = col(keyCol)
    val perBucket = Window.partitionBy(keyCol, "hour")
      .orderBy(col(tsCol).desc, col(valueCol).desc)
    val hourly = events
      .withColumn("hour", date_trunc("hour", col(tsCol)))
      .withColumn("_rn", row_number().over(perBucket))
      .filter(col("_rn") === 1)
      .select(key, col("hour"), col(valueCol).as("v"))
    val grid = hourly.groupBy(key)
      .agg(min(col("hour")).as("_lo"), max(col("hour")).as("_hi"))
      .select(key, explode(
        sequence(col("_lo"), col("_hi"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val ffill = Window.partitionBy(keyCol).orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq(keyCol, "hour"), "left_outer")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(ffill))
      .withColumn("is_gap", col("v").isNull)
  }
}
