package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark's SQL surface lacks.
  *
  * For every left row, attach the payload of the latest right row with
  * `right.ts <= left.ts` within the same key (inclusive at equal
  * timestamps, matching DuckDB/pandas `merge_asof` semantics).
  *
  * Implementation is the compose-existing-ops formulation (preferred
  * over a custom SparkPlan, SURVEY.md §7.3): tag both sides, UNION,
  * then a single window per key ordered by (ts, side) carrying the last
  * seen payload forward. ONE shuffle on the key columns total —
  * equivalent hand-written sort-merge would shuffle both sides the same
  * amount, so a custom physical operator buys nothing here.
  */
object AsOfJoin {

  /** @param payloadCols right-side columns to attach (must not clash
    *                    with left column names)
    * @param toleranceMs optional maximum allowed `left.ts - right.ts`
    *                    in milliseconds; matches older than this yield
    *                    null payloads (pandas merge_asof `tolerance`)
    * @note when multiple right rows share the same (key, ts), the winner
    *       among the exact ties is arbitrary — the same contract as
    *       DuckDB ASOF JOIN and pandas merge_asof; pre-aggregate the
    *       right side if tie determinism matters
    */
  def joinAsOf(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], leftTsCol: String, rightTsCol: String,
      payloadCols: Seq[String], toleranceMs: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one key column")
    require(payloadCols.intersect(left.columns.toSeq).isEmpty,
      s"payload columns ${payloadCols.intersect(left.columns.toSeq)} clash with left")

    // leftTsCol travels as `_ts` (renamed back at the end) — it must not
    // ALSO ride along in the passthrough columns or the output would
    // carry a duplicate column name
    val leftCols = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == leftTsCol)
    val rightSchema = right.schema
    val leftSchema = left.schema

    // harmonized union: left rows carry null payloads, right rows carry
    // null left-columns; `_side` orders right (0) before left (1) at
    // equal timestamps so equal-ts matches are inclusive
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTsCol).as("_ts"), lit(1).as("_side")) ++
        leftCols.map(col) ++
        payloadCols.map(c => lit(null).cast(rightSchema(c).dataType).as(c)): _*)
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTsCol).as("_ts"), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).cast(leftSchema(c).dataType).as(c)) ++
        payloadCols.map(col): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRight)
      .select(
        (keyCols.map(col) ++ Seq(col("_ts"), col("_side")) ++ leftCols.map(col) ++
          payloadCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)) :+
          last(when(col("_side") === 0, col("_ts")), ignoreNulls = true).over(w)
            .as("_matched_ts")): _*)
      .filter(col("_side") === 1)

    val withTolerance = toleranceMs match {
      case Some(tol) =>
        val stale = col("_matched_ts").isNull ||
          unix_millis(col("_ts")) - unix_millis(col("_matched_ts")) > tol
        payloadCols.foldLeft(carried) { (df, c) =>
          df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
        }
      case None => carried
    }

    withTolerance
      .withColumnRenamed("_ts", leftTsCol)
      .drop("_side", "_matched_ts")
  }
}
