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
    val internal = Seq("_ts", "_side", "_payload")
    require(internal.intersect(left.columns.toSeq ++ right.columns.toSeq).isEmpty,
      s"columns named ${internal.mkString("/")} are reserved by joinAsOf")

    // leftTsCol travels as `_ts` (renamed back at the end) — it must not
    // ALSO ride along in the passthrough columns or the output would
    // carry a duplicate column name
    val leftCols = left.columns.toSeq.filterNot(c => keyCols.contains(c) || c == leftTsCol)
    val leftSchema = left.schema

    // harmonized union. The whole right payload rides in ONE non-null
    // struct per right row so (a) a genuinely NULL payload value on the
    // matching row stays NULL (never shadowed by an older row) and
    // (b) staleness and payload always come from the same matched row.
    // `_side` orders right (0) before left (1) at equal timestamps so
    // equal-ts matches are inclusive. Right rows with NULL keys are
    // dropped — equi-join semantics never match NULL keys.
    val payloadStruct = struct(
      (col(rightTsCol).as("_matched_ts") +: payloadCols.map(col)): _*)
    val taggedRight = right
      .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++
          Seq(col(rightTsCol).as("_ts"), lit(0).as("_side")) ++
          leftCols.map(c => lit(null).cast(leftSchema(c).dataType).as(c)) :+
          payloadStruct.as("_payload"): _*)
    val payloadType = taggedRight.schema("_payload").dataType
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTsCol).as("_ts"), lit(1).as("_side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("_payload"): _*)

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedLeft.unionByName(taggedRight)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val matched = toleranceMs match {
      case Some(tol) =>
        val stale = col("_payload").isNull ||
          unix_millis(col("_ts")) - unix_millis(col("_payload._matched_ts")) > tol
        carried.withColumn("_payload",
          when(stale, lit(null).cast(payloadType)).otherwise(col("_payload")))
      case None => carried
    }

    payloadCols.foldLeft(matched) { (df, c) =>
        df.withColumn(c, col(s"_payload.$c"))
      }
      .withColumnRenamed("_ts", leftTsCol)
      .drop("_side", "_payload")
  }
}
