package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation-funnel lineage: WHERE does a pipeline lose its documents?
  *
  * A production training-data pipeline chains many keep/drop gates
  * (length floors, language, quality, PII, ...). When 40% of a crawl
  * disappears, "which gate, and which documents" is the first audit
  * question — per-stage loss rates catch a miscalibrated threshold
  * (one stage suddenly eating everything) and per-doc attribution
  * answers takedown/debug queries. The reference has no equivalent;
  * this is part of the beyond-reference pipeline layer.
  *
  * Scale shape: ONE projection computes each row's FIRST failing stage
  * (a `coalesce` over `when(!pred, stageName)` in gate order — rows
  * are never duplicated per stage), and the report is a stage-bounded
  * `groupBy` of that single column. 100 TB pays one scan + one
  * |stages|-row aggregate; no joins, no windows, no per-stage passes.
  */
object Funnel {

  /** Per-row attribution: `first_fail` = name of the first gate (in
    * declaration order) whose predicate is NOT true, NULL for
    * survivors — sequential-filter semantics without running |stages|
    * filters. A NULL predicate (e.g. `length(text) >= 150` on a null
    * text column) counts as a failure, exactly as `filter(pred)` would
    * drop the row — `when(!pred, ...)` alone would let NULLs fall
    * through every stage and report them as survivors.
    */
  def withFirstFail(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val firstFail = coalesce(
      stages.map { case (name, pred) =>
        when(!coalesce(pred, lit(false)), lit(name)) } :+
        lit(null).cast("string"): _*)
    df.withColumn("first_fail", firstFail)
  }

  /** The funnel report: one row per stage IN ORDER with
    * (stage, n_in, n_dropped, n_out, drop_rate), where stage i's input
    * is stage i-1's survivors — exactly what sequentially-applied
    * filters would see. Derived from one first-fail aggregate by a
    * running subtraction over the |stages|-row frame (driver-side
    * arithmetic on the tiny collected report, not a data-frame window).
    */
  def report(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = withFirstFail(df, stages)
      .groupBy("first_fail").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val total = counts.values.sum
    var in = total
    val rows = stages.map { case (name, _) =>
      val dropped = counts.getOrElse(Some(name), 0L)
      val out = in - dropped
      val row = (name, in, dropped, out,
        if (in == 0L) 0.0 else dropped.toDouble / in.toDouble)
      in = out
      row
    }
    rows.toDF("stage", "n_in", "n_dropped", "n_out", "drop_rate")
  }

  /** Cohort retention: users bucketed by their FIRST-ACTIVITY bucket
    * (the cohort), counted as active at each AGE (bucket − cohort) —
    * the "of the users who arrived in week 0, how many were still
    * here in week k" triangle every growth/engagement dashboard
    * draws, and for a data pipeline the contributor-survival view of
    * a crawl or labeling workforce.
    *
    * `bucketCol` is any orderable integer bucket (day number, week
    * number). Scale shape: first-touch is ONE map-side-combined min
    * per user; activity dedups to (user, bucket) in the same shuffle
    * family; the join is user-keyed (co-partitioned with both aggs);
    * the output aggregate is |buckets|²-bounded. No windows over data,
    * nothing driver-side.
    *
    * Returns (cohort, age, n_active) — n_active(cohort, 0) is the
    * cohort's size (every user is active in their first bucket).
    */
  def cohortRetention(events: DataFrame, userCol: String,
      bucketCol: Column): DataFrame = {
    val act = events
      .select(col(userCol).as("_u"), bucketCol.cast("long").as("_b"))
      .filter(col("_u").isNotNull && col("_b").isNotNull)
      .distinct()
    val first = act.groupBy("_u").agg(min(col("_b")).as("cohort"))
    act.join(first, Seq("_u"))
      .groupBy(col("cohort"), (col("_b") - col("cohort")).as("age"))
      .agg(count(lit(1)).as("n_active"))
  }
}
