package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ/Great-Expectations
  * shape re-expressed as plain aggregates: a pipeline asserts "these
  * invariants hold on today's 100 TB drop" and gets a per-rule
  * violation report from ONE scan, not one job per rule.
  *
  * Design: every row rule is a boolean Column evaluated per row; the
  * report aggregates them together in a single map-side-combined pass
  * (per-rule conditional sums over one scan), then pivots the 1-row
  * aggregate into per-rule rows driver-free with an explode over a
  * literal struct array (bounded by |rules|, not data). A NULL rule
  * result counts as a VIOLATION — filter semantics (the [[Funnel]]
  * null lesson): a row that cannot prove the invariant does not pass
  * it.
  */
object Validate {

  /** Per-rule violation report: (rule, n_rows, n_violations,
    * violation_rate), one row per rule in input order, from one scan.
    */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_._1).distinct.size == rules.size,
      "rule names must be unique")
    // positional internal names (_v_0, _v_1, …), NOT derived from the
    // user-facing rule name: a rule named "price.positive" would
    // otherwise turn col("_v_price.positive") into a nested-field
    // reference and fail analysis — names stay free-form and only
    // appear inside the literal struct below (r7 advice)
    val aggs = count(lit(1)).as("_n") +: rules.zipWithIndex.map {
      case ((_, pred), i) =>
        sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"_v_$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"_v_$i").as("_v"))
    }
    one.select(col("_n"), explode(array(pairs: _*)).as("_r"))
      .select(col("_r.rule").as("rule"), col("_n").as("n_rows"),
        col("_r._v").as("n_violations"),
        when(col("_n") > 0,
          col("_r._v").cast("double") / col("_n").cast("double"))
          .otherwise(lit(0.0)).as("violation_rate"))
  }

  /** Benford first-digit audit: counts of the leading significant
    * digit 1-9 of a POSITIVE INTEGER column per group — the classic
    * fabricated-numbers / unit-mix smell test (genuine multi-scale
    * quantities follow P(d) = log10(1 + 1/d); flat or spiked digit
    * histograms flag synthetic data, truncation bugs, or mixed
    * units). Callers scale decimal quantities to integer units first
    * (cents, micros) with an engine-stable floor — the digit then
    * comes from the integer's decimal rendering, pure string ops with
    * no float formatting or log10 anywhere, so the histogram replays
    * bit-for-bit on any engine. The chi-square against the Benford
    * expectation is caller-side (it needs log10). Values below 1 are
    * excluded — non-positives have no leading significant digit, and
    * fractions in (0, 1) would truncate to a spurious digit 0 (scale
    * them to integer units first).
    *
    * One scan, one map-side-combined aggregate; output is
    * |groups|·9 rows of integers: (groupCols…, digit, n).
    */
  def benfordDigits(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    df.filter(col(valueCol) >= 1)
      .select(g :+ substring(col(valueCol).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"): _*)
      .groupBy(g :+ col("digit"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Referential-integrity audit: child rows whose foreign key has no
    * parent (orphans — broken joins waiting to happen) and parent keys
    * no child references (unused — often a stale-dimension smell).
    * One row of integers: (n_child, n_orphans, n_parents,
    * n_parents_unused). NULL foreign keys count as orphans (they
    * cannot join). Shape: two key-projected anti-join counts — the
    * child side scans once per count, column-pruned to the key.
    */
  def referentialIntegrity(child: DataFrame, fkCol: String,
      parent: DataFrame, pkCol: String): DataFrame = {
    val fk = child.select(col(fkCol).as("_k"))
    val pk = parent.select(col(pkCol).as("_k"))
    val orphans = fk.join(pk, Seq("_k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val unused = pk.join(fk, Seq("_k"), "left_anti")
      .agg(count(lit(1)).as("n_parents_unused"))
    child.agg(count(lit(1)).as("n_child"))
      .crossJoin(orphans)
      .crossJoin(parent.agg(count(lit(1)).as("n_parents")))
      .crossJoin(unused)
      .select(col("n_child"), col("n_orphans"), col("n_parents"),
        col("n_parents_unused"))
  }

  /** Key-uniqueness audit for `cols`: one row (n_rows, n_keys,
    * n_dupe_rows, max_multiplicity) — n_dupe_rows is how many rows
    * would be dropped by a dedup on the key. NULL key components group
    * together (a NULL-keyed pile IS a uniqueness problem).
    */
  def uniqueness(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one key column")
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("_c"))
      .agg(
        coalesce(sum(col("_c")), lit(0L)).as("n_rows"),
        count(lit(1)).as("n_keys"),
        coalesce(sum(col("_c") - 1L), lit(0L)).as("n_dupe_rows"),
        coalesce(max(col("_c")), lit(0L)).as("max_multiplicity"))
  }
}
