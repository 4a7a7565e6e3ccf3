package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — a standard compliance pass in
  * training-data pipelines (emails, IPv4 addresses, US phone numbers,
  * SSN-shaped ids).
  *
  * Pure regex projections (`regexp_count` / `regexp_replace`), so the
  * whole pass is codegen'd, shuffle-free, and runs at scan speed at any
  * corpus size. Patterns stay inside the RE2-compatible subset (no
  * lookaround, no backreferences) so the same pattern text runs on
  * engines like DuckDB/Trino for cross-checking.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  // dash-only phone shape: the dotted form is ambiguous against IPv4
  val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Per-category match counts over the raw text. */
  def counts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(emailRe)),
    "n_ipv4" -> regexp_count(text, lit(ipv4Re)),
    "n_phone" -> regexp_count(text, lit(phoneRe)),
    "n_ssn" -> regexp_count(text, lit(ssnRe)))

  /** Redacted text with typed placeholders. Order matters: emails go
    * first (their local/domain parts may contain digit runs), SSN
    * (3-2-4) before phone (3-3-4) so neither claims the other's shape,
    * and IPv4 last.
    */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "[EMAIL]")
    val s = regexp_replace(e, ssnRe, "[SSN]")
    val p = regexp_replace(s, phoneRe, "[PHONE]")
    regexp_replace(p, ipv4Re, "[IP]")
  }

  /** True when any PII category matches — the filter form. */
  def hasPii(text: Column): Column =
    counts(text).map { case (_, c) => c > 0 }.reduce(_ || _)

  /** k-anonymity suppression: rows whose quasi-identifier combination
    * occurs fewer than `k` times get those columns nulled (plus a
    * `suppressed` flag) — the release-gate companion to [[redact]] for
    * STRUCTURED columns, where rare attribute combinations re-identify
    * even after free-text redaction.
    *
    * Scale shape: group sizes are one map-side-combined aggregate
    * equi-joined back on the quasi columns (group count can be
    * corpus-scale, so no broadcast assumption); suppression is a
    * projection.
    */
  def kAnonymitySuppress(
      df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
      k: Long): org.apache.spark.sql.DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column required")
    require(k >= 1, s"k must be >= 1, got $k")
    val sizes = df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("_gn"))
    val joined = df.join(sizes, quasiCols)
    val suppressed = col("_gn") < k
    quasiCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, when(suppressed, lit(null)).otherwise(col(c)))
    }
      .withColumn("suppressed", suppressed)
      .drop("_gn")
  }
}
