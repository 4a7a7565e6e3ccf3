package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the dedup key every web-corpus pipeline
  * derives before anything else (CommonCrawl-style: the same page is
  * crawled under scheme/case/port/tracking-param/fragment variants).
  *
  * All pure regexp/string projections (codegen'd, scan-speed):
  * lowercase scheme+host, drop default ports (http:80 / https:443),
  * strip one trailing path slash (root `/` survives), drop tracking
  * params (`utm_*`, `fbclid`, `gclid`) while PRESERVING other params
  * and their order, drop the fragment.
  */
object Urls {

  private def grp(url: Column, i: Int): Column =
    regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\\?[^#]*)?(#.*)?$", i)

  /** Lowercased scheme. */
  def scheme(url: Column): Column = lower(grp(url, 1))

  /** Lowercased host, port stripped (userinfo unsupported). */
  def host(url: Column): Column =
    lower(regexp_extract(grp(url, 2), "^([^:]*)", 1))

  /** Explicit port, or empty string. */
  def port(url: Column): Column =
    regexp_extract(grp(url, 2), ":([0-9]+)$", 1)

  /** Registrable-ish domain: host minus a leading `www.`. */
  def domain(url: Column): Column =
    regexp_replace(host(url), "^www\\.", "")

  /** Canonical form (see object doc). Non-URLs (no `scheme://`) yield
    * the empty string — filter upstream.
    */
  def normalize(url: Column): Column = {
    val sch = scheme(url)
    val hst = host(url)
    val prt = port(url)
    val keepPort = when(
      prt === "" || (sch === "http" && prt === "80") ||
        (sch === "https" && prt === "443"),
      lit("")).otherwise(concat(lit(":"), prt))
    val rawPath = grp(url, 3)
    val path = when(rawPath.rlike("^.+/$"),
      rawPath.substr(lit(1), length(rawPath) - 1)).otherwise(rawPath)
    val rawQuery = grp(url, 4) // includes the leading '?', or empty
    val kept = filter(
      split(regexp_replace(rawQuery, "^\\?", ""), "&"),
      p => !p.rlike("^(utm_[A-Za-z0-9]+|fbclid|gclid)=") && p =!= "")
    val query = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    when(sch === "", lit(""))
      .otherwise(concat(sch, lit("://"), hst, keepPort, path, query))
  }

  /** Per-domain rollup: (domain, n_docs, avg of `scoreCol`) — the
    * aggregate behind domain-level curation (RefinedWeb/C4 cut whole
    * sites, not documents, because quality is site-correlated). One
    * map-side-combined aggregation keyed on the derived domain; the
    * result is domain-cardinality-bounded, broadcastable back onto the
    * corpus for filtering (see the `tx_domain_filter` gate).
    */
  def domainRollup(docs: DataFrame, urlCol: String, scoreCol: String): DataFrame =
    docs
      .groupBy(domain(col(urlCol)).as("domain"))
      .agg(count(lit(1)).as("n_docs"), avg(col(scoreCol)).as("avg_score"))

  /** Keep only docs whose domain-average score clears `minAvg` —
    * domain-level filtering as a broadcast semi-join against the slim
    * [[domainRollup]] frame (no shuffle of the corpus side). Appends
    * `domain` and the rounded `domain_avg`.
    */
  def filterByDomainQuality(docs: DataFrame, urlCol: String,
      scoreCol: String, minAvg: Double): DataFrame = {
    val good = broadcast(
      domainRollup(docs, urlCol, scoreCol)
        .filter(graft.functions.hround(col("avg_score"), 4) >= minAvg)
        .select(col("domain"),
          graft.functions.hround(col("avg_score"), 4).as("domain_avg")))
    docs.withColumn("domain", domain(col(urlCol)))
      .join(good, Seq("domain"))
  }
}
