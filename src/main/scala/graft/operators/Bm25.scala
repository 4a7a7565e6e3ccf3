package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a corpus against a fixed query-term set —
  * the classic lexical retrieval baseline a training-data pipeline uses
  * for benchmark decontamination triage and quality-targeted sampling.
  *
  * Scale shape (100 TB): the query vocabulary is tiny, so per-term
  * term frequencies are computed as a pure projection over the document
  * scan (no explode of the token stream, no shuffle of text). Corpus
  * statistics (N, avgdl, per-term df) partially aggregate to ONE row
  * collected as driver state — exactly the k-means-centroid pattern in
  * [[Ann]] — and the final score is again a shuffle-free projection with
  * the idf weights embedded as literals. Two jobs total, both map-side.
  */
object Bm25 {

  /** Per-document BM25 score against `terms` (Robertson idf with the
    * Lucene-style `log(1 + ...)` floor, so idf is always positive).
    * Output: (idCol, dl, tf_0..tf_{m-1}, bm25).
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // the tokenizer lowercases, so match terms in lowercase too — an
    // uppercase query term would otherwise silently score 0 everywhere
    val qTerms = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    require(qTerms.distinct.size == qTerms.size,
      s"duplicate query terms (after lowercasing): $terms")

    // tf per term: lambda references only the lambda var and a literal,
    // so the token split evaluates once per row (HOF-embedding hazard).
    // coalesce(0): NULL text must contribute dl=0/tf=0, not poison the
    // corpus stats into SQL NULL (and an NPE on the stats reads below).
    // The slim (id, dl, tf…) frame is eagerly checkpointed because BOTH
    // the stats aggregate and the scoring projection consume it — one
    // tokenization pass over the text instead of two (measured 12.5 s
    // → 6.6 s on the 100k-doc smoke; at 100 TB the saved pass is a full
    // corpus scan, traded for a checkpoint of ~6 ints per doc).
    val withToks = docs.select(
      col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
    val withTf = withToks.select(
      col(idCol) +: coalesce(size(col("_toks")), lit(0)).as("dl") +:
        qTerms.zipWithIndex.map { case (t, i) =>
          coalesce(size(filter(col("_toks"), x => x === lit(t))), lit(0)).as(s"tf_$i")
        }: _*)
      .localCheckpoint()

    // One partially-aggregated reduce to a single stats row (driver
    // state, like k-means centroids): N, avgdl, df per term.
    val statsRow = withTf.agg(
      count(lit(1)).as("n"),
      avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i")): _*).head()

    val n = statsRow.getLong(0)
    if (n == 0L) {
      // avg/sum over zero rows are SQL NULL — return the empty frame
      // with the full schema rather than NPE on the stats reads.
      return withTf.withColumn("bm25", lit(0.0)).limit(0)
    }
    val avgdl = statsRow.getDouble(1)
    val idf = terms.indices.map { i =>
      val df = statsRow.getLong(2 + i).toDouble
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }

    val scoreCol: Column = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val norm = lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdl))
      lit(idf(i)) * tf * lit(k1 + 1.0) / (tf + norm)
    }.reduce(_ + _)
    withTf.withColumn("bm25", scoreCol)
  }

  /** Top-k retrieval: positive-scoring docs by descending (rounded)
    * score, id tie-break. Rounding BEFORE the sort keeps the ranking
    * reproducible across engines whose `ln` differs in the last ulp.
    *
    * The positivity filter runs AFTER the limit: zero scores sort
    * below every positive score, so the result set is identical, and
    * the scoring expression is never duplicated into a pre-top-k
    * Filter node (with the checkpointed tf frame the filter input is
    * cheap either way — this keeps it that way if the checkpoint is
    * ever removed).
    */
  def topK(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    score(docs, idCol, textCol, terms, k1, b)
      .withColumn("bm25", round(col("bm25"), 4))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .filter(col("bm25") > 0.0)
      .select(col(idCol), col("bm25"))
  }
}
