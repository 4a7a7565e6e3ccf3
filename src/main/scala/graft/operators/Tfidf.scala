package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting — the classic retrieval/keyword-extraction
  * signal (and the cheap "what is this document about" feature a
  * training-data pipeline uses for topic balancing).
  *
  * Scale shape: ONE tokenize+explode pass feeds a map-side-combined
  * `(doc, token)` count; document frequency is a second map-side
  * aggregation of that frame (never re-reads text); the idf join
  * shuffles on `token`, the natural key — at open-web scale the
  * token-level df frame is orders of magnitude smaller than the pair
  * frame and AQE turns the join broadcast when it fits. No driver
  * state beyond the single corpus-size scalar.
  *
  * Weighting matches sklearn's smoothed default:
  * `idf(t) = ln((N + 1) / (df_t + 1)) + 1`, `tfidf = tf * idf` — never
  * a division by zero, and unseen-corpus scoring stays finite.
  */
object Tfidf {

  /** Per-(doc, token) weights: (doc_id, token, tf, df, tfidf).
    * `tf` is the raw in-document occurrence count; `df` the number of
    * documents containing the token.
    */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = docs.count() // one scalar of driver state, like Bm25.CorpusStats
    // BOTH the df branch and the final join consume the tf frame —
    // deliberately WITHOUT a cache/checkpoint. The price is a second
    // tokenize pass (a fully parallel map-side stage; column pruning
    // keeps the branches' subplans distinct, so ReuseExchange cannot
    // collapse them); the previous eager localCheckpoint instead wrote
    // the doc×token frame to block storage and LEAKED it unless every
    // caller remembered to release it — repeated in-session runs
    // (bench reps, ScaleSmoke) accumulated storage without bound.
    // Leak-freedom is plan-asserted in PlanSpec.
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    // tf has exactly one row per (doc, token) => per-token row count IS df
    val dfc = tf.groupBy("token").agg(count(lit(1)).as("df"))
    tf.join(dfc, "token")
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        (col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)).as("tfidf"))
  }

  /** Top-`k` terms per document by (tfidf desc, token asc). The
    * row_number cap plans as WindowGroupLimit, so the per-doc sort is
    * top-k bounded before the exchange — no unbounded per-doc buffer.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
    tfidf(docs, idCol, textCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
