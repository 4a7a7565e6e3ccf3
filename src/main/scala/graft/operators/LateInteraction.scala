package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{cosine_similarity, dot_product}

/** Late-interaction (multi-vector) retrieval — the ColBERT scoring
  * model (Khattab & Zaharia, "ColBERT: Efficient and Effective Passage
  * Search via Contextualized Late Interaction over BERT", SIGIR 2020):
  * a document is a BAG of token/chunk vectors, a query is a bag of
  * token vectors, and the score is
  * `MaxSim(q, d) = sum over query tokens t of max over doc tokens c of
  * sim(t, c)` — each query token independently finds its best match in
  * the document, so fine-grained term-level evidence survives where a
  * single pooled vector would wash it out.
  *
  * Relational shape: token-pair sims → `max` per (query, doc, query
  * token) → `sum` per (query, doc) — two hash aggregations, both
  * map-side combinable, then the shared per-query top-k window. The
  * per-token sims are float32 codegen kernels ([[graft.functions.dot_product]]),
  * the max is order-insensitive, and the final sum runs in double over
  * ≤ |query tokens| terms, so cross-engine replay is stable.
  *
  * Scale shape (100 TB): [[maxSimTopK]] is the bounded brute tier
  * (score every doc — an audit/oracle surface, like the other exact
  * scoring tiers). The production path is [[maxSimRerank]]: a cheap
  * first stage (pooled-vector ANN / [[Ann.ivfSearchL2Pruned]], or
  * BM25) proposes `s` candidate docs per query, and the token-level
  * MaxSim runs only on the shortlist — every join an equi-join on
  * doc/query id, cost `O(queries × s × tokens²)`, independent of
  * corpus size. [[meanPoolTokens]] builds the first-stage single
  * vector from the token bag (mean pooling, the standard proxy).
  */
object LateInteraction {

  private def simCol(metric: String): (Column, Column) => Column =
    metric match {
      case "dot" => (a, b) => dot_product(a, b)
      case "cosine" => (a, b) => cosine_similarity(a, b)
      case other => throw new IllegalArgumentException(
        s"metric must be 'dot' or 'cosine', got '$other'")
    }

  /** Per-(query, doc) MaxSim over explicit candidate pairs: the core
    * both tiers share. `pairs` is a (qid, doc) relation; token frames
    * attach by equi-join, so nothing here is quadratic in the corpus.
    * Returns (qid, doc, score, n_qtok) with `score` the double sum of
    * per-query-token float32 max-sims.
    */
  def maxSimScores(pairs: DataFrame, qidCol: String, docCol: String,
      docTokens: DataFrame, dtokVecCol: String,
      queryTokens: DataFrame, qtokCol: String, qvecCol: String,
      metric: String = "dot"): DataFrame = {
    val sim = simCol(metric)
    pairs.select(col(qidCol), col(docCol))
      .join(docTokens, Seq(docCol))
      .join(queryTokens, Seq(qidCol))
      .withColumn("_sim", sim(col(qvecCol), col(dtokVecCol)))
      .groupBy(col(qidCol), col(docCol), col(qtokCol))
      .agg(max(col("_sim")).as("_maxsim"))
      .groupBy(col(qidCol), col(docCol))
      .agg(sum(col("_maxsim").cast("double")).as("score"),
        count(lit(1)).as("n_qtok"))
  }

  /** Brute-tier MaxSim top-k: every query scores every document —
    * exact by construction, O(docs × queries) pairs; the oracle/audit
    * surface. Ties break on doc id ascending (the shared contract).
    */
  def maxSimTopK(docTokens: DataFrame, docCol: String, dtokVecCol: String,
      queryTokens: DataFrame, qidCol: String, qtokCol: String,
      qvecCol: String, k: Int, metric: String = "dot"): DataFrame = {
    val pairs = docTokens.select(col(docCol)).distinct()
      .crossJoin(queryTokens.select(col(qidCol)).distinct())
    rankDesc(maxSimScores(pairs, qidCol, docCol, docTokens, dtokVecCol,
      queryTokens, qtokCol, qvecCol, metric), qidCol, docCol, k)
  }

  /** Production-tier MaxSim: re-rank a per-query candidate shortlist
    * (from pooled-vector ANN, BM25, or any first stage) by full
    * token-level MaxSim. Cost is O(|shortlist| × tokens²) regardless
    * of corpus size; recall is the first stage's recall (raise `s`
    * there, not here). Shortlist ids must reference `docTokens` rows.
    */
  def maxSimRerank(shortlist: DataFrame, qidCol: String, docCol: String,
      docTokens: DataFrame, dtokVecCol: String,
      queryTokens: DataFrame, qtokCol: String, qvecCol: String,
      k: Int, metric: String = "dot"): DataFrame =
    rankDesc(maxSimScores(shortlist, qidCol, docCol, docTokens, dtokVecCol,
      queryTokens, qtokCol, qvecCol, metric), qidCol, docCol, k)

  private def rankDesc(scored: DataFrame, qidCol: String, docCol: String,
      k: Int): DataFrame =
    SimilarityJoin.topKByDistance(
        scored.withColumn("_neg", -col("score")), qidCol, docCol, "_neg", k)
      .drop("_neg")

  /** Mean-pool a token bag to one single vector per doc — the standard
    * first-stage representation. posexplode → per-(doc, pos) avg (two
    * map-side-combinable aggregations) → re-assemble ordered by pos;
    * emitted as float32 so downstream kernels (and a DuckDB replay via
    * `CAST(avg(v) AS FLOAT)`) stay bit-comparable.
    */
  def meanPoolTokens(docTokens: DataFrame, docCol: String,
      vecCol: String): DataFrame =
    docTokens
      .select(col(docCol), posexplode(col(vecCol)).as(Seq("_pos", "_v")))
      .groupBy(col(docCol), col("_pos"))
      .agg(avg(col("_v")).as("_m"))
      .groupBy(col(docCol))
      .agg(transform(
        array_sort(collect_list(struct(col("_pos"), col("_m")))),
        s => s.getField("_m").cast("float")).as("pooled_vec"))
}
