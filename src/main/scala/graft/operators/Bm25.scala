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
  * the idf weights embedded as literals.
  *
  * Two usage shapes:
  *   - [[score]] / [[topK]]: self-contained, one tokenization pass over
  *     `docs` shared by the stats reduce and the scoring projection.
  *   - [[fit]] once → [[scoreWith]] / [[topKWith]] many: the
  *     [[CorpusStats]] live on the driver (like a fitted
  *     [[LangModel.UnigramLM]]), so repeated retrieval — new query
  *     batches, different k — never re-scans the corpus for statistics.
  */
object Bm25 {

  /** Fitted corpus statistics — bounded driver state (one long, one
    * double, and a long per query term). `terms` are stored lowercased,
    * in fit order; `df(i)` is the document frequency of `terms(i)`.
    */
  case class CorpusStats(terms: Seq[String], n: Long, avgdl: Double, df: Seq[Long]) {
    require(terms.size == df.size, "one df per term required")

    /** Robertson idf with the Lucene-style `log(1 + ...)` floor, so idf
      * is always positive.
      */
    private[graft] def idf: Seq[Double] = df.map(d => robertsonIdf(n, d))

    /** An all-NULL-text corpus has every dl = 0, hence avgdl = 0, and
      * `dl/avgdl` would make every score 0/0 = NaN. Clamping to 1 keeps
      * the length norm finite; the scores are 0 anyway (every tf = 0).
      */
    private[graft] def avgdlSafe: Double = if (avgdl <= 0.0) 1.0 else avgdl
  }

  /** Robertson idf with the Lucene-style `log(1 + ...)` floor — the
    * ONE place the formula lives (stats fit here, posting-index route
    * in [[graft.store.VectorStore]]).
    */
  private[graft] def robertsonIdf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  private[operators] def lowercasedDistinct(terms: Seq[String]): Seq[String] = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // the tokenizer lowercases, so match terms in lowercase too — an
    // uppercase query term would otherwise silently score 0 everywhere
    val qTerms = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    require(qTerms.distinct.size == qTerms.size,
      s"duplicate query terms (after lowercasing): $terms")
    qTerms
  }

  /** Slim per-doc frame (idCol, dl, tf_0..tf_{m-1}) — one tokenization
    * pass, pure projection. tf per term: the lambda references only the
    * lambda var and a literal, so the token split evaluates once per row
    * (HOF-embedding hazard). coalesce(0): NULL text must contribute
    * dl=0/tf=0, not poison the corpus stats into SQL NULL (and an NPE
    * on the stats reads).
    */
  private def tfFrame(
      docs: DataFrame, idCol: String, textCol: String, qTerms: Seq[String]): DataFrame =
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(
        col(idCol) +: coalesce(size(col("_toks")), lit(0)).as("dl") +:
          qTerms.zipWithIndex.map { case (t, i) =>
            coalesce(size(filter(col("_toks"), x => x === lit(t))), lit(0)).as(s"tf_$i")
          }: _*)

  /** Stats from a tf frame: one partially-aggregated reduce to a single
    * row of driver state.
    */
  private def fitFromTf(withTf: DataFrame, qTerms: Seq[String]): CorpusStats = {
    val statsRow = withTf.agg(
      count(lit(1)).as("n"),
      avg(col("dl")).as("avgdl") +:
        qTerms.indices.map(i =>
          sum((col(s"tf_$i") > 0).cast("long")).as(s"df_$i")): _*).head()
    val n = statsRow.getLong(0)
    if (n == 0L)
      // avg/sum over zero rows are SQL NULL — don't read them
      CorpusStats(qTerms, 0L, 0.0, Seq.fill(qTerms.size)(0L))
    else
      CorpusStats(qTerms, n, statsRow.getDouble(1),
        qTerms.indices.map(i => statsRow.getLong(2 + i)))
  }

  /** The BM25 sum as a column over a tf frame's (dl, tf_i) columns,
    * with idf and avgdl embedded as literals.
    */
  private def scoreColumn(stats: CorpusStats, k1: Double, b: Double): Column =
    scoreTerms(stats, stats.terms.indices, k1, b)

  /** The BM25 sum restricted to `termIdxs` — shared by the whole-query
    * [[scoreColumn]] and [[topKBatch]]'s per-query projections so the
    * scoring formula exists exactly once.
    */
  private def scoreTerms(stats: CorpusStats, termIdxs: Seq[Int],
      k1: Double, b: Double): Column = {
    val idf = stats.idf
    termIdxs.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val norm = lit(k1) *
        (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(stats.avgdlSafe))
      lit(idf(i)) * tf * lit(k1 + 1.0) / (tf + norm)
    }.reduce(_ + _)
  }

  /** Fit corpus statistics once (one corpus scan, one row collected).
    * Reuse via [[scoreWith]] / [[topKWith]] for repeated retrieval.
    */
  def fit(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): CorpusStats = {
    val qTerms = lowercasedDistinct(terms)
    fitFromTf(tfFrame(docs, idCol, textCol, qTerms), qTerms)
  }

  /** Score `docs` against previously fitted stats: a single shuffle-free
    * projection pass, no corpus re-scan. `docs` need not be the fitted
    * corpus (score new batches against stable statistics). Stats fitted
    * on an empty corpus score everything 0.
    * Output: (idCol, dl, tf_0..tf_{m-1}, bm25).
    */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
      stats: CorpusStats, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val withTf = tfFrame(docs, idCol, textCol, stats.terms)
    if (stats.n == 0L) withTf.withColumn("bm25", lit(0.0))
    else withTf.withColumn("bm25", scoreColumn(stats, k1, b))
  }

  /** Per-document BM25 score against `terms`, fitting the stats on
    * `docs` itself. Output: (idCol, dl, tf_0..tf_{m-1}, bm25).
    *
    * The slim (id, dl, tf…) frame is eagerly checkpointed because BOTH
    * the stats aggregate and the scoring projection consume it — one
    * tokenization pass over the text instead of two (measured 12.5 s
    * → 6.6 s on the 100k-doc smoke; at 100 TB the saved pass is a full
    * corpus scan, traded for a checkpoint of ~6 ints per doc). The
    * returned frame reads from that checkpoint: callers own its
    * storage, and long-lived sessions can release it with
    * `GraftShim.unpersistLocalCheckpoint` once the result is consumed.
    */
  def score(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms = lowercasedDistinct(terms)
    val withTf = tfFrame(docs, idCol, textCol, qTerms).localCheckpoint()
    val stats = fitFromTf(withTf, qTerms)
    if (stats.n == 0L)
      // keep the full schema on the empty frame
      withTf.withColumn("bm25", lit(0.0)).limit(0)
    else
      withTf.withColumn("bm25", scoreColumn(stats, k1, b))
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
    rank(score(docs, idCol, textCol, terms, k1, b), idCol, k)
  }

  /** [[topK]] against previously fitted stats — no corpus re-scan. */
  def topKWith(
      docs: DataFrame, idCol: String, textCol: String, stats: CorpusStats,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    rank(scoreWith(docs, idCol, textCol, stats, k1, b), idCol, k)
  }

  /** Multi-query BM25 retrieval in ONE corpus pass: all queries'
    * terms tokenize together (one tf frame over the term union, one
    * stats reduce, one eager checkpoint), then the whole batch scores
    * RELATIONALLY — the queries melt into a broadcast
    * `(qid, term_idx, idf)` relation, the tf frame melts sparsely into
    * `(doc, term_idx, tf > 0)` rows, and one equi-join + one map-side-
    * combined aggregate produces every (qid, doc) score. Plan size is
    * O(1) in Q (the IVF-PQ r5 lesson: data in relations, never in plan
    * branches — the previous Q-way `unionAll` made Catalyst analysis
    * itself the bottleneck at Q=10³⁺, which is the batch shape
    * [[graft.store.VectorStore.searchHybrid]] grows into). Dropping
    * zero-tf terms is exact: Robertson idf with the Lucene floor is
    * strictly positive and tf = 0 contributes exactly 0.0, so the
    * sparse melt changes no score. The per-query top-k is the
    * aggregator reduction (per-partition heaps, never a corpus-sized
    * per-query shuffle). Ranking matches [[topK]]: rounded score desc,
    * id asc, positive scores only.
    *
    * Returns (qid, idCol, bm25, rank), rank 1..k per qid.
    */
  def topKBatch(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_._1).distinct.size == queries.size,
      s"duplicate qids in ${queries.map(_._1)}")
    val normQ = queries.map { case (qid, ts) => qid -> lowercasedDistinct(ts) }
    val allTerms = normQ.flatMap(_._2).distinct
    val withTf = tfFrame(docs, idCol, textCol, allTerms).localCheckpoint()
    val stats = fitFromTf(withTf, allTerms)
    val idx = allTerms.zipWithIndex.toMap
    val spark = docs.sparkSession
    import spark.implicits._
    val idf = stats.idf
    // |qRel| = total query terms — bounded driver state, broadcast side
    val qRel = normQ
      .flatMap { case (qid, ts) => ts.map(t => (qid, idx(t), idf(idx(t)))) }
      .toDF("_qid", "_ti", "_idf")
    // sparse doc melt: row count = matched (doc, term) pairs, not
    // |docs| x |terms|; zero-tf rows are exact zeros (see scaladoc)
    val tfLong = withTf
      .select(col(idCol), col("dl"),
        posexplode(array(allTerms.indices.map(i => col(s"tf_$i")): _*))
          .as(Seq("_ti", "_tf")))
      .filter(col("_tf") > 0)
    scorePairs(tfLong, idCol, qRel, stats.avgdlSafe, k, k1, b)
  }

  /** The shared relational scoring core: a sparse
    * `(idCol, dl, _ti, _tf)` matched-pair frame joined to a broadcast
    * `(_qid, _ti, _idf)` query relation, one map-side-combined sum per
    * (qid, doc), aggregator top-k — used by [[topKBatch]] (pairs from
    * the in-query tf melt) and by the store's posting-index route
    * ([[graft.store.VectorStore.searchLexDF]], pairs straight from the
    * persisted postings, no corpus tokenization at query time).
    *
    * Determinism: the per-(qid, doc) score is an ORDER-PINNED fold —
    * the matched contributions collect into (term_idx, contrib)
    * structs, `sort_array` totally orders them (term_idx is unique
    * per pair), and `aggregate` folds left-to-right in ascending
    * term_idx — so the double is bit-identical across partitionings,
    * repartition counts, and runs, and matches the DuckDB oracles,
    * which spell the sum as an explicit `c0 + c1 + ...` chain in the
    * same ascending term order (dropping tf = 0 terms stays exact:
    * adding 0.0 never changes a non-negative IEEE sum). Per-group
    * state is |query terms| structs — bounded, broadcast-sized.
    */
  private[graft] def scorePairs(pairs: DataFrame, idCol: String,
      qRel: DataFrame, avgdlSafe: Double, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = col("_tf").cast("double")
    val norm = lit(k1) *
      (lit(1.0 - b) + lit(b) * col("dl").cast("double") / lit(avgdlSafe))
    val contrib = col("_idf") * tf * lit(k1 + 1.0) / (tf + norm)
    val scored = pairs.join(broadcast(qRel), "_ti")
      .groupBy(col("_qid").as("qid"), col(idCol))
      .agg(sort_array(collect_list(
        struct(col("_ti").cast("int").as("ti"), contrib.as("c")))).as("_cs"))
      .select(col("qid"), col(idCol), graft.functions.hround(
        aggregate(col("_cs"), lit(0.0),
          (acc, x) => acc + x.getField("c")), 4).as("bm25"))
    TopKAggregator.topKRows(
        scored.withColumn("_neg", -col("bm25")), "qid", idCol, "_neg", k)
      .filter(col("_neg") < 0.0)
      .select(col("qid"), col(idCol), (-col("_neg")).as("bm25"),
        col("rn").cast("int").as("rank"))
  }

  private def rank(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored
      .withColumn("bm25", graft.functions.hround(col("bm25"), 4))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .filter(col("bm25") > 0.0)
      .select(col(idCol), col("bm25"))
}
