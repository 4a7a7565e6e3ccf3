package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/** Unigram language-model perplexity scoring — the classic
  * CCNet/KenLM-style quality signal: documents whose token
  * distribution diverges from the corpus (or from a trusted reference
  * corpus) score high perplexity and get filtered or down-weighted.
  *
  * Scale shape: training the model is ONE token-count aggregation
  * (explode + map-side-combined groupBy, shuffle bounded by distinct
  * vocabulary); the fitted model is `vocabSize` (token, logp) rows of
  * driver state — the k-means-centroid pattern — and scoring embeds it
  * as a literal map, making the scoring pass a pure shuffle-free
  * projection at any corpus size.
  */
object LangModel {

  /** A fitted unigram model: Laplace-smoothed log-probabilities for the
    * top-`vocabSize` tokens plus the out-of-vocabulary floor.
    */
  final case class UnigramLM(logProbs: Map[String, Double], oovLogProb: Double)

  /** Fit on a corpus: token counts, deterministic top-`vocabSize`
    * vocabulary (count desc, token asc tie-break), Laplace smoothing
    * with pseudo-count `alpha`:
    * `p(t) = (count_t + alpha) / (total + alpha * (V + 1))`, with the
    * +1 reserving one pseudo-class for every OOV token.
    */
  def fitUnigram(
      docs: DataFrame, textCol: String, vocabSize: Int,
      alpha: Double = 1.0): UnigramLM = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    // persisted: BOTH the total and the top-V collect consume this
    // frame — without it the corpus-wide explode+aggregate runs twice
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .persist()
    try {
      // total over ALL tokens (pruned mass stays in the denominator so
      // probabilities remain honest), vocab = deterministic top-V.
      // sum over zero rows is SQL NULL: an empty/all-NULL corpus yields
      // the degenerate all-OOV model (empty vocab, p_oov = 1), not NPE.
      val totalRow = counts.agg(sum(col("c"))).head()
      val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
      val vocab = counts.orderBy(col("c").desc, col("t")).limit(vocabSize)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val v = vocab.length
      val denom = total + alpha * (v + 1)
      UnigramLM(
        vocab.map { case (t, c) => t -> math.log((c + alpha) / denom) }.toMap,
        math.log(alpha / denom))
    } finally counts.unpersist()
  }

  /** Perplexity column `exp(-mean log p(token))` for a token-array
    * column under the fitted model (empty/NULL token arrays score
    * NULL). The model rides along as ONE literal map expression — the
    * lookup never joins or shuffles.
    */
  def perplexityCol(lm: UnigramLM, toks: Column): Column = {
    val entries = lm.logProbs.toSeq.sortBy(_._1)
    val m =
      if (entries.isEmpty) typedLit(Map.empty[String, Double])
      else map(entries.flatMap { case (t, p) => Seq(lit(t), lit(p)) }: _*)
    val sumLp = aggregate(toks, lit(0.0),
      (acc, t) => acc + coalesce(element_at(m, t), lit(lm.oovLogProb)))
    when(size(toks) > 0, exp(-sumLp / size(toks)))
  }

  /** Per-document perplexity: (idCol, perplexity). */
  def perplexity(
      docs: DataFrame, idCol: String, textCol: String, lm: UnigramLM): DataFrame =
    docs.select(col(idCol),
      perplexityCol(lm, TextAnalysis.tokens(col(textCol))).as("perplexity"))

  // --------------------------- bigram model ---------------------------- //

  /** Key separator for bigram map entries — a control char that survives
    * neither whitespace tokenization nor the corpus alphabet.
    */
  private[graft] val PairSep = "\u0001"

  /** A fitted interpolated bigram model (Jelinek-Mercer):
    * `p(t | prev) = lambda * pML(t | prev) + (1 - lambda) * pUni(t)`
    * where `pML` is the maximum-likelihood bigram ratio over the
    * retained top-`maxPairs` pairs (a dropped or unseen pair scores 0,
    * falling back to the unigram term — capping IS the unseen case),
    * and `pUni` is Laplace-smoothed with an OOV floor. `pUni > 0`
    * everywhere keeps every token's probability positive.
    *
    * Stored as direct probabilities (not logs) because interpolation
    * adds in probability space.
    */
  final case class BigramLM(
      pUni: Map[String, Double], pOov: Double,
      ratios: Map[String, Double], lambda: Double)

  /** Fit on a corpus: ONE tokenize pass (checkpointed token frame)
    * feeds both the unigram counts and the consecutive-pair counts.
    * Driver state is bounded: `vocabSize` unigram probs +
    * `maxPairs` bigram ratios (top pairs by count desc, pair asc).
    * Pair left-totals (`c(prev, *)`) come from the FULL pair frame, so
    * retained ratios are honest ML estimates, not renormalized over
    * the cap.
    */
  def fitBigram(
      docs: DataFrame, textCol: String, vocabSize: Int, maxPairs: Int,
      alpha: Double = 1.0, lambda: Double = 0.7): BigramLM = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPairs >= 1, s"maxPairs must be >= 1, got $maxPairs")
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val toks = docs
      .select(TextAnalysis.tokens(col(textCol)).as("ts"))
      .filter(size(col("ts")) > 0)
      .localCheckpoint() // one corpus scan for both aggregations
    try {
      val counts = toks.select(explode(col("ts")).as("t"))
        .groupBy("t").agg(count(lit(1)).as("c")).persist()
      val (uniProbs, oov) =
        try {
          val totalRow = counts.agg(sum(col("c"))).head()
          val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
          val vocab = counts.orderBy(col("c").desc, col("t")).limit(vocabSize)
            .collect().map(r => r.getString(0) -> r.getLong(1))
          val denom = total + alpha * (vocab.length + 1)
          (vocab.map { case (t, c) => t -> ((c + alpha) / denom) }.toMap,
            alpha / denom)
        } finally counts.unpersist()
      // consecutive pairs: zip the token array with its own shift — the
      // wordShingles trick, with a non-text separator
      val pairKeys = filter(
        zip_with(col("ts"), slice(col("ts"), lit(2), size(col("ts"))),
          (a, b) => concat(a, lit(PairSep), b)),
        x => x.isNotNull)
      val pairCounts = toks.select(explode(pairKeys).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("c")).persist()
      val ratios =
        try {
          val top = pairCounts.orderBy(col("c").desc, col("pair")).limit(maxPairs)
            .collect().map(r => r.getString(0) -> r.getLong(1))
          val prevs = top.map(_._1.split(PairSep, 2)(0)).distinct.toSeq
          val lefts = pairCounts
            .withColumn("prev", split(col("pair"), PairSep).getItem(0))
            .filter(col("prev").isInCollection(prevs))
            .groupBy("prev").agg(sum(col("c")).as("n"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          top.map { case (pair, c) =>
            pair -> c.toDouble / lefts(pair.split(PairSep, 2)(0))
          }.toMap
        } finally pairCounts.unpersist()
      BigramLM(uniProbs, oov, ratios, lambda)
    } finally GraftShim.unpersistLocalCheckpoint(toks)
  }

  /** Interpolated-bigram perplexity for a token array: the first token
    * scores `pUni`, every later token `lambda*pML + (1-lambda)*pUni`;
    * `exp(-mean log p)` (empty/NULL arrays score NULL). Both model maps
    * ride along as literal expressions — scoring never joins or
    * shuffles, the tx_perplexity scale shape.
    */
  def bigramPerplexityCol(lm: BigramLM, toks: Column): Column = {
    def litMap(m: Map[String, Double]): Column = {
      val entries = m.toSeq.sortBy(_._1)
      if (entries.isEmpty) typedLit(Map.empty[String, Double])
      else map(entries.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    }
    val mUni = litMap(lm.pUni)
    val mBi = litMap(lm.ratios)
    def pUni(t: Column) = coalesce(element_at(mUni, t), lit(lm.pOov))
    val tail = slice(toks, lit(2), size(toks))
    val pairKeys = filter(
      zip_with(toks, tail, (a, b) => concat(a, lit(PairSep), b)),
      x => x.isNotNull)
    val restLp = aggregate(
      zip_with(pairKeys, tail, (k, t) => log(
        lit(lm.lambda) * coalesce(element_at(mBi, k), lit(0.0))
          + lit(1.0 - lm.lambda) * pUni(t))),
      lit(0.0), (acc, lp) => acc + lp)
    val sumLp = log(pUni(element_at(toks, 1))) + restLp
    when(size(toks) > 0, exp(-sumLp / size(toks)))
  }

  /** Per-document interpolated-bigram perplexity: (idCol, perplexity).
    *
    * Literal-map scoring: right for BOUNDED models (a few hundred
    * entries) — `element_at` on a map literal is a LINEAR scan per
    * lookup, so cost grows with `vocabSize + maxPairs` per token (the
    * 1k-vocab/4k-pair smoke model scored 100k docs in 41 s this way).
    * For open-vocabulary models use [[bigramPerplexityJoin]].
    */
  def bigramPerplexity(
      docs: DataFrame, idCol: String, textCol: String, lm: BigramLM): DataFrame =
    docs.select(col(idCol),
      bigramPerplexityCol(lm, TextAnalysis.tokens(col(textCol))).as("perplexity"))

  /** Join-form scoring — the open-vocabulary scale path: the model
    * ships as two tiny frames hash-joined (broadcast) against the
    * exploded token stream, so per-token cost is a hash probe, not a
    * linear map scan. Shuffle volume = one (doc, pos, token) explode +
    * the per-doc average. Same model semantics as
    * [[bigramPerplexityCol]]; per-doc mean is a float sum in shuffle
    * order rather than token order (differences O(1e-15) — round
    * before hash-comparing). Docs with zero tokens produce no row.
    */
  def bigramPerplexityJoin(
      docs: DataFrame, idCol: String, textCol: String, lm: BigramLM): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val uniDF = broadcast(lm.pUni.toSeq.toDF("t", "p_uni"))
    val biDF = broadcast(lm.ratios.toSeq
      .map { case (k, r) =>
        val Array(prev, tok) = k.split(PairSep, 2); (prev, tok, r)
      }
      .toDF("b_prev", "b_tok", "r"))
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "t")))
    val withPrev = toks.withColumn("prev",
      lag(col("t"), 1).over(org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")))
    val scored = withPrev
      .join(uniDF, Seq("t"), "left_outer")
      .join(biDF,
        col("prev") === col("b_prev") && col("t") === col("b_tok"), "left_outer")
      .withColumn("p",
        when(col("pos") === 0, coalesce(col("p_uni"), lit(lm.pOov)))
          .otherwise(lit(lm.lambda) * coalesce(col("r"), lit(0.0))
            + lit(1.0 - lm.lambda) * coalesce(col("p_uni"), lit(lm.pOov))))
    scored.groupBy("doc_id")
      .agg(exp(-avg(log(col("p")))).as("perplexity"))
  }
}
