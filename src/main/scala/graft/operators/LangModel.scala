package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
