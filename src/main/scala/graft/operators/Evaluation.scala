package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-evaluation metrics — the measurement half of a search
  * engine: given a ranked run and a relevant set per query, score
  * recall@k, MRR@k, and binary NDCG@k. An ANN configuration is only
  * "done" when these numbers are on the table (the ann_* gates check
  * exactness contracts; these ops measure graded degradation).
  *
  * Shape: one equi-join of run against truth on (query, id) and one
  * per-query aggregation — metrics at any corpus size cost two
  * map-side-combined shuffles on the run, never a scan of the corpus.
  */
object Evaluation {

  /** Per-query metrics for a ranked `run` (qidCol, idCol, rankCol;
    * rank 1 = best) against binary `truth` (qidCol, idCol):
    * (qid, n_relevant, hits, recall, mrr, ndcg) — all @k.
    *
    * NDCG uses binary gains: DCG = Σ_hits 1/log2(rank+1), normalized
    * by the ideal DCG of min(k, n_relevant) hits. Queries present in
    * `truth` but absent from the run score zero; queries only in the
    * run are dropped (no truth, nothing to measure).
    */
  def rankedMetrics(
      run: DataFrame, truth: DataFrame,
      qidCol: String, idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // dedupe defensively: a duplicated (qid, id) truth row would
    // double-count through the left join and inflate recall/dcg past 1
    val t = truth.select(col(qidCol), col(idCol)).dropDuplicates(qidCol, idCol)
    val nRel = t.groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_relevant"))
    val joined = run.filter(col(rankCol) <= k)
      .join(t.withColumn("_rel", lit(1)),
        Seq(qidCol, idCol), "left_outer")
    val perQ = joined.groupBy(col(qidCol)).agg(
      sum(coalesce(col("_rel"), lit(0))).cast("long").as("hits"),
      min(when(col("_rel") === 1, col(rankCol))).as("_first_hit"),
      sum(when(col("_rel") === 1,
        lit(1.0) / log2(col(rankCol).cast("double") + 1.0))
        .otherwise(0.0)).as("_dcg"))
    val idealDcg = {
      // Σ_{r=1..m} 1/log2(r+1) for m = min(k, n_relevant), as a
      // literal-array lookup (k is a small constant)
      val prefix = (1 to k).scanLeft(0.0)((acc, r) => acc + 1.0 / (math.log(r + 1.0) / math.log(2.0))).tail
      element_at(lit(prefix.toArray), least(col("n_relevant"), lit(k)).cast("int"))
    }
    nRel.join(perQ, Seq(qidCol), "left_outer")
      .select(
        col(qidCol),
        col("n_relevant"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double")
          / least(col("n_relevant"), lit(k.toLong))).as("recall"),
        coalesce(lit(1.0) / col("_first_hit"), lit(0.0)).as("mrr"),
        (coalesce(col("_dcg"), lit(0.0)) / idealDcg).as("ndcg"))
  }
}
