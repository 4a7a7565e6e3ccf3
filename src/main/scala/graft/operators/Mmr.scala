package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance reranking (Carbonell & Goldstein 1998):
  * greedily pick from a retrieval shortlist the candidate maximizing
  * `lambda * relevance - (1 - lambda) * max_sim_to_already_picked` —
  * the standard diversity pass between ANN retrieval and a consumer
  * that dislikes near-duplicate hits.
  *
  * Scale shape: MMR is sequential in k but INDEPENDENT ACROSS QUERIES,
  * so the batch path [[rerankDistributed]] runs the greedy kernel per
  * query on the executors (`groupByKey(qid).flatMapGroups` — one
  * shuffle of the shortlists, driver never sees a vector); per-group
  * state is one bounded shortlist (top-N of a distributed retrieval).
  * [[rerank]] is the ad-hoc driver form for a handful of queries —
  * same kernel, same results, bounded by `maxDriverRows`.
  *
  * `lambda = 1` degenerates to plain relevance order (gate-checked
  * against the distributed top-k). Ties break on lower id.
  */
object Mmr {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The greedy kernel for ONE query's shortlist `(id, score, vec)` →
    * `(id, rank, mmr_score)`. Shared verbatim by the driver and
    * distributed forms, so the two are result-identical by
    * construction.
    */
  private def greedy(
      cands: Seq[(Long, Double, Array[Float])], k: Int,
      lambda: Double): List[(Long, Int, Double)] = {
    var pool = cands.sortBy(c => (-c._2, c._1)).toList
    var picked = List.empty[(Long, Int, Double)]
    var chosen = List.empty[Array[Float]]
    var rank = 1
    while (rank <= k && pool.nonEmpty) {
      val scored = pool.map { c =>
        val div = if (chosen.isEmpty) 0.0 else chosen.map(cos(c._3, _)).max
        (lambda * c._2 - (1.0 - lambda) * div, c)
      }
      // max mmr score, ties to lower id
      val (s, best) = scored.minBy { case (ms, c) => (-ms, c._1) }
      picked ::= ((best._1, rank, s))
      chosen ::= best._3
      pool = pool.filterNot(_._1 == best._1)
      rank += 1
    }
    picked.reverse
  }

  private def validate(k: Int, lambda: Double): Unit = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
  }

  /** Typed `(qid, id, score, vec)` projection both forms read —
    * `vecCol` is cast to `array<float>` so double-typed embedding
    * columns work instead of class-cast failing.
    */
  private def typedCands(
      candidates: DataFrame, qidCol: String, idCol: String,
      scoreCol: String, vecCol: String) =
    candidates.select(
      col(qidCol).cast("long"), col(idCol).cast("long"),
      col(scoreCol).cast("double"), col(vecCol).cast("array<float>"))

  /** Rerank `candidates` (qidCol, idCol, scoreCol — larger is better,
    * vecCol) down to `k` per query on the DRIVER. Returns
    * (qid, id, rank, mmr_score). Refuses frames above `maxDriverRows`
    * (collected whole) — send large batches to [[rerankDistributed]].
    */
  def rerank(
      candidates: DataFrame, qidCol: String, idCol: String,
      scoreCol: String, vecCol: String, k: Int, lambda: Double,
      maxDriverRows: Int = 1 << 20): DataFrame = {
    validate(k, lambda)
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = typedCands(candidates, qidCol, idCol, scoreCol, vecCol)
      .limit(maxDriverRows + 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getSeq[Float](3).toArray))
    require(rows.length <= maxDriverRows,
      s"driver rerank got > $maxDriverRows candidate rows; " +
        "use rerankDistributed for large query batches")
    val out = rows.groupBy(_._1).toSeq.flatMap { case (qid, cands) =>
      greedy(cands.map(c => (c._2, c._3, c._4)).toSeq, k, lambda)
        .map { case (id, rank, s) => (qid, id, rank, s) }
    }
    out.toDF("qid", "id", "rank", "mmr_score")
  }

  /** The batch path: same greedy kernel, run per query ON THE
    * EXECUTORS. One shuffle groups each query's shortlist; memory per
    * task is one shortlist, and the driver only ever sees the final
    * (qid, id, rank, mmr_score) rows the caller asks for.
    */
  def rerankDistributed(
      candidates: DataFrame, qidCol: String, idCol: String,
      scoreCol: String, vecCol: String, k: Int, lambda: Double): DataFrame = {
    validate(k, lambda)
    val spark = candidates.sparkSession
    import spark.implicits._
    typedCands(candidates, qidCol, idCol, scoreCol, vecCol)
      .as[(Long, Long, Double, Seq[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.map(c => (c._2, c._3, c._4.toArray)).toSeq
        greedy(cands, k, lambda).iterator
          .map { case (id, rank, s) => (qid, id, rank, s) }
      }
      .toDF("qid", "id", "rank", "mmr_score")
  }
}
