package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance reranking (Carbonell & Goldstein 1998):
  * greedily pick from a retrieval shortlist the candidate maximizing
  * `lambda * relevance - (1 - lambda) * max_sim_to_already_picked` —
  * the standard diversity pass between ANN retrieval and a consumer
  * that dislikes near-duplicate hits.
  *
  * Scale shape: MMR is inherently sequential in k, so it runs on the
  * DRIVER over per-query shortlists — the same contract as the
  * reference store's `search` collect (a shortlist is top-N of a
  * distributed retrieval, N bounded). The distributed stages
  * (candidate generation) stay in [[SimilarityJoin]] / [[Ann]]; this
  * is deliberately a post-processing step, not a Spark job.
  *
  * `lambda = 1` degenerates to plain relevance order (gate-checked
  * against the distributed top-k). Ties break on lower id.
  */
object Mmr {

  /** Rerank `candidates` (qidCol, idCol, scoreCol — larger is better,
    * vecCol) down to `k` per query. Returns (qid, id, rank, mmr_score).
    */
  def rerank(
      candidates: DataFrame, qidCol: String, idCol: String,
      scoreCol: String, vecCol: String, k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val rows = candidates
      .select(col(qidCol).cast("long"), col(idCol).cast("long"),
        col(scoreCol).cast("double"), col(vecCol))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getSeq[Float](3).toArray))

    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    val out = rows.groupBy(_._1).toSeq.flatMap { case (qid, cands) =>
      var pool = cands.sortBy(c => (-c._3, c._2)).toList
      var picked = List.empty[(Long, Long, Int, Double)] // qid, id, rank, score
      var chosen = List.empty[Array[Float]]
      var rank = 1
      while (rank <= k && pool.nonEmpty) {
        val scored = pool.map { c =>
          val div = if (chosen.isEmpty) 0.0 else chosen.map(cos(c._4, _)).max
          (lambda * c._3 - (1.0 - lambda) * div, c)
        }
        // max mmr score, ties to lower id
        val (s, best) = scored.minBy { case (ms, c) => (-ms, c._2) }
        picked ::= ((qid, best._2, rank, s))
        chosen ::= best._4
        pool = pool.filterNot(_._2 == best._2)
        rank += 1
      }
      picked.reverse
    }
    out.toDF("qid", "id", "rank", "mmr_score")
  }
}
