package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Scale-path per-key top-k: a typed [[Aggregator]] registered as a UDAF
  * so Spark performs **map-side partial aggregation** — each input
  * partition reduces to at most k candidates per key before the shuffle.
  *
  * Contrast with the window top-k (shuffle ALL n·q scored rows, then
  * rank): here shuffle volume is `partitions × queries × k`, independent
  * of index size — the property that keeps a 100 TB brute-force k-NN scan
  * network-bound on k, not on n. Semantics match the window variant:
  * ascending (distance, id) with insertion-order tie-break.
  */
object TopKAggregator {

  case class Cand(id: Long, dist: Double)

  /** Bounded max-heap buffer: keeps the k smallest (dist, id) pairs. */
  private final class TopKAgg(k: Int)
      extends Aggregator[Cand, mutable.PriorityQueue[Cand], Seq[Cand]] {
    private val ord: Ordering[Cand] = Ordering.by(c => (c.dist, c.id))
    override def zero: mutable.PriorityQueue[Cand] = mutable.PriorityQueue.empty(ord)
    override def reduce(b: mutable.PriorityQueue[Cand], a: Cand): mutable.PriorityQueue[Cand] = {
      b.enqueue(a)
      while (b.size > k) b.dequeue()
      b
    }
    override def merge(
        b1: mutable.PriorityQueue[Cand],
        b2: mutable.PriorityQueue[Cand]): mutable.PriorityQueue[Cand] = {
      b2.foreach(b1.enqueue(_))
      while (b1.size > k) b1.dequeue()
      b1
    }
    override def finish(b: mutable.PriorityQueue[Cand]): Seq[Cand] =
      b.toSeq.sortBy(c => (c.dist, c.id))
    override def bufferEncoder: Encoder[mutable.PriorityQueue[Cand]] =
      Encoders.kryo[mutable.PriorityQueue[Cand]]
    override def outputEncoder: Encoder[Seq[Cand]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Cand]]()
  }

  /** `df.groupBy(qid).agg(topK(...))` column: array of the k nearest
    * `{id, dist}` structs in ascending (dist, id) order.
    */
  def topK(k: Int, id: Column, dist: Column): Column = {
    val agg = udaf(new TopKAgg(k), Encoders.product[Cand])
    agg(id, dist)
  }

  /** Full per-query top-k as rows `(qid, id, distance, rn)` — the
    * aggregator-based equivalent of [[SimilarityJoin.topKByDistance]].
    */
  def topKRows(
      scored: DataFrame, qidCol: String, idCol: String, distCol: String, k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    scored
      .groupBy(col(qidCol))
      .agg(topK(k, col(idCol).cast("long"), col(distCol).cast("double")).as("top"))
      .select(col(qidCol), posexplode($"top").as(Seq("pos", "cand")))
      .select(
        col(qidCol),
        $"cand.id".as(idCol),
        $"cand.dist".as(distCol),
        ($"pos" + 1).as("rn"))
  }
}
