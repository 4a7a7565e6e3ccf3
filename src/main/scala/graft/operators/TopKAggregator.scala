package graft.operators

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

  /** Aggregation buffer: the current top-k as parallel primitive arrays
    * in ascending (dist, id) order. A product type over primitive
    * arrays serializes through Spark's native unsafe-row encoder
    * (codegen'd, no kryo reflection) — the buffer serde is what
    * dominates this aggregator's cost at small n.
    */
  case class TopKBuf(ids: Array[Long], dists: Array[Double])

  /** Bounded sorted-array buffer keeping the k smallest (dist, id)
    * pairs. After the buffer fills, most rows fail the O(1) bound check
    * against the current worst; accepted rows pay one O(k) insertion.
    */
  private final class TopKAgg(k: Int) extends Aggregator[Cand, TopKBuf, Seq[Cand]] {

    override def zero: TopKBuf = TopKBuf(Array.emptyLongArray, Array.emptyDoubleArray)

    // SQL comparison semantics, matching the window form exactly:
    // NaN sorts greater than everything and equal to itself; -0.0 and
    // 0.0 are equal (raw < / == would make every NaN comparison false,
    // letting NaN candidates block finite ones)
    private def sqlNorm(d: Double): Double = if (d == 0.0) 0.0 else d
    private def beats(d1: Double, i1: Long, d2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(sqlNorm(d1), sqlNorm(d2))
      c < 0 || (c == 0 && i1 < i2)
    }

    override def reduce(b: TopKBuf, a: Cand): TopKBuf = {
      val n = b.ids.length
      if (k <= 0) return b // k = 0: empty result, like the window form's rn <= 0
      if (n == k && !beats(a.dist, a.id, b.dists(n - 1), b.ids(n - 1))) return b
      // position of the first element the candidate beats
      var pos = n
      var i = 0
      var found = false
      while (i < n && !found) {
        if (beats(a.dist, a.id, b.dists(i), b.ids(i))) { pos = i; found = true }
        i += 1
      }
      val outN = math.min(k, n + 1)
      val ids = new Array[Long](outN)
      val dists = new Array[Double](outN)
      System.arraycopy(b.ids, 0, ids, 0, pos)
      System.arraycopy(b.dists, 0, dists, 0, pos)
      if (pos < outN) {
        ids(pos) = a.id; dists(pos) = a.dist
        val tail = outN - pos - 1
        if (tail > 0) {
          System.arraycopy(b.ids, pos, ids, pos + 1, tail)
          System.arraycopy(b.dists, pos, dists, pos + 1, tail)
        }
      }
      TopKBuf(ids, dists)
    }

    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
      val (n1, n2) = (b1.ids.length, b2.ids.length)
      if (n2 == 0) return b1
      if (n1 == 0) return b2
      val outN = math.min(k, n1 + n2)
      val ids = new Array[Long](outN)
      val dists = new Array[Double](outN)
      var (i, j, o) = (0, 0, 0)
      while (o < outN) {
        val takeLeft = j >= n2 ||
          (i < n1 && beats(b1.dists(i), b1.ids(i), b2.dists(j), b2.ids(j)))
        if (takeLeft) { ids(o) = b1.ids(i); dists(o) = b1.dists(i); i += 1 }
        else { ids(o) = b2.ids(j); dists(o) = b2.dists(j); j += 1 }
        o += 1
      }
      TopKBuf(ids, dists)
    }

    override def finish(b: TopKBuf): Seq[Cand] =
      b.ids.indices.map(i => Cand(b.ids(i), b.dists(i)))

    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
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
