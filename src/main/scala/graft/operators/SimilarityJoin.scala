package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, l2_distance}

/** Distributed brute-force k-NN similarity join — the scale-out analogue
  * of the reference's per-query NumPy distance scan
  * (reference: vector_store.py:287-298).
  *
  * Plan shape: `index CROSS JOIN broadcast(queries)` → codegen distance
  * expression → per-query top-k. The index side streams partition-by-
  * partition (never collected), the query side is broadcast — at cluster
  * scale this is an embarrassingly parallel map over index partitions
  * followed by a shuffle of only `numQueries × k × partitions` candidate
  * rows when `partialTopK` is enabled.
  */
object SimilarityJoin {

  /** Per-query top-k by a distance column, ties broken by `idCol`
    * (insertion order — reference argsort parity, SURVEY.md §2.4).
    *
    * Window implementation: shuffles all scored candidates by `qidCol`
    * then ranks. Deterministic and simple; for the scale path that
    * shuffles only `k` candidates per (partition, query) see
    * [[TopKAggregator.topK]], which rides Spark's map-side partial
    * aggregation.
    */
  def topKByDistance(
      scored: DataFrame,
      qidCol: String,
      idCol: String,
      distCol: String,
      k: Int): DataFrame = {
    import scored.sparkSession.implicits._
    val w = Window.partitionBy(col(qidCol)).orderBy(col(distCol).asc, col(idCol).asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
  }

  /** Brute-force L2 k-NN: one row per (query, neighbor, rank). */
  def knnL2(
      index: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    val scored = index
      .crossJoin(broadcast(queries))
      .withColumn("distance", l2_distance(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("distance"))
    topKByDistance(scored, qidCol, idCol, "distance", k)
  }

  /** Brute-force cosine top-k (descending similarity). */
  def knnCosine(
      index: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int): DataFrame = {
    import index.sparkSession.implicits._
    val scored = index
      .crossJoin(broadcast(queries))
      .withColumn("sim", cosine_similarity(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("sim"))
      // negate so the shared ascending top-k machinery ranks high-sim first
      .withColumn("negSim", -$"sim")
    topKByDistance(scored, qidCol, idCol, "negSim", k).drop("negSim")
  }

  /** All pairs (a < b) above a cosine-similarity threshold — embedding
    * near-duplicate detection. O(n²) scoring parallelized over the join;
    * for the 100 TB path see [[Ann.lshCosineNearDupPairs]] which buckets
    * by random-hyperplane signature first (equi-join, no cross join).
    */
  def cosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val b = df.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim", cosine_similarity(col("a_vec"), col("b_vec")))
      .filter(col("sim") > threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** Hard-negative mining for contrastive training: for each anchor,
    * the `k` most-similar rows whose label DIFFERS from the anchor's —
    * the high-loss negatives an embedding model learns most from.
    * Same broadcast-scan + bounded top-k shape as [[knnCosine]], with
    * the label inequality pushed into the scan filter; at cluster
    * scale swap the scan for an [[Ann]] candidate stage and keep the
    * filter.
    *
    * Anchors carry (qid, qvec, qlabel); output
    * (qid, id, sim, rn ≤ k).
    */
  def hardNegatives(
      index: DataFrame, idCol: String, vecCol: String, labelCol: String,
      anchors: DataFrame, qidCol: String, qvecCol: String, qlabelCol: String,
      k: Int): DataFrame = {
    import index.sparkSession.implicits._
    val scored = index
      .crossJoin(broadcast(anchors))
      .filter(col(labelCol) =!= col(qlabelCol))
      .withColumn("sim", cosine_similarity(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("sim"))
      .withColumn("negSim", -$"sim")
    topKByDistance(scored, qidCol, idCol, "negSim", k).drop("negSim")
  }
}
