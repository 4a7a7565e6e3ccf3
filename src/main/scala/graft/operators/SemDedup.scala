package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.cosine_similarity

/** Semantic deduplication in the SemDeDup shape (Abbas et al. 2023):
  * spherical k-means partitions the embedding space, then near-duplicate
  * pairs are searched only WITHIN each cluster. The O(n²) all-pairs
  * cosine join becomes k independent O((n/k)²) equi-join cells — at
  * 100 TB the candidate join shuffles on `centroid_id` and each cell is
  * a bounded task, where the exact form is a single unshardable cross
  * join. Cross-cluster duplicates are the (documented) recall trade;
  * precision stays 1.0 because every emitted pair carries its exact
  * cosine score (gated by containment in the exact pair set).
  */
object SemDedup {

  /** Within-cluster cosine near-duplicate pairs (a_id < b_id).
    * Each row lands in exactly one cluster, so a pair is emitted at
    * most once — no dedup pass needed.
    */
  def semanticNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nClusters: Int, iters: Int = 3): DataFrame = {
    require(nClusters >= 1, s"nClusters must be >= 1, got $nClusters")
    val (indexed, _) = Ann.ivfBuildCosine(df, idCol, vecCol, nClusters, iters)
    val slim = indexed.select(col("centroid_id"), col(idCol), col(vecCol))
    val a = slim.select(col("centroid_id"), col(idCol).as("a_id"), col(vecCol).as("a_vec"))
    val b = slim.select(col("centroid_id"), col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    a.join(b, Seq("centroid_id"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosine_similarity(col("a_vec"), col("b_vec")))
      .filter(col("sim") > threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** Survivor ids after semantic dedup: for every near-dup pair the
    * higher id is dropped (keep-lowest, matching [[Dedup.exactDedup]]'s
    * keep-min convention). Plain anti-join — on a duplicate-heavy
    * corpus the drop list is O(n), far past any broadcast bound, so
    * strategy choice is left to the planner/AQE (same shape as
    * [[Dedup.exactDedup]]'s keep join).
    */
  def semanticDedupKeep(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double,
      nClusters: Int, iters: Int = 3): DataFrame = {
    val drops = semanticNearDupPairs(df, idCol, vecCol, threshold, nClusters, iters)
      .select(col("b_id").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }
}
