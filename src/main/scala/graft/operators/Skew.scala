package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * Scope note: algebraic aggregates (count/sum/min/max/avg) already
  * survive key skew via map-side partial aggregation — each reducer
  * sees at most one partial row per key per map partition, so salting
  * adds an exchange for nothing. Salting matters for **holistic**
  * aggregation state (distinct sets, collect_list, large percentile
  * sketches) where the reducer for a heavy key must hold that key's
  * whole value set. `saltedCountSum` is kept as the didactic two-phase
  * shape (and as an oracle-checked equivalence); `saltedCountDistinct`
  * is the genuinely skew-safe variant: the heavy key's distinct-set
  * state is split across `saltBuckets` value-hash sub-groups. AQE's
  * skew-join splitting covers the join-side case at runtime.
  */
object Skew {

  /** Salted count+sum aggregation: semantically identical to
    * `df.groupBy(keys).agg(count, sum(valueCol))` for any data, safe
    * under extreme key skew.
    */
  def saltedCountSum(
      df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }

  /** Salted distinct-count via two-phase set splitting: exact distinct
    * under skew (each (key, hash-bucket-of-value) pair deduplicates
    * independently, then counts sum).
    */
  def saltedCountDistinct(
      df: DataFrame, keyCol: String, valueCol: String,
      saltBuckets: Int = 16): DataFrame =
    df
      .filter(col(valueCol).isNotNull) // count(DISTINCT x) excludes NULLs
      .withColumn("_vb", pmod(hash(col(valueCol)), lit(saltBuckets)))
      .select(col(keyCol), col("_vb"), col(valueCol))
      .distinct()
      .groupBy(col(keyCol), col("_vb"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col(keyCol))
      .agg(sum(col("_n")).as("n_distinct"))

  /** Salted inner equi-join for extreme key skew: replicate the SMALL
    * side `saltFactor`× (one full copy per salt bucket) and scatter
    * the skewed side's rows across buckets by a deterministic hash of
    * `bigSaltExpr` — the manual treatment for when AQE's skew-join
    * split cannot help (a single key too hot for any split target, a
    * build side that must stay shuffled, or a non-AQE context like a
    * streaming micro-batch join). The result is IDENTICAL to
    * `big.join(small, keys)`: a skewed row lands in exactly one salt
    * bucket, and that bucket holds a complete copy of the small
    * side's rows for its key, so every matching pair meets exactly
    * once. Cost: the small side shuffles `saltFactor`× its size; the
    * hot key's rows spread over `saltFactor` reducers instead of one.
    *
    * `bigSaltExpr` must be deterministic per row (any column works —
    * even the join key's companion attributes; prefer a high-
    * cardinality one so buckets balance).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, bigSaltExpr: Column): DataFrame = {
    require(keys.nonEmpty, "need at least one join key")
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not contain a column named _salt (reserved by saltedJoin)")
    val s = small.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    val b = big.withColumn("_salt",
      pmod(hash(bigSaltExpr), lit(saltFactor)))
    b.join(s, keys :+ "_salt").drop("_salt")
  }
}
