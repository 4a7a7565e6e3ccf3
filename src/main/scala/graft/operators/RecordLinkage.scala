package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution by blocked edit-distance join — the classic
  * record-linkage shape (Fellegi-Sunter blocking + string comparator):
  * candidate pairs come ONLY from rows sharing a blocking key, so the
  * quadratic comparator never sees the full corpus, then survivors are
  * clustered into entities with the existing O(log n) large/small-star
  * connected components.
  *
  * Scale shape: one groupBy on the blocking key bounds every block
  * (oversized blocks — the "Smith"/"null key" pathology that turns
  * blocking quadratic — are dropped with an explicit `oversized`
  * count, the [[Dedup]] giant-bucket backstop pattern); the pair join
  * is a key-equi self-join, shuffle-partitioned by block; the
  * comparator is Spark's codegen `levenshtein` with its threshold
  * short-circuit (bounded O(maxDist·len) per pair, -1 early-exit).
  * Nothing driver-side; no window over the corpus.
  */
object RecordLinkage {

  /** Candidate pairs within blocks at edit distance ≤ `maxDist`.
    *
    * Input: `df` with `idCol` (unique long) and `strCol` (the field to
    * compare — pass a pre-normalized column, e.g. lower/trim, since
    * the comparator is exact). `blockKey` is the blocking expression
    * evaluated on `df` (e.g. first token + length band). Blocks larger
    * than `maxBlock` rows are EXCLUDED from pairing (documented
    * recall trade; count them via [[blockSizes]]).
    *
    * Returns (id_a, id_b, str_a, str_b, block, dist) with id_a < id_b,
    * dist = exact Levenshtein distance ≤ maxDist.
    */
  def blockedEditPairs(df: DataFrame, idCol: String, strCol: String,
      blockKey: Column, maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxBlock >= 2, s"maxBlock must be >= 2, got $maxBlock")
    val keyed = df.select(col(idCol).cast("long").as("_id"),
        col(strCol).as("_s"), blockKey.as("block"))
      .filter(col("block").isNotNull)
    // block-size gate: one map-side-combined count, broadcast back —
    // at 100 TB the block histogram is tiny relative to the data and
    // the join below never materializes a quadratic block
    val sizes = keyed.groupBy("block").agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBlock)
    val inBlock = keyed.join(sizes, "block")
    val a = inBlock.select(col("block"), col("_id").as("id_a"),
      col("_s").as("str_a"))
    val b = inBlock.select(col("block"), col("_id").as("id_b"),
      col("_s").as("str_b"))
    // threshold form returns -1 above maxDist — O(maxDist·len) per
    // pair instead of full DP, and the filter keeps only real matches
    a.join(b, Seq("block")).filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"),
        col("block"), col("dist").cast("long").as("dist"))
  }

  /** Block-size histogram plus the oversized count — the audit a
    * blocking-key choice is judged by (too-selective keys → no pairs;
    * a degenerate key → quadratic blow-up).
    */
  def blockSizes(df: DataFrame, blockKey: Column,
      maxBlock: Int = 1000): DataFrame =
    df.select(blockKey.as("block")).filter(col("block").isNotNull)
      .groupBy("block").agg(count(lit(1)).as("n"))
      .withColumn("oversized", col("n") > maxBlock)

  /** Entity ids: connected components over [[blockedEditPairs]] edges.
    * Every row of `df` gets an entity (singletons keep their own id);
    * entity = the minimum member id, via [[Dedup.connectedComponents]]
    * (O(log n) star rounds, (long,long)-only shuffles).
    *
    * Returns (id, entity).
    */
  def resolveEntities(df: DataFrame, idCol: String, strCol: String,
      blockKey: Column, maxDist: Int, maxBlock: Int = 1000): DataFrame = {
    val pairs = blockedEditPairs(df, idCol, strCol, blockKey, maxDist,
      maxBlock)
    Dedup.connectedComponents(df, idCol, pairs, "id_a", "id_b")
      .withColumnRenamed("comp", "entity")
  }
}
