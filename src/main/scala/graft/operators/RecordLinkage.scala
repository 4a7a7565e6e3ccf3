package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD '95):
    * order the records by `sortKey` and compare each record only with
    * the `window − 1` records that follow it in that order — the
    * classic complement to hash blocking ([[blockedEditPairs]]): a
    * hash block is all-or-nothing (a typo in the key loses the pair;
    * a degenerate key goes quadratic until the size gate drops it),
    * while the sorted neighborhood yields at most n·(window−1)
    * candidate pairs whatever the key distribution (the last window−1
    * records have fewer followers) — the standard
    * multi-pass remedy for its boundary blindness is a second pass
    * with a rotated key, which is just calling this again.
    *
    * Scale shape: the global rank is computed WITHOUT a single-
    * partition window — records bucket by a `prefixLen`-character
    * prefix of the sort key (a monotone function of it under binary
    * collation, so per-bucket order concatenates to the global
    * order), rank locally per bucket, and add broadcast per-bucket
    * offsets (the [[Packing.tokenSpans]] bucketed-cumsum pattern; the
    * offsets frame is |buckets| rows). Candidates come from
    * `window − 1` exploded rank deltas equi-joined on rank — a shuffle
    * of n·(window−1) slim rows, no range join, no quadratic anywhere.
    * A degenerate prefix (every key equal) costs one linear-sort task,
    * not a quadratic block.
    *
    * Returns (id_a, id_b, str_a, str_b, gap, dist): `gap` = rank
    * distance (1 ≤ gap < window), `dist` the thresholded Levenshtein
    * (pairs above `maxDist` dropped, like [[blockedEditPairs]]).
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, strCol: String,
      sortKey: Column, window: Int, maxDist: Int,
      prefixLen: Int = 2): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(prefixLen >= 1, s"prefixLen must be >= 1, got $prefixLen")
    val keyed = df.select(col(idCol).cast("long").as("_id"),
        col(strCol).as("_s"), sortKey.cast("string").as("_k"))
      .filter(col("_k").isNotNull)
      .withColumn("_bkt", substring(col("_k"), 1, prefixLen))
    val wloc = Window.partitionBy("_bkt").orderBy(col("_k"), col("_id"))
    val local = keyed.withColumn("_lrn",
      row_number().over(wloc).cast("long"))
    val offs = keyed.groupBy("_bkt").agg(count(lit(1)).as("_n"))
      .withColumn("_off",
        coalesce(sum(col("_n")).over(Window.orderBy("_bkt")), lit(0L))
          - col("_n"))
      .select("_bkt", "_off")
    val ranked = local.join(broadcast(offs), Seq("_bkt"))
      .withColumn("_rn", col("_off") + col("_lrn"))
      .select(col("_id"), col("_s"), col("_rn"))
    val lefts = ranked
      .withColumn("gap",
        explode(array((1 until window).map(d => lit(d.toLong)): _*)))
      .select(col("_id").as("id_a"), col("_s").as("str_a"), col("gap"),
        (col("_rn") + col("gap")).as("_rn"))
    lefts.join(ranked.select(col("_id").as("id_b"), col("_s").as("str_b"),
        col("_rn")), Seq("_rn"))
      .withColumn("dist", levenshtein(col("str_a"), col("str_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"),
        col("gap"), col("dist").cast("long").as("dist"))
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
