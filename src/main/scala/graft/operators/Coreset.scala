package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.hround

/** Diversity / coreset selection over an embedding column: greedy
  * k-center (farthest-point traversal, Gonzalez 1985) — pick the point
  * farthest from everything picked so far, k times. The classic
  * 2-approximation to the k-center cover, and the standard "give me k
  * maximally-diverse exemplars" primitive a training-data pipeline uses
  * for seed selection, dedup-cluster exemplars, and eval-slice picking.
  *
  * Spark shape: the chosen set is bounded driver state (k × dim
  * doubles — the centroid/codebook pattern); each round updates a
  * persisted per-row min-distance frame against ONLY the newest center
  * (one shuffle-free projection scan) and takes the argmax as a
  * TakeOrdered top-1, so the full selection is k scans with no shuffle
  * and nothing row-sized on the driver. At 100 TB the k-scan loop is
  * the honest exact cost; the published scale path is sample-then-
  * select ([[kCenterSample]]) — k-center on a hash-sample approximates
  * the full traversal's cover radius within the sample bound, and the
  * selection cost drops to k scans OF THE SAMPLE.
  *
  * Determinism: distances are computed in float64 from the float32
  * inputs with a fixed left-to-right summation (both engines fold the
  * array in order), the argmax compares the distance ROUNDED to 6
  * decimals (the hround engine-stability pin), and ties break by
  * ascending id.
  */
object Coreset {

  /** Exact double-precision L2 between a float-array column and a
    * broadcast center, folded in array order.
    */
  private def l2ToCenter(vecCol: Column, center: Array[Double]): Column = {
    val c = typedLit(center)
    sqrt(aggregate(
      zip_with(vecCol, c, (x, y) => {
        val d = x.cast("double") - y
        d * d
      }),
      lit(0.0), (acc, e) => acc + e))
  }

  /** Greedy k-center selection: returns `(step, id, radius)` in pick
    * order, where `radius` is the (rounded) distance from the picked
    * point to the previously-chosen set — the running cover radius,
    * nonincreasing by construction (spec'd). Step 0 is the seed
    * (`seedId`, default: smallest id) at radius 0.
    */
  def kCenterSelect(df: DataFrame, idCol: String, vecCol: String, k: Int,
      seedId: Option[Long] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      require(k <= n, s"k = $k exceeds row count $n")
      val seed = seedId.getOrElse(base.agg(min($"id")).as[Long].head())
      val first = (0, seed, 0.0)
      val more = traverse(base, Seq(seed), k - 1, stepOffset = 1)
      (first +: more).toDF("step", "id", "radius")
    } finally base.unpersist()
  }

  /** Continue a previous traversal: seed the chosen set with
    * `existingIds` (in their original pick order) and make `kMore`
    * further farthest-point picks — incremental exemplar maintenance
    * as the corpus grows, without re-running the whole selection.
    * Greedy is prefix-consistent, so
    * `select(k1) ++ extend(select(k1).ids, k2) == select(k1 + k2)`
    * (spec- and gate-pinned). Returns ONLY the new picks, steps
    * numbered from `existingIds.size`.
    */
  def kCenterExtend(df: DataFrame, idCol: String, vecCol: String,
      existingIds: Seq[Long], kMore: Int): DataFrame = {
    require(existingIds.nonEmpty, "need at least one existing center")
    require(existingIds.distinct.size == existingIds.size,
      "existing centers contain duplicates")
    require(kMore >= 1, s"kMore must be >= 1, got $kMore")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = base.count()
      require(existingIds.size + kMore <= n,
        s"${existingIds.size} existing + $kMore more exceeds row count $n")
      traverse(base, existingIds, kMore, stepOffset = existingIds.size)
        .toDF("step", "id", "radius")
    } finally base.unpersist()
  }

  /** The shared farthest-point loop: min-distance frame initialized
    * against ALL of `initial` (one projection, |initial| kernel terms
    * — bounded driver state), then `kMore` rounds of least()-update
    * against only the newest pick + TakeOrdered argmax.
    */
  private def traverse(base: DataFrame, initial: Seq[Long], kMore: Int,
      stepOffset: Int): Seq[(Int, Long, Double)] = {
    val spark = base.sparkSession
    import spark.implicits._
    if (kMore == 0) return Seq.empty
    val initVecs = base.filter($"id".isInCollection(initial))
      .select($"id", $"vec").as[(Long, Array[Float])].collect().toMap
    require(initVecs.size == initial.size,
      s"${initial.size - initVecs.size} existing center id(s) not present")
    val md0 = initial.map(i => l2ToCenter($"vec", initVecs(i).map(_.toDouble)))
      .reduce(least(_, _))
    val chosenIds = scala.collection.mutable.ArrayBuffer(initial: _*)
    val picked = ArrayBuffer[(Int, Long, Double)]()
    var minDist = base.withColumn("md", md0)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prev = minDist
    var i = 0
    while (i < kMore) {
      val (nid, nextDist) = minDist
        .filter(!$"id".isInCollection(chosenIds.toSeq))
        .orderBy(hround($"md", 6).desc, $"id")
        .limit(1)
        .select($"id", hround($"md", 6))
        .as[(Long, Double)].head()
      picked += ((stepOffset + i, nid, nextDist))
      chosenIds += nid
      val nextVec = base.filter($"id" === nid).select($"vec")
        .as[Array[Float]].head().map(_.toDouble)
      val upd = minDist
        .withColumn("md", least($"md", l2ToCenter($"vec", nextVec)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // materialize before dropping the parent so the persisted
      // blocks, not a k-deep lineage, back the next round
      upd.count()
      prev.unpersist()
      prev = upd
      minDist = upd
      i += 1
    }
    prev.unpersist()
    picked.toSeq
  }

  /** The scale path: hash-sample the corpus first (deterministic,
    * [[Sampling.hashSample]]'s md5 membership), then run the exact
    * greedy on the sample — k scans of `fraction · n` rows instead of
    * n. Standard coreset practice: the sample's cover radius bounds
    * the full set's within the sampling error.
    */
  def kCenterSample(df: DataFrame, idCol: String, vecCol: String, k: Int,
      fraction: Double, salt: String = "kc"): DataFrame = {
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction must be in (0, 1], got $fraction")
    kCenterSelect(
      Sampling.hashSample(df, idCol, fraction, salt), idCol, vecCol, k)
  }

  /** Assign every row to its nearest chosen center (one shuffle-free
    * projection over broadcast centers): `(id, center_id, dist)` —
    * the partition step that turns the selection into k-center
    * clustering, and whose max dist is the realized cover radius.
    */
  def assignToCenters(df: DataFrame, idCol: String, vecCol: String,
      centers: Seq[(Long, Array[Double])]): DataFrame = {
    require(centers.nonEmpty, "need at least one center")
    val spark = df.sparkSession
    import spark.implicits._
    val withDists = centers.map { case (cid, cvec) =>
      struct(hround(l2ToCenter(col(vecCol), cvec), 6).as("dist"),
        lit(cid).as("center_id"))
    }
    val best = array_min(array(withDists: _*))
    df.select(col(idCol).cast("long").as("id"),
      best.getField("center_id").as("center_id"),
      best.getField("dist").as("dist"))
  }
}
