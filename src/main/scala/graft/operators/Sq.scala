package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar quantization (FAISS `ScalarQuantizer` QT_8bit / SQ8): each
  * vector component quantizes independently to an 8-bit level on a
  * per-dimension linear grid `vmin_j + scale_j * code`, trained from
  * the data's per-dimension min/max. A 64-dim float32 vector stores as
  * 64 small ints — 4× fewer index bytes scanned per probe than flat
  * float32, with NO codebook k-means to train or keep in sync (the
  * PQ/SQ trade: PQ compresses 16-32×, SQ 4× with far lower
  * reconstruction error and a closed-form encoder).
  *
  * Distances are SQDC (asymmetric): exact float32 L2 between the query
  * and the DECODED reconstruction — a pure `transform` projection plus
  * the shared codegen L2 kernel, so the whole scoring path stays
  * inside whole-stage codegen and the search core is literally
  * [[Ann.ivfSearchL2Pruned]] over decoded rows. Approximate for the
  * true vector by at most `sqrt(sum_j (scale_j/2)^2)` (per-dim error
  * is ≤ half a grid step — asserted in AnnSpec); an exact-refine
  * re-rank over the live vectors removes even that (the store facade's
  * `refine` parameter, same two-stage shape as PQ refine).
  *
  * Scale shape (100 TB): params are `2 × dim` floats of bounded driver
  * state (smaller than one centroid); training is ONE pass of
  * per-dimension min/max with map-side combine to `dim` groups (like
  * PQ codebooks, a sample suffices — the grid needs the value range,
  * not the corpus); encode/decode are stateless projections, so the
  * O(batch) index-append and post-compaction rebuild paths reuse the
  * persisted params with no retraining.
  *
  * Beyond-reference operator (the reference is exact-only brute force,
  * vector_store.py:291); the store facade pairs it with the IVF coarse
  * quantizer as `buildAnnIndexSq` (kind marker "ivfsq").
  */
object Sq {

  /** Fitted per-dimension grid: `decode(c)_j = vmin(j) + scale(j)*c`.
    * `scale(j) = 0` marks a constant dimension (every code is 0 and
    * decodes to the constant). Bounded driver state (`2 × dim`
    * floats).
    */
  case class SqParams(vmin: Array[Float], scale: Array[Float]) {
    require(vmin.length == scale.length, "vmin/scale length mismatch")
    def dim: Int = vmin.length
  }

  /** Number of grid steps: codes are 0..255 (8-bit, the FAISS QT_8bit
    * layout — parquet dictionary/bit-packing stores them compactly).
    */
  val Levels = 255

  /** Train the per-dimension grid: ONE pass, `posexplode` to
    * `(pos, v)` and min/max with map-side combine into `dim` groups —
    * the only full-data job in an SQ build (and, as with PQ codebooks,
    * a sample is standard at corpus scale: the grid needs the value
    * RANGE, which saturates long before the corpus does).
    */
  /** @param clipQuantile 0 (default) trains the grid on the exact
    *   per-dimension [min, max]; q ∈ (0, 0.5) trains on the
    *   [q, 1−q] quantiles instead (FAISS `RangeStat_quantiles`) — a
    *   single outlier component otherwise stretches its dimension's
    *   grid so every inlier lands in a handful of levels, wasting the
    *   8-bit budget. Clipping composes with the existing contract for
    *   free: [[encodeCol]] already SATURATES out-of-range values at
    *   the grid edge (the append-drift rule), so clipped outliers
    *   quantize to level 0/255 — bounded error for the tail, a much
    *   finer grid for everything else. The persisted (vmin, scale)
    *   fully describe either grid: search, append, and rebuild need
    *   no new state.
    */
  def fit(df: DataFrame, vecCol: String, dim: Int,
      clipQuantile: Double = 0.0): SqParams = {
    require(clipQuantile >= 0.0 && clipQuantile < 0.5,
      s"clipQuantile must be in [0, 0.5), got $clipQuantile")
    val exploded = df
      .select(posexplode(col(vecCol).cast("array<float>")).as(Seq("pos", "v")))
    val mm = (if (clipQuantile == 0.0)
        exploded.groupBy("pos").agg(min("v").as("vmin"), max("v").as("vmax"))
      else
        exploded.groupBy("pos").agg(
          expr(s"CAST(percentile_approx(v, $clipQuantile) AS FLOAT)").as("vmin"),
          expr(s"CAST(percentile_approx(v, ${1.0 - clipQuantile}) AS FLOAT)")
            .as("vmax")))
      .collect()
    require(mm.length == dim,
      s"fit saw ${mm.length} dimensions, expected $dim (empty input?)")
    val vmin = new Array[Float](dim)
    val scale = new Array[Float](dim)
    mm.foreach { r =>
      val p = r.getInt(0)
      vmin(p) = r.getFloat(1)
      scale(p) = (r.getFloat(2) - r.getFloat(1)) / Levels
    }
    SqParams(vmin, scale)
  }

  /** Encode a float vector column to `array<int>` 8-bit codes:
    * `round((v - vmin_j) / scale_j)` clamped to [0, 255] — values
    * outside the trained range (appended batches drift) saturate at
    * the grid edge rather than error, the FAISS SQ contract. A pure
    * projection (no shuffle, stays in codegen) over plan-literal
    * params (`2 × dim` floats — centroid-sized, Q-independent).
    */
  def encodeCol(vec: Column, p: SqParams): Column = {
    val vminC = typedLit(p.vmin.toSeq)
    val scaleC = typedLit(p.scale.toSeq)
    transform(vec.cast("array<float>"), (v, i) => {
      val vm = element_at(vminC, (i + lit(1)).cast("int"))
      val sc = element_at(scaleC, (i + lit(1)).cast("int"))
      when(sc === lit(0f), lit(0))
        .otherwise(least(lit(Levels),
          greatest(lit(0), round((v - vm) / sc).cast("int"))))
    })
  }

  /** Decode codes back to the grid reconstruction, each component one
    * float32 fma — the SQDC scoring input. Inverse of [[encodeCol]] up
    * to the ≤ scale/2 per-dim rounding error.
    */
  def decodeCol(codes: Column, p: SqParams): Column = {
    val vminC = typedLit(p.vmin.toSeq)
    val scaleC = typedLit(p.scale.toSeq)
    transform(codes, (c, i) => {
      val vm = element_at(vminC, (i + lit(1)).cast("int"))
      val sc = element_at(scaleC, (i + lit(1)).cast("int"))
      (vm + sc * c.cast("float")).cast("float")
    })
  }

  /** Persist the grid as a tiny `(pos, vmin, scale)` parquet — the
    * same self-describing-layout move as the PQ codebook, so append /
    * rebuild / search all read one source of truth.
    */
  def writeParams(spark: SparkSession, path: String, p: SqParams): Unit = {
    import spark.implicits._
    p.vmin.indices.map(j => (j, p.vmin(j), p.scale(j)))
      .toDF("pos", "vmin", "scale")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readParams(spark: SparkSession, path: String): SqParams = {
    val rows = spark.read.parquet(path).orderBy("pos").collect()
    SqParams(rows.map(_.getFloat(1)), rows.map(_.getFloat(2)))
  }

  /** O(batch) index maintenance: assign the fresh batch to the
    * PERSISTED coarse centroids and encode with the PERSISTED grid —
    * ingestion never retrains (drift in the value range saturates at
    * the grid edges and is a rebuild trigger, not an ingest side
    * effect — the [[Pq.appendToIvfPqIndex]] contract).
    */
  def appendToIvfSqIndex(spark: SparkSession, path: String,
      newBatch: DataFrame, idCol: String, vecCol: String,
      countCells: Boolean = false): Array[(Long, Long)] = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val params = readParams(spark, s"$path/sq")
    Ann.writeAssignedBatch(
      Ann.assign(newBatch, idCol, vecCol, centroids)
        .withColumn("codes", encodeCol(col(vecCol), params))
        .drop(vecCol),
      path, countCells)
  }
}
