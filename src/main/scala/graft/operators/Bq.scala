package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.l2_distance

/** Binary quantization (pgvector `binary_quantize` + rescore, FAISS
  * binary indexes): each vector component quantizes to ONE bit —
  * above or below a per-dimension threshold trained from the data
  * (the per-dim mean; pgvector hardcodes 0, which is the same thing
  * on centered embeddings). A 64-dim float32 vector stores as 8
  * BYTES of packed bits — 32× fewer index bytes than flat, the
  * bottom rung of the store's quantization ladder (flat 1× → SQ8 4×
  * → PQ/OPQ/residual 16-32× → BQ 32×/dim-bits).
  *
  * Hamming distance between packed codes is a RANK signal, not a
  * distance estimate (it counts disagreeing half-spaces — monotone in
  * angle for centered data, but not in L2). So unlike SQ/PQ, BQ
  * search makes exact refine MANDATORY: the hamming shortlist
  * candidate-generates, the live float32 vectors re-rank (the
  * pgvector BQ+rescore contract, [[Ann.hammingRescoreTopK]] at
  * operator level, gated `ann_rescore`). Returned distances are
  * always TRUE L2.
  *
  * Scale shape (100 TB): params are `dim` floats of bounded driver
  * state; training is one map-side-combined mean pass (a sample
  * saturates it, as with the SQ grid); encode is a stateless
  * projection (integer when-chains inside whole-stage codegen, the
  * [[VectorOps.signSketch]] packing); the index scan reads packed
  * longs (8 bytes per 64 dims) and scores with XOR+popcount —
  * integer ALU work, no float lanes; refine touches |Q|·refine rows,
  * never the corpus. O(batch) append encodes with the PERSISTED
  * thresholds (drift flips marginal bits and is a rebuild trigger,
  * not an ingest side effect — the SQ/PQ contract).
  *
  * Beyond-reference operator (the reference is exact-only brute
  * force, vector_store.py:291); the store facade pairs it with the
  * IVF coarse quantizer as `buildAnnIndexBq` (kind marker "ivfbq").
  */
object Bq {

  /** Fitted per-dimension bit thresholds. Bounded driver state
    * (`dim` floats).
    */
  case class BqParams(thr: Array[Float]) {
    def dim: Int = thr.length
  }

  /** Train per-dimension thresholds: ONE pass, `posexplode` to
    * `(pos, v)` and mean with map-side combine into `dim` groups.
    * The mean balances bit occupancy on uncentered embedding columns
    * (a constant-offset dimension under pgvector's fixed-0 threshold
    * wastes its bit; the mean splits every dimension's mass).
    */
  def fit(df: DataFrame, vecCol: String, dim: Int): BqParams = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<float>")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(avg("v").as("m"))
      .collect()
    require(rows.length == dim,
      s"fit saw ${rows.length} dimensions, expected $dim (empty input?)")
    val thr = new Array[Float](dim)
    rows.foreach(r => thr(r.getInt(0)) = r.getDouble(1).toFloat)
    BqParams(thr)
  }

  /** Pack a float vector column to `array<long>` sign bits against
    * the trained thresholds — the [[VectorOps.signSketch]] 32-bits-
    * per-word layout so [[VectorOps.hammingDistance]]'s XOR+popcount
    * scores it unchanged. A pure projection (no shuffle, stays in
    * whole-stage codegen); thresholds are plan literals (`dim`
    * floats — centroid-sized, Q-independent).
    */
  def encodeCol(vec: Column, p: BqParams): Column = {
    val v = vec.cast("array<float>")
    val words = (0 until p.dim by 32).map { base =>
      (base until math.min(base + 32, p.dim)).map { j =>
        when(element_at(v, j + 1) > lit(p.thr(j)), lit(1L << (j - base)))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(words: _*)
  }

  /** Persist thresholds as a tiny `(pos, thr)` parquet — the
    * self-describing-layout move shared with the PQ codebook and SQ
    * grid: append / rebuild / search read one source of truth.
    */
  def writeParams(spark: SparkSession, path: String, p: BqParams): Unit = {
    import spark.implicits._
    p.thr.indices.map(j => (j, p.thr(j)))
      .toDF("pos", "thr")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def readParams(spark: SparkSession, path: String): BqParams =
    BqParams(spark.read.parquet(path).orderBy("pos").collect()
      .map(_.getFloat(1)))

  /** Pruned IVF-BQ candidate stage: probe the `nProbe` nearest cells
    * per query with float L2 to the coarse centroids (probing is
    * always full-precision — centroids are `nlist` rows, never
    * quantized), prune the index scan to probed partitions
    * (PartitionFilters, the [[Ann.ivfSearchL2Pruned]] move), score
    * XOR+popcount hamming between packed row codes and the packed
    * query, and shortlist `shortK` per query with the (hamming, id)
    * tie-break. `rowFilter` composes the tombstone mask (and any
    * caller predicate) BEFORE the shortlist cut. Output
    * (qid, id, hamming, rn) — the caller MUST exact-rescore (see the
    * object doc); the store facade enforces `refine >= k`.
    */
  def ivfBqSearch(spark: SparkSession, path: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      shortK: Int, nProbe: Int,
      rowFilter: DataFrame => DataFrame = identity): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val params = readParams(spark, s"$path/bq")
    val q = queries
      .select(col(qidCol), col(qvecCol), encodeCol(col(qvecCol), params).as("_qsig"))
    val probed = SimilarityJoin.topKByDistance(
        q.crossJoin(broadcast(centroids))
          .withColumn("cdist", l2_distance(col(qvecCol), col("centroid")))
          .select(col(qidCol), col("_qsig"), col("centroid_id"), col("cdist")),
        qidCol, "centroid_id", "cdist", nProbe)
      .select(col(qidCol), col("_qsig"),
        col("centroid_id").cast("long").as("centroid_id"))
    // ≤ queries × nProbe cell ids — planner state, like the centroids
    val cells = probed.select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val indexed = rowFilter(spark.read.parquet(s"$path/index")
      .filter(col("centroid_id").isin(cells.toIndexedSeq: _*)) // → PartitionFilters
      .withColumn("centroid_id", col("centroid_id").cast("long")))
    val scored = indexed
      .join(broadcast(probed), Seq("centroid_id"))
      .withColumn("hamming", VectorOps.hammingDistance(col("codes"), col("_qsig")))
      .select(col(qidCol), col("id"), col("hamming"))
    SimilarityJoin.topKByDistance(scored, qidCol, "id", "hamming", shortK)
  }

  /** O(batch) index maintenance: assign the fresh batch to the
    * PERSISTED coarse centroids and pack with the PERSISTED
    * thresholds — ingestion never retrains (the
    * [[Sq.appendToIvfSqIndex]] contract).
    */
  def appendToIvfBqIndex(spark: SparkSession, path: String,
      newBatch: DataFrame, idCol: String, vecCol: String,
      countCells: Boolean = false): Array[(Long, Long)] = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val params = readParams(spark, s"$path/bq")
    Ann.writeAssignedBatch(
      Ann.assign(newBatch, idCol, vecCol, centroids)
        .withColumn("codes", encodeCol(col(vecCol), params))
        .drop(vecCol),
      path, countCells)
  }
}
