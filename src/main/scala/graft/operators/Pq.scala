package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split each vector into `m`
  * subspaces, k-means each subspace independently, and store a vector
  * as `m` small codes — `dim × 4` bytes compress to `m` bytes at
  * k ≤ 256. Queries score compressed vectors with an ADC
  * (asymmetric-distance) lookup table: the exact L2 distance between
  * the query and the RECONSTRUCTION `concat_s(centroid_s(code_s))`,
  * computed as a sum of `m` table lookups.
  *
  * Scale shape (100 TB): the codebook is bounded driver state
  * (`m·k·(dim/m)` floats — the k-means-centroid pattern); fitting runs
  * on a sample (standard practice — codebooks need ~100k vectors, not
  * the corpus); encoding is a pure argmin-over-literals projection;
  * ADC scoring is a pure projection summing `m` `element_at` lookups
  * into broadcast per-query tables. No shuffle anywhere except the
  * final per-query top-k (WindowGroupLimit-bounded).
  *
  * Beyond-reference operator (reference is exact-only brute force,
  * vector_store.py:291); composes with [[Ann.ivfBuild]] for the
  * classic IVF-PQ layout (partition by cell, scan codes).
  */
object Pq {

  /** Fitted per-subspace codebooks: `centroids(s)(c)` is the `dim/m`
    * subvector for code `c` of subspace `s`. Bounded driver state.
    */
  case class PqCodebook(dim: Int, m: Int, k: Int,
      centroids: Array[Array[Array[Float]]]) {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(centroids.length == m && centroids.forall(_.length == k),
      "codebook shape must be m x k")
    def subDim: Int = dim / m
    /** The `(s*k + c)*subDim + j` flat layout [[Kernels.pqEncode]]
      * reads — one contiguous float array as codegen reference state.
      */
    def flat: Array[Float] = {
      val out = new Array[Float](m * k * subDim)
      var s = 0
      while (s < m) {
        var c = 0
        while (c < k) {
          System.arraycopy(centroids(s)(c), 0, out, (s * k + c) * subDim,
            subDim)
          c += 1
        }
        s += 1
      }
      out
    }
  }

  /** Fit per-subspace codebooks with the shared Lloyd semantics (seeds
    * and recentring exactly as [[Ann.kmeansCore]] at `seedRounds = 0`,
    * run on each subvector slice) — but FUSED across subspaces: ONE
    * hash-ordered sample job seeds all `m` sub-codebooks (the loop
    * form's per-subspace samples were the same rows anyway — the
    * sample order is a function of the id alone), and each Lloyd
    * round is ONE scan (the [[encode]] argmin projection for every
    * subspace at once, exploded to `(sub, code, subvec)` and
    * recentred by a single `groupBy(sub, code)` mean with map-side
    * combine). The loop form paid `m × (iters + 1)` full scans; at
    * 100 TB the scan count, not the per-row distance math (identical
    * here), is the build cost. Seeding per subspace stays the
    * deterministic greedy k-means++ over the driver-held sample;
    * FAISS seeds subquantizers randomly for the same
    * cost-per-subspace reason.
    *
    * `df` may be a sample of the corpus; `k` cells per subspace, `m`
    * subspaces. Cells that win no rows keep their previous centroid
    * (callers rely on a full codebook), as in [[Ann.kmeansCore]].
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, k: Int, iters: Int = 5): PqCodebook = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0 (got k=$k, iters=$iters)")
    val subDim = dim / m
    // one sample job for all m subspaces (kmeansCore's seedRounds = 0
    // sample: hash-of-id order, bounded size)
    val sample = df
      .orderBy(xxhash64(col(idCol), lit(0x5eedL)), col(idCol))
      .limit(math.max(1024, 64 * k))
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    var cents: Array[Array[Array[Float]]] = (0 until m).map { s =>
      val sub = sample.map(_.slice(s * subDim, (s + 1) * subDim))
      Ann.greedyKmeansPP(sub, Array.fill(sub.length)(1.0), k, Ann.l2SqDriver)
    }.toArray
    (0 until iters).foreach { _ =>
      // per row, for every subspace: (sub, nearest code, subvector) —
      // the encode argmin (ties to the lower code via struct order,
      // as assignTo ties to the lower centroid id). Wide codebooks
      // (k > 16) take the loop kernel like [[encode]] — the literal
      // unroll blows janino at k = 256 and drops the whole Lloyd scan
      // to interpreted eval
      val kernelCodes =
        if (k > 16) Some(graft.functions.pq_encode(col(vecCol),
          PqCodebook(dim, m, k, cents).flat, m, k, subDim))
        else None
      val assigned = array((0 until m).map { s =>
        val sub = slice(col(vecCol), s * subDim + 1, subDim)
        struct(
          lit(s).as("s"),
          kernelCodes.map(_ => element_at(col("_pqfit_codes"), s + 1))
            .getOrElse(
              array_min(array(cents(s).indices.map { c =>
                struct(Ann.l2Score(sub, cents(s)(c)).as("d"),
                  lit(c).as("code"))
              }: _*)).getField("code")).as("code"),
          sub.as("sub"))
      }: _*)
      val base = kernelCodes.fold(df)(cc => df.withColumn("_pqfit_codes", cc))
      val means = base.select(explode(assigned).as("a"))
        .groupBy(col("a.s").as("s"), col("a.code").as("code"))
        .agg(array((0 until subDim).map(i =>
          avg(element_at(col("a.sub"), i + 1)).cast("float")): _*).as("mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray)
        .toMap
      cents = Array.tabulate(m)(s => cents(s).indices.map(c =>
        means.getOrElse((s, c), cents(s)(c))).toArray)
    }
    PqCodebook(dim, m, k, cents)
  }

  /** Append `outCol`: the `m` nearest-subcentroid codes as
    * `array<int>`. Pure projection. Two regimes, same tie rule (lower
    * code on equal distance): narrow codebooks (k ≤ 16) keep the
    * literal-argmin expression — per subspace an argmin over `k`
    * literal (distance, code) structs, the [[Ann]] assign pattern,
    * bit-identical to every artifact built before the kernel existed —
    * while wide codebooks (k = 256, the 8-bit tier) dispatch to the
    * [[graft.expressions.Kernels.pqEncode]] loop kernel: unrolled as
    * literals they blow janino's method-size limit and the whole
    * projection silently drops to interpreted row-at-a-time eval.
    */
  def encode(df: DataFrame, vecCol: String, outCol: String,
      cb: PqCodebook): DataFrame = {
    if (cb.k > 16)
      return df.withColumn(outCol,
        graft.functions.pq_encode(col(vecCol), cb.flat, cb.m, cb.k,
          cb.subDim))
    val codes = array((0 until cb.m).map { s =>
      val sub = slice(col(vecCol), s * cb.subDim + 1, cb.subDim)
      array_min(array((0 until cb.k).map { c =>
        struct(
          graft.functions.l2_distance(sub, lit(cb.centroids(s)(c))).as("d"),
          lit(c).as("code"))
      }: _*)).getField("code")
    }: _*)
    df.withColumn(outCol, codes)
  }

  /** The reconstruction a code array stands for, as a literal lookup:
    * `concat(centroids(0)(code_0), …, centroids(m-1)(code_m-1))`.
    */
  def reconstructCol(codesCol: Column, cb: PqCodebook): Column =
    concat((0 until cb.m).map { s =>
      // typedLit: plain lit() cannot build nested-array literals
      element_at(typedLit(cb.centroids(s)), codesCol.getItem(s) + 1)
    }: _*)

  /** ADC lookup table for one query: `table(s)(c)` = squared L2 between
    * the query's subvector `s` and centroid `c`, in double.
    */
  private def adcTable(q: Array[Float], cb: PqCodebook): Array[Array[Double]] = {
    require(q.length == cb.dim, s"query dim ${q.length} != codebook dim ${cb.dim}")
    Array.tabulate(cb.m, cb.k) { (s, c) =>
      var acc = 0.0
      var i = 0
      while (i < cb.subDim) {
        val d = q(s * cb.subDim + i).toDouble - cb.centroids(s)(c)(i).toDouble
        acc += d * d
        i += 1
      }
      acc
    }
  }

  /** ADC distance of a code array to query `q`: the EXACT L2 distance
    * to the reconstruction, as `sqrt` of `m` literal-table lookups —
    * one projection, no vector arithmetic per row.
    */
  def adcDistanceCol(q: Array[Float], cb: PqCodebook, codesCol: Column): Column = {
    val table = adcTable(q, cb)
    sqrt((0 until cb.m).map { s =>
      element_at(typedLit(table(s)), codesCol.getItem(s) + 1)
    }.reduce(_ + _))
  }

  /** The query batch as a relational frame: one `(qid, _adc)` row per
    * query, `_adc` the precomputed m×k ADC table. The tables are
    * driver state exactly like the codebook (`queries × m × k`
    * doubles), but shipped as a BROADCAST FRAME instead of per-query
    * plan literals — one plan serves any batch size.
    */
  private def adcTableFrame(
      spark: org.apache.spark.sql.SparkSession,
      queries: Seq[(Long, Array[Float])], cb: PqCodebook): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_._1).distinct.length == queries.length,
      "query ids must be unique")
    import spark.implicits._
    queries.map { case (qid, q) =>
      (qid, adcTable(q, cb).map(_.toSeq).toSeq)
    }.toDF("qid", "_adc")
  }

  /** ADC distance read from the joined `_adc` table column — the same
    * left-to-right double sum as [[adcDistanceCol]] (bit-identical
    * results), with the table a row value instead of a plan literal.
    * The unrolled element_at chain stays inside whole-stage codegen
    * (a zip_with/aggregate spelling would be CodegenFallback —
    * interpreted per candidate row, measured ~3× slower at 12.5M
    * candidates); the m references to `codesCol` are safe because
    * [[materializeRows]] pins codes to row values before the join.
    */
  private def adcDistFromTable(adcCol: Column, codesCol: Column, m: Int): Column =
    sqrt((0 until m).map { s =>
      element_at(element_at(adcCol, s + 1), codesCol.getItem(s) + 1)
    }.reduce(_ + _))

  /** Pin the index projection to concrete row values BEFORE the
    * candidate join. A broadcast join evaluates non-key stream-side
    * expressions lazily in its consume path — once per MATCHED row —
    * so an index frame arriving with the [[encode]] argmin still in
    * its lineage recomputes the whole encode expression per candidate
    * (measured: 68 s vs 6 s for 1.26M candidates over a 100k-row
    * index). The object round-trip forces one evaluation per INDEX
    * row: no shuffle, no persistence, nothing to leak; an index read
    * from storage pays only the row serde.
    */
  private def materializeRows(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Approximate top-k for each query over a PQ-encoded index: rank by
    * ADC distance (id tie-break). Accuracy is the PQ reconstruction
    * trade — measure against [[SimilarityJoin.knnL2]]; raise `m`/`k`
    * (or re-rank an ADC shortlist with true distances) to tighten.
    *
    * ONE job for the whole batch: the index is scanned once against
    * the broadcast query-table frame (the [[SimilarityJoin.knnL2]]
    * shape), not once per query.
    */
  def adcTopK(index: DataFrame, idCol: String, codesCol: String,
      cb: PqCodebook, queries: Seq[(Long, Array[Float])], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qt = adcTableFrame(index.sparkSession, queries, cb)
    val scored = materializeRows(index.select(col(idCol), col(codesCol)))
      .crossJoin(broadcast(qt))
      .select(col("qid"), col(idCol),
        adcDistFromTable(col("_adc"), col(codesCol), cb.m).as("adc_dist"))
    SimilarityJoin.topKByDistance(scored, "qid", idCol, "adc_dist", k)
  }

  // ------------------------------ IVF-PQ ------------------------------- //

  /** IVF-PQ index: coarse IVF cells over the corpus plus PQ codes per
    * row — the billion-scale ANN layout (FAISS `IVFx,PQy` without
    * residual encoding: codes quantize the RAW vector, cells only
    * prune the scan; one codebook serves every cell, so reconstruction
    * and ADC tables stay cell-independent).
    *
    * Returns (indexed `(id, centroid_id, codes)`, centroids frame,
    * codebook). The indexed frame drops the raw vector — at scale the
    * index is `m` bytes/row + a partition column; persist it with
    * [[Ann.writeIvfIndex]] for source-level partition pruning.
    */
  def ivfPqBuild(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nCells: Int, m: Int, k: Int, iters: Int = 5): (DataFrame, DataFrame, PqCodebook) = {
    val (indexed, cents) = Ann.ivfBuild(df, idCol, vecCol, nCells, iters)
    val (enc, cb) = pqFromIvf(indexed, idCol, vecCol, dim, m, k, iters)
    (enc, cents, cb)
  }

  /** Non-residual PQ fit/encode over an ALREADY-BUILT IVF assignment —
    * the [[pqResidualFromIvf]] counterpart for the raw-vector codebook:
    * callers holding `(indexed, centroids)` (e.g. a sweep measuring
    * several index families over one coarse quantizer) skip the
    * duplicate k-means build.
    */
  def pqFromIvf(indexed: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int, k: Int, iters: Int = 5): (DataFrame, PqCodebook) = {
    val cb = fit(indexed, idCol, vecCol, dim, m, k, iters)
    (encode(indexed, vecCol, "codes", cb)
      .select(col(idCol), col("centroid_id"), col("codes")), cb)
  }

  /** IVF-PQ search: rank cells per query ON THE DRIVER (both the query
    * and the centroids are driver state — no probe job at all), then
    * score only the probed cells' codes with the ADC projection.
    * `nProbe = nCells` degenerates to [[adcTopK]] exactly (same
    * distances, same id tie-break). Probe tie-break: lower centroid
    * id, matching `Ann.probeCells`.
    *
    * ONE job for the whole batch (the `Ann.ivfSearchCosine` shape):
    * the driver-ranked `(qid, centroid_id)` probe relation — ≤
    * queries × nProbe slim rows — is broadcast and equi-joined against
    * the index, so probed cells are scanned once no matter how many
    * queries probe them; ADC tables ride a second broadcast keyed by
    * qid; the top-k is a WindowGroupLimit. No per-query plan branches,
    * no N-way union.
    */
  /** Centroid frame → ordered driver array (bounded state, like the
    * codebook): (centroid_id, centroid) pairs sorted by id.
    */
  private def collectCentroids(centroids: DataFrame): Array[(Long, Array[Float])] =
    centroids
      .select(col("centroid_id").cast("long"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Driver-side cell ranking for one query: the `nProbe` nearest
    * centroid ids by squared L2, ties to lower id (matches
    * `Ann.probeCells`).
    */
  private def rankCells(q: Array[Float], cents: Array[(Long, Array[Float])],
      nProbe: Int): Seq[Long] =
    cents.map { case (cid, c) =>
      var acc = 0.0
      var i = 0
      while (i < math.min(q.length, c.length)) {
        val d = q(i).toDouble - c(i).toDouble; acc += d * d; i += 1
      }
      (acc, cid)
    }.sorted.take(nProbe).map(_._2).toSeq

  /** Queries per chunk for the batched searches: bounds the ADC-table
    * driver/broadcast state at `chunk × m × k` doubles (~34 MB at
    * m=16, k=256) however large the batch — chunks run as independent
    * single-job searches and union by qid (per-query top-k, so the
    * union IS the single-batch result). Plan size grows only as
    * ⌈Q/chunk⌉ branches.
    */
  private val QueryChunk = 1024

  private def chunked(queries: Seq[(Long, Array[Float])], chunk: Int)(
      run: Seq[(Long, Array[Float])] => DataFrame): DataFrame =
    if (queries.size <= chunk) run(queries)
    else queries.grouped(chunk).map(run).reduce(_ unionAll _)

  def ivfPqSearch(index: DataFrame, idCol: String, codesCol: String,
      centroids: DataFrame, cb: PqCodebook,
      queries: Seq[(Long, Array[Float])], k: Int, nProbe: Int,
      queryChunk: Int = QueryChunk): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(queryChunk >= 1, s"queryChunk must be >= 1, got $queryChunk")
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_._1).distinct.length == queries.length,
      "query ids must be unique")
    val spark = index.sparkSession
    import spark.implicits._
    val cents = collectCentroids(centroids)
    // pin the index projection ONCE, outside the per-chunk closures
    val mat = materializeRows(
      index.select(col(idCol), col("centroid_id"), col(codesCol)))
    chunked(queries, queryChunk) { qs =>
      val probes = qs.flatMap { case (qid, q) =>
        rankCells(q, cents, nProbe).map(cid => (qid, cid))
      }.toDF("qid", "centroid_id")
      val qt = adcTableFrame(spark, qs, cb)
      val scored = mat
        .join(broadcast(probes), Seq("centroid_id"))
        .join(broadcast(qt), Seq("qid"))
        .select(col("qid"), col(idCol),
          adcDistFromTable(col("_adc"), col(codesCol), cb.m).as("adc_dist"))
      SimilarityJoin.topKByDistance(scored, "qid", idCol, "adc_dist", k)
    }
  }

  // ------------------- persisted IVF-PQ layout ------------------------ //

  /** Persist a codebook next to an IVF layout: one row per (sub, cell)
    * codeword — the shape (dim, m, k) is derivable from the rows, so
    * the file IS the codebook, engine-readably.
    */
  def writeCodebook(spark: org.apache.spark.sql.SparkSession,
      path: String, cb: PqCodebook): Unit = {
    import spark.implicits._
    val rows = for (s <- 0 until cb.m; c <- 0 until cb.k)
      yield (s, c, cb.centroids(s)(c).toSeq)
    rows.toDF("sub", "cell", "word")
      .write.mode("overwrite").parquet(path)
  }

  def readCodebook(spark: org.apache.spark.sql.SparkSession,
      path: String): PqCodebook = {
    val rows = spark.read.parquet(path)
      .select(col("sub").cast("int"), col("cell").cast("int"), col("word"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    require(rows.nonEmpty, s"empty codebook at $path")
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val subDim = rows.head._3.length
    val cents = Array.ofDim[Array[Float]](m, k)
    rows.foreach { case (s, c, w) => cents(s)(c) = w }
    PqCodebook(m * subDim, m, k, cents.map(_.toArray))
  }

  /** The distinct cell ids the query batch would probe — the driver-
    * state input a caller needs to partition-prune a persisted layout's
    * scan BEFORE handing it to [[ivfPqSearch]] (whose internal probe
    * join then restricts each query to its own cells).
    */
  def probedCells(centroids: DataFrame,
      queries: Seq[(Long, Array[Float])], nProbe: Int): Seq[Long] = {
    val cents = collectCentroids(centroids)
    queries.flatMap { case (_, q) => rankCells(q, cents, nProbe) }
      .distinct.sorted
  }

  /** O(batch) append to a persisted IVF-PQ layout: assign the new rows
    * to the EXISTING coarse centroids, encode with the PERSISTED
    * codebook, append under the matching partitions — the
    * [[Ann.appendToIvfIndex]] maintenance contract for compressed
    * indexes (codebook drift is the rebuild trigger, not a side effect
    * of ingestion). Extra columns on `newBatch` (e.g. a write
    * generation) ride along into the layout.
    */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newBatch: DataFrame, idCol: String, vecCol: String,
      countCells: Boolean = false): Array[(Long, Long)] = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val cb = readCodebook(spark, s"$path/codebook")
    Ann.writeAssignedBatch(
      encode(Ann.assign(newBatch, idCol, vecCol, centroids), vecCol, "codes", cb)
        .drop(vecCol),
      path, countCells)
  }

  // ------------------------ residual IVF-PQ --------------------------- //

  /** The float32 residual `v - c` (the arithmetic [[graft.functions.vec_sub]]
    * runs row-side), shared by build-time fitting and query-side tables.
    */
  private def residual(v: Array[Float], c: Array[Float]): Array[Float] = {
    val n = math.min(v.length, c.length)
    Array.tabulate(n)(i => v(i) - c(i))
  }

  /** Residual-encoding IVF-PQ (the FAISS `IVFx,PQy` default): PQ codes
    * quantize the RESIDUAL `v - centroid(cell)` instead of the raw
    * vector. Once the coarse quantizer has localized a cell, residual
    * magnitudes are far smaller than raw vectors, so the same (m, k)
    * code budget spends its resolution on a tighter ball — lower
    * reconstruction error and better recall at identical storage
    * (still `m` bytes/row + the partition column).
    *
    * Build shape: one extra codegen projection over the indexed frame
    * (the [[graft.functions.vec_sub]] kernel against a centroid literal
    * picked by `centroid_id`) before the same argmin [[encode]]; the
    * codebook is fit on residuals. Returns (indexed `(id, centroid_id,
    * codes)`, centroids frame, codebook), like [[ivfPqBuild]].
    */
  def ivfPqBuildResidual(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      nCells: Int, m: Int, k: Int, iters: Int = 5): (DataFrame, DataFrame, PqCodebook) = {
    val (indexed, cents) = Ann.ivfBuild(df, idCol, vecCol, nCells, iters)
    val (enc, cb) = pqResidualFromIvf(indexed, cents, idCol, vecCol, dim, m, k, iters)
    (enc, cents, cb)
  }

  /** Residual-PQ fit/encode over an ALREADY-BUILT IVF assignment —
    * callers holding an `(indexed, centroids)` pair (e.g. a sweep that
    * measures several index families over one coarse quantizer) skip
    * the duplicate k-means build [[ivfPqBuildResidual]] would run.
    */
  def pqResidualFromIvf(indexed: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String, dim: Int,
      m: Int, k: Int, iters: Int = 5): (DataFrame, PqCodebook) = {
    val centArr = collectCentroids(cents).map(_._2)
    val resCol = graft.functions.vec_sub(col(vecCol),
      element_at(typedLit(centArr), col("centroid_id").cast("int") + 1))
    val withRes = indexed.withColumn("_res", resCol)
    val cb = fit(withRes, idCol, "_res", dim, m, k, iters)
    (encode(withRes, "_res", "codes", cb)
      .select(col(idCol), col("centroid_id"), col("codes")), cb)
  }

  /** Residual IVF-PQ search. The ADC table is CELL-DEPENDENT here (the
    * query's residual differs per probed cell), so the broadcast probe
    * relation carries one m×k table per (query, probed cell) —
    * `queries × nProbe × m × k` doubles of bounded driver state, the
    * same tables FAISS precomputes per query. Everything else keeps the
    * [[ivfPqSearch]] shape: ONE equi-join of the index against the
    * broadcast probe relation (probed cells scanned once regardless of
    * how many queries probe them), ADC distance as a projection,
    * WindowGroupLimit top-k. No per-query plan branches.
    *
    * `nProbe = nCells` is exact over the residual reconstruction:
    * every row is scored with its own cell's table, and the ADC sum IS
    * the distance `‖(q - c) - recon_res‖` — gated by `ann_ivfpq_res`
    * against an independent double recompute.
    */
  def ivfPqSearchResidual(index: DataFrame, idCol: String, codesCol: String,
      centroids: DataFrame, cb: PqCodebook,
      queries: Seq[(Long, Array[Float])], k: Int, nProbe: Int,
      queryChunk: Int = QueryChunk): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(queryChunk >= 1, s"queryChunk must be >= 1, got $queryChunk")
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_._1).distinct.length == queries.length,
      "query ids must be unique")
    val spark = index.sparkSession
    import spark.implicits._
    val cents = collectCentroids(centroids)
    val byId = cents.toMap
    val mat = materializeRows(
      index.select(col(idCol), col("centroid_id"), col(codesCol)))
    // residual tables are per (query, probed cell) — nProbe× the raw-PQ
    // state — so the chunk is proportionally smaller
    chunked(queries, math.max(1, queryChunk / nProbe)) { qs =>
      val probes = qs.flatMap { case (qid, q) =>
        rankCells(q, cents, nProbe).map { cid =>
          (qid, cid, adcTable(residual(q, byId(cid)), cb).map(_.toSeq).toSeq)
        }
      }.toDF("qid", "centroid_id", "_adc")
      val scored = mat
        .join(broadcast(probes), Seq("centroid_id"))
        .select(col("qid"), col(idCol),
          adcDistFromTable(col("_adc"), col(codesCol), cb.m).as("adc_dist"))
      SimilarityJoin.topKByDistance(scored, "qid", idCol, "adc_dist", k)
    }
  }

  /** Residual-encode an ALREADY-ASSIGNED frame (`centroid_id` present)
    * with a FITTED codebook: the [[pqResidualFromIvf]] projection
    * without the fit — the maintenance-path building block (append,
    * post-compaction rebuild) where retraining is explicitly not
    * wanted. Extra columns ride along.
    */
  def encodeResidualAssigned(assigned: DataFrame, vecCol: String,
      outCol: String, centroids: DataFrame, cb: PqCodebook): DataFrame = {
    val centArr = collectCentroids(centroids).map(_._2)
    val resCol = graft.functions.vec_sub(col(vecCol),
      element_at(typedLit(centArr), col("centroid_id").cast("int") + 1))
    encode(assigned.withColumn("_res", resCol), "_res", outCol, cb)
      .drop("_res")
  }

  /** O(batch) append to a persisted RESIDUAL IVF-PQ layout — the
    * [[appendToIvfPqIndex]] contract with residual encoding against
    * the persisted coarse centroids and codebook.
    */
  def appendToIvfPqIndexResidual(spark: org.apache.spark.sql.SparkSession,
      path: String, newBatch: DataFrame, idCol: String, vecCol: String,
      countCells: Boolean = false): Array[(Long, Long)] = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val cb = readCodebook(spark, s"$path/codebook")
    Ann.writeAssignedBatch(
      encodeResidualAssigned(Ann.assign(newBatch, idCol, vecCol, centroids),
          vecCol, "codes", centroids, cb)
        .drop(vecCol),
      path, countCells)
  }
}
