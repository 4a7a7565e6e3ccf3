package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{cosine_similarity, l2_distance}

/** Approximate nearest-neighbor search: the scale path beyond
  * brute-force (reference is exact-only, vector_store.py:291 — these are
  * the beyond-reference operators for 100 TB corpora).
  *
  * Two standard families:
  *   - Random-hyperplane LSH for cosine: bucket by sign-pattern, search
  *     only same-bucket candidates. Candidate generation is an equi-join
  *     on the bucket key — shuffle-by-key, no cross join.
  *   - IVF (inverted-file): Lloyd-iteration centroids, index rows
  *     assigned to nearest centroid; queries probe the `nProbe` nearest
  *     cells. The 100 TB layout: partition (or bucket) the index by
  *     `centroid_id` so a probe touches only matching partitions.
  */
object Ann {

  /** Sign-pattern bucket id of a vector column under `nBits` seeded
    * hyperplanes — vectors with small cosine distance agree on most bits.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int, seed: Long = 42L): Column =
    graft.functions.hyperplane_bucket(vec, dim, nBits, seed)

  /** Approximate cosine top-k via LSH bucketing: candidates = index rows
    * sharing the query's bucket (NOT exhaustive — recall < 1 by design;
    * measure against [[SimilarityJoin.knnCosine]]).
    */
  def lshCosineTopK(
      index: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, dim: Int, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val bIndex = index.withColumn("bucket", hyperplaneBucket(col(vecCol), dim, nBits, seed))
    val bQueries = queries.withColumn("bucket", hyperplaneBucket(col(qvecCol), dim, nBits, seed))
    val scored = bIndex
      .join(broadcast(bQueries), Seq("bucket"))
      .withColumn("sim", cosine_similarity(col(vecCol), col(qvecCol)))
      .withColumn("neg_sim", -col("sim"))
      .select(col(qidCol), col(idCol), col("sim"), col("neg_sim"))
    SimilarityJoin.topKByDistance(scored, qidCol, idCol, "neg_sim", k).drop("neg_sim")
  }

  /** Multi-probe LSH cosine top-k (Lv et al., VLDB '07): each query
    * probes its own bucket PLUS the `nBits` buckets at Hamming
    * distance 1 (one sign bit flipped) — recall approaching more hash
    * tables without building any, at (nBits+1)× probe cost. The
    * expansion happens on the small broadcast QUERY side only; the
    * index is bucketed once, identically to [[lshCosineTopK]], so the
    * candidate join stays an equi-join on the bucket key.
    */
  def lshCosineTopKMultiProbe(
      index: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, dim: Int, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val bIndex = index.withColumn("bucket", hyperplaneBucket(col(vecCol), dim, nBits, seed))
    val probes = queries
      .withColumn("bucket0", hyperplaneBucket(col(qvecCol), dim, nBits, seed))
      .withColumn("flip",
        explode(array((lit(0L) +: (0 until nBits).map(b => lit(1L << b))): _*)))
      .withColumn("bucket", col("bucket0").bitwiseXOR(col("flip")))
      .drop("bucket0", "flip")
    val scored = bIndex
      .join(broadcast(probes), Seq("bucket"))
      .withColumn("sim", cosine_similarity(col(vecCol), col(qvecCol)))
      .withColumn("neg_sim", -col("sim"))
      .select(col(qidCol), col(idCol), col("sim"), col("neg_sim"))
      // the same candidate can surface through several probes
      .dropDuplicates(qidCol, idCol)
    SimilarityJoin.topKByDistance(scored, qidCol, idCol, "neg_sim", k).drop("neg_sim")
  }

  /** LSH-bucketed cosine near-duplicate pairs: the scale path for
    * [[SimilarityJoin.cosineNearDupPairs]]. Pairs are generated only
    * within hyperplane buckets (equi-join self-join, no cross join) and
    * then verified against the exact threshold — precision 1.0 by
    * construction; recall grows as `nBits` shrinks (fewer, larger
    * buckets) at quadratic in-bucket cost.
    */
  def lshCosineNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, nBits: Int = 8, seed: Long = 42L): DataFrame = {
    val bucketed = df.select(
      col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      hyperplaneBucket(col(vecCol), dim, nBits, seed).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("a_id"), col("v").as("a_vec"))
    val b = bucketed.select(col("bucket"), col("id").as("b_id"), col("v").as("b_vec"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("sim", cosine_similarity(col("a_vec"), col("b_vec")))
      .filter(col("sim") > threshold)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** Lloyd k-means over an `array<float>` column. Deterministic: initial
    * centroids are the `nCentroids` lowest-id rows' vectors. Returns
    * (centroid_id, centroid).
    *
    * Centroids are k-means STATE (k × dim floats), not data — they live
    * on the driver (exactly like Spark MLlib's KMeans keeps its cluster
    * centers). Each Lloyd iteration is then ONE distributed job: a
    * shuffle-free argmin projection (see [[assign]]) feeding a single
    * partially-aggregated `groupBy(centroid_id)` whose shuffle volume is
    * bounded at partitions × k × (dim + 1) values regardless of n. The
    * old form re-shuffled n × dim posexploded rows through TWO exchanges
    * plus a cache/count/join per iteration.
    */
  def kmeans(
      df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 5, seedRounds: Int = 2): DataFrame =
    centsToDF(df, kmeansCore(df, idCol, vecCol, nCentroids, iters,
      l2Score, identity, seedRounds = seedRounds))

  private[operators] def l2Score(v: Column, c: Array[Float]): Column =
    l2_distance(v, lit(c))

  private def centsToDF(df: DataFrame, cents: Array[(Long, Array[Float])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    cents.toSeq.toDF("centroid_id", "centroid")
  }

  /** Shared Lloyd loop: `score` is the smaller-is-better per-centroid
    * score; `post` post-processes each recentred mean (identity for L2,
    * re-normalization for spherical/cosine).
    */
  /** Deterministic k-means|| seeding (Bahmani et al. 2012, VLDB):
    *
    *  1. pool starts with the `nCentroids` smallest-salted-hash rows (a
    *     deterministic uniform spread — also the fallback floor, so the
    *     pool never has fewer usable seeds than the data allows);
    *  2. `rounds` oversampling passes: each row joins the pool with
    *     probability min(1, l·w²/Σw²), w = its score against the
    *     nearest pool member minus the metric floor (squared L2 weight
    *     for the L2 metric, (1−cos)² for cosine) — the coin is a
    *     per-(id, round) xxhash64 mapped into [0,1), so the sample is a
    *     pure function of the data (reproducible cross-run, unlike an
    *     RNG draw);
    *  3. ONE assignment job weights each pool member by the rows it
    *     wins, then greedy weighted k-means++ on the driver (argmax of
    *     weight × distance-to-chosen, the deterministic variant of the
    *     ++ draw) picks the final `nCentroids` seeds from the ~2·l·
    *     rounds-sized pool.
    *
    * Cost: ~2 small jobs per round + 1 weighting job at BUILD time
    * only; every job is a projection/aggregate over the data with the
    * pool embedded as literals (the [[assignTo]] shape — map-side, no
    * shuffle beyond the 1-row aggregates). The previous first-k-by-id
    * seeds were deterministic but biased toward one corner of the
    * data; plain salted-hash spread fixes the bias but still collapses
    * multiple seeds into one heavy cluster (measured: mean IVF
    * recall@10 at nProbe=1 dropped 0.71 → 0.34 on the sf0.01 sweep) —
    * distance-aware oversampling is what keeps cells balanced at fixed
    * nProbe.
    */
  private def seedKmeansPar(
      df: DataFrame, idCol: String, vecCol: String, nCentroids: Int,
      score: (Column, Array[Float]) => Column,
      post: Array[Float] => Array[Float],
      scoreFloor: Double,
      dist2Driver: (Array[Float], Array[Float]) => Double,
      rounds: Int = 2): Array[Array[Float]] = {
    val data = df.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    // spread floor: k smallest salted hashes, TakeOrderedAndProject
    var pool: Array[Array[Float]] = data
      .orderBy(xxhash64(col("_id"), lit(0x5eedL)), col("_id"))
      .limit(nCentroids)
      .select(col("_v")).collect()
      .map(r => post(r.getSeq[Float](0).toArray))
    require(pool.nonEmpty, "kmeans needs at least one seed row")
    // rounds = 0: the cheap tier — ONE hash-spread sample job (bounded
    // at max(1024, 64k) rows) + greedy k-means++ on the driver. The
    // FAISS move for sub-quantizers (PQ codebooks train on samples
    // anyway); full || oversampling would multiply build jobs per
    // subspace. Still distance-aware: pure spread seeds provably drop
    // whole clusters (two seeds in one tight cluster leave another
    // unmodeled, and Lloyd cannot split a won cluster — AnnSpec's
    // three-cluster PQ fixture fails on spread-only seeding).
    if (rounds == 0) {
      val sample = data
        .orderBy(xxhash64(col("_id"), lit(0x5eedL)), col("_id"))
        .limit(math.max(1024, 64 * nCentroids))
        .select(col("_v")).collect()
        .map(r => post(r.getSeq[Float](0).toArray))
      return greedyKmeansPP(sample, Array.fill(sample.length)(1.0),
        nCentroids, dist2Driver)
    }
    if (nCentroids > 1) {
      val l = 2.0 * nCentroids
      // The per-round scoring pool grows to ~2·l·rounds members, each a
      // dim-length literal vector; unbounded, the generated projection
      // for large k (256 centroids × 64 dims ⇒ tens of thousands of
      // expression nodes) risks Janino's per-method bytecode ceiling
      // and an interpreted fallback. Cap the SCORING references at
      // maxScoreRefs by greedy farthest-point selection over the pool
      // (driver-side, pool is bounded seeding state) — the min-distance
      // oversampling weight against a spread summary of current
      // coverage is the same signal; small pools (k ≤ ~128) are
      // untouched, so the common path is bit-identical.
      val maxScoreRefs = math.max(2 * nCentroids, 64).min(512)
      for (round <- 1 to rounds) {
        val refs =
          if (pool.length <= maxScoreRefs) pool
          else greedyKmeansPP(pool, Array.fill(pool.length)(1.0),
            maxScoreRefs, dist2Driver)
        val w = array_min(array(refs.toIndexedSeq.map(c =>
          score(col("_v"), c).cast("double")): _*)) - lit(scoreFloor)
        val w2 = (w * w).as("_w2")
        val tot = data.agg(sum(w * w)).head().getDouble(0)
        if (tot > 0.0) {
          // u in [0,1): signed xxhash64 / 2^64 + 1/2, salted per round
          val u = xxhash64(col("_id"), lit(round * 7919)).cast("double") /
            lit(1.8446744073709552e19) + lit(0.5)
          val picked = data.select(col("_v"), w2, u.as("_u"))
            .filter(col("_u") * lit(tot) < lit(l) * col("_w2"))
            .select(col("_v")).collect()
            .map(r => post(r.getSeq[Float](0).toArray))
          pool = pool ++ picked
        }
      }
    }
    // weight pool members by the rows they win, then greedy ++ on the
    // driver (pool is seeding state, size ~2·l·rounds — not data).
    // Unlike the per-round scoring above, this ONE job cannot cap its
    // reference set (it needs a weight PER pool member), so the argmin
    // embeds the full pool as literals: practical ceiling ≈ 1-2k
    // centroids at dim 64 (pool ≈ 8·k members) before generated-code
    // size risks interpreted fallback for this single build-time job —
    // beyond that, seed with `rounds = 0` (bounded sample) or shard
    // the build per coarse partition.
    val poolCents = pool.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val weights = assignTo(data, "_v", poolCents, score)
      .groupBy("centroid_id").agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    val wArr = poolCents.map { case (cid, _) => weights.getOrElse(cid, 0.0) }
    greedyKmeansPP(pool, wArr, nCentroids, dist2Driver)
  }

  /** Greedy weighted k-means++ over a driver-held candidate pool:
    * heaviest candidate first, then repeatedly the argmax of
    * weight × distance²-to-chosen (the deterministic variant of the ++
    * draw). Degenerate pools (fewer distinct points than k) top up
    * with the remaining distinct candidates — callers get as many
    * seeds as the data supports.
    */
  private[operators] def greedyKmeansPP(pool: Array[Array[Float]], wArr: Array[Double],
      k: Int, dist2Driver: (Array[Float], Array[Float]) => Double)
      : Array[Array[Float]] = {
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    chosen += pool(wArr.indexOf(wArr.max))
    val d2 = pool.map(v => dist2Driver(v, chosen.head))
    while (chosen.size < math.min(k, pool.length) &&
        d2.indices.exists(i => wArr(i) * d2(i) > 0.0)) {
      val next = d2.indices.maxBy(i => wArr(i) * d2(i))
      chosen += pool(next)
      d2.indices.foreach { i =>
        d2(i) = math.min(d2(i), dist2Driver(pool(i), pool(next)))
      }
    }
    var i = 0
    while (chosen.size < math.min(k, pool.length) && i < pool.length) {
      if (!chosen.exists(_.sameElements(pool(i)))) chosen += pool(i)
      i += 1
    }
    chosen.toArray
  }

  /** Squared L2 on the driver (seed-selection metric for [[kmeans]]). */
  private[operators] def l2SqDriver(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    s
  }

  /** 1 − cosine on the driver (seed-selection metric for the spherical
    * variants; inputs are already post-normalized). */
  private def cosDistDriver(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length && i < b.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0.0) 0.0 else 1.0 - d / den
  }

  private[operators] def kmeansCore(
      df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int,
      score: (Column, Array[Float]) => Column,
      post: Array[Float] => Array[Float],
      scoreFloor: Double = 0.0,
      dist2Driver: (Array[Float], Array[Float]) => Double = l2SqDriver,
      seedRounds: Int = 2): Array[(Long, Array[Float])] = {
    var cents: Array[(Long, Array[Float])] =
      seedKmeansPar(df, idCol, vecCol, nCentroids, score, post,
        scoreFloor, dist2Driver, seedRounds)
        .zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
    require(cents.nonEmpty, "kmeans needs at least one seed row")
    val dim = cents.head._2.length
    (0 until iters).foreach { _ =>
      val means = assignTo(df, vecCol, cents, score)
        .groupBy(col("centroid_id"))
        .agg(array((0 until dim).map(i =>
          avg(element_at(col(vecCol), i + 1)).cast("float")): _*).as("mean"))
        .collect()
        .map(r => r.getLong(0) -> post(r.getSeq[Float](1).toArray))
        .toMap
      // a cell that won no rows keeps its previous centroid instead of
      // silently vanishing (callers rely on exactly nCentroids cells)
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** Assign each row to its nearest centroid.
    *
    * Shuffle-free by design: the centroid table is tiny (`nCentroids`
    * rows — k-means state, not data), so it is collected once and
    * embedded as literals; the argmin is then a pure projection
    * (`array_min` over `struct(dist, centroid_id)` — lexicographic
    * struct ordering ties-break on the lower centroid id, matching the
    * previous window form). No join, no Exchange: at 100 TB this runs
    * entirely map-side, where the old `Window.partitionBy(id)` form
    * re-shuffled every row WITH its vector payload per Lloyd iteration.
    */
  def assign(
      df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val cents = centroids
      .select(col("centroid_id").cast("long"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    assignTo(df, vecCol, cents, l2Score)
  }

  /** [[assign]] by maximum cosine similarity — the assignment a
    * [[kmeansCosine]]/[[ivfBuildCosine]] index's rows follow (same
    * shuffle-free literal-centroid projection; ties to the lower
    * centroid id).
    */
  def assignCosine(
      df: DataFrame, idCol: String, vecCol: String, centroids: DataFrame): DataFrame = {
    val cents = centroids
      .select(col("centroid_id").cast("long"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    assignTo(df, vecCol, cents, cosineScore)
  }

  /** Arg-best projection over driver-held centroids (the literal form
    * every assign/kmeans variant shares); `score` is smaller-is-better,
    * ties to the lower centroid id via lexicographic struct order.
    */
  private def assignTo(
      df: DataFrame, vecCol: String, cents: Array[(Long, Array[Float])],
      score: (Column, Array[Float]) => Column): DataFrame = {
    require(cents.nonEmpty, "assign needs at least one centroid")
    val best = array_min(array(cents.toIndexedSeq.map { case (cid, cvec) =>
      struct(
        score(col(vecCol), cvec).as("d"),
        lit(cid).as("cid"))
    }: _*))
    df.withColumn("centroid_id", best.getField("cid"))
  }

  /** IVF index: rows tagged with their centroid cell. At cluster scale,
    * write this out partitioned/bucketed by `centroid_id` so probes
    * prune partitions at the source.
    */
  def ivfBuild(
      df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 5,
      seedRounds: Int = 2): (DataFrame, DataFrame) = {
    // the centroid array never leaves the driver: assign directly from
    // it rather than round-tripping through a DataFrame + collect
    val cents = kmeansCore(df, idCol, vecCol, nCentroids, iters, l2Score,
      identity, seedRounds = seedRounds)
    (assignTo(df, vecCol, cents, l2Score), centsToDF(df, cents))
  }

  /** Spherical k-means (cosine analogue of [[kmeans]]): assignment by
    * maximum cosine similarity, recentering by per-dimension mean
    * followed by re-normalization of each centroid — done on the
    * driver, where the k × dim centroid state already lives. Same
    * one-job-per-iteration shape as the L2 variant.
    */
  def kmeansCosine(
      df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 5, seedRounds: Int = 2): DataFrame =
    centsToDF(df, kmeansCore(df, idCol, vecCol, nCentroids, iters,
      cosineScore, normalize, scoreFloor = -1.0, dist2Driver = cosDistDriver,
      seedRounds = seedRounds))

  /** Smaller-is-better cosine score (negated similarity). */
  private def cosineScore(v: Column, c: Array[Float]): Column =
    -cosine_similarity(v, lit(c))

  private def normalize(v: Array[Float]): Array[Float] = {
    val n = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x.toDouble * x)).toFloat
    if (n == 0f) v else v.map(_ / n)
  }

  /** Clustering inertia for a fitted centroid set: (n, Σ min-centroid
    * squared L2) in ONE aggregation scan — the number behind the elbow
    * report that picks k for an IVF layout or SemDeDup clustering. The
    * min is a per-row projection over centroid literals (bounded driver
    * state), the sum map-side combines; nothing row-sized moves.
    */
  def inertia(df: DataFrame, vecCol: String,
      centroids: Seq[Array[Float]]): (Long, Double) = {
    require(centroids.nonEmpty, "inertia needs at least one centroid")
    val minSq = array_min(array(centroids.map(c =>
      graft.functions.l2_sq_distance(col(vecCol), lit(c)).cast("double")): _*))
    val r = df.agg(count(minSq), sum(minSq)).head()
    // empty (or all-null-vector) input: sum aggregates to NULL — report
    // (0, 0.0) instead of NPEing a k-sweep that filtered a slice empty
    if (r.isNullAt(1)) (0L, 0.0) else (r.getLong(0), r.getDouble(1))
  }

  /** Cosine IVF build: rows tagged with their max-cosine cell. */
  def ivfBuildCosine(
      df: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int = 5): (DataFrame, DataFrame) = {
    val cents = kmeansCore(df, idCol, vecCol, nCentroids, iters,
      cosineScore, normalize, scoreFloor = -1.0, dist2Driver = cosDistDriver)
    (assignTo(df, vecCol, cents, cosineScore), centsToDF(df, cents))
  }

  /** Cosine IVF search: probe the `nProbe` most-similar cells per
    * query, score by cosine only within probed cells. nProbe =
    * nCentroids degenerates to exact cosine top-k.
    */
  def ivfSearchCosine(
      indexed: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val probed = probeCells(queries, qidCol, qvecCol, centroids,
      (q, c) => -cosine_similarity(q, c), nProbe)
    val scored = indexed
      .join(broadcast(probed), Seq("centroid_id"))
      .withColumn("sim", cosine_similarity(col(vecCol), col(qvecCol)))
      .withColumn("neg_sim", -col("sim"))
      .select(col(qidCol), col(idCol), col("sim"), col("neg_sim"))
    SimilarityJoin.topKByDistance(scored, qidCol, idCol, "neg_sim", k).drop("neg_sim")
  }

  /** Persist an IVF index in the 100 TB layout: the indexed rows are
    * written PARTITIONED BY `centroid_id`, so a probe that touches
    * nProbe of k cells reads nProbe/k of the data at the source (see
    * [[ivfSearchL2Pruned]]), not a full scan followed by a filter.
    *
    * `consolidate = false` skips the one-file-per-cell shuffle — the
    * ESCAPE for build-once-probe-once layouts (swept sweep/tune
    * candidates, whose single probe can never amortize the extra
    * staging shuffle; adjudicated at +6–10% on rebuild-heavy gates).
    * Every SERVING path — the store facade, rebalance/merge renames —
    * keeps the default: a layout probed more than a handful of times
    * pays per-file footer overhead on every probe, forever.
    */
  def writeIvfIndex(indexed: DataFrame, centroids: DataFrame, path: String,
      metric: String = "l2", consolidate: Boolean = true): Unit = {
    require(metric == "l2" || metric == "cosine",
      s"metric must be 'l2' or 'cosine', got '$metric'")
    // one file per cell: repartition guarantees a cell lands wholly in
    // one task, so a probe pays one parquet footer per probed cell
    // instead of one per shuffle task that held rows of it (the same
    // per-file overhead the graph layout measured as its serve-IO
    // bottleneck at 512 buckets × 32 files)
    val staged =
      if (consolidate)
        indexed.repartition(col("centroid_id"))
          .sortWithinPartitions(col("centroid_id"))
      else indexed
    staged.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$path/index")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
    // self-describing layout: searches and appends dispatch on the
    // persisted metric, so a cosine index can never be probed with L2
    // by accident (absent marker = l2, the pre-metric layout)
    val p = new org.apache.hadoop.fs.Path(s"$path/metric")
    val fs = p.getFileSystem(
      indexed.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(metric.getBytes("UTF-8")) finally out.close()
  }

  /** The persisted index's distance metric; layouts written before the
    * marker existed read as "l2" (their only metric).
    */
  def readIvfMetric(
      spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$path/metric")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "l2"
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
  }

  /** Append a batch to a persisted [[writeIvfIndex]] layout WITHOUT
    * retraining: assign the new rows to the EXISTING centroids (read
    * back from the layout — they are the index's contract) and append
    * their files under the matching `centroid_id=` partitions. The
    * operational "vectors keep arriving" path — a retrain is a
    * deliberate rebuild, not a side effect of ingestion. O(batch) IO:
    * existing partitions' files are untouched (append-mode dynamic
    * partition write), searches prune exactly as before and see the
    * new rows immediately. Centroids drift from the true means as
    * batches accumulate — monitor [[inertia]] and rebuild when recall
    * decays (the standard IVF maintenance loop).
    */
  def appendToIvfIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newBatch: DataFrame, idCol: String, vecCol: String,
      countCells: Boolean = false): Array[(Long, Long)] = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val assigned =
      if (readIvfMetric(spark, path) == "cosine")
        assignCosine(newBatch, idCol, vecCol, centroids)
      else assign(newBatch, idCol, vecCol, centroids)
    writeAssignedBatch(assigned, path, countCells)
  }

  /** Append an assigned batch under its `centroid_id=` partitions,
    * optionally returning the batch's per-cell row counts — the
    * O(batch) delta incremental maintenance stats consume (counted
    * from the SAME cached frame the write then reads, so the
    * assignment projection runs once, never O(index) anything).
    */
  private[graft] def writeAssignedBatch(assigned: DataFrame, path: String,
      countCells: Boolean): Array[(Long, Long)] =
    if (!countCells) {
      assigned.write.mode("append").partitionBy("centroid_id")
        .parquet(s"$path/index")
      Array.empty
    } else {
      val cached = assigned.persist()
      try {
        val deltas = cached
          .groupBy(col("centroid_id").cast("long").as("c")).count()
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        cached.write.mode("append").partitionBy("centroid_id")
          .parquet(s"$path/index")
        deltas
      } finally cached.unpersist()
    }

  /** What [[rebalanceIvfCells]] did: how many oversized cells split
    * (across all rounds), how many sub-cells replaced them.
    * `splitCells == 0` means the layout was already within the cap and
    * nothing was touched.
    */
  case class RebalanceReport(splitCells: Int, newCells: Int)

  /** Split oversized IVF cells in place — the incremental answer to
    * append-driven cell growth (FAISS answers with a full retrain;
    * SPANN/DiskANN-style systems split hot postings lists instead,
    * which is this). [[appendToIvfIndex]] keeps centroids fixed, so a
    * corpus that keeps growing concentrates rows in the cells under
    * its drift — probe cost is O(nProbe × cellSize), so one hot cell
    * quietly becomes the whole index's latency floor. A full rebuild
    * re-scans and re-writes EVERY row; this touches only the
    * oversized cells.
    *
    * Mechanics: cells with more than `maxCellRows` rows are read back
    * (partition-pruned — cold cells' files are never opened), split by
    * a within-cell Lloyd k-means into `ceil(rows / maxCellRows)`
    * sub-cells (deterministic seeds: the sub-count lowest-id rows of
    * the cell; every Lloyd iteration is ONE job across ALL splitting
    * cells — per-row argmin is restricted to the row's own cell's
    * sub-centroids by a foreign-cell penalty, so H hot cells cost the
    * same job count as one), assigned fresh centroid ids above the
    * current max, staged to a scratch dir, renamed in (O(1) metadata
    * per new cell), and only then are the old hot partition dirs
    * deleted and the centroid table rewritten (cold centroids
    * unchanged). Searches before/after return identical full-probe
    * results — the split is a repartition of the same row set, and a
    * partial probe ranks the finer cells exactly like any other.
    *
    * Crash window: new partitions land before old ones are deleted,
    * so a crash in between leaves duplicate rows visible to probes
    * that touch both the old and new cell. The index is DERIVED state
    * — re-running the rebalance (idempotent on the re-split cells) or
    * a rebuild clears it; callers who need atomicity rebuild instead.
    *
    * L2 layouts only (a cosine layout's cells are angular; splitting
    * them with an L2 objective would misshape the probe ranking —
    * rebuild those). One sub-cell can end up owning all rows of a
    * degenerate cell (every vector identical): the empty siblings are
    * dropped from the centroid table, and the cell simply stays over
    * the cap — a data property, not a split failure.
    */
  def rebalanceIvfCells(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      maxCellRows: Long, iters: Int = 3): RebalanceReport = {
    require(maxCellRows >= 1, s"maxCellRows must be >= 1, got $maxCellRows")
    require(readIvfMetric(spark, path) == "l2",
      "rebalanceIvfCells supports l2 layouts; rebuild cosine indexes instead")
    // a k-means split is not guaranteed even, so one pass can leave a
    // sub-cell over the cap — iterate to a fixpoint. Cells whose split
    // lands every row in ONE sub (all vectors identical) are frozen:
    // no split can separate them, so they stay over the cap by data
    // property, and retrying forever would not terminate.
    var frozen = Set.empty[Long]
    var totalSplit = 0
    var totalNew = 0
    var progress = true
    var rounds = 0
    while (progress && rounds < 8) {
      val pass = rebalancePass(spark, path, idCol, vecCol, maxCellRows,
        iters, frozen)
      rounds += 1
      totalSplit += pass.size
      totalNew += pass.map(_._2.size).sum
      frozen ++= pass.filter(_._2.size <= 1).flatMap(_._2)
      progress = pass.exists(_._2.size > 1)
    }
    RebalanceReport(totalSplit, totalNew)
  }

  /** Merge undersized IVF cells away — the delete-side complement of
    * [[rebalanceIvfCells]]: tombstone compactions and hot-cell splits
    * leave a long tail of near-empty cells, and probe cost has a
    * per-cell floor (centroid scoring + one partition dir + file-open
    * overhead), so a fragmented index pays it thousands of times for
    * rows that would fit in a handful of cells. Cells with fewer than
    * `minCellRows` rows are dissolved: their centroids leave the
    * table and their rows re-assign to the nearest SURVIVING centroid
    * (the standard argmin projection). Only the dissolved cells' rows
    * move — appended to their target partitions, old dirs dropped —
    * so IO is O(rows in small cells), never the index. Full-probe
    * results are identical before/after (same row set, coarser
    * cover); partial probes rank the merged cells like any others.
    *
    * At least one cell always survives: if EVERY cell is under the
    * floor, the largest cell is kept as the merge target (an index
    * needs a centroid to probe). Same crash-window contract as the
    * split: new files land before old dirs are deleted, and the index
    * is derived state — re-run or rebuild clears a half-applied pass.
    * L2 layouts only, as with the split.
    */
  case class MergeReport(mergedCells: Int, survivingCells: Int)

  def mergeIvfCells(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      minCellRows: Long): MergeReport = {
    require(minCellRows >= 1, s"minCellRows must be >= 1, got $minCellRows")
    require(readIvfMetric(spark, path) == "l2",
      "mergeIvfCells supports l2 layouts; rebuild cosine indexes instead")
    val counts = spark.read.parquet(s"$path/index")
      .withColumn("centroid_id", col("centroid_id").cast("long"))
      .groupBy("centroid_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // the centroid table is the authority — it may hold empty cells
    // (rows deleted by compaction) that must dissolve too
    val oldCents = spark.read.parquet(s"$path/centroids")
      .select(col("centroid_id").cast("long"), col("centroid"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val rowsByCell = counts.toMap
    var small = oldCents.map(_._1)
      .filter(c => rowsByCell.getOrElse(c, 0L) < minCellRows).sorted
    if (small.length == oldCents.length) {
      // keep the fullest cell (ties to the lower id) as the target
      val keep = oldCents.map(_._1)
        .maxBy(c => (rowsByCell.getOrElse(c, 0L), -c))
      small = small.filterNot(_ == keep)
    }
    if (small.isEmpty)
      return MergeReport(0, oldCents.length)
    val survivors = oldCents.filterNot { case (c, _) => small.contains(c) }
    val smallWithRows = small.filter(c => rowsByCell.getOrElse(c, 0L) > 0)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (smallWithRows.nonEmpty) {
      val moving = spark.read.parquet(s"$path/index")
        .filter(col("centroid_id").isin(smallWithRows.toIndexedSeq: _*))
        .drop("centroid_id")
      import spark.implicits._
      val survivorsDF = survivors.toSeq.toDF("centroid_id", "centroid")
      val staging = s"$path/index_merge_staging"
      assign(moving, idCol, vecCol, survivorsDF)
        .repartition(col("centroid_id"))
        .sortWithinPartitions(col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id").parquet(staging)
      fs.listStatus(new org.apache.hadoop.fs.Path(staging))
        .filter(_.getPath.getName.startsWith("centroid_id="))
        .foreach { d =>
          // the target partition may already exist — move the files in
          val dest = new org.apache.hadoop.fs.Path(s"$path/index/${d.getPath.getName}")
          if (!fs.exists(dest)) fs.rename(d.getPath, dest)
          else fs.listStatus(d.getPath).foreach(f =>
            fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dest, f.getPath.getName)))
        }
      fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    }
    small.foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/index/centroid_id=$c"), true)
    }
    import spark.implicits._
    survivors.toSeq.toDF("centroid_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    MergeReport(small.length, survivors.length)
  }

  /** One split pass over the cells currently above the cap (minus
    * `frozen`). Returns (old cell id → the new cell ids its rows
    * landed in); empty when nothing was over the cap.
    */
  private def rebalancePass(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      maxCellRows: Long, iters: Int,
      frozen: Set[Long]): Seq[(Long, Seq[Long])] = {
    val index = spark.read.parquet(s"$path/index")
      .withColumn("centroid_id", col("centroid_id").cast("long"))
    val counts = index.groupBy("centroid_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val hot = counts
      .filter { case (c, n) => n > maxCellRows && !frozen.contains(c) }
      .sortBy(_._1)
    if (hot.isEmpty) return Seq.empty
    val nSub: Map[Long, Int] = hot.map { case (c, n) =>
      c -> math.ceil(n.toDouble / maxCellRows).toInt
    }.toMap
    val hotIds = hot.map(_._1).toIndexedSeq
    val hotRows = spark.read.parquet(s"$path/index")
      .filter(col("centroid_id").isin(hotIds: _*)) // → PartitionFilters
      .withColumn("centroid_id", col("centroid_id").cast("long"))

    // deterministic seeds: each cell's nSub lowest-id rows
    val maxSub = nSub.values.max
    var subs: Seq[((Long, Int), Array[Float])] =
      SimilarityJoin.topKByDistance(
          hotRows.withColumn("_zero", lit(0)), "centroid_id", idCol, "_zero", maxSub)
        .select(col("centroid_id"), col("rn"), col(vecCol))
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1) - 1), r.getSeq[Float](2).toArray))
        .filter { case ((cell, sub), _) => sub < nSub(cell) }
        .sortBy(_._1)
    val dim = subs.head._2.length

    // per-row argmin restricted to the row's own cell via a foreign-cell
    // penalty — all splitting cells advance in ONE job per iteration
    def assignSub(df: DataFrame): DataFrame = {
      val best = array_min(array(subs.map { case ((cell, sub), cvec) =>
        struct(
          when(col("centroid_id") === cell,
            l2_distance(col(vecCol), lit(cvec)).cast("double"))
            .otherwise(lit(Double.MaxValue)).as("d"),
          lit(sub).as("s"))
      }: _*))
      df.withColumn("_sub", best.getField("s"))
    }
    (0 until iters).foreach { _ =>
      val means = assignSub(hotRows)
        .groupBy(col("centroid_id"), col("_sub"))
        .agg(array((0 until dim).map(i =>
          avg(element_at(col(vecCol), i + 1)).cast("float")): _*).as("mean"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getSeq[Float](2).toArray)
        .toMap
      subs = subs.map { case (k, old) => k -> means.getOrElse(k, old) }
    }

    // fresh centroid ids above the persisted max (the centroid table,
    // not the row counts, is the id authority — it may hold empty cells)
    val oldCents = spark.read.parquet(s"$path/centroids")
      .select(col("centroid_id").cast("long"), col("centroid"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val maxCid = oldCents.map(_._1).max
    val newId: Map[(Long, Int), Long] = subs.map(_._1).zipWithIndex
      .map { case (k, i) => k -> (maxCid + 1 + i) }.toMap

    // final assignment → staging dir → O(1) renames → drop old dirs.
    // Every original column (id, vec, liveness generation, ...) rides
    // along untouched; only centroid_id changes.
    val newCidExpr = subs.map(_._1).foldLeft(lit(-1L)) { case (acc, (cell, sub)) =>
      when(col("centroid_id") === cell && col("_sub") === sub,
        lit(newId((cell, sub)))).otherwise(acc)
    }
    val keep = hotRows.columns.filterNot(_ == "centroid_id").toIndexedSeq
    val staging = s"$path/index_rebalance_staging"
    assignSub(hotRows)
      .withColumn("_new_cid", newCidExpr)
      .select(keep.map(col) :+ col("_new_cid").as("centroid_id"): _*)
      .repartition(col("centroid_id"))
      .sortWithinPartitions(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val landed = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
      .filter(_.getPath.getName.startsWith("centroid_id="))
    landed.foreach { d =>
      fs.rename(d.getPath, new org.apache.hadoop.fs.Path(s"$path/index/${d.getPath.getName}"))
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    hotIds.foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/index/centroid_id=$c"), true)
    }

    // centroid table: cold cells unchanged; only sub-cells that landed
    // rows survive (a degenerate all-identical cell keeps one winner)
    val landedIds = landed.map(_.getPath.getName.stripPrefix("centroid_id=").toLong).toSet
    val hotSet = hotIds.toSet
    val kept = oldCents.filterNot { case (cid, _) => hotSet.contains(cid) }.toSeq ++
      subs.collect { case (k, v) if landedIds.contains(newId(k)) => (newId(k), v) }
    import spark.implicits._
    kept.toDF("centroid_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    hotIds.map { c =>
      c -> subs.collect {
        case ((cell, sub), _) if cell == c && landedIds.contains(newId((cell, sub))) =>
          newId((cell, sub))
      }.toSeq
    }.toSeq
  }

  /** IVF search against a [[writeIvfIndex]] layout with SOURCE-LEVEL
    * partition pruning: the probed cell set (≤ queries × nProbe ids —
    * planner state, like the centroids themselves) becomes a static
    * `IN` filter on the partition column, so the parquet scan's
    * `PartitionFilters` skips every unprobed cell's files. Results are
    * identical to [[ivfSearchL2]] over the full index (asserted in
    * AnnSpec); only the scanned volume changes.
    */
  /** @param rowFilter applied to the pruned index scan BEFORE scoring —
    *   the hook a caller with row-liveness state (e.g. the store's
    *   tombstone mask) uses so dead rows can never occupy a top-k slot.
    */
  def ivfSearchL2Pruned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int,
      rowFilter: DataFrame => DataFrame = identity): DataFrame =
    ivfSearchPrunedCore(spark, path, idCol, vecCol, queries, qidCol,
      qvecCol, k, nProbe, rowFilter,
      cellScore = (q, c) => l2_distance(q, c),
      rowDistance = (v, q) => l2_distance(v, q))

  /** Pruned IVF search that dispatches on the layout's persisted
    * metric ([[readIvfMetric]]): L2 distance for "l2", cosine DISTANCE
    * `1 − sim` (one IEEE float32 subtraction, so smaller-is-better and
    * the (distance, id) tie-break carry over unchanged) for "cosine".
    * The store facade routes through this so one search entry point
    * serves both index kinds.
    */
  def ivfSearchPruned(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int,
      rowFilter: DataFrame => DataFrame = identity): DataFrame =
    readIvfMetric(spark, path) match {
      case "cosine" =>
        ivfSearchPrunedCore(spark, path, idCol, vecCol, queries, qidCol,
          qvecCol, k, nProbe, rowFilter,
          cellScore = (q, c) => -cosine_similarity(q, c),
          rowDistance = (v, q) => lit(1.0f) - cosine_similarity(v, q))
      case _ =>
        ivfSearchL2Pruned(spark, path, idCol, vecCol, queries, qidCol,
          qvecCol, k, nProbe, rowFilter)
    }

  private def ivfSearchPrunedCore(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int,
      rowFilter: DataFrame => DataFrame,
      cellScore: (Column, Column) => Column,
      rowDistance: (Column, Column) => Column): DataFrame = {
    val centroids = spark.read.parquet(s"$path/centroids")
    val probed = probeCells(queries, qidCol, qvecCol, centroids,
      cellScore, nProbe)
    scanProbedCells(spark, path, idCol, vecCol, probed, qidCol, qvecCol,
      k, rowFilter, rowDistance)
  }

  /** Partition-pruned scan + score + top-k over an already-probed
    * (qid, qvec, centroid_id) relation — the tail every probe strategy
    * (flat, metric-dispatched, hierarchical) shares.
    */
  private def scanProbedCells(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      probed: DataFrame, qidCol: String, qvecCol: String,
      k: Int,
      rowFilter: DataFrame => DataFrame,
      rowDistance: (Column, Column) => Column): DataFrame = {
    // ≤ queries × nProbe cell ids — planner state, like the centroids
    val cells = probed.select(col("centroid_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted
    val indexed = rowFilter(spark.read.parquet(s"$path/index")
      .filter(col("centroid_id").isin(cells.toIndexedSeq: _*)) // → PartitionFilters
      .withColumn("centroid_id", col("centroid_id").cast("long")))
    val scored = indexed
      .join(broadcast(probed.withColumn("centroid_id", col("centroid_id").cast("long"))),
        Seq("centroid_id"))
      .withColumn("distance", rowDistance(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("distance"))
    SimilarityJoin.topKByDistance(scored, qidCol, idCol, "distance", k)
  }

  /** Two-level coarse quantizer over a persisted [[writeIvfIndex]]
    * layout — the probe-stage scale fix. A 100 TB IVF wants ~√N cells
    * (10⁵-10⁷), and the flat probe scores EVERY cell centroid per
    * query: the centroid table stops being "planner state" and the
    * probe becomes the bottleneck before any data is scanned. The
    * standard fix (FAISS IMI / coarse-HNSW routing) adds a second
    * quantizer OVER THE CENTROIDS: queries score `nSuper` super-cells
    * (√C of them), keep `superProbe`, and rank only the cells routed
    * to those super-cells — probe flops drop from O(C) to
    * O(√C + superProbe · C/√C).
    *
    * The hierarchy is an AUXILIARY routing structure under
    * `<path>/super`: the index rows, the centroid table, appends,
    * deletes, and every existing search path are untouched. k-means
    * runs over the CENTROIDS (√C rows — trivially cheap); each cell
    * routes to its nearest super-centroid. Rebuilds that rewrite the
    * centroid table (rebalance/merge/retrain) invalidate the routing —
    * callers drop/rebuild the super quantizer with them (the store
    * facade does this automatically). L2 layouts only.
    */
  def buildSuperQuantizer(
      spark: org.apache.spark.sql.SparkSession, path: String,
      nSuper: Int, iters: Int = 5): Unit = {
    require(readIvfMetric(spark, path) == "l2",
      "buildSuperQuantizer supports l2 layouts")
    val cells = spark.read.parquet(s"$path/centroids")
      .select(col("centroid_id").cast("long").as("cell_id"),
        col("centroid"))
    val supers = kmeans(cells, "cell_id", "centroid", nSuper, iters,
      seedRounds = 0)
    val routing = assign(cells, "cell_id", "centroid", supers)
      .select(col("cell_id"), col("centroid_id").as("super_id"))
    supers.select(col("centroid_id").as("super_id"),
        col("centroid").as("super_centroid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/super/centroids")
    routing.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/super/routing")
  }

  def hasSuperQuantizer(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/super/centroids")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Hierarchically-routed pruned IVF search: probe `superProbe`
    * super-cells, rank only their routed cells, keep `nProbe`, then
    * the shared partition-pruned scan. `superProbe` = nSuper and
    * `nProbe` = nCells degenerate to the flat probe's exact ranking
    * (every cell is a candidate, and cell ranking among identical
    * candidate sets is identical).
    */
  def ivfSearchL2PrunedHier(
      spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int, superProbe: Int,
      rowFilter: DataFrame => DataFrame = identity): DataFrame = {
    require(superProbe >= 1, s"superProbe must be >= 1, got $superProbe")
    require(hasSuperQuantizer(spark, path),
      s"no super quantizer at $path/super — buildSuperQuantizer first " +
        "(and rebuild it after any rebalance/merge/retrain)")
    val supers = spark.read.parquet(s"$path/super/centroids")
      .select(col("super_id").as("centroid_id"),
        col("super_centroid").as("centroid"))
    val probedSupers = probeCells(queries, qidCol, qvecCol, supers,
        (q, c) => l2_distance(q, c), superProbe)
      .withColumnRenamed("centroid_id", "super_id")
    val routing = spark.read.parquet(s"$path/super/routing")
    val centroids = spark.read.parquet(s"$path/centroids")
      .select(col("centroid_id").cast("long").as("cell_id"), col("centroid"))
    // candidate cells per query: only those routed to probed supers —
    // the whole point: Q × (cells under superProbe supers) scored
    // pairs instead of Q × C
    val cand = probedSupers
      .join(broadcast(routing), Seq("super_id"))
      .join(broadcast(centroids), Seq("cell_id"))
      .withColumn("cdist", l2_distance(col(qvecCol), col("centroid")))
      .select(col(qidCol), col(qvecCol), col("cell_id").as("centroid_id"),
        col("cdist"))
    val probed = SimilarityJoin.topKByDistance(cand, qidCol, "centroid_id",
        "cdist", nProbe)
      .select(col(qidCol), col(qvecCol), col("centroid_id"))
    scanProbedCells(spark, path, idCol, vecCol, probed, qidCol, qvecCol,
      k, rowFilter, (v, q) => l2_distance(v, q))
  }

  /** Rank cells per query (small: queries × centroids) and keep the
    * `nProbe` best — the probe stage every IVF search variant shares.
    * `cellScore` is smaller-is-better over (query vec, centroid).
    */
  private def probeCells(
      queries: DataFrame, qidCol: String, qvecCol: String,
      centroids: DataFrame, cellScore: (Column, Column) => Column,
      nProbe: Int): DataFrame =
    SimilarityJoin.topKByDistance(
      queries.crossJoin(broadcast(centroids))
        .withColumn("cdist", cellScore(col(qvecCol), col("centroid")))
        .select(col(qidCol), col(qvecCol), col("centroid_id"), col("cdist")),
      qidCol, "centroid_id", "cdist", nProbe)
      .select(col(qidCol), col(qvecCol), col("centroid_id"))

  /** IVF search: probe the `nProbe` nearest cells per query, brute-force
    * only within probed cells. Exact within recall limits of the probe
    * set; nProbe = nCentroids degenerates to exact search.
    */
  def ivfSearchL2(
      indexed: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int, nProbe: Int): DataFrame = {
    // rank cells per query (small: queries × centroids)
    val probed = probeCells(queries, qidCol, qvecCol, centroids,
      (q, c) => l2_distance(q, c), nProbe)
    // candidates: equi-join on cell id — prunes the index scan
    val scored = indexed
      .join(broadcast(probed), Seq("centroid_id"))
      .withColumn("distance", l2_distance(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("distance"))
    SimilarityJoin.topKByDistance(scored, qidCol, idCol, "distance", k)
  }

  /** Hamming k-NN over sign-bit sketches ([[VectorOps.signSketch]]):
    * pack both sides to `ceil(dim/32)` 32-bit words, broadcast the
    * (tiny) packed queries, score with XOR + popcount, per-query top-k
    * with the (distance, id) tie-break.
    *
    * The first-pass shape for binary-sketch retrieval at 100 TB: the
    * index-side scan reads 8 bytes per 64-dim vector instead of 256,
    * the distance is integer ALU work inside whole-stage codegen, and
    * nothing shuffles but the window's per-query candidate rows. Exact
    * over the sketch (an EXACT oracle replays it); approximate for the
    * underlying angular distance — rerank the top-k with the full
    * vectors when the sketch is the outer filter.
    */
  def hammingTopK(
      index: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dim: Int, k: Int): DataFrame = {
    val idx = index.select(col(idCol),
      VectorOps.signSketch(col(vecCol), dim).as("_sig"))
      // materialize the 8-byte-per-64-dim sketches behind an exchange
      // (the jaccardPairs idiom): under the broadcast cross join,
      // codegen defers stream-side column evaluation into the pair
      // loop, so the 64-branch packing expression was re-evaluated
      // once per (row, query) PAIR — measured 1.7 s vs 0.25 s for the
      // materialized form on the sf0.1 sweep arm. The exchange carries
      // (id, sketch) rows only — 16 bytes/row, the scan never re-runs.
      .repartition(col(idCol))
    val q = queries.select(col(qidCol),
      VectorOps.signSketch(col(qvecCol), dim).as("_qsig"))
    val scored = idx.crossJoin(broadcast(q))
      .withColumn("hamming", VectorOps.hammingDistance(col("_sig"), col("_qsig")))
      .select(col(qidCol), col(idCol), col("hamming"))
    SimilarityJoin.topKByDistance(scored, qidCol, idCol, "hamming", k)
  }

  /** Two-stage binary-quantization retrieval (the modern vector-DB
    * default, e.g. FAISS' IndexBinaryFlat + refine or pgvector's
    * binary-quantize + rescore): a Hamming sign-sketch prefilter
    * shortlists `shortlist` candidates per query, then ONLY those
    * rows are rescored with the exact float metric and cut to top-k.
    *
    * Scale shape: stage 1 is the [[hammingTopK]] scan — 8 bytes read
    * per 64-dim vector, integer XOR+popcount inside whole-stage
    * codegen, nothing shuffles but per-query candidate rows. Stage 2
    * touches |queries|·shortlist rows (NOT the index): the candidate
    * ids semi-bound an equi-join back to the full vectors, queries
    * broadcast, so full-precision arithmetic runs on a vanishing
    * fraction of the corpus. Recall is the sketch's (tunable via
    * `shortlist`); the FINAL ranking is exact over the shortlist —
    * both stages are deterministic, so an EXACT oracle replays the
    * whole pipeline (packing, popcount, shortlist cut, rescore).
    */
  def hammingRescoreTopK(
      index: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dim: Int, shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) to fill the top-k")
    val cand = hammingTopK(index, idCol, vecCol, queries, qidCol, qvecCol,
        dim, shortlist)
      .select(col(qidCol), col(idCol))
    val rescored = cand
      .join(index.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .withColumn("distance", l2_distance(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("distance"))
    SimilarityJoin.topKByDistance(rescored, qidCol, idCol, "distance", k)
  }

  /** Matryoshka (MRL) two-stage retrieval (Kusupati et al. NeurIPS
    * 2022 — the truncatable-embedding serving pattern modern
    * embedding APIs ship): stage 1 ranks by L2 over only the FIRST
    * `prefixDim` components (MRL training packs coarse semantics into
    * the prefix, so a 16-of-64 slice preserves most of the ranking),
    * shortlists `shortlist` candidates per query, and stage 2
    * re-ranks ONLY those by exact full-dimension L2, cut to top-k
    * with the standard (distance, id) tie-break.
    *
    * Scale shape: the stage-1 scan reads `prefixDim/dim` of the
    * vector bytes (a `slice` projection inside whole-stage codegen —
    * with a column layout that stores the prefix separately the scan
    * itself shrinks, the dimension analog of the SQ/PQ byte
    * ladders); stage 2 touches |queries|·shortlist rows, never the
    * corpus. Both stages are deterministic slices and float32
    * arithmetic — NO trained state — so an EXACT oracle replays the
    * whole pipeline including partial shortlists (the strongest
    * oracle class; the quantized paths only replay at
    * refine-degenerate settings). `prefixDim` = dim degenerates
    * stage 1 to exact and the shortlist to a no-op.
    */
  def matryoshkaRescoreTopK(
      index: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      prefixDim: Int, shortlist: Int, k: Int): DataFrame = {
    require(prefixDim >= 1, s"prefixDim must be >= 1, got $prefixDim")
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) to fill the top-k")
    val scored = index
      .crossJoin(broadcast(queries))
      .withColumn("pdist", l2_distance(
        slice(col(vecCol), 1, prefixDim), slice(col(qvecCol), 1, prefixDim)))
      .select(col(qidCol), col(idCol), col("pdist"))
    val cand = SimilarityJoin.topKByDistance(scored, qidCol, idCol,
        "pdist", shortlist)
      .select(col(qidCol), col(idCol))
    val rescored = cand
      .join(index.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qidCol), col(qvecCol))), Seq(qidCol))
      .withColumn("distance", l2_distance(col(vecCol), col(qvecCol)))
      .select(col(qidCol), col(idCol), col("distance"))
    SimilarityJoin.topKByDistance(rescored, qidCol, idCol, "distance", k)
  }

  /** Pick an index configuration from a recall-vs-cost sweep (the
    * `ir_ann_sweep` output shape): among arms whose MEAN recall meets
    * `minRecall`, the one scanning the fewest rows — the question a
    * user actually asks a tuning sweep ("cheapest config that still
    * hits 0.9"), answered from the frontier instead of eyeballed.
    * Ties break toward higher recall, then config name. Returns one
    * row (config, mean_recall, mean_scanned) — empty if no arm
    * qualifies (caller should widen the sweep, not silently degrade).
    *
    * `sweep` needs (configCol, recallCol, scannedCol) per (arm, query);
    * aggregation to arm means happens here so callers pass the raw
    * per-query frame.
    */
  def chooseConfig(sweep: DataFrame, minRecall: Double,
      configCol: String = "config", recallCol: String = "recall",
      scannedCol: String = "scanned"): DataFrame = {
    require(minRecall >= 0.0 && minRecall <= 1.0,
      s"minRecall must be in [0, 1], got $minRecall")
    sweep.groupBy(col(configCol))
      .agg(avg(col(recallCol)).as("mean_recall"),
        avg(col(scannedCol)).as("mean_scanned"))
      .filter(col("mean_recall") >= minRecall)
      .orderBy(col("mean_scanned").asc, col("mean_recall").desc,
        col(configCol).asc)
      .limit(1)
  }
}
