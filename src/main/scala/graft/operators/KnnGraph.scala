package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.l2_distance

/** Batch k-NN-graph construction by NN-Descent (Dong, Moses & Li,
  * "Efficient k-nearest neighbor graph construction for generic
  * similarity measures", WWW 2011) — the standard all-pairs-free
  * primitive behind graph-ANN serving handoffs (NSG/Vamana builds
  * start from one) and similarity-graph analyses (components /
  * clustering over the `gr_*` family).
  *
  * The idea: a neighbor of a neighbor is likely a neighbor. Start from
  * an arbitrary k-neighbor list per node, then repeatedly (a) form the
  * GENERAL neighborhood of each node (its list plus everyone who lists
  * it, each side capped at the list width by (distance, id)), (b)
  * propose every pair that co-occurs in some node's general
  * neighborhood and involves at least one NEW entry (the
  * incremental-search flag from §2.3 of the paper — converged regions
  * stop generating work), (c) score proposals and fold them into each
  * endpoint's top list. Stop when an iteration changes nothing (or
  * `maxIters` hits).
  *
  * Spark shape — everything is equi-joins and bounded per-node state,
  * no crossJoin anywhere: per node the general neighborhood is ≤
  * 2·buildK rows, so one iteration proposes ≤ n·(2·buildK)² candidate
  * edges, each scored once per appearance after a distinct. Vectors
  * travel only through two id-equi-joins per iteration (8-byte keys
  * otherwise); per-iteration lineage is cut with an eager
  * localCheckpoint and the PREVIOUS checkpoint is unpersisted, so long
  * runs stay flat. Empty-convergence is detected by the update count,
  * so converged corpora pay one no-op iteration.
  *
  * Determinism: the seed graph links each node to its successors in
  * xxhash64-scrambled order (a data-dependent but RNG-free spread),
  * every top-k ranks by (float32 L2, id), and proposals dedupe before
  * scoring — same input, same graph, every run.
  *
  * Returns (id, nbr, distance float32, rank 1..k) — exactly k rows per
  * node for corpora with > k nodes. At convergence on well-behaved
  * data this IS the exact k-NN graph (gated EXACT against the
  * brute-force oracle); like every NN-Descent it is formally a local
  * optimum, so `maxIters` bounds the work either way.
  */
object KnnGraph {

  case class Report(graph: DataFrame, iterations: Int, converged: Boolean)

  /** Distance kernel shared by the descent and every serving walk:
    * L2, or cosine DISTANCE `1 − cos` (both float32 codegen
    * expressions; the subtraction keeps smaller-is-better, so every
    * ranking window and beam truncation is metric-blind).
    */
  private[graft] def distExpr(metric: String,
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    if (metric == "cosine")
      (lit(1f) - graft.functions.cosine_similarity(a, b)).cast("float")
    else l2_distance(a, b)

  private[graft] def requireMetric(metric: String): Unit =
    require(metric == "l2" || metric == "cosine",
      s"metric must be 'l2' or 'cosine', got '$metric'")

  /** @param buildK the neighbor-list width the DESCENT maintains
    *   (>= k; 0 = auto, max(2k, k+8)). NN-Descent's recall knob: wider
    *   lists widen each general neighborhood, which is what rescues
    *   concentrated high-dimensional data from early local optima —
    *   the paper's K vs the output k. Output is always top-k.
    */
  def nnDescent(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIters: Int = 25, buildK: Int = 0,
      metric: String = "l2"): Report = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buildK == 0 || buildK >= k, s"buildK ($buildK) must be >= k ($k)")
    requireMetric(metric)
    val points = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec")).localCheckpoint(true)
    val n = points.count()
    require(n > k, s"k-NN graph needs more than k=$k nodes, got $n")
    val kb = effectiveBuildK(k, buildK, n)
    val seeds = seedEdges(points.select(col("id")), points.select(col("id")), kb)
    val init = scoreEdges(points, seeds, metric)
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= kb)
      .drop("rank")
      .withColumn("new", lit(true))
      .localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(seeds)
    descend(points, init, k, kb, maxIters, metric)
  }

  /** O(batch)-seeded INCREMENTAL maintenance: fold `newBatch` into an
    * already-built graph without restarting the descent from scratch —
    * the 100 TB posture (a corpus-scale graph is maintained, not
    * rebuilt per ingest). The prior graph's entries enter the descent
    * NOT-fresh (converged regions generate no proposals until a new
    * node reaches them through a reverse edge); only the new nodes are
    * seeded (scrambled-order successors over the UNION corpus) and
    * marked fresh, so the first iterations' work scales with the batch
    * and its neighborhoods, not the corpus. Old nodes adopt new
    * neighbors through the same general-neighborhood propagation (a
    * new node listing an old one puts itself in that node's reverse
    * set). Converges to the same fixpoint as a from-scratch build on
    * well-behaved data (gated EXACT against the union brute force).
    *
    * `priorGraph` is a previous [[Report.graph]] (or any (id, nbr,
    * distance) edge set over `oldPoints`).
    */
  def nnDescentAppend(oldPoints: DataFrame, priorGraph: DataFrame,
      newBatch: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIters: Int = 25, buildK: Int = 0,
      metric: String = "l2"): Report = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buildK == 0 || buildK >= k, s"buildK ($buildK) must be >= k ($k)")
    requireMetric(metric)
    val old = oldPoints.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    val fresh = newBatch.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec"))
    val points = old.unionAll(fresh).localCheckpoint(true)
    val n = points.count()
    require(n > k, s"k-NN graph needs more than k=$k nodes, got $n")
    val kb = effectiveBuildK(k, buildK, n)
    val prior = priorGraph.select(col("id").cast("long").as("id"),
        col("nbr").cast("long").as("nbr"),
        col("distance").cast("float").as("distance"))
      .withColumn("new", lit(false))
    val seeds = seedEdges(fresh.select(col("id")), points.select(col("id")), kb)
    val init = prior.unionAll(
        scoreEdges(points, seeds, metric).withColumn("new", lit(true)))
      .groupBy(col("id"), col("nbr"))
      .agg(min(col("distance")).as("distance"), max(col("new")).as("new"))
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= kb)
      .drop("rank")
      .localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(seeds)
    descend(points, init, k, kb, maxIters, metric)
  }

  /** SHARDED build — the public DiskANN/Vamana sharded-build recipe
    * (Subramanya et al., NeurIPS'19 §4.3: partition with a coarse
    * k-means, build per shard, merge the per-shard lists) re-expressed
    * in the descent's own machinery, for corpora where a cold global
    * descent pays 15–20 full-volume iterations:
    *
    *  1. coarse geometry: a cheap k-means (`nShards` centers, coverage
    *     not convergence) assigns every point to its `replicas`
    *     nearest cells;
    *  2. shard-local descent: ONE run of the shared [[descend]] loop
    *     over surrogate node ids seeded with PER-SHARD scrambled
    *     rings — proposals propagate only through existing
    *     neighborhoods, so shard-locality holds by construction (no
    *     shard column in any join), every shard advances in the same
    *     Spark jobs, and small-diameter shards converge in a fraction
    *     of the global iteration count (the k-means pre-localization
    *     is a far better init than a global scrambled ring);
    *  3. merge: per-shard lists union per underlying node
    *     (min-distance dedupe) — with `replicas` ≥ 2 boundary nodes
    *     already carry cross-shard edges (the DiskANN overlap);
    *  4. stitch: [[nnDescentWarm]] polish — the merged graph enters a
    *     global descent all-fresh, so boundary-damaged neighborhoods
    *     repair in a couple of global iterations instead of a cold
    *     run's ten-plus, and the result converges to the same fixpoint
    *     as a single-shot build on well-behaved data (gated EXACT).
    *
    * `shardIters` 0 = `maxIters`; `polishIters` 0 = polish to
    * convergence (`maxIters`), negative = SKIP the polish (cost
    * probes; the merged graph is then returned top-k with shard-local
    * quality only — boundary recall is whatever the overlap bought,
    * and nodes in singleton shards may be missing entirely).
    */
  def nnDescentSharded(df: DataFrame, idCol: String, vecCol: String,
      k: Int, nShards: Int, maxIters: Int = 25, buildK: Int = 0,
      metric: String = "l2", replicas: Int = 2, shardIters: Int = 0,
      polishIters: Int = 0, shardBuildK: Int = 0): Report = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(replicas >= 1 && replicas <= 4,
      s"replicas must be in 1..4, got $replicas")
    require(buildK == 0 || buildK >= k, s"buildK ($buildK) must be >= k ($k)")
    require(shardBuildK == 0 || shardBuildK >= k,
      s"shardBuildK ($shardBuildK) must be >= k ($k)")
    requireMetric(metric)
    val debug = sys.env.contains("GRAFT_KNNGRAPH_DEBUG")
    var tLast = System.nanoTime()
    def mark(label: String): Unit = if (debug) {
      val now = System.nanoTime()
      println(f"nnDescentSharded $label%-16s ${(now - tLast) / 1e9}%8.2f s")
      tLast = now
    }
    val shim = org.apache.spark.sql.graftshim.GraftShim
    val points = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec")).localCheckpoint(true)
    val n = points.count()
    require(n > k, s"k-NN graph needs more than k=$k nodes, got $n")
    val kb = effectiveBuildK(k, buildK, n)
    // the shard phase may run NARROWER lists than the polish (the
    // classic coarse-build / fine-refine split): per-iteration
    // proposal volume is ∝ kb², so shardBuildK = 20 vs 32 runs the
    // dominant phase at 0.4× the volume and lets the full-width polish
    // recover list quality
    val kbS = effectiveBuildK(k,
      if (shardBuildK > 0) shardBuildK else kb, n)
    val kCells = math.min(nShards.toLong, n).toInt
    val cents =
      if (metric == "cosine") Ann.kmeansCosine(points, "id", "vec", kCells,
        iters = 3, seedRounds = 0)
      else Ann.kmeans(points, "id", "vec", kCells, iters = 3, seedRounds = 0)
    mark("kmeans")
    val rr = math.min(replicas, kCells)
    // each point's `rr` nearest cells; slot 0 = primary. The surrogate
    // id (id·replicas + slot) is UNIQUE per (id, slot) — decoding goes
    // through the sidMap join below, never arithmetic
    val assigned = SimilarityJoin.topKByDistance(
        points.crossJoin(broadcast(cents))
          .withColumn("cd", distExpr(metric, col("vec"), col("centroid")))
          .select(col("id"), col("centroid_id"), col("cd")),
        "id", "centroid_id", "cd", rr)
      .select(col("centroid_id").as("shard"), col("id"),
        (col("rn") - 1).cast("long").as("slot"))
    val surro = assigned.join(points, Seq("id"))
      .select((col("id") * lit(replicas.toLong) + col("slot")).as("sid"),
        col("shard"), col("id").as("uid"), col("vec"))
      .localCheckpoint(true)
    val sidMap = surro.select(col("sid"), col("uid"))
    // descend unpersists the point frame it is handed (plan-walk over
    // LogicalRDDs) — give it its OWN checkpoint so surro (backing
    // sidMap, which the merge reads AFTER the descent) survives
    val surroPts = surro.select(col("sid").as("id"), col("vec"))
      .localCheckpoint(true)
    mark("assign+surro")
    val seeds = seedEdgesSharded(
      surro.select(col("shard"), col("sid").as("id")), kbS)
    val init = scoreEdges(surroPts, seeds, metric)
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= kbS)
      .drop("rank")
      .withColumn("new", lit(true))
      .localCheckpoint(true)
    shim.unpersistLocalCheckpoint(seeds)
    mark("seeds+init")
    // k = kbS here: the merge wants the FULL shard-phase list width,
    // the final top-k cut happens after the polish
    val shardRep = descend(surroPts, init, kbS, kbS,
      if (shardIters > 0) shardIters else maxIters, metric)
    mark("shard descend")
    val merged = shardRep.graph
      .join(sidMap, shardRep.graph("id") === sidMap("sid"))
      .select(col("uid").as("id"), col("nbr"), col("distance"))
      .join(sidMap.select(col("sid").as("nbr"), col("uid").as("nuid")),
        Seq("nbr"))
      .select(col("id"), col("nuid").as("nbr"), col("distance"))
      .filter(col("id") =!= col("nbr"))
      .groupBy(col("id"), col("nbr"))
      .agg(min(col("distance")).as("distance"))
    val rep =
      if (polishIters < 0) {
        val g = merged
          .withColumn("rank", row_number().over(wTop))
          .filter(col("rank") <= k)
          .localCheckpoint(true)
        Report(g, shardRep.iterations, shardRep.converged)
      } else {
        val r = nnDescentWarm(points, "id", "vec", merged,
          k = k, maxIters = if (polishIters > 0) polishIters else maxIters,
          buildK = buildK, metric = metric)
        r.copy(iterations = shardRep.iterations + r.iterations)
      }
    mark("merge+polish")
    for (aux <- Seq(points, surro, shardRep.graph))
      shim.unpersistLocalCheckpoint(aux)
    rep
  }

  /** Per-shard scrambled seed rings over (shard, id): each node links
    * to its `kb` successors in xxhash64-scrambled order WITHIN ITS
    * SHARD (cyclic) — [[seedEdges]] with the ring per shard. Shards
    * smaller than kb+1 wrap (deduped); singletons yield no edges.
    */
  private def seedEdgesSharded(assigned: DataFrame, kb: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(xxhash64(col("id")), col("id"))
    val pos = assigned.select(col("shard"), col("id"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .localCheckpoint(true)
    val sizes = pos.groupBy(col("shard")).agg(count(lit(1)).as("m"))
    val withM = pos.join(broadcast(sizes), Seq("shard"))
    val out = (1 to kb).map { j =>
      withM.select(col("shard"), col("id"),
          pmod(col("pos") + j, col("m")).as("pos2"))
        .join(pos.select(col("shard"), col("pos").as("pos2"),
          col("id").as("nbr")), Seq("shard", "pos2"))
        .filter(col("id") =!= col("nbr"))
        .select(col("id"), col("nbr"))
    }.reduce(_ unionAll _).distinct().localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(pos)
    out
  }

  /** WARM-STARTED build: the descent over `df` initialized from a
    * prior edge set instead of scrambled-order seeds — for callers
    * holding a converged graph of a closely-related corpus (a superset
    * whose restriction to the current ids is near-correct, or a
    * sharded build's stitched merge). Prior edges are restricted to
    * the current id set ON BOTH ENDPOINTS and their recorded distances
    * reused verbatim (the caller's contract: same vectors, same
    * metric); nodes the restriction under-fills below `buildK` get the
    * cold start's scrambled-order seed padding. Every initial edge
    * enters FRESH, so the first iteration re-proposes through every
    * neighborhood (restriction damage repairs), after which a
    * near-correct prior converges in a couple of iterations instead of
    * the cold start's ten-plus — same fixpoint, descent cost
    * proportional to how wrong the prior was.
    */
  def nnDescentWarm(df: DataFrame, idCol: String, vecCol: String,
      priorGraph: DataFrame, k: Int, maxIters: Int = 25, buildK: Int = 0,
      metric: String = "l2"): Report = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(buildK == 0 || buildK >= k, s"buildK ($buildK) must be >= k ($k)")
    requireMetric(metric)
    val points = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("vec")).localCheckpoint(true)
    val n = points.count()
    require(n > k, s"k-NN graph needs more than k=$k nodes, got $n")
    val kb = effectiveBuildK(k, buildK, n)
    val ids = points.select(col("id"))
    val prior = priorGraph.select(col("id").cast("long").as("id"),
        col("nbr").cast("long").as("nbr"),
        col("distance").cast("float").as("distance"))
      .join(ids, Seq("id"), "left_semi")
      .join(ids.select(col("id").as("nbr")), Seq("nbr"), "left_semi")
    val underFilled = ids.join(
      prior.groupBy(col("id")).agg(count(lit(1)).as("c"))
        .filter(col("c") >= kb).select(col("id")),
      Seq("id"), "left_anti")
    val seeds = seedEdges(underFilled, ids, kb)
    // thin global bridge ring: a warm prior can be DISCONNECTED (e.g.
    // per-shard merges with no overlap) and neighbor-of-neighbor can
    // never cross a component gap on its own — min(4, kb) scrambled
    // global successors per node restore the cold start's connectivity
    // guarantee at a fraction of its seed volume
    val bridges = seedEdges(ids, ids, math.min(4, kb))
    val init = prior
      .unionAll(scoreEdges(points,
        seeds.unionAll(bridges).distinct(), metric))
      .groupBy(col("id"), col("nbr"))
      .agg(min(col("distance")).as("distance"))
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= kb)
      .drop("rank")
      .withColumn("new", lit(true))
      .localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(seeds)
    org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(bridges)
    descend(points, init, k, kb, maxIters, metric)
  }

  /** Batch greedy beam search over a built k-NN graph — the
    * HNSW/Vamana-style serving walk on a flat graph, run for a whole
    * query BATCH at once (each iteration expands every query's
    * frontier in the same jobs; Spark amortizes the hop across the
    * batch instead of walking queries one by one).
    *
    * This is the IN-MEMORY arm: it takes the graph as a frame and pays
    * an O(E) undirected-adjacency derivation + O(n) entry selection
    * per call — right for one-shot searches over a graph you already
    * hold. The SERVING entry point is the persisted
    * [[KnnGraphIndex.search]] (via `VectorStore.searchGraphDF`): built
    * medoid entries, bucket-pruned hops, no per-call prep — at the 1M
    * smoke it reads ~35× fewer records per batch than this operator.
    *
    * The walk:
    *
    *  1. every query starts at the same `nEntries` deterministic entry
    *     nodes (scrambled-order heads — the RNG-free spread);
    *  2. each hop expands the UNSEEN neighbors (graph treated
    *     undirected — reverse edges double the out-degree and rescue
    *     greedy walks from directed dead ends) of the nodes that
    *     entered the beam last hop, scores them against the query, and
    *     keeps the best `ef` visited per query;
    *  3. stops when no unseen candidate makes any query's beam (or
    *     `maxHops`).
    *
    * Per-query state is bounded by `ef`; a hop's candidate volume by
    * |frontier| × 2·degree; vectors travel through one id join per
    * hop. `ef` is the recall knob (ef ≥ corpus degenerates to exact on
    * a connected graph). Returns (qid, id, distance float32, rank
    * 1..k).
    */
  def searchGraph(points: DataFrame, graph: DataFrame, queries: DataFrame,
      qidCol: String, qvecCol: String, k: Int, ef: Int,
      nEntries: Int = 4, maxHops: Int = 30): DataFrame = {
    require(k >= 1 && ef >= k, s"need ef ($ef) >= k ($k) >= 1")
    require(nEntries >= 1, s"nEntries must be >= 1, got $nEntries")
    val pts = points.select(col("id").cast("long").as("id"), col("vec"))
      .localCheckpoint(true)
    val qs = queries.select(col(qidCol).cast("long").as("qid"),
      col(qvecCol).as("qvec")).localCheckpoint(true)
    val und = graph.select(col("id").cast("long").as("node"),
        col("nbr").cast("long").as("cand"))
      .unionAll(graph.select(col("nbr").cast("long").as("node"),
        col("id").cast("long").as("cand")))
      .distinct().localCheckpoint(true)
    val entries = pts.select(col("id"))
      .orderBy(xxhash64(col("id")), col("id")).limit(nEntries)
    def scoreCands(cands: DataFrame): DataFrame = cands
      .join(pts, Seq("id"))
      .join(qs, Seq("qid"))
      .select(col("qid"), col("id"),
        l2_distance(col("vec"), col("qvec")).as("distance"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("distance"), col("id"))
    var visited = scoreCands(
        qs.select(col("qid")).crossJoin(entries))
      .withColumn("new", lit(true))
      .localCheckpoint(true)
    // the seen set is SEPARATE from the beam: a node evicted from the
    // top-ef beam must stay ineligible for re-proposal (it can never
    // re-enter — the ef-th distance only tightens), otherwise later
    // hops re-score evicted nodes every time a frontier touches them.
    // Per-hop CHECKPOINTED DELTAS unioned lazily for the anti-join —
    // re-materializing the whole set each hop pays O(total-seen)
    // writes per tail hop (see KnnGraphIndex.searchCore)
    var seenParts: List[DataFrame] =
      List(visited.select(col("qid"), col("id")).localCheckpoint(true))
    var hops = 0
    var done = false
    while (hops < maxHops && !done) {
      hops += 1
      val frontier = visited.filter(col("new"))
        .select(col("qid"), col("id").as("node"))
      val unseen = frontier.join(und, Seq("node"))
        .select(col("qid"), col("cand").as("id")).distinct()
        .join(seenParts.reduce(_ unionAll _), Seq("qid", "id"), "left_anti")
        .localCheckpoint(true) // consumed twice: scoring + seen fold
      val merged = visited.select(col("qid"), col("id"), col("distance"),
          lit(false).as("fresh"))
        .unionAll(scoreCands(unseen).withColumn("fresh", lit(true)))
        .withColumn("rn", row_number().over(wq)).filter(col("rn") <= ef)
        .drop("rn")
        .withColumnRenamed("fresh", "new")
        .localCheckpoint(true)
      seenParts = unseen :: seenParts // already checkpointed above
      val grew = merged.filter(col("new")).count()
      if (sys.env.contains("GRAFT_KNNGRAPH_DEBUG"))
        println(s"searchGraph hop $hops: $grew beam entries")
      org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(visited)
      visited = merged
      done = grew == 0L
    }
    // only the final beam checkpoint backs the returned frame
    for (aux <- Seq(pts, qs, und) ++ seenParts)
      org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(aux)
    visited
      .withColumn("rank", row_number().over(wq)).filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("distance"), col("rank"))
  }

  private def effectiveBuildK(k: Int, buildK: Int, n: Long): Int =
    math.min(n - 1,
      (if (buildK > 0) buildK else math.max(2 * k, k + 8)).toLong).toInt

  private def wTop = org.apache.spark.sql.expressions.Window
    .partitionBy("id").orderBy(col("distance"), col("nbr"))

  /** Seed edges: for every id in `ids`, its `kb` successors among
    * `targets` in xxhash64-scrambled order (cyclic over the targets) —
    * a deterministic RNG-free spread, one zipWithIndex pass, no
    * corpus-wide dense-rank window.
    */
  private def seedEdges(ids: DataFrame, targets: DataFrame,
      kb: Int): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    val posDF = targets.select(col("id"))
      .orderBy(xxhash64(col("id")), col("id"))
      .rdd.map(_.getLong(0)).zipWithIndex()
      .toDF("id", "pos").localCheckpoint(true)
    val m = posDF.count()
    val srcPos = posDF.join(ids, Seq("id"), "left_semi")
    val out = (1 to kb).map { j =>
      srcPos.select(col("id"), ((col("pos") + j) % m).as("pos2"))
        .join(posDF.select(col("pos").as("pos2"), col("id").as("nbr")),
          Seq("pos2"))
        .filter(col("id") =!= col("nbr"))
        .select(col("id"), col("nbr"))
    }.reduce(_ unionAll _).localCheckpoint(true)
    org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(posDF)
    out
  }

  private def scoreEdges(points: DataFrame, edges: DataFrame,
      metric: String = "l2"): DataFrame =
    edges
      .join(points, Seq("id"))
      .join(points.select(col("id").as("nbr"), col("vec").as("nvec")),
        Seq("nbr"))
      .select(col("id"), col("nbr"),
        distExpr(metric, col("vec"), col("nvec")).as("distance"))

  /** The shared descent loop over an initial (id, nbr, distance, new)
    * graph whose list width is `kb`; returns the top-k projection.
    */
  /** `init` must already be an EAGER localCheckpoint (the loop
    * unpersists the previous generation each iteration, init
    * included); every auxiliary checkpoint except the returned final
    * graph is dropped before returning — gates that build many graphs
    * must not accumulate cached blocks.
    */
  private def descend(points: DataFrame, init: DataFrame, k: Int, kb: Int,
      maxIters: Int, metric: String = "l2"): Report = {
    var graph = init
    var iters = 0
    var converged = false
    while (iters < maxIters && !converged) {
      iters += 1
      // general neighborhood: forward list + reverse edges capped at kb
      // per node — flags travel so a proposal fires only when at least
      // one side is fresh
      val fwd = graph.select(col("id").as("pivot"), col("nbr").as("node"),
        col("new"))
      val rev = graph.select(col("nbr").as("pivot"), col("id").as("node"),
          col("distance"), col("new"))
        .withColumn("rr", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("pivot")
            .orderBy(col("distance"), col("node"))))
        .filter(col("rr") <= kb)
        .select(col("pivot"), col("node"), col("new"))
      val general = fwd.unionAll(rev)
        .groupBy(col("pivot"), col("node"))
        .agg(max(col("new")).as("new"))
      val a = general.select(col("pivot"), col("node").as("u"),
        col("new").as("nu"))
      val b = general.select(col("pivot"), col("node").as("v"),
        col("new").as("nv"))
      val proposals = a.join(b, Seq("pivot"))
        .filter(col("u") =!= col("v"))
        .filter(col("nu") || col("nv"))
        .select(col("u").as("id"), col("v").as("nbr"))
        .distinct()
      val scored = scoreEdges(points, proposals, metric)
      // fold proposals into each endpoint's list; an entry is NEW when
      // it was not in the previous top list
      val merged = graph.select(col("id"), col("nbr"), col("distance"),
          lit(false).as("fresh"))
        .unionAll(scored.withColumn("fresh", lit(true)))
        .groupBy(col("id"), col("nbr"))
        .agg(min(col("distance")).as("distance"),
          min(col("fresh")).as("fresh")) // in both => not fresh
        .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= kb)
        .drop("rank")
        .withColumnRenamed("fresh", "new")
        .localCheckpoint(true) // eager: safe to drop the previous one
      val updates = merged.filter(col("new")).count()
      if (sys.env.contains("GRAFT_KNNGRAPH_DEBUG"))
        println(s"nnDescent iter $iters: $updates updates")
      org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(graph)
      graph = merged
      converged = updates == 0L
    }
    // the final graph checkpoint backs the returned frame and stays;
    // the points checkpoint backed only the loop's scoring joins
    org.apache.spark.sql.graftshim.GraftShim.unpersistLocalCheckpoint(points)
    val out = graph
      .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= k)
      .select(col("id"), col("nbr"), col("distance"), col("rank"))
    Report(out, iters, converged)
  }
}
