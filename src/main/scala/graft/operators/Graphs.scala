package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over edge-list DataFrames. The curation use case:
  * rank hosts/documents by link (or co-occurrence) structure so
  * low-centrality spam sources can be down-weighted before sampling —
  * the classic web-scale quality prior (Page et al. 1999).
  *
  * Everything is relational: an iteration is ONE shuffle join of the
  * (src, dst, odeg) edge frame with the current rank frame plus a
  * map-side-combined sum by dst — the textbook distributed PageRank
  * shape. No driver-side graph state: dangling-node mass flows through
  * a broadcast one-row frame, and each iteration's rank frame is
  * eagerly local-checkpointed so lineage stays O(1) deep regardless of
  * iteration count (the [[Dedup.connectedComponents]] discipline).
  */
object Graphs extends org.apache.spark.internal.Logging {

  /** PageRank with uniform teleport and uniform dangling-mass
    * redistribution, run for a FIXED `iterations` count (deterministic
    * plan, reproducible cross-engine — convergence-threshold stopping
    * would make the result depend on float noise).
    *
    *   rank'(v) = (1-d)/N + d · (Σ_{u→v} rank(u)/odeg(u) + dangling/N)
    *
    * `edges` is a directed edge list; parallel edges count once per
    * occurrence (dedupe upstream for a simple graph). Nodes are the
    * union of endpoints. Returns (node, rank); ranks sum to 1.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      tol: Option[Double] = None): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iterations, damping, tol)._1

  /** Edge-weighted PageRank: a link's vote is proportional to its
    * weight within its source's total out-weight,
    *
    *   rank'(v) = (1-d)/N + d · (Σ_{u→v} rank(u)·w(u,v)/outw(u) + dangling/N)
    *
    * — the variant a links-graph curation pass actually runs (link
    * multiplicity / co-occurrence counts as edge strength, Xing &
    * Ghorbani 2004). Weights must be positive; `outw(u)` is the sum of
    * u's edge weights, and dangling means NO out-edges (as unweighted).
    * Same per-iteration shape and lineage discipline as [[pageRank]];
    * integer-count weights keep the per-source sums float-exact, so the
    * unrolled-recurrence oracle replays bit-for-bit.
    */
  def weightedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iterations: Int = 5, damping: Double = 0.85,
      tol: Option[Double] = None): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iterations, damping, tol,
      weightCol = Some(weightCol))._1

  /** [[pageRank]] plus the iteration count actually run — the
    * convergence contract made observable. With `tol = Some(eps)` the
    * loop exits once the L1 rank delta Σ|rank′−rank| drops below eps
    * (one extra node-keyed join + 1-row aggregate per iteration, both
    * over checkpointed frames); `iterations` becomes the CAP. With
    * `tol = None` the count is fixed and no delta job ever runs — the
    * unrolled-recurrence oracles replay that form bit-for-bit, which a
    * float-noise-dependent stopping rule would break.
    */
  private[graft] def pageRankCore(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      tol: Option[Double] = None,
      weightCol: Option[String] = None): (DataFrame, Int) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    tol.foreach(t => require(t > 0.0, s"tol must be > 0, got $t"))
    val e = edges.select(
      col(srcCol).cast("long").as("src") +: col(dstCol).cast("long").as("dst") +:
        weightCol.map(w => col(w).cast("double").as("_w")).toSeq: _*)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    // unweighted: out-degree count. weighted: total out-weight (the
    // vote denominator). Both bounded per-source state.
    val outDeg = weightCol match {
      case None => e.groupBy("src").agg(count(lit(1)).as("odeg"))
      case Some(_) => e.groupBy("src").agg(sum(col("_w")).as("odeg"))
    }
    // (src, dst[, _w], odeg) materialized once, reused by every iteration
    val ej = e.join(outDeg, "src").localCheckpoint(true)
    val danglingNodes = nodes
      .join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
      .localCheckpoint(true)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val vote = weightCol match {
        case None => col("rank") / col("odeg").cast("double")
        case Some(_) => col("rank") * (col("_w") / col("odeg"))
      }
      val contribs = ej
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg(sum(vote).as("_c"))
        .withColumnRenamed("dst", "node")
      val dangling = danglingNodes
        .join(ranks, "node")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm"))
      val next = nodes
        .join(contribs, Seq("node"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping)
            * (coalesce(col("_c"), lit(0.0))
              + col("_dm") / lit(n.toDouble))).as("rank"))
        .localCheckpoint(true)
      it += 1
      converged = tol.exists { eps =>
        next.withColumnRenamed("rank", "_r2")
          .join(ranks, "node")
          .agg(coalesce(sum(abs(col("_r2") - col("rank"))), lit(0.0)))
          .head().getDouble(0) < eps
      }
      ranks = next
    }
    (ranks, it)
  }

  /** Personalized PageRank: teleport (and dangling mass) flows back to
    * a SEED set instead of all nodes, so rank measures proximity to the
    * seeds through the link structure — the graph form of "expand a
    * trusted corpus": seed with curated hosts, harvest the high-PPR
    * neighborhood as candidate quality documents (Haveliwala 2002).
    *
    *   rank'(v) = (1-d)·t(v) + d · (Σ_{u→v} rank(u)/odeg(u) + dangling·t(v))
    *
    * with t uniform over `seeds` ∩ nodes, 0 elsewhere. Same per-
    * iteration shape as [[pageRank]]: one join + one map-side-combined
    * sum, rank lineage truncated each round. Ranks sum to 1; nodes
    * unreachable from the seeds converge to 0.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      tol: Option[Double] = None): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0.0 && damping < 1.0, s"damping must be in (0,1), got $damping")
    tol.foreach(t => require(t > 0.0, s"tol must be > 0, got $t"))
    val e = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val seedSet = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().join(nodes, "node").localCheckpoint(true)
    val nS = seedSet.count()
    require(nS > 0, "no seed is a node of the graph")
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("odeg"))
    val ej = e.join(outDeg, "src").localCheckpoint(true)
    val danglingNodes = nodes
      .join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
      .localCheckpoint(true)
    // (node, _t): the teleport distribution, reused every iteration
    val t = nodes
      .join(seedSet.withColumn("_t", lit(1.0 / nS)), Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("_t"), lit(0.0)).as("_t"))
      .localCheckpoint(true)
    var ranks = t.select(col("node"), col("_t").as("rank"))
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val contribs = ej
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy("dst")
        .agg(sum(col("rank") / col("odeg").cast("double")).as("_c"))
        .withColumnRenamed("dst", "node")
      val dangling = danglingNodes
        .join(ranks, "node")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm"))
      val next = t
        .join(contribs, Seq("node"), "left_outer")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit(1.0 - damping) * col("_t") + lit(damping)
            * (coalesce(col("_c"), lit(0.0))
              + col("_dm") * col("_t"))).as("rank"))
        .localCheckpoint(true)
      it += 1
      converged = tol.exists { eps =>
        next.withColumnRenamed("rank", "_r2")
          .join(ranks, "node")
          .agg(coalesce(sum(abs(col("_r2") - col("rank"))), lit(0.0)))
          .head().getDouble(0) < eps
      }
      ranks = next
    }
    ranks
  }

  /** HITS hubs-and-authorities (Kleinberg 1999), fixed iterations with
    * L2 normalization: authority = normalized in-flow of hub score,
    * hub = normalized out-flow of the NEW authority score (the
    * classic alternating update). Separates "pages many point at"
    * from "pages that point at good pages" — on a citation/link corpus
    * the two roles rank differently, where PageRank conflates them.
    *
    * Same per-iteration shape as [[pageRank]]: two join+sum rounds per
    * iteration, norms ride broadcast one-row frames, lineage truncated
    * each round. Returns (node, hub, auth).
    */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, tol: Option[Double] = None): DataFrame =
    hitsCore(edges, srcCol, dstCol, iterations, tol)._1

  /** [[hits]] plus the iteration count actually run. `tol = Some(eps)`
    * exits once Σ|hub′−hub| + Σ|auth′−auth| < eps (see
    * [[pageRankCore]] for the shape and the fixed-form rationale).
    */
  private[graft] def hitsCore(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, tol: Option[Double] = None): (DataFrame, Int) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    tol.foreach(t => require(t > 0.0, s"tol must be > 0, got $t"))
    val e = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    // one L2-normalized flow step: out(v) = Σ over matching edges of
    // score(other endpoint), then / sqrt(Σ out²) (0 stays 0)
    def flow(scores: DataFrame, scoreCol: String,
        from: String, to: String): DataFrame = {
      val raw = e
        .join(scores.select(col("node").as(from), col(scoreCol).as("_s")), from)
        .groupBy(to).agg(sum(col("_s")).as("_raw"))
        .withColumnRenamed(to, "node")
      val full = nodes.join(raw, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("_raw"), lit(0.0)).as("_v"))
      val norm = full.agg(sqrt(sum(col("_v") * col("_v"))).as("_n"))
      full.crossJoin(broadcast(norm))
        .select(col("node"),
          when(col("_n") > 0.0, col("_v") / col("_n")).otherwise(0.0).as("_v"))
    }
    var scores = nodes
      .withColumn("hub", lit(1.0)).withColumn("auth", lit(1.0))
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val auth = flow(scores, "hub", "src", "dst")
        .withColumnRenamed("_v", "auth")
      val hub = flow(auth, "auth", "dst", "src")
        .withColumnRenamed("_v", "hub")
      val next = hub.join(auth, "node").select(col("node"), col("hub"), col("auth"))
        .localCheckpoint(true)
      it += 1
      converged = tol.exists { eps =>
        next.select(col("node"), col("hub").as("_h2"), col("auth").as("_a2"))
          .join(scores, "node")
          .agg(coalesce(sum(abs(col("_h2") - col("hub"))
            + abs(col("_a2") - col("auth"))), lit(0.0)))
          .head().getDouble(0) < eps
      }
      scores = next
    }
    (scores, it)
  }

  /** Per-node triangle count and local clustering coefficient over the
    * UNDIRECTED simple graph induced by `edges` — the community-density
    * audit (a near-dup cluster that is also a dense triangle cluster is
    * a template farm, not coincidence).
    *
    * Relational one-shot, no iteration: canonicalize to u<v edges,
    * orient each edge low-degree → high-degree (the standard fan-out
    * bound: a hub's wedges are charged to its low-degree neighbors, so
    * the wedge join is Σ deg_oriented² not Σ deg² — survives power-law
    * skew), build wedges with ONE self-join, close them with a
    * semi-join against the canonical edge set, then count each
    * triangle once for each of its three corners. Returns
    * (node, degree, triangles, clustering) with clustering =
    * 2T/(deg·(deg−1)), NULL when deg < 2.
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(
      col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    // canonical undirected edge set (u < v), deduped
    val canon = raw.select(
      least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient by (degree, id): strictly less-connected endpoint first
    val dU = deg.select(col("node").as("u"), col("degree").as("_du"))
    val dV = deg.select(col("node").as("v"), col("degree").as("_dv"))
    val oriented = canon.join(dU, "u").join(dV, "v")
      .select(
        when(col("_du") < col("_dv")
          || (col("_du") === col("_dv") && col("u") < col("v")),
          struct(col("u").as("lo"), col("v").as("hi")))
          .otherwise(struct(col("v").as("lo"), col("u").as("hi"))).as("_e"))
      .select(col("_e.lo").as("lo"), col("_e.hi").as("hi"))
    // wedges lo -> hi1, lo -> hi2 (hi1 < hi2), closed by a canonical edge
    val w1 = oriented.select(col("lo"), col("hi").as("x"))
    val w2 = oriented.select(col("lo"), col("hi").as("y"))
    val tris = w1.join(w2, "lo").filter(col("x") < col("y"))
      .join(canon,
        col("x") === col("u") && col("y") === col("v"), "left_semi")
      .select(col("lo"), col("x"), col("y"))
    val perNode = tris.select(explode(array(col("lo"), col("x"), col("y"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2L,
          lit(2.0) * coalesce(col("triangles"), lit(0L)).cast("double")
            / (col("degree") * (col("degree") - 1L)).cast("double"))
          .as("clustering"))
  }

  /** Degree assortativity of the undirected simple graph: Pearson
    * correlation of endpoint degrees over every edge taken in both
    * directions (Newman 2002). Positive ⇒ hubs link hubs (social
    * shape); negative ⇒ hubs link leaves (web/spam-farm shape) — a
    * one-number structural fingerprint to compare crawl snapshots.
    * Cost: the canonical-edge distinct + two broadcast-joinable degree
    * lookups + one `corr` aggregate. Returns ONE row
    * (n_edges, assortativity); NULL when degrees are constant.
    */
  def assortativity(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(
      col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val canon = raw.select(
      least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val both = canon.unionAll(canon.select(col("v").as("u"), col("u").as("v")))
    val paired = both
      .join(deg.select(col("node").as("u"), col("degree").as("_du")), "u")
      .join(deg.select(col("node").as("v"), col("degree").as("_dv")), "v")
    val nEdges = canon.count()
    // corr via guarded pop-moments: ANSI `corr` raises DIVIDE_BY_ZERO
    // on a regular graph (zero degree variance); here that is NULL
    paired
      .select(col("_du").cast("double").as("x"), col("_dv").cast("double").as("y"))
      .agg(covar_pop(col("x"), col("y")).as("_c"),
        stddev_pop(col("x")).as("_sx"), stddev_pop(col("y")).as("_sy"))
      .select(lit(nEdges).as("n_edges"),
        when(col("_sx") > 0.0 && col("_sy") > 0.0,
          col("_c") / (col("_sx") * col("_sy"))).as("assortativity"))
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007),
    * made DETERMINISTIC: every node starts labeled with its own id;
    * each iteration it adopts the most frequent label among its
    * neighbors, ties to the SMALLEST label (the canonical order that
    * replaces the original's random tie coin), isolated nodes keep
    * theirs. Fixed iteration count, so the result is a pure function
    * of the edge set — replayable by any engine.
    *
    * The "cluster near-duplicate sources / co-occurrence communities"
    * op: where [[Dedup.connectedComponents]] merges anything touching,
    * LPA keeps weakly-bridged groups apart (a bridge edge is outvoted).
    *
    * Shape per iteration: ONE (edge ⋈ label) shuffle join, a
    * (dst, label) count aggregate (map-side combined), and an argmax
    * via `max(struct(cnt, -label))` — no windows. Label frames are
    * eagerly checkpointed so lineage stays O(1) in the iteration count.
    * `undirected = true` (default) symmetrizes the edge list first.
    *
    * Returns (node, label); equal labels = same community.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 2, undirected: Boolean = true,
      untilStable: Boolean = false): DataFrame =
    labelPropagationCore(edges, srcCol, dstCol, iterations, undirected,
      untilStable)._1

  /** [[labelPropagation]] plus the iteration count actually run.
    * `untilStable = true` exits once an iteration changes NO label (a
    * one-row changed-count aggregate per iteration over the
    * checkpointed label frames); `iterations` caps the loop — LPA on
    * bipartite-ish structure can oscillate forever, so an uncapped
    * stable-point loop is not safe on arbitrary graphs.
    */
  private[graft] def labelPropagationCore(edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int = 2, undirected: Boolean = true,
      untilStable: Boolean = false): (DataFrame, Int) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val e = (if (undirected)
        e0.unionAll(e0.select(col("dst").as("src"), col("src").as("dst")))
      else e0).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var labels = nodes.withColumn("label", col("node"))
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val counts = e
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("_cnt"))
      // most frequent label, smallest on tie: max(struct(cnt, -label))
      val best = counts.groupBy(col("dst").as("node"))
        .agg(max(struct(col("_cnt"), (-col("label")).as("nl"))).as("_b"))
        .select(col("node"), (-col("_b.nl")).as("_new"))
      val next = labels.join(best, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("_new"), col("label")).as("label"))
        .localCheckpoint(true)
      it += 1
      if (untilStable) {
        val changed = next.withColumnRenamed("label", "_l2")
          .join(labels, "node")
          .filter(col("_l2") =!= col("label")).count()
        converged = changed == 0L
      }
      labels = next
    }
    (labels, it)
  }

  /** In/out degree per node — the cheap structural profile (one
    * aggregation per direction over the edge list, outer-merged so
    * source-only and sink-only nodes both appear with a 0). */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val out = edges.groupBy(col(srcCol).cast("long").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val in = edges.groupBy(col(dstCol).cast("long").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    out.join(in, Seq("node"), "full_outer")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** k-core of the undirected simple graph (Seidman 1983): the
    * maximal subgraph in which every vertex has degree >= k, computed
    * by the classic peeling fixpoint — drop every vertex with degree
    * < k, restrict the edge set to survivors, repeat until stable.
    * The dense-community extractor a links-graph curation pass runs
    * to separate organic hubs from long-tail chaff (a spam farm's
    * star pattern collapses at k=2; a real community survives).
    *
    * Peeling is monotone (the vertex set only shrinks) and its
    * fixpoint is reached in at most |V| rounds, in practice a handful:
    * each round is ONE degree aggregate (map-side combined) plus two
    * left-semi joins restricting the edge list — all key-partitioned
    * shuffles, no windows, no all-pairs anywhere. Edge frames are
    * eagerly checkpointed per round so lineage stays O(1), and the
    * stability test rides the same count. `maxIters` caps pathological
    * chains (a path graph peels one layer per round); the result is a
    * pure function of the edge set either way, so any engine can
    * replay the unrolled recurrence.
    *
    * Returns (node, deg): the surviving vertices with their degree
    * INSIDE the core (all >= k). Empty when no k-core exists.
    */
  /** Multi-source BFS distance — hops from the nearest seed to every
    * reachable vertex. The "link distance from trusted domains"
    * signal (the Common-Crawl-style seed-proximity curation feature),
    * and the building block for graph-radius audits.
    *
    * Frontier-style: each round joins the CURRENT frontier (only the
    * nodes first reached last round) against the edge list and
    * anti-joins already-settled nodes — work per round is
    * O(frontier-adjacent edges), never the whole reached set, and the
    * loop stops when the frontier empties (true distances, no cap
    * artifacts; `maxDepth` only bounds pathological chains). Frames
    * are eagerly checkpointed per round (O(1) lineage). Deterministic:
    * set semantics, no tie-breaks needed (all same-round reaches get
    * the same distance).
    *
    * Returns (node, dist) for REACHED nodes only; seeds are dist 0.
    * `undirected` (default) symmetrizes the edge list.
    */
  def shortestPaths(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[Long], maxDepth: Int = 30,
      undirected: Boolean = true): DataFrame = {
    require(sources.nonEmpty, "need at least one source node")
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val spark = edges.sparkSession
    import spark.implicits._
    val raw = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val adj = (if (undirected)
        raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      else raw).distinct().localCheckpoint(true)
    var settled = sources.distinct.map(n => (n, 0L)).toDF("node", "dist")
      .localCheckpoint(true)
    var frontier = settled.select("node").localCheckpoint(true)
    var d = 0L
    while (d < maxDepth && !frontier.isEmpty) {
      d += 1
      val next = adj
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(settled, Seq("node"), "left_anti")
        .localCheckpoint(true)
      settled = settled
        .unionAll(next.select(col("node"), lit(d).as("dist")))
        .localCheckpoint(true)
      frontier = next
    }
    settled
  }

  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxIters: Int = 50): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    val raw = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    // symmetric deduped adjacency: each undirected edge appears in
    // both orientations, so degree = count by src
    var adj = raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var nEdges = adj.count()
    var stable = nEdges == 0L
    var it = 0
    while (!stable && it < maxIters) {
      val keep = adj.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("_keep"))
      val pruned = adj
        .join(keep.select(col("_keep").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("_keep").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
      val n2 = pruned.count()
      stable = n2 == nEdges
      adj = pruned
      nEdges = n2
      it += 1
    }
    adj.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }

  /** Modularity Q of a node→community assignment over the undirected
    * simple graph (Newman & Girvan 2004): Q = Σ_c [ e_c/m −
    * (d_c/2m)² ] where e_c = intra-community edges, d_c = total degree
    * in c, m = edge count — THE number that says whether a community
    * labeling ([[labelPropagation]], components, or any clustering)
    * actually found structure (Q ≈ 0 ⇒ no better than random wiring).
    *
    * All inputs are INTEGER counts, and Q is a sum of integer ratios
    * with fixed parenthesization — hash-exact cross-engine when
    * rounded. Shape: canonical-edge distinct, one broadcast-joinable
    * label lookup per endpoint, two community-bounded aggregates;
    * nothing iterates, nothing windows the data.
    *
    * Returns ONE row (m, n_communities, q); q NULL when the graph has
    * no edges. Nodes absent from `labels` are treated as singleton
    * communities (degree mass still counts) — the singleton namespace
    * is tagged disjointly from label values, so an unlabeled node
    * whose ID happens to equal some community's LABEL can never be
    * absorbed into that community.
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
      labels: DataFrame, nodeCol: String, commCol: String): DataFrame = {
    val raw = edges.select(
      col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val canon = raw.select(
      least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val lab = labels.select(col(nodeCol).cast("long").as("_n"),
      col(commCol).cast("long").as("_c"))
    def labeled(side: String) = canon
      .join(lab.withColumnRenamed("_n", side), Seq(side), "left_outer")
      .select(col("u"), col("v"),
        when(col("_c").isNotNull, concat(lit("l:"), col("_c")))
          .otherwise(concat(lit("s:"), col(side))).as(s"c_$side"))
    val both = labeled("u")
      .join(labeled("v").select(col("u"), col("v"), col("c_v")), Seq("u", "v"))
    val m = canon.count()
    if (m == 0L) {
      val spark = edges.sparkSession
      import spark.implicits._
      return Seq((0L, 0L, Option.empty[Double]))
        .toDF("m", "n_communities", "q")
    }
    // intra-community edges per community
    val intra = both.filter(col("c_u") === col("c_v"))
      .groupBy(col("c_u").as("_c")).agg(count(lit(1)).as("e_c"))
    // total degree mass per community (each edge adds 1 to each side)
    val degMass = both.select(col("c_u").as("_c"))
      .unionAll(both.select(col("c_v").as("_c")))
      .groupBy("_c").agg(count(lit(1)).as("d_c"))
    degMass.join(intra, Seq("_c"), "left_outer")
      .select(
        (coalesce(col("e_c"), lit(0L)).cast("double") / lit(m.toDouble)
          - (col("d_c").cast("double") / lit(2.0 * m))
            * (col("d_c").cast("double") / lit(2.0 * m))).as("_q"))
      .agg(count(lit(1)).as("n_communities"), sum(col("_q")).as("q"))
      .select(lit(m).as("m"), col("n_communities"), col("q"))
  }

  /** Neighborhood link prediction over the undirected simple graph:
    * for every NON-adjacent pair (u < v) with at least `minCommon`
    * common neighbors, the common-neighbor count, both degrees, and
    * neighbor-set Jaccard cn / (deg_u + deg_v − cn) — the classic
    * missing-edge scores (Liben-Nowell & Kleinberg 2003) a related-
    * items or citation-suggestion pass ranks by.
    *
    * Shape: ONE wedge self-join of the symmetric adjacency on the
    * center node (the [[triangleCount]] join family), a count per
    * candidate pair, an anti-join against the canonical edge set
    * (existing edges are not "predictions"), and two broadcast-sized
    * degree lookups. The wedge join is Σ_w deg(w)², which a hub
    * center blows up quadratically — `maxCenterDegree` prunes wedge
    * centers above the cap BEFORE the self-join (the standard hub
    * suppression: a million-degree hub contributes C(d,2) wedges and
    * near-zero signal per pair). When set, cn counts only common
    * neighbors within the cap — an approximation, documented here;
    * the DEFAULT is a finite cap of 1000 (Σ deg² ≤ 1000·|E| — linear
    * in edges whatever the degree distribution), because real product
    * and citation graphs are power-law and an unbounded default turns
    * one hub into a driver-killing C(d, 2) blowup (no-silent-scale-
    * killer contract; the hub-heavy ScaleSmoke entry records the
    * difference). Pass `None` explicitly for exact counts on graphs
    * whose degree bound you know.
    *
    * Returns (u, v, cn, deg_u, deg_v, jaccard); degrees are always
    * full-graph degrees regardless of the cap.
    */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Int = 1,
      maxCenterDegree: Option[Int] = Some(1000)): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val raw = edges.select(
      col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
    val canon = raw.select(
      least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(true)
    val adj = canon.select(col("u").as("w"), col("v").as("n"))
      .unionAll(canon.select(col("v").as("w"), col("u").as("n")))
    // node-bounded; checkpointed eagerly so the degree shuffle runs
    // ONCE and is reused by the cap check and all three downstream
    // joins (uncheckpointed, each join recomputes the aggregate)
    val deg = adj.groupBy("w").agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    val centers = maxCenterDegree match {
      case Some(cap) =>
        // make the exactness loss observable: the cap defaulting to
        // Some(1000) means callers on hub-heavy graphs silently get
        // approximate cn counts. Over the checkpointed node-bounded
        // frame this count is a local cached-block scan, not an extra
        // aggregate pass (r9 ADVICE: the no-prune path pays ~nothing).
        val pruned = deg.filter(col("degree") > cap).count()
        if (pruned > 0)
          logWarning(s"linkPrediction: maxCenterDegree=$cap prunes " +
            s"$pruned wedge center(s) with degree > $cap — " +
            "common-neighbor counts are approximate (common neighbors " +
            "of degree > cap are not counted); pass " +
            "maxCenterDegree = None for exact counts if the degree " +
            "distribution allows it")
        adj.join(deg.filter(col("degree") <= cap).select("w"), "w")
      case None => adj
    }
    val cn = centers.select(col("w"), col("n").as("x"))
      .join(centers.select(col("w"), col("n").as("y")), "w")
      .filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
      .join(canon, col("x") === col("u") && col("y") === col("v"),
        "left_anti")
    cn.join(deg.select(col("w").as("x"), col("degree").as("deg_u")), "x")
      .join(deg.select(col("w").as("y"), col("degree").as("deg_v")), "y")
      .select(col("x").as("u"), col("y").as("v"), col("cn"),
        col("deg_u"), col("deg_v"),
        (col("cn").cast("double")
          / (col("deg_u") + col("deg_v") - col("cn")).cast("double"))
          .as("jaccard"))
  }
}
