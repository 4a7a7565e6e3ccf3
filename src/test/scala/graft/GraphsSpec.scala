package graft

import org.apache.spark.sql.functions._
import graft.operators.Graphs

class GraphsSpec extends SparkSuite {
  import spark.implicits._

  /** Scalar reference: dense PageRank with uniform teleport and
    * dangling redistribution, same fixed-iteration recurrence. */
  private def refPageRank(
      nodes: Seq[Long], edges: Seq[(Long, Long)],
      iterations: Int, damping: Double): Map[Long, Double] = {
    val n = nodes.size
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / odeg(s) }.sum
      }
      val dm = nodes.filterNot(odeg.contains).map(r).sum
      r = nodes.map(v => v ->
        ((1.0 - damping) / n + damping * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    r
  }

  test("pageRank: dangling-node graph matches the scalar recurrence") {
    // 1 -> 2, 1 -> 3, 2 -> 3; node 3 dangles
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val got = Graphs.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = 4)
      .as[(Long, Double)].collect().toMap
    val want = refPageRank(Seq(1L, 2L, 3L), edges, iterations = 4, damping = 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
    // mass conservation: dangling redistribution keeps Σrank = 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the double-cited sink outranks everything; the pure source is last
    assert(got(3L) > got(2L) && got(2L) > got(1L))
  }

  test("pageRank: symmetric ring is uniform; star center dominates") {
    val ring = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L))
    val r = Graphs.pageRank(ring.toDF("src", "dst"), "src", "dst", iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(r.values.map(v => math.abs(v - 1.0 / 3)).max < 1e-12)
    // hub-and-spoke: all spokes cite the center
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L))
    val s = Graphs.pageRank(star.toDF("src", "dst"), "src", "dst", iterations = 5)
      .as[(Long, Double)].collect().toMap
    assert(s(0L) > s(1L) && s(1L) > s(2L) && s(2L) == s(3L))
  }

  test("weightedPageRank: scalar recurrence; uniform weights ≈ unweighted") {
    // A(1) votes 3:1 for B(2) over C(3); B -> C, C dangles
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 5L))
    val got = Graphs.weightedPageRank(edges.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 4)
      .as[(Long, Double)].collect().toMap
    // scalar reference with weighted votes
    val nodes = Seq(1L, 2L, 3L); val n = 3; val d = 0.85
    val ow = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum.toDouble }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 4) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (s, _, w) => r(s) * (w / ow(s)) }.sum }
      val dm = nodes.filterNot(ow.contains).map(r).sum
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dm / n))).toMap
    }
    got.foreach { case (v, rank) => assert(math.abs(rank - r(v)) < 1e-12, s"node $v") }
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the 3:1 vote: B outranks C's direct share from A alone
    assert(got(2L) > got(1L))
    // uniform weights reduce to the unweighted recurrence (ULP-level
    // difference only: a/b vs a*(1/b))
    val e2 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val uni = Graphs.weightedPageRank(
        e2.map { case (s, t) => (s, t, 1L) }.toDF("src", "dst", "w"),
        "src", "dst", "w", iterations = 4)
      .as[(Long, Double)].collect().toMap
    val plain = Graphs.pageRank(e2.toDF("src", "dst"), "src", "dst",
        iterations = 4).as[(Long, Double)].collect().toMap
    uni.foreach { case (v, rank) => assert(math.abs(rank - plain(v)) < 1e-12) }
  }

  test("personalized pageRank: scalar recurrence, unreachable decay, seed intersect") {
    // seeds {1}; node 4 has no path FROM the seed side: 4 -> 1 only
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (4L, 1L))
    val seeds = Seq(1L, 99L) // 99 is not a graph node -> dropped
    def ref(iterations: Int): Map[Long, Double] = {
      val nodes = Seq(1L, 2L, 3L, 4L)
      val d = 0.85
      val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
      val t = nodes.map(v => v -> (if (v == 1L) 1.0 else 0.0)).toMap
      var r = t
      for (_ <- 1 to iterations) {
        val contrib = edges.groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (s, _) => r(s) / odeg(s) }.sum
        }
        val dm = nodes.filterNot(odeg.contains).map(r).sum
        r = nodes.map(v => v ->
          ((1.0 - d) * t(v) + d * (contrib.getOrElse(v, 0.0) + dm * t(v)))).toMap
      }
      r
    }
    val got = Graphs.personalizedPageRank(
        edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("node"), "node", iterations = 4)
      .as[(Long, Double)].collect().toMap
    val want = ref(4)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
    // nothing links TO 4: its rank is exactly 0 after the first step
    assert(got(4L) == 0.0)
    // seed gets the teleport floor; mass conserved
    assert(got(1L) > 0.15 && math.abs(got.values.sum - 1.0) < 1e-9)
    intercept[IllegalArgumentException] {
      Graphs.personalizedPageRank(edges.toDF("src", "dst"), "src", "dst",
        Seq(99L).toDF("node"), "node")
    }
  }

  test("hits: star sink is sole authority, spokes split hub mass; roles differ") {
    // 1 -> 3, 2 -> 3: auth(3)=1, hub(1)=hub(2)=1/sqrt(2), and the
    // pure sink has hub 0 / the pure sources auth 0
    val star = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val s = Graphs.hits(star, "src", "dst", iterations = 3)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(s(3L)._2 - 1.0) < 1e-12 && s(3L)._1 == 0.0)
    val h = 1.0 / math.sqrt(2.0)
    Seq(1L, 2L).foreach { v =>
      assert(math.abs(s(v)._1 - h) < 1e-12 && s(v)._2 == 0.0)
    }
    // directed chain 1 -> 2 -> 3: node 2 is both a hub and an authority
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val c = Graphs.hits(chain, "src", "dst", iterations = 2)
      .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(c(2L)._1 > 0.0 && c(2L)._2 > 0.0)
    assert(c(1L)._2 == 0.0 && c(3L)._1 == 0.0)
    // L2 norms of both score vectors are 1
    val hn = math.sqrt(c.values.map(v => v._1 * v._1).sum)
    val an = math.sqrt(c.values.map(v => v._2 * v._2).sum)
    assert(math.abs(hn - 1.0) < 1e-12 && math.abs(an - 1.0) < 1e-12)
  }

  test("triangleCount: square+diagonal hand case, K4, dup/reversed edges collapse") {
    // square 1-2-3-4 plus diagonal 1-3; duplicates and reversals included
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (3L, 1L), (1L, 2L)).toDF("src", "dst")
    val t = Graphs.triangleCount(e, "src", "dst")
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(t(1L) == ((3L, 2L, Some(2.0 / 3.0))))
    assert(t(3L) == ((3L, 2L, Some(2.0 / 3.0))))
    assert(t(2L) == ((2L, 1L, Some(1.0))))
    assert(t(4L) == ((2L, 1L, Some(1.0))))
    // K4: every node in 3 triangles, clustering exactly 1
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b))
      .toDF("src", "dst")
    val k = Graphs.triangleCount(k4, "src", "dst")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(k.forall(r => r._2 == 3L && r._3 == 3L && r._4.contains(1.0)))
    // a lone edge has no triangles and UNDEFINED clustering (deg < 2)
    val lone = Graphs.triangleCount(Seq((9L, 10L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(lone.forall(r => r._3 == 0L && r._4.isEmpty))
  }

  test("shortestPaths: hand distances on a path+branch graph; multi-source " +
      "min; unreached nodes absent; directed asymmetry") {
    // 1-2-3-4-5 path with a branch 3-6; island 9-10
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L),
      (9L, 10L)).toDF("src", "dst")
    val d1 = Graphs.shortestPaths(e, "src", "dst", Seq(1L))
      .as[(Long, Long)].collect().toMap
    assert(d1 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      6L -> 3L), s"got $d1")
    // two seeds: every node takes the NEARER one
    val d2 = Graphs.shortestPaths(e, "src", "dst", Seq(1L, 5L))
      .as[(Long, Long)].collect().toMap
    assert(d2(3L) == 2L && d2(4L) == 1L && d2(5L) == 0L && !d2.contains(9L))
    // directed: edges only go forward, so seed 5 reaches nothing
    val dd = Graphs.shortestPaths(e, "src", "dst", Seq(5L),
      undirected = false).as[(Long, Long)].collect().toMap
    assert(dd == Map(5L -> 0L), s"got $dd")
    // maxDepth truncates (audit bound), seeds dedupe
    val dm = Graphs.shortestPaths(e, "src", "dst", Seq(1L, 1L), maxDepth = 2)
      .as[(Long, Long)].collect().toMap
    assert(dm == Map(1L -> 0L, 2L -> 1L, 3L -> 2L), s"got $dm")
  }

  test("kCore: triangle survives 2-core, pendant peels; cascading peel; " +
      "dup/reversed edges collapse; empty core when k too high") {
    // triangle 1-2-3 with pendant 4 hanging off 1 (dups + reversals mixed in)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 1L), (2L, 1L),
      (1L, 2L)).toDF("src", "dst")
    val core2 = Graphs.kCore(e, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"2-core must be exactly the triangle, got $core2")
    // path 1-2-3-4-5: peeling the endpoints cascades until nothing is
    // left — the multi-iteration fixpoint, not a single pass
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(Graphs.kCore(path, "src", "dst", k = 2).count() == 0L,
      "a path has no 2-core (cascade must run to the empty fixpoint)")
    // K4 with a triangle bridged on: 3-core = the K4 alone
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
    val bridged = (k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 4L))).toDF("src", "dst")
    val core3 = Graphs.kCore(bridged, "src", "dst", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(core3 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core must be the K4, got $core3")
    // k above the max degree: empty
    assert(Graphs.kCore(e, "src", "dst", k = 5).count() == 0L)
  }

  test("assortativity: star/path are -1, regular graph is NULL (zero variance)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val s = Graphs.assortativity(star, "src", "dst")
      .as[(Long, Double)].collect().head
    assert(s._1 == 3L && math.abs(s._2 + 1.0) < 1e-12)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(math.abs(Graphs.assortativity(path, "src", "dst")
      .as[(Long, Double)].collect().head._2 + 1.0) < 1e-12)
    // 4-cycle: every degree 2 -> corr undefined
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    assert(Graphs.assortativity(ring, "src", "dst")
      .as[(Long, Option[Double])].collect().head == ((4L, None)))
  }

  test("degrees: full-outer merge includes source-only and sink-only nodes") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val d = Graphs.degrees(e, "src", "dst")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(d == Map(1L -> ((2L, 0L)), 2L -> ((1L, 1L)), 3L -> ((0L, 2L))))
  }

  test("labelPropagation: hand-unrolled two rounds on bridged triangles") {
    // two triangles bridged by 3-10, plus a self-loop isolate
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L), (20L, 20L))
      .toDF("src", "dst")
    def run(iters: Int): Map[Long, Long] =
      Graphs.labelPropagation(e, "src", "dst", iterations = iters)
        .as[(Long, Long)].collect().toMap
    // round 1: every neighbor label is distinct (all counts 1), so
    // each node takes its min neighbor id; the self-loop keeps 20
    assert(run(1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
    // round 2: counts now differentiate — left triangle converges to
    // 1; node 10's label 3 spreads to 11 and 12 via the min tie-break
    assert(run(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 3L, 12L -> 3L, 20L -> 20L))
    // deterministic across runs
    assert(run(2) == run(2))
  }

  test("pageRank tol: early exit, result within tolerance of the long fixed run") {
    // two directed triangles joined by a bridge — no dangling nodes,
    // geometric (damping-rate) convergence
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 6L), (6L, 4L)).toDF("src", "dst")
    val (pr, ran) = Graphs.pageRankCore(e, "src", "dst",
      iterations = 40, tol = Some(1e-3))
    assert(ran < 40, s"expected convergence exit before the cap, ran $ran")
    assert(ran > 1, "a nontrivial graph should need more than one round")
    val got = pr.as[(Long, Double)].collect().toMap
    val fixed = Graphs.pageRank(e, "src", "dst", iterations = 40)
      .as[(Long, Double)].collect().toMap
    // distance to the (effectively converged) 40-round run is bounded
    // by the geometric tail: delta · d/(1-d) = 1e-3 · 5.67 < 0.01
    assert(got.keys.map(k => math.abs(got(k) - fixed(k))).sum < 0.01)
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "mass still conserved")
    // tol = None keeps the exact fixed-iteration contract the oracles
    // replay: same input, same count, bit-identical ranks
    val a = Graphs.pageRank(e, "src", "dst", iterations = 3)
      .as[(Long, Double)].collect().toMap
    val b = Graphs.pageRankCore(e, "src", "dst", iterations = 3)._1
      .as[(Long, Double)].collect().toMap
    assert(a == b)
  }

  test("hits tol: early exit once the alternating updates settle") {
    val e = Seq((1L, 2L), (3L, 2L), (4L, 2L), (1L, 5L), (3L, 5L))
      .toDF("src", "dst")
    val (sc, ran) = Graphs.hitsCore(e, "src", "dst",
      iterations = 30, tol = Some(1e-4))
    assert(ran < 30, s"expected convergence exit before the cap, ran $ran")
    val got = sc.as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // the double-cited sink 2 stays the top authority at the fixpoint
    assert(got(2L)._2 > got(5L)._2 && got(5L)._2 > got(1L)._2)
  }

  test("labelPropagation untilStable: stops at a fixpoint the next round confirms") {
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L), (20L, 20L))
      .toDF("src", "dst")
    val (lbl, ran) = Graphs.labelPropagationCore(e, "src", "dst",
      iterations = 12, untilStable = true)
    assert(ran < 12, s"expected a stable fixpoint before the cap, ran $ran")
    val got = lbl.as[(Long, Long)].collect().toMap
    // witnessed stability: one more fixed round from the same start
    // reproduces the same labeling
    val next = Graphs.labelPropagation(e, "src", "dst", iterations = ran + 1)
      .as[(Long, Long)].collect().toMap
    assert(got == next, "the returned labeling must be a fixpoint")
  }

  test("modularity: hand two-triangle value, scrambled ~ 0, singleton fallback") {
    // two triangles bridged by one edge: m = 7; perfect labeling has
    // e_c = 3, d_c = 7 per side -> Q = 2*(3/7 - (7/14)^2) = 0.357142857
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L)).toDF("src", "dst")
    val good = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("node", "comm")
    val q = Graphs.modularity(e, "src", "dst", good, "node", "comm")
      .select($"m", $"n_communities", $"q")
      .as[(Long, Long, Option[Double])].head()
    assert(q._1 == 7L && q._2 == 2L)
    assert(math.abs(q._3.get - (2.0 * (3.0 / 7.0 - 0.25))) < 1e-12)
    // all nodes in one community: Q = m/m - 1 = 0 exactly
    val one = (1L to 6L).map(_ -> 0L).toDF("node", "comm")
    assert(Graphs.modularity(e, "src", "dst", one, "node", "comm")
      .select($"q").as[Option[Double]].head().get == 0.0)
    // unlabeled nodes become singletons: worse than the good labeling
    val partial = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("node", "comm")
    val qp = Graphs.modularity(e, "src", "dst", partial, "node", "comm")
      .select($"n_communities", $"q").as[(Long, Option[Double])].head()
    assert(qp._1 == 4L && qp._2.get < q._3.get)
    // empty graph: NULL q, zero rows counted
    val qe = Graphs.modularity(e.filter($"src" > 99), "src", "dst",
      good, "node", "comm").select($"m", $"q")
      .as[(Long, Option[Double])].head()
    assert(qe._1 == 0L && qe._2.isEmpty)
    // an unlabeled node whose ID equals a LABEL value must stay a
    // singleton, not be absorbed into that community: label nodes 1,2
    // as community 5 and leave node 5 itself unlabeled — were the
    // namespaces shared, 5 would join community 5 and Q would rise
    val clash = Seq((1L, 5L), (2L, 5L)).toDF("node", "comm")
    val ce = Seq((1L, 2L), (1L, 5L), (2L, 5L)).toDF("src", "dst")
    val cq = Graphs.modularity(ce, "src", "dst", clash, "node", "comm")
      .select($"n_communities", $"q").as[(Long, Option[Double])].head()
    // communities: {1,2} labeled 5, singleton 5 -> 2 communities;
    // intra edges = 1 of 3, d_lab = 4, d_single = 2:
    // Q = (1/3 - (4/6)^2) + (0 - (2/6)^2) = 1/3 - 4/9 - 1/9 = -2/9
    assert(cq._1 == 2L)
    assert(math.abs(cq._2.get - (-2.0 / 9.0)) < 1e-12)
  }

  test("linkPrediction: hand wedge counts, adjacency excluded, hub cap") {
    // square 1-2-3-4-1 plus hub 9 linked to everyone: non-adjacent
    // pairs are the square's diagonals (1,3) and (2,4)
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val hub = Seq(9L -> 1L, 9L -> 2L, 9L -> 3L, 9L -> 4L)
    val e = (sq ++ hub).toDF("src", "dst")
    val r = Graphs.linkPrediction(e, "src", "dst")
      .select($"u", $"v", $"cn", $"deg_u", $"deg_v", $"jaccard")
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t).toMap
    // (1,3): common neighbors {2, 4, 9} = 3; deg 3 each;
    // jaccard = 3/(3+3-3) = 1.0 (identical neighbor sets)
    assert(r((1L, 3L))._3 == 3L && r((1L, 3L))._4 == 3L)
    assert(r((1L, 3L))._6 == 1.0)
    assert(r((2L, 4L))._3 == 3L)
    // adjacent pairs never appear, even with common neighbors
    assert(!r.contains((1L, 2L)) && !r.contains((1L, 9L)))
    assert(r.size == 2)
    // capping out the degree-4 hub drops it from every wedge center:
    // cn falls to 2 (the square corners), degrees stay full-graph
    val capped = Graphs.linkPrediction(e, "src", "dst",
      maxCenterDegree = Some(3))
      .select($"u", $"v", $"cn", $"deg_u", $"deg_v")
      .as[(Long, Long, Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t).toMap
    assert(capped((1L, 3L))._3 == 2L && capped((1L, 3L))._4 == 3L)
    // minCommon filters below-threshold pairs
    assert(Graphs.linkPrediction(e, "src", "dst", minCommon = 4)
      .count() == 0L)
  }
}
