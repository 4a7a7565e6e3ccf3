package graft

import org.apache.spark.sql.functions._

/** Sharded NN-Descent cold build at scale (r14 verdict #1 — the last
  * 100 TB leg with no evidence): the serve / repair / append paths of
  * the persisted graph are all measured, this smoke measures the
  * COLD BUILD that feeds them.
  *
  *  - tier `100k`: single-shot vs sharded on the SAME fixture — wall
  *    ratio and sampled-recall parity (the "serve recall within the
  *    spec bound of the single-shot graph" check).
  *  - tier `1m`: the sharded REAL-descent build through the versioned
  *    [[operators.KnnGraphIndex]] layout, plus a serve probe over the
  *    committed artifacts. Single-shot was never run at 1M — its
  *    extrapolation from the 100k measurement (192 s / 15 iters, and
  *    iteration counts GROW with n) is ~32+ min; the sharded wall must
  *    come in well under that, with sampled recall reported next to
  *    it.
  *
  * Numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmokeGraphBuild [100k|1m]..." }}}
  */
object ScaleSmokeGraphBuild {
  def main(args: Array[String]): Unit = {
    val tiers: Set[String] = if (args.isEmpty) Set("100k", "1m") else args.toSet
    val base = "/tmp/graft_scale_gbuild"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-gbuild")

    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE $label%-44s $s%8.2f s")
      (r, s)
    }

    // same clustered-synth recipe as ScaleSmokeKnnGraph: locality
    // present (the workload NN-Descent exists for), deterministic
    def synth(nRows: Long, nClusters: Int, path: String): Unit = {
      val dim = 16
      spark.range(nRows)
        .select(col("id"), (col("id") % nClusters).as("cell"))
        .withColumn("vec", transform(sequence(lit(0), lit(dim - 1)),
          d => (col("cell") * lit(37) % lit(509)).cast("float")
            * when(d % 3 === 0, 1f).otherwise(-0.5f)
            + (pmod(xxhash64(col("id"), d), lit(1000)) / lit(250.0))
              .cast("float")))
        .select(col("id"), col("vec"))
        .write.mode("overwrite").parquet(path)
    }

    val k = 10
    def sampledRecall(pts: org.apache.spark.sql.DataFrame,
        graph: org.apache.spark.sql.DataFrame, mod: Int): Double = {
      val sample = pts.filter(pmod(xxhash64(col("id")), lit(mod)) === 0)
        .select(col("id").as("qid"), col("vec").as("qvec"))
      val truth = operators.SimilarityJoin.knnL2(
          pts.select(col("id").as("nbr"), col("vec")), "nbr", "vec",
          sample, "qid", "qvec", k + 1)
        .filter(col("qid") =!= col("nbr"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("distance"), col("nbr"))))
        .filter(col("rk") <= k)
        .select(col("qid").as("id"), col("nbr"))
        .localCheckpoint(true)
      val hit = graph.join(truth, Seq("id", "nbr"), "left_semi").count()
      hit.toDouble / truth.count().toDouble
    }

    if (tiers("100k")) {
      val (_, _) = timed("synthesize 100k") {
        synth(100000L, 256, s"$base/vecs100k")
      }
      val pts = spark.read.parquet(s"$base/vecs100k")
      val (rep1, w1) = timed("single-shot nnDescent @100k (r11 recipe)") {
        operators.KnnGraph.nnDescent(pts, "id", "vec", k = k,
          maxIters = 15, buildK = 32)
      }
      val r1 = sampledRecall(pts, rep1.graph, 200)
      println(f"SMOKE single-shot: iters=${rep1.iterations} " +
        f"converged=${rep1.converged} recall=$r1%.4f")
      val (rep2, w2) = timed("sharded build @100k (32 shards, overlap=2)") {
        operators.KnnGraph.nnDescentSharded(pts, "id", "vec", k = k,
          nShards = 32, maxIters = 15, buildK = 32, replicas = 2,
          shardIters = 6, polishIters = 3)
      }
      val r2 = sampledRecall(pts, rep2.graph, 200)
      println(f"SMOKE sharded r2:  iters=${rep2.iterations} " +
        f"converged=${rep2.converged} recall=$r2%.4f")
      println(f"SMOKE 100k wall ratio sharded-r2/single = ${w2 / w1}%.3f, " +
        f"recall delta = ${r2 - r1}%+.4f")
      val (rep3, w3) = timed("sharded build @100k (32 shards, no overlap)") {
        operators.KnnGraph.nnDescentSharded(pts, "id", "vec", k = k,
          nShards = 32, maxIters = 15, buildK = 32, replicas = 1,
          shardIters = 6, polishIters = 3)
      }
      val r3 = sampledRecall(pts, rep3.graph, 200)
      println(f"SMOKE sharded r1:  iters=${rep3.iterations} " +
        f"converged=${rep3.converged} recall=$r3%.4f")
      println(f"SMOKE 100k wall ratio sharded-r1/single = ${w3 / w1}%.3f, " +
        f"recall delta = ${r3 - r1}%+.4f")
    }

    // parameter probe: one sharded arm at 100k, knobs via env —
    // GRAFT_KNNGRAPH_DEBUG=1 prints the per-phase split
    if (tiers("probe")) {
      synth(100000L, 256, s"$base/vecs100k")
      val pts = spark.read.parquet(s"$base/vecs100k")
      val ns = sys.env.getOrElse("SPARK_GRAFT_NSHARDS", "32").toInt
      val reps = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "1").toInt
      val skb = sys.env.getOrElse("SPARK_GRAFT_SHARD_BUILDK", "0").toInt
      val si = sys.env.getOrElse("SPARK_GRAFT_SHARD_ITERS", "6").toInt
      val pi = sys.env.getOrElse("SPARK_GRAFT_POLISH_ITERS", "3").toInt
      val (rep, w) = timed(
          s"probe sharded @100k ns=$ns r=$reps skb=$skb si=$si pi=$pi") {
        operators.KnnGraph.nnDescentSharded(pts, "id", "vec", k = k,
          nShards = ns, maxIters = 15, buildK = 32, replicas = reps,
          shardIters = si, polishIters = pi, shardBuildK = skb)
      }
      val r = sampledRecall(pts, rep.graph, 200)
      println(f"SMOKE probe: iters=${rep.iterations} recall=$r%.4f " +
        f"wall=$w%.1f s")
    }

    // the honest 1M baseline the sharded comparison hinges on: the
    // single-shot descent, same recipe as the 100k tier
    if (tiers("1msingle")) {
      synth(1000000L, 1024, s"$base/vecs1m")
      val pts = spark.read.parquet(s"$base/vecs1m")
      val (rep, w) = timed("single-shot nnDescent @1M (r11 recipe)") {
        operators.KnnGraph.nnDescent(pts, "id", "vec", k = k,
          maxIters = 15, buildK = 32)
      }
      val r = sampledRecall(pts, rep.graph, 2000)
      println(f"SMOKE 1M single-shot: iters=${rep.iterations} " +
        f"converged=${rep.converged} recall=$r%.4f wall=$w%.1f s")
    }

    if (tiers("1m")) {
      val (_, _) = timed("synthesize 1M") {
        synth(1000000L, 1024, s"$base/vecs1m")
      }
      val pts = spark.read.parquet(s"$base/vecs1m")
        .withColumn("gen", lit(0L))
      val root = s"$base/layout1m"
      val ns = sys.env.getOrElse("SPARK_GRAFT_NSHARDS", "128").toInt
      val reps = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "1").toInt
      val skb = sys.env.getOrElse("SPARK_GRAFT_SHARD_BUILDK", "0").toInt
      val si = sys.env.getOrElse("SPARK_GRAFT_SHARD_ITERS", "6").toInt
      val pi = sys.env.getOrElse("SPARK_GRAFT_POLISH_ITERS", "3").toInt
      val (rep, wb) = timed(
          s"sharded buildSharded @1M ns=$ns r=$reps skb=$skb si=$si pi=$pi") {
        operators.KnnGraphIndex.buildSharded(spark, root, pts,
          k = k, nShards = ns, buildK = 32, maxIters = 15,
          nEntries = 16, nBuckets = 512, replicas = reps,
          shardIters = si, polishIters = pi, shardBuildK = skb)
      }
      println(f"SMOKE 1M build: iters=${rep.iterations} " +
        f"converged=${rep.converged} wall=$wb%.1f s " +
        f"(single-shot extrapolation ~1900-2600 s)")
      val ptsRaw = spark.read.parquet(s"$base/vecs1m")
      val (rg, _) = timed("sampled recall @1M (500 nodes)") {
        sampledRecall(ptsRaw,
          operators.KnnGraphIndex.edges(spark, root), 2000)
      }
      println(f"SMOKE 1M sampled graph recall@$k: $rg%.4f")
      // serve probe over the committed layout: 64 out-of-corpus-ish
      // queries (perturbed rows), batch beam
      val qs = ptsRaw.filter(pmod(xxhash64(col("id")), lit(15625)) === 3)
        .limit(64)
        .select(col("id").as("qid"),
          transform(col("vec"), x => x + lit(0.25f)).as("qvec"))
        .localCheckpoint(true)
      val (nServed, ws) = timed("serve probe: 64 queries ef=32") {
        operators.KnnGraphIndex.search(spark, root, qs, k = k, ef = 32)
          .count()
      }
      println(s"SMOKE 1M serve rows: $nServed (wall above)")
    }
    spark.stop()
  }
}
