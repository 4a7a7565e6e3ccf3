package graft

import graft.operators.{Ann, SimilarityJoin}
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
  private lazy val queries = emb.filter($"vec_id" < 10)
    .select($"vec_id".as("qid"), $"embedding".as("qvec")).cache()

  test("kmeans converges to stable centroid count and assignment covers all rows") {
    val (indexed, centroids) = Ann.ivfBuild(emb, "vec_id", "embedding", nCentroids = 8, iters = 3)
    assert(centroids.count() == 8)
    assert(indexed.count() == emb.count())
    assert(indexed.select("centroid_id").distinct().count() <= 8)
    // deterministic across runs
    val (_, c2) = Ann.ivfBuild(emb, "vec_id", "embedding", nCentroids = 8, iters = 3)
    val a = centroids.orderBy("centroid_id").as[(Long, Array[Float])].collect()
    val b = c2.orderBy("centroid_id").as[(Long, Array[Float])].collect()
    assert(a.map(_._1).toSeq == b.map(_._1).toSeq)
    a.zip(b).foreach { case ((_, v1), (_, v2)) => assert(v1.toSeq == v2.toSeq) }
  }

  test("IVF search: exact when probing all cells; good recall at nProbe=3") {
    val (indexed, centroids) = Ann.ivfBuild(emb, "vec_id", "embedding", nCentroids = 8, iters = 3)
    val exact = SimilarityJoin.knnL2(emb, "vec_id", "embedding", queries, "qid", "qvec", k = 5)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val full = Ann.ivfSearchL2(indexed, "vec_id", "embedding", centroids,
        queries, "qid", "qvec", k = 5, nProbe = 8)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(full == exact) // nProbe = nCentroids degenerates to exact
    val approx = Ann.ivfSearchL2(indexed, "vec_id", "embedding", centroids,
        queries, "qid", "qvec", k = 5, nProbe = 3)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(t => (t._1, t._2))
    val recall = approx.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"recall $recall too low") // self-match alone gives 0.2
  }

  test("cosine IVF: exact at full probe; assignment shuffle-free") {
    val (indexed, centroids) = Ann.ivfBuildCosine(emb, "vec_id", "embedding", nCentroids = 8, iters = 3)
    assert(centroids.count() == 8)
    val exact = SimilarityJoin.knnCosine(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val full = Ann.ivfSearchCosine(indexed, "vec_id", "embedding", centroids,
        queries, "qid", "qvec", k = 5, nProbe = 8)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(full == exact, "nProbe = nCentroids must degenerate to exact cosine top-k")
    val approx = Ann.ivfSearchCosine(indexed, "vec_id", "embedding", centroids,
        queries, "qid", "qvec", k = 5, nProbe = 3)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val recall = approx.intersect(exact.map(t => (t._1, t._2))).size.toDouble / exact.size
    assert(recall >= 0.4, s"cosine IVF recall $recall too low")
    // same no-shuffle assign contract as the L2 variant
    val plan = indexed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join") && !plan.contains("Window"),
      s"cosine assign must be a pure projection:\n$plan")
  }

  test("partitioned IVF layout: pruned probe matches full search, scan prunes partitions") {
    val (indexed, centroids) = Ann.ivfBuild(emb, "vec_id", "embedding", nCentroids = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Ann.writeIvfIndex(indexed, centroids, path)
    val full = Ann.ivfSearchL2(indexed, "vec_id", "embedding", centroids,
        queries, "qid", "qvec", k = 5, nProbe = 3)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val pruned = Ann.ivfSearchL2Pruned(spark, path, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, nProbe = 3)
    val prunedSet = pruned
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(prunedSet == full, "pruned search must equal full-index search")
    // the probe reaches the SOURCE: partition filters on centroid_id in
    // the parquet scan, so unprobed cells' files are never read
    val plan = pruned.queryExecution.executedPlan.toString
    // uppercase "IN (" — a lowercase 'in' would also match 'bigint'
    val pf = "(?s)PartitionFilters: \\[[^\\]]*centroid_id[^\\]]* IN \\(".r
    assert(pf.findFirstIn(plan).isDefined,
      s"expected an IN partition filter on centroid_id in:\n$plan")
  }

  test("serving IVF layouts hold exactly one file per cell; the consolidate=false escape stays correct") {
    def cellFiles(path: String): Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(path, "index")
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith("centroid_id="))
        .map { d =>
          val fs2 = java.nio.file.Files.list(d)
          try d.getFileName.toString ->
            fs2.iterator().asScala.count(_.toString.endsWith(".parquet"))
          finally fs2.close()
        }.toMap
      finally s.close()
    }
    // many input partitions, so an unconsolidated write WOULD fan out
    val (indexed, centroids) = Ann.ivfBuild(emb.repartition(16),
      "vec_id", "embedding", nCentroids = 4, iters = 2)
    val served = java.nio.file.Files
      .createTempDirectory("graft-ivf-cons").toString
    Ann.writeIvfIndex(indexed, centroids, served)
    assert(cellFiles(served).values.forall(_ == 1),
      s"serving layout must hold ONE file per cell (a probe pays one " +
        s"footer per probed cell), got ${cellFiles(served)}")
    // the escape for build-once-probe-once sweep candidates: skips the
    // consolidation shuffle, must stay READ-identical
    val swept = java.nio.file.Files
      .createTempDirectory("graft-ivf-nocons").toString
    Ann.writeIvfIndex(indexed, centroids, swept, consolidate = false)
    val a = Ann.ivfSearchL2Pruned(spark, served, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 2)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val b = Ann.ivfSearchL2Pruned(spark, swept, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 2)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(a == b, "consolidation is a FILE-layout property — results " +
      "must be identical either way")
  }

  test("chooseConfig recommends the graph arm when it dominates the frontier at the target recall") {
    // locality-bearing 8-dim corpus, held-out queries — a mini
    // ir_ann_sweep with an IVF probe ladder AND a persisted-graph arm
    // on the same frontier (r14 verdict #2: the chooser must be able
    // to answer "build the graph" when the graph wins)
    val pts = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 450)
      .select($"vec_id".as("id"), slice($"embedding", 1, 8).as("vec"))
      .localCheckpoint(true)
    val qs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" >= 450 && $"vec_id" < 460)
      .select($"vec_id".as("qid"), slice($"embedding", 1, 8).as("qvec"))
      .localCheckpoint(true)
    val kk = 5
    val truth = SimilarityJoin.knnL2(pts, "id", "vec", qs, "qid", "qvec", kk)
      .select($"qid", $"id").localCheckpoint(true)
    val (indexed, cents) = Ann.ivfBuild(pts, "id", "vec",
      nCentroids = 4, iters = 2)
    val cellSizes = indexed.groupBy($"centroid_id")
      .agg(count(lit(1)).as("csz"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy($"cdist", $"centroid_id")
    val probeRank = qs.crossJoin(broadcast(cents))
      .withColumn("cdist",
        graft.functions.l2_distance($"qvec", $"centroid"))
      .withColumn("crank", row_number().over(wq))
      .join(broadcast(cellSizes), Seq("centroid_id"))
      .localCheckpoint(true)
    def armRow(config: String, hits: org.apache.spark.sql.DataFrame,
        scanned: org.apache.spark.sql.DataFrame) =
      qs.select($"qid")
        .join(hits, Seq("qid"), "left")
        .join(scanned, Seq("qid"))
        .select(lit(config).as("config"), $"qid",
          (coalesce($"hits", lit(0L)) / lit(kk.toDouble)).as("recall"),
          $"scanned")
    val ivfArms = Seq(1, 2, 4).map { p =>
      val hits = Ann.ivfSearchL2(indexed, "id", "vec", cents,
          qs, "qid", "qvec", k = kk, nProbe = p)
        .select($"qid", $"id")
        .join(truth, Seq("qid", "id"), "left_semi")
        .groupBy("qid").agg(count(lit(1)).as("hits"))
      val scanned = probeRank.filter($"crank" <= p)
        .groupBy("qid").agg(sum($"csz").as("scanned"))
      armRow(f"ivf_p$p", hits, scanned)
    }
    val root = java.nio.file.Files
      .createTempDirectory("graft-choose-graph").toString + "/g"
    graft.operators.KnnGraphIndex.build(spark, root,
      pts.withColumn("gen", lit(0L)), k = kk, buildK = 24,
      nEntries = 4, nBuckets = 8)
    val (gres, gcost) = graft.operators.KnnGraphIndex.searchWithCost(
      spark, root, qs, k = kk, ef = 32)
    val gHits = gres.select($"qid", $"id")
      .join(truth, Seq("qid", "id"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("hits"))
    val graphArm = armRow("graph_ef32", gHits, gcost)
    val frontier = (ivfArms :+ graphArm).reduce(_ unionAll _)
      .localCheckpoint(true)
    // fixture precondition, asserted so the test cannot go vacuous:
    // the graph walk is exact here (beam-served == brute on locality
    // fixtures) and scores fewer candidates than the full probe
    val means = frontier.groupBy("config")
      .agg(avg($"recall").as("r"), avg($"scanned").as("s"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(means("graph_ef32")._1 >= 0.999,
      s"graph arm must be exact on this fixture, got ${means("graph_ef32")}")
    val qualifying = means.filter(_._2._1 >= 0.999)
    assert(qualifying.minBy(_._2._2)._1 == "graph_ef32",
      s"fixture must make the graph dominate at recall 1.0: $means")
    val pick = Ann.chooseConfig(frontier, minRecall = 0.999)
      .select($"config").head().getString(0)
    assert(pick == "graph_ef32",
      s"chooser must recommend the dominating graph arm, picked $pick " +
        s"from $means")
  }

  test("appendToIvfIndex: O(batch) file append, appended rows searchable, cells correct") {
    val base = emb.filter($"vec_id" < 400)
    val rest = emb.filter($"vec_id" >= 400)
    val (indexed, centroids) = Ann.ivfBuild(base, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    Ann.writeIvfIndex(indexed, centroids, path)
    def dataFiles(): Set[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(path, "index")
      val s = java.nio.file.Files.walk(root)
      try s.iterator().asScala
        .filter(p => p.toString.endsWith(".parquet"))
        .map(p => (p.toString, java.nio.file.Files.size(p))).toSet
      finally s.close()
    }
    val before = dataFiles()
    Ann.appendToIvfIndex(spark, path, rest, "vec_id", "embedding")
    val after = dataFiles()
    // existing files byte-identical — the append touched only new files
    assert(before.subsetOf(after), "append must not rewrite existing files")
    assert(after.size > before.size, "append must add files")
    // every appended row landed in the cell the centroid contract says
    val expected = Ann.assign(rest, "vec_id", "embedding", centroids)
      .select($"vec_id", $"centroid_id").as[(Long, Long)].collect().toSet
    val onDisk = spark.read.parquet(s"$path/index")
      .filter($"vec_id" >= 400)
      .select($"vec_id", $"centroid_id".cast("long")).as[(Long, Long)]
      .collect().toSet
    assert(onDisk == expected, "appended rows must sit in their assigned cells")
    // pruned search over the appended layout ≡ one-shot full search
    val full = Ann.ivfSearchL2(Ann.assign(emb, "vec_id", "embedding", centroids),
        "vec_id", "embedding", centroids, queries, "qid", "qvec", k = 5, nProbe = 3)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val appended = Ann.ivfSearchL2Pruned(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 3)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(appended == full, "appended layout must search identically")
  }

  test("rebalanceIvfCells: splits only hot cells, search-identical, caps enforced") {
    // 2 coarse cells over 500 rows → both far above a 100-row cap
    val (indexed, centroids) = Ann.ivfBuild(emb, "vec_id", "embedding",
      nCentroids = 2, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-reb").toString
    Ann.writeIvfIndex(indexed, centroids, path)
    val exactBefore = Ann.ivfSearchL2Pruned(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 2)
      .select($"qid", $"vec_id", $"rn", $"distance")
      .as[(Long, Long, Int, Float)].collect().toSet
    val rep = Ann.rebalanceIvfCells(spark, path, "vec_id", "embedding",
      maxCellRows = 100, iters = 2)
    assert(rep.splitCells == 2)
    assert(rep.newCells >= 6, s"500 rows / 100 cap needs >= 6 sub-cells, got $rep")
    // same row set, finer partition cover, every cell within the cap
    val after = spark.read.parquet(s"$path/index")
    assert(after.count() == emb.count())
    val cellCounts = after.groupBy("centroid_id").count()
      .as[(Long, Long)].collect().toMap
    assert(cellCounts.values.forall(_ <= 100),
      s"cells over cap after rebalance: ${cellCounts.filter(_._2 > 100)}")
    // centroid table consistent with the partitions on disk
    val centIds = spark.read.parquet(s"$path/centroids")
      .select($"centroid_id".cast("long")).as[Long].collect().toSet
    assert(centIds == cellCounts.keySet)
    // full-probe search identical to the pre-rebalance layout
    val exactAfter = Ann.ivfSearchL2Pruned(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = centIds.size)
      .select($"qid", $"vec_id", $"rn", $"distance")
      .as[(Long, Long, Int, Float)].collect().toSet
    assert(exactAfter == exactBefore, "rebalance must not change full-probe results")
    // idempotent: nothing left over the cap → no-op report
    assert(Ann.rebalanceIvfCells(spark, path, "vec_id", "embedding", 100, 2)
      == Ann.RebalanceReport(0, 0))
    // cosine layouts are rejected — their cells are angular
    val cpath = java.nio.file.Files.createTempDirectory("graft-ivf-rebc").toString
    val (ci, cc) = Ann.ivfBuildCosine(emb, "vec_id", "embedding", 2, 2)
    Ann.writeIvfIndex(ci, cc, cpath, metric = "cosine")
    intercept[IllegalArgumentException](
      Ann.rebalanceIvfCells(spark, cpath, "vec_id", "embedding", 100, 2))
  }

  test("mergeIvfCells: dissolves small cells, search-identical, keeps one survivor") {
    val (indexed, centroids) = Ann.ivfBuild(emb, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-mrg").toString
    Ann.writeIvfIndex(indexed, centroids, path)
    val before = Ann.ivfSearchL2Pruned(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 8)
      .select($"qid", $"vec_id", $"rn", $"distance")
      .as[(Long, Long, Int, Float)].collect().toSet
    val counts = spark.read.parquet(s"$path/index")
      .groupBy($"centroid_id".cast("long")).count()
      .as[(Long, Long)].collect().toMap
    // a floor just above the smallest cell dissolves at least it
    val floor = counts.values.min + 1
    val rep = Ann.mergeIvfCells(spark, path, "vec_id", "embedding", floor)
    assert(rep.mergedCells >= 1 && rep.survivingCells == 8 - rep.mergedCells)
    val after = spark.read.parquet(s"$path/index")
    assert(after.count() == emb.count(), "merge must not lose rows")
    val centsAfter = spark.read.parquet(s"$path/centroids")
      .select($"centroid_id".cast("long")).as[Long].collect().toSet
    assert(centsAfter.size == rep.survivingCells)
    // moved rows sit in their nearest-survivor cell
    val cellsOnDisk = after.select($"centroid_id".cast("long")).distinct()
      .as[Long].collect().toSet
    assert(cellsOnDisk.subsetOf(centsAfter))
    // full-probe search identical (same rows, coarser cover)
    val got = Ann.ivfSearchL2Pruned(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 8)
      .select($"qid", $"vec_id", $"rn", $"distance")
      .as[(Long, Long, Int, Float)].collect().toSet
    assert(got == before, "merge must not change full-probe results")
    // dissolving everything keeps the fullest cell as the target
    val rep2 = Ann.mergeIvfCells(spark, path, "vec_id", "embedding",
      minCellRows = Long.MaxValue / 2)
    assert(rep2.survivingCells == 1)
    assert(spark.read.parquet(s"$path/index").count() == emb.count())
    val one = Ann.ivfSearchL2Pruned(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 1)
      .select($"qid", $"vec_id", $"rn", $"distance")
      .as[(Long, Long, Int, Float)].collect().toSet
    assert(one == before, "single-cell layout is the exact brute scan")
  }

  test("super quantizer: degenerate routing exact, partial routing sane") {
    val (indexed, centroids) = Ann.ivfBuild(emb, "vec_id", "embedding",
      nCentroids = 16, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivf-hier").toString
    Ann.writeIvfIndex(indexed, centroids, path)
    intercept[IllegalArgumentException](
      Ann.ivfSearchL2PrunedHier(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 16, superProbe = 4))
    Ann.buildSuperQuantizer(spark, path, nSuper = 4, iters = 2)
    assert(Ann.hasSuperQuantizer(spark, path))
    // every cell routes to exactly one super-cell
    val routing = spark.read.parquet(s"$path/super/routing")
      .as[(Long, Long)].collect()
    assert(routing.map(_._1).toSet.size == 16 && routing.length == 16)
    // full routing (all supers, all cells) ≡ the flat full probe ≡ exact
    val exact = SimilarityJoin.knnL2(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val hierFull = Ann.ivfSearchL2PrunedHier(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 16, superProbe = 4)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(hierFull == exact)
    // full SUPER probe at partial nProbe ≡ the flat probe at the same
    // nProbe (identical candidate cell set → identical ranking)
    val flat3 = Ann.ivfSearchL2Pruned(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 3)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val hier3 = Ann.ivfSearchL2PrunedHier(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 3, superProbe = 4)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(hier3 == flat3)
    // routed partial probe: valid rows, reasonable recall
    val routed = Ann.ivfSearchL2PrunedHier(spark, path, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5, nProbe = 3, superProbe = 2)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val exactPairs = exact.map(t => (t._1, t._2))
    val recall = routed.intersect(exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.5, s"hier recall $recall too low")
  }

  test("TopKAggregator matches the window top-k when NaN distances occur") {
    // SQL semantics: NaN sorts last and equals itself — raw Double
    // comparisons would let buffered NaNs block finite candidates
    val rows = Seq(
      (0L, 1L, Double.NaN), (0L, 2L, 1.0), (0L, 3L, Double.NaN), (0L, 4L, 0.5),
      (1L, 5L, Double.NaN), (1L, 6L, Double.NaN), (2L, 7L, 2.0))
    val df = rows.toDF("qid", "id", "dist").repartition(3)
    val win = SimilarityJoin.topKByDistance(df, "qid", "id", "dist", 2)
      .select($"qid", $"id", $"rn").as[(Long, Long, Int)].collect().toSet
    val agg = graft.operators.TopKAggregator.topKRows(df, "qid", "id", "dist", 2)
      .select($"qid", $"id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(agg == win, s"agg=$agg win=$win")
  }

  test("TopKAggregator matches the window top-k on tie-heavy random data") {
    val rnd = new scala.util.Random(7)
    // coarse distances force (dist, id) tie-breaks on most comparisons
    val rows = (0 until 5000).map(i => (i % 7L, i.toLong, rnd.nextInt(40) / 10.0))
    val df = rows.toDF("qid", "id", "dist").repartition(13)
    val win = SimilarityJoin.topKByDistance(df, "qid", "id", "dist", 5)
      .select($"qid", $"id", $"dist", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    val agg = graft.operators.TopKAggregator.topKRows(df, "qid", "id", "dist", 5)
      .select($"qid", $"id", $"dist", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(agg == win)
  }

  test("LSH near-dup pairs: precision 1.0 subset of the exact O(n²) pairs") {
    val exact = SimilarityJoin.cosineNearDupPairs(emb, "vec_id", "embedding", 0.35)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshCosineNearDupPairs(emb, "vec_id", "embedding", 0.35, dim = 64, nBits = 4)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"non-pairs: ${lsh.diff(exact).take(3)}")
    if (exact.nonEmpty) {
      // 4-bit buckets on 64-d random vectors: recall is partial but
      // must find a meaningful share of true pairs
      val recall = lsh.size.toDouble / exact.size
      assert(recall > 0.0, s"LSH found none of ${exact.size} true pairs")
    }
  }

  test("multi-probe LSH: recall >= single-probe, still bucket-pruned") {
    val exact = SimilarityJoin.knnCosine(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    val single = recallOf(Ann.lshCosineTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, dim = 64, nBits = 6))
    val multi = recallOf(Ann.lshCosineTopKMultiProbe(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5, dim = 64, nBits = 6))
    assert(multi >= single, s"multi-probe recall $multi < single-probe $single")
    assert(multi > single, s"1-bit probes must add candidates on random vectors ($multi)")
    // still approximate: candidates pruned to (nBits+1) of 2^nBits buckets
    val full = recallOf(SimilarityJoin.knnCosine(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5))
    assert(full == 1.0)
  }

  test("LSH cosine top-k: self-match always found, candidates bucket-pruned") {
    val got = Ann.lshCosineTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 3, dim = 64, nBits = 6)
    val bySelf = got.filter($"rn" === 1)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
    // rank-1 hit for each query is the query vector itself (same bucket,
    // cosine 1.0)
    assert(bySelf.forall { case (q, id) => q == id })
    assert(got.count() > 0 && got.count() <= 30)
  }

  // ------------------------ product quantization ------------------------ //

  test("pq: codebook shape, codes bounded, centroid vectors encode losslessly") {
    import graft.operators.Pq
    val cb = Pq.fit(emb, "vec_id", "embedding", dim = 64, m = 4, k = 8, iters = 2)
    assert(cb.centroids.length == 4 && cb.centroids.forall(_.length == 8))
    assert(cb.subDim == 16)

    val coded = Pq.encode(emb, "embedding", "codes", cb)
    val codes = coded.select(explode($"codes")).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < 8))

    // a vector that IS a concatenation of subspace centroids must
    // round-trip: its codes pick those centroids, recon == itself,
    // and ADC distance from itself == 0
    val synth = (0 until 4).flatMap(s => cb.centroids(s)(s % 8).toSeq).toArray
    val one = Seq((0L, synth)).toDF("vec_id", "embedding")
    val enc = Pq.encode(one, "embedding", "codes", cb)
    val got = enc.select($"codes").as[Seq[Int]].head()
    assert(got == Seq(0, 1, 2, 3))
    val recon = enc.select(Pq.reconstructCol($"codes", cb)).as[Seq[Float]].head()
    assert(recon == synth.toSeq)
    val adc = enc.select(Pq.adcDistanceCol(synth, cb, $"codes")).as[Double].head()
    assert(adc == 0.0)
  }

  test("pq: ADC distance equals recon distance; clustered data gets exact top-k") {
    import graft.operators.Pq
    // three tight clusters far apart in all subspaces
    val base = Seq.tabulate(3)(c => Array.fill(8)(c * 10.0f))
    val vecs = (0 until 30).map { i =>
      val c = i % 3
      (i.toLong, base(c).zipWithIndex.map { case (x, j) =>
        x + ((i * 7 + j) % 5) * 0.01f })
    }
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Pq.fit(df, "vec_id", "embedding", dim = 8, m = 2, k = 3, iters = 4)
    val coded = Pq.encode(df, "embedding", "codes", cb)

    // ADC == independent double recomputation against the reconstruction
    val q = vecs(1)._2
    val recon = Pq.reconstructCol($"codes", cb)
    val reconL2 = sqrt(aggregate(
      zip_with(typedLit(q), recon,
        (a, b) => (a.cast("double") - b.cast("double")) *
          (a.cast("double") - b.cast("double"))),
      lit(0.0d), (acc, x) => acc + x))
    val diffs = coded
      .select(abs(Pq.adcDistanceCol(q, cb, $"codes") - reconL2)).as[Double].collect()
    assert(diffs.forall(_ < 1e-9))

    // cluster separation >> quantization error: ADC top-10 for a
    // cluster-1 query is exactly the 10 cluster-1 members
    val top = Pq.adcTopK(coded, "vec_id", "codes", cb, Seq((1L, q)), k = 10)
      .select($"vec_id").as[Long].collect().toSet
    assert(top == (0 until 30).filter(_ % 3 == 1).map(_.toLong).toSet)
  }

  test("cosine seeding prefers far (angular) points: 3 angular clusters recovered") {
    // 60 points hug direction e1; two 5-point minorities hug e2 and e3.
    // The k-means|| oversampling weight for the cosine metric must be
    // (1 - cos) — with the inverted sign (w = -cos, floor 0) the picks
    // concentrate NEAR existing seeds and a minority direction loses
    // its centroid. Assert every angular cluster maps to its own
    // centroid with full purity.
    def jit(i: Int, j: Int): Float = ((i * 13 + j * 7) % 9) * 0.003f
    val pts = (0 until 60).map { i =>
      (i.toLong, Array(1f + jit(i, 0), jit(i, 1), jit(i, 2), jit(i, 3))) } ++
      (60 until 65).map { i =>
        (i.toLong, Array(jit(i, 0), 1f + jit(i, 1), jit(i, 2), jit(i, 3))) } ++
      (65 until 70).map { i =>
        (i.toLong, Array(jit(i, 0), jit(i, 1), 1f + jit(i, 2), jit(i, 3))) }
    val df = pts.toDF("vec_id", "embedding")
    val (indexed, centroids) =
      Ann.ivfBuildCosine(df, "vec_id", "embedding", nCentroids = 3, iters = 4)
    assert(centroids.count() == 3)
    val byCluster = indexed
      .select($"vec_id", $"centroid_id").as[(Long, Long)].collect()
      .groupBy { case (id, _) => if (id < 60) 0 else if (id < 65) 1 else 2 }
      .view.mapValues(_.map(_._2).toSet).toMap
    // each angular cluster assigned to exactly one centroid...
    byCluster.values.foreach(s => assert(s.size == 1,
      s"cluster split across centroids: $byCluster"))
    // ...and the three centroids are distinct (no dropped direction)
    assert(byCluster.values.map(_.head).toSet.size == 3,
      s"a minority direction lost its centroid: $byCluster")
  }

  test("hardNegatives: never the anchor's label, ranked by sim, bounded at k") {
    val anchors = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"), $"label".as("qlabel"))
    val negs = graft.operators.SimilarityJoin.hardNegatives(
      emb, "vec_id", "embedding", "label", anchors, "qid", "qvec", "qlabel", k = 4)
    val joined = negs
      .join(emb.select($"vec_id", $"label"), "vec_id")
      .join(anchors.select($"qid", $"qlabel"), "qid")
    assert(joined.filter($"label" === $"qlabel").count() == 0,
      "a hard negative must never share the anchor's label")
    val perQ = negs.groupBy("qid").count().select("count").as[Long].collect()
    assert(perQ.forall(_ == 4))
    // ranks are sim-descending within each anchor
    val rows = negs.select($"qid", $"rn", $"sim".cast("double"))
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    rows.values.foreach { rs =>
      val bySim = rs.sortBy(_._2).map(_._3)
      assert(bySim.zip(bySim.tail).forall { case (a, b) => a >= b })
    }
  }

  test("evaluation: hand-computed recall/mrr/ndcg, zero-hit and absent queries") {
    import graft.operators.Evaluation
    val run = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("qid", "id", "rank")
    val truth = Seq((1L, 11L), (1L, 99L), (2L, 50L)).toDF("qid", "id")
    val m = Evaluation.rankedMetrics(run, truth, "qid", "id", "rank", k = 3)
      .select("qid", "n_relevant", "hits", "recall", "mrr", "ndcg")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    // q1: one hit at rank 2 of {11, 99}: recall 1/2, mrr 1/2,
    // ndcg = (1/log2(3)) / (1/log2(2) + 1/log2(3))
    val (_, nr, h, rec, mrr, ndcg) = m(1L)
    assert(nr == 2L && h == 1L && rec == 0.5 && mrr == 0.5)
    assert(math.abs(ndcg - (1 / log2(3)) / (1 + 1 / log2(3))) < 1e-12)
    // q2: in truth but not retrieved at all -> all zeros
    assert(m(2L)._3 == 0L && m(2L)._4 == 0.0 && m(2L)._5 == 0.0 && m(2L)._6 == 0.0)
  }

  test("evaluation: reciprocal rank fusion hand-computed, ties break on id") {
    import graft.operators.Evaluation
    val run1 = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3)).toDF("qid", "id", "rank")
    val run2 = Seq((1L, 3L, 1), (1L, 4L, 2)).toDF("qid", "id", "rank")
    // k0=1: id3 = 1/4+1/2 = .75; id1 = 1/2; id2 = 1/3 ties id4 = 1/3 -> id asc
    val fused = Evaluation.reciprocalRankFusion(
        Seq(run1, run2), "qid", "id", "rank", topK = 10, k0 = 1)
      .orderBy("rank").select("id", "rrf", "rank")
      .as[(Long, Double, Int)].collect()
    assert(fused.map(_._1).toSeq == Seq(3L, 1L, 2L, 4L))
    assert(math.abs(fused(0)._2 - 0.75) < 1e-12)
    assert(math.abs(fused(2)._2 - 1.0 / 3.0) < 1e-12)
    // topK truncates the fused list, not the inputs
    val top2 = Evaluation.reciprocalRankFusion(
      Seq(run1, run2), "qid", "id", "rank", topK = 2, k0 = 1)
    assert(top2.count() == 2L)
  }

  test("evaluation: average precision hand-computed, order sensitivity, absent query") {
    import graft.operators.Evaluation
    // q1: hits at ranks 1 and 3 of 2 relevant -> AP = (1/1 + 2/3) / 2
    // q2: same hits pushed to ranks 2 and 3 -> AP = (1/2 + 2/3) / 2 (strictly lower)
    val run = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3)).toDF("qid", "id", "rank")
    val truth = Seq(
      (1L, 10L), (1L, 12L),
      (2L, 21L), (2L, 22L),
      (3L, 99L)).toDF("qid", "id")
    val ap = Evaluation.averagePrecision(run, truth, "qid", "id", "rank", k = 3)
      .select("qid", "n_relevant", "ap")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(math.abs(ap(1L)._3 - (1.0 + 2.0 / 3.0) / 2.0) < 1e-12)
    assert(math.abs(ap(2L)._3 - (0.5 + 2.0 / 3.0) / 2.0) < 1e-12)
    assert(ap(1L)._3 > ap(2L)._3, "AP must reward earlier hits")
    // q3: in truth, absent from the run -> ap = 0
    assert(ap(3L)._2 == 1L && ap(3L)._3 == 0.0)
    // duplicated truth rows must not double-count
    val dup = truth.unionAll(truth)
    val apDup = Evaluation.averagePrecision(run, dup, "qid", "id", "rank", k = 3)
      .select("qid", "ap").as[(Long, Double)].collect().toMap
    assert(math.abs(apDup(1L) - ap(1L)._3) < 1e-12)
  }

  test("mmr: lambda=1 is relevance order; diversity penalty reroutes pick 2") {
    import graft.operators.Mmr
    val cands = Seq(
      (0L, 1L, 1.0, Seq(1f, 0f)),
      (0L, 2L, 0.9, Seq(1f, 0.01f)), // nearly parallel to id 1
      (0L, 3L, 0.5, Seq(0f, 1f)))    // orthogonal
      .toDF("qid", "id", "score", "vec")
    val plain = Mmr.rerank(cands, "qid", "id", "score", "vec", k = 3, lambda = 1.0)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(plain == Seq(1L, 2L, 3L))
    val div = Mmr.rerank(cands, "qid", "id", "score", "vec", k = 3, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    // pick 2: id 2 scores .45 - .5*~1 < 0, id 3 scores .25 - 0 -> id 3
    assert(div == Seq(1L, 3L, 2L))
    intercept[IllegalArgumentException] {
      Mmr.rerank(cands, "qid", "id", "score", "vec", 3, 1.5)
    }
  }

  test("ivfpq: full probe equals flat ADC; pruned probe per-rank dominated") {
    import graft.operators.Pq
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (i, v) => (i, v.toArray) }.toSeq
    val (indexed, cents, cb) = Pq.ivfPqBuild(emb, "vec_id", "embedding",
      dim = 64, nCells = 8, m = 4, k = 8, iters = 2)
    assert(indexed.columns.toSeq == Seq("vec_id", "centroid_id", "codes"))

    val flat = Pq.adcTopK(
        Pq.encode(emb, "embedding", "codes", cb), "vec_id", "codes", cb, queries, 5)
      .select($"qid", $"vec_id", $"adc_dist").as[(Long, Long, Double)]
      .collect().toSet
    val full = Pq.ivfPqSearch(indexed, "vec_id", "codes", cents, cb,
        queries, k = 5, nProbe = 8)
      .select($"qid", $"vec_id", $"adc_dist").as[(Long, Long, Double)]
      .collect().toSet
    assert(full == flat, "nProbe = nCells must degenerate to flat ADC")

    // pruned probe: per-rank ADC distance can only get worse (the
    // candidate set shrank), never better
    def ranked(df: org.apache.spark.sql.DataFrame) = df
      .select($"qid", $"adc_dist").as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val pruned = ranked(Pq.ivfPqSearch(indexed, "vec_id", "codes", cents, cb,
      queries, k = 5, nProbe = 2))
    val fullR = ranked(Pq.ivfPqSearch(indexed, "vec_id", "codes", cents, cb,
      queries, k = 5, nProbe = 8))
    pruned.foreach { case (qid, ds) =>
      ds.zip(fullR(qid)).foreach { case (p, f) =>
        assert(p >= f - 1e-12, s"query $qid: pruned rank beat full probe")
      }
    }
  }

  test("ivfpq search: one relational job — no per-query plan branches") {
    import graft.operators.Pq
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (i, v) => (i, v.toArray) }.toSeq
    val (indexed, cents, cb) = Pq.ivfPqBuild(emb, "vec_id", "embedding",
      dim = 64, nCells = 8, m = 4, k = 8, iters = 1)
    val plan = Pq.ivfPqSearch(indexed, "vec_id", "codes", cents, cb,
        queries, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"),
      s"batch search must be ONE plan, not a per-query union:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe relation and ADC tables must broadcast-join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"probed-cell candidate join must stay a broadcast equi-join:\n$plan")
    val flatPlan = Pq.adcTopK(Pq.encode(emb, "embedding", "codes", cb),
        "vec_id", "codes", cb, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(!flatPlan.contains("Union"),
      s"flat ADC batch must be ONE plan, not a per-query union:\n$flatPlan")
  }

  test("ivfpq: chunked query batches union to the exact unchunked result") {
    import graft.operators.Pq
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (i, v) => (i, v.toArray) }.toSeq
    val (indexed, cents, cb) = Pq.ivfPqBuild(emb, "vec_id", "embedding",
      dim = 64, nCells = 8, m = 4, k = 8, iters = 1)
    def run(chunk: Int) = Pq.ivfPqSearch(indexed, "vec_id", "codes", cents,
        cb, queries, k = 5, nProbe = 3, queryChunk = chunk)
      .select($"qid", $"vec_id", $"rn", $"adc_dist")
      .as[(Long, Long, Long, Double)].collect().toSet
    // per-query top-k is chunk-independent: 10 queries in chunks of 3
    // (4 sub-batches) must union to the single-batch result exactly
    assert(run(3) == run(1024))
    val (ri, rc, rcb) = Pq.ivfPqBuildResidual(emb, "vec_id", "embedding",
      dim = 64, nCells = 8, m = 4, k = 8, iters = 1)
    def runRes(chunk: Int) = Pq.ivfPqSearchResidual(ri, "vec_id", "codes",
        rc, rcb, queries, k = 5, nProbe = 3, queryChunk = chunk)
      .select($"qid", $"vec_id", $"rn", $"adc_dist")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(runRes(7) == runRes(1024))
  }

  test("residual ivfpq: tighter reconstruction than raw PQ, one relational search job") {
    import graft.operators.Pq
    import org.apache.spark.sql.functions.{aggregate, broadcast, element_at, sqrt, typedLit, zip_with}
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().map { case (i, v) => (i, v.toArray) }.toSeq
    val (indexed, cents, cb) = Pq.ivfPqBuildResidual(emb, "vec_id", "embedding",
      dim = 64, nCells = 8, m = 4, k = 8, iters = 2)
    assert(indexed.columns.toSeq == Seq("vec_id", "centroid_id", "codes"))

    val res = Pq.ivfPqSearchResidual(indexed, "vec_id", "codes", cents, cb,
      queries, k = 5, nProbe = 2)
    assert(res.groupBy("qid").count().select("count")
      .as[Long].collect().toSeq == Seq.fill(5)(5L))
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"),
      s"residual batch search must be ONE plan, not a per-query union:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && !plan.contains("CartesianProduct")
      && !plan.contains("SortMergeJoin"),
      s"probe relation must broadcast equi-join:\n$plan")

    // quantization quality: at the same (m, k) budget, residual codes
    // reconstruct tighter than raw-vector codes (the point of the
    // residual layout) — mean L2(v, reconstruction) over the corpus
    def meanErr(errCol: org.apache.spark.sql.Column,
        df: org.apache.spark.sql.DataFrame): Double =
      df.agg(org.apache.spark.sql.functions.avg(errCol)).head().getDouble(0)
    def hofL2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      sqrt(aggregate(
        zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
        org.apache.spark.sql.functions.lit(0.0d), (acc, x) => acc + x))
    val centArr = cents.select($"centroid_id".cast("long"), $"centroid")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    val joined = indexed.join(emb.select($"vec_id", $"embedding"), "vec_id")
    val residErr = meanErr(
      hofL2(
        graft.functions.vec_sub($"embedding",
          element_at(typedLit(centArr), $"centroid_id".cast("int") + 1)),
        Pq.reconstructCol($"codes", cb)),
      joined)
    val cbRaw = Pq.fit(emb, "vec_id", "embedding", dim = 64, m = 4, k = 8, iters = 2)
    val rawErr = meanErr(
      hofL2($"embedding", Pq.reconstructCol($"codes", cbRaw)),
      Pq.encode(emb, "embedding", "codes", cbRaw))
    assert(residErr <= rawErr * 1.02,
      s"residual encoding must not reconstruct worse: resid=$residErr raw=$rawErr")
  }

  test("mmr distributed: executor kernel matches driver pick-for-pick, score included") {
    import graft.operators.Mmr
    val qs = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val cands = graft.operators.SimilarityJoin.knnCosine(
        emb, "vec_id", "embedding", qs, "qid", "qvec", k = 15)
      .join(emb.select($"vec_id", $"embedding"), "vec_id")
    for (lambda <- Seq(1.0, 0.5, 0.0)) {
      val drv = Mmr.rerank(cands, "qid", "vec_id", "sim", "embedding", 5, lambda)
      val dst = Mmr.rerankDistributed(cands, "qid", "vec_id", "sim", "embedding", 5, lambda)
      assert(drv.except(dst).count() == 0 && dst.except(drv).count() == 0,
        s"distributed MMR diverged from the driver kernel at lambda=$lambda")
    }
  }

  test("mmr: double-typed vector columns are cast, oversized driver batch refused") {
    import graft.operators.Mmr
    val cands = Seq(
      (0L, 1L, 1.0, Seq(1.0, 0.0)),
      (0L, 2L, 0.9, Seq(1.0, 0.01)),
      (0L, 3L, 0.5, Seq(0.0, 1.0)))
      .toDF("qid", "id", "score", "vec") // vec is array<double>
    val picks = Mmr.rerank(cands, "qid", "id", "score", "vec", k = 3, lambda = 0.5)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(picks == Seq(1L, 3L, 2L))
    intercept[IllegalArgumentException] {
      Mmr.rerank(cands, "qid", "id", "score", "vec", k = 3, lambda = 0.5,
        maxDriverRows = 2)
    }
  }

  test("evaluation: duplicated truth rows do not inflate recall past 1") {
    import graft.operators.Evaluation
    val run = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("qid", "id", "rank")
    val truth = Seq((1L, 10L), (1L, 10L), (1L, 11L)).toDF("qid", "id")
    val m = Evaluation.rankedMetrics(run, truth, "qid", "id", "rank", k = 2)
      .select("n_relevant", "hits", "recall")
      .as[(Long, Long, Double)].head()
    assert(m == ((2L, 2L, 1.0)), s"expected dedup'd truth (2,2,1.0), got $m")
  }

  test("pq: validation — m must divide dim, query dim must match") {
    import graft.operators.Pq
    intercept[IllegalArgumentException] {
      Pq.fit(emb, "vec_id", "embedding", dim = 64, m = 5, k = 4, iters = 1)
    }
    val cb = Pq.fit(emb.limit(50), "vec_id", "embedding", dim = 64, m = 4, k = 4, iters = 1)
    intercept[IllegalArgumentException] {
      Pq.adcDistanceCol(Array.fill(32)(0f), cb, $"codes")
    }
  }

  test("binaryAuc: separation, reversal, ties via midranks; calibration bins") {
    import graft.operators.Evaluation
    def auc(rows: Seq[(Double, Boolean)]): Option[Double] = {
      val r = Evaluation.binaryAuc(rows.toDF("s", "y"), "s", "y", nBuckets = 4).head()
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    }
    assert(auc(Seq((0.1, false), (0.2, false), (0.8, true), (0.9, true))) == Some(1.0))
    assert(auc(Seq((0.9, false), (0.8, false), (0.1, true))) == Some(0.0))
    assert(auc(Seq((0.5, false), (0.5, true), (0.5, true))) == Some(0.5))
    // midranks: tie at 0.1 counts half, the clear win counts full
    assert(auc(Seq((0.1, false), (0.1, true), (0.9, true))) == Some(0.75))
    // one-class and empty inputs: NULL auc, not a crash or a 0/0
    assert(auc(Seq((0.3, true), (0.7, true))).isEmpty)
    assert(auc(Seq.empty).isEmpty)
    // the two-level prefix sum must agree with a single-bucket run
    val mixed = (1 to 200).map(i => (i / 200.0, i % 3 == 0))
    assert(auc(mixed) ==
      Some(Evaluation.binaryAuc(mixed.toDF("s", "y"), "s", "y", nBuckets = 1)
        .head().getDouble(2)))

    val cal = Evaluation.calibration(
      Seq((0.05, false), (0.08, true), (0.95, true), (1.0, true), (-0.2, false))
        .toDF("s", "y"), "s", "y", nBins = 10)
      .orderBy("bin").collect()
    // -0.2 clamps into bin 0; 1.0 clamps into bin 9
    assert(cal.map(_.getLong(0)).toSeq == Seq(0L, 9L))
    assert(cal(0).getLong(1) == 3L && cal(1).getLong(1) == 2L)
    assert(math.abs(cal(0).getDouble(3) - 1.0 / 3) < 1e-12)
    assert(cal(1).getDouble(3) == 1.0)
  }

  test("kmeans inertia: non-increasing in k, matches a local recompute") {
    val inertias = Seq(1, 2, 4, 8).map { k =>
      val cents = Ann.kmeans(emb, "vec_id", "embedding", k, iters = 3)
        .collect().map(_.getSeq[Float](1).toArray).toSeq
      val (n, i) = Ann.inertia(emb, "embedding", cents)
      assert(n == emb.count())
      (k, cents, i)
    }
    assert(inertias.map(_._3).sliding(2).forall(p => p(1) <= p(0) + 1e-6),
      s"inertia must not increase with k: ${inertias.map(t => t._1 -> t._3)}")
    // local recompute for k=2 (float32 kernel distances, double sum)
    val rows = emb.select($"embedding").collect().map(_.getSeq[Float](0).toArray)
    val c2 = inertias(1)._2
    val want = rows.map { v =>
      c2.map { c =>
        var s = 0.0f
        var i = 0
        while (i < v.length) {
          val d = v(i) - c(i); s += d * d; i += 1
        }
        s.toDouble
      }.min
    }.sum
    assert(math.abs(want - inertias(1)._3) / want < 1e-6,
      s"inertia ${inertias(1)._3} vs local $want")
    // a slice filtered empty reports (0, 0.0) — not an NPE mid-k-sweep
    assert(Ann.inertia(emb.filter($"vec_id" < 0), "embedding",
      inertias(1)._2) == ((0L, 0.0)))
  }

  test("prCurve/prAuc: hand-computed thresholds, AP, empty and one-class inputs") {
    import graft.operators.Evaluation
    val d = Seq((0.9, true), (0.8, false), (0.8, true), (0.5, false))
      .toDF("score", "label")
    val curve = Evaluation.prCurve(d, "score", "label")
      .select($"score", $"pos_at", $"tp", $"fp", $"precision", $"recall")
      .as[(Double, Long, Long, Long, Double, Double)].collect()
      .sortBy(-_._1)
    assert(curve.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((0.9, 1L, 1L, 0L), (0.8, 1L, 2L, 1L), (0.5, 0L, 2L, 2L)))
    assert(curve(0)._5 == 1.0 && curve(0)._6 == 0.5)
    assert(math.abs(curve(1)._5 - 2.0 / 3.0) < 1e-15 && curve(1)._6 == 1.0)
    assert(curve(2)._5 == 0.5 && curve(2)._6 == 1.0)
    val ap = Evaluation.prAuc(d, "score", "label").head()
    assert(ap.getAs[Long]("n_pos") == 2L && ap.getAs[Long]("n_neg") == 2L)
    // AP = 1/2·1 + 1/2·(2/3)
    assert(math.abs(ap.getAs[Double]("ap") - (0.5 + 1.0 / 3.0)) < 1e-12)
    // empty input: empty curve, NULL ap
    val empty = Seq.empty[(Double, Boolean)].toDF("score", "label")
    assert(Evaluation.prCurve(empty, "score", "label").count() == 0)
    assert(Evaluation.prAuc(empty, "score", "label").head().isNullAt(2))
    // all-negative input: curve exists, precision 0, NULL ap (nPos=0)
    val neg = Seq((0.4, false), (0.6, false)).toDF("score", "label")
    val negCurve = Evaluation.prCurve(neg, "score", "label")
      .select($"precision", $"recall").collect()
    assert(negCurve.forall(r => r.getDouble(0) == 0.0 && r.isNullAt(1)))
    assert(Evaluation.prAuc(neg, "score", "label").head().isNullAt(2))
  }

  test("hammingTopK: matches a local popcount recompute; broadcast-only plan") {
    val got = Ann.hammingTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", dim = 64, k = 5)
      .select($"qid", $"vec_id", $"hamming", $"rn")
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(t => (t._2, t._3))).toMap
    // local oracle: pack sign bits, brute-force hamming, (dist, id) order
    def pack(v: Array[Float]): Long =
      v.zipWithIndex.foldLeft(0L) { case (acc, (x, i)) =>
        if (x > 0f) acc | (1L << i) else acc
      }
    val idx = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().map { case (i, v) => (i, pack(v)) }
    val qs = queries.select($"qid", $"qvec")
      .as[(Long, Array[Float])].collect().map { case (i, v) => (i, pack(v)) }
    qs.foreach { case (qid, qsig) =>
      val want = idx.map { case (id, sig) =>
        (id, java.lang.Long.bitCount(sig ^ qsig).toLong)
      }.sortBy { case (id, d) => (d, id) }.take(5).toSeq
      assert(got(qid).toSeq == want, s"query $qid")
    }
    // shape: broadcast join only — the index side never shuffles before
    // the per-query window
    val plan = Ann.hammingTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", dim = 64, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"hamming scan must broadcast the packed queries:\n$plan")
    assert(!plan.contains("Union"), s"one relational job expected:\n$plan")
  }

  test("hammingRescoreTopK: full shortlist degenerates to exact L2 top-k; " +
      "small shortlist rescored from the sketch candidates only") {
    val n = emb.count().toInt
    // shortlist = whole index: the rescore stage sees every row, so the
    // result must equal brute-force exact L2 top-k rank-for-rank
    val exact = SimilarityJoin.knnL2(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 5)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val full = Ann.hammingRescoreTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", dim = 64, shortlist = n, k = 5)
      .select($"qid", $"vec_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(full == exact, "shortlist = n must degenerate to exact top-k")
    // bounded shortlist: every returned id must come from the Hamming
    // shortlist, and ranks must follow exact L2 distance within it
    val short = Ann.hammingTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", dim = 64, k = 20)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val resc = Ann.hammingRescoreTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", dim = 64, shortlist = 20, k = 5)
      .select($"qid", $"vec_id", $"rn", $"distance").collect()
    assert(resc.forall(r => short.contains((r.getLong(0), r.getLong(1)))),
      "rescored ids must be a subset of the Hamming shortlist")
    resc.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(2)).map(_.getFloat(3))
      assert(byRank.toSeq == byRank.sorted.toSeq, "exact distance must be non-decreasing in rank")
    }
    // guard: a shortlist smaller than k is a contract error
    intercept[IllegalArgumentException] {
      Ann.hammingRescoreTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", dim = 64, shortlist = 3, k = 5)
    }
  }
  test("chooseConfig: cheapest arm meeting the recall bar, ties to recall") {
    import graft.operators.Ann
    val sweep = Seq(
      ("lsh", 0.2, 10L), ("lsh", 0.4, 12L),       // mean 0.3 — below bar
      ("ivf_p2", 0.8, 100L), ("ivf_p2", 1.0, 120L), // mean 0.9, scan 110
      ("ivf_p4", 0.9, 200L), ("ivf_p4", 1.0, 260L), // mean 0.95, scan 230
      ("flat", 1.0, 500L), ("flat", 1.0, 500L)      // mean 1.0, scan 500
    ).toDF("config", "recall", "scanned")
    val pick = Ann.chooseConfig(sweep, minRecall = 0.85).collect()
    assert(pick.length == 1 && pick.head.getString(0) == "ivf_p2")
    // raising the bar moves the pick up the frontier
    assert(Ann.chooseConfig(sweep, 0.92).head().getString(0) == "ivf_p4")
    assert(Ann.chooseConfig(sweep, 0.99).head().getString(0) == "flat")
    // nothing qualifies -> empty, never a silent degrade
    assert(Ann.chooseConfig(sweep.filter($"config" === "lsh"), 0.9).isEmpty)
  }

  test("maxsim: hand-computed scores; full-shortlist rerank equals brute top-k") {
    import graft.operators.LateInteraction
    // d0 tokens: (1,0), (0,1); d1 tokens: (0.5,0.5), (0.8,0.1)
    val dt = Seq(
      (0L, Array(1f, 0f)), (0L, Array(0f, 1f)),
      (1L, Array(0.5f, 0.5f)), (1L, Array(0.8f, 0.1f))
    ).toDF("doc_id", "dvec")
    // q0 tokens: (1,0), (0,1)
    val qt = Seq(
      (0L, 0L, Array(1f, 0f)), (0L, 1L, Array(0f, 1f))
    ).toDF("qid", "qtok", "qvec")
    val top = LateInteraction.maxSimTopK(dt, "doc_id", "dvec",
        qt, "qid", "qtok", "qvec", k = 2)
      .orderBy("rn")
      .select($"doc_id", $"score", $"n_qtok").as[(Long, Double, Long)]
      .collect().toSeq
    // MaxSim(q0, d0) = max(1,0) + max(0,1) = 2
    // MaxSim(q0, d1) = max(0.5,0.8) + max(0.5,0.1) = 1.3 — per-token
    // maxes are float32, the sum is double over the float32 values
    assert(top == Seq((0L, 2.0, 2L), (1L, 0.8f.toDouble + 0.5f.toDouble, 2L)))
    // a complete shortlist re-rank IS the brute tier
    val all = Seq((0L, 0L), (0L, 1L)).toDF("qid", "doc_id")
    val rr = LateInteraction.maxSimRerank(all, "qid", "doc_id",
        dt, "dvec", qt, "qtok", "qvec", k = 2)
      .orderBy("rn").select($"doc_id", $"score").as[(Long, Double)]
      .collect().toSeq
    assert(rr == top.map(t => (t._1, t._2)))
    // mean pooling: ordered by position, float32
    val pooled = LateInteraction.meanPoolTokens(dt, "doc_id", "dvec")
      .orderBy("doc_id").select($"pooled_vec").as[Seq[Float]]
      .collect().toSeq
    assert(pooled == Seq(Seq(0.5f, 0.5f), Seq(0.65f, 0.3f)))
  }

  test("opq: rotation orthogonal, L2-preserving; recon error <= identity-PQ on correlated data") {
    import graft.operators.Opq
    // dims 1 and 2 perfectly correlated ACROSS the m=2 subspace split
    // {0,1}|{2,3} — the case plain PQ handles worst and OPQ exists for
    val df = (0 until 64).map { i =>
      val t = (i % 16).toFloat
      val u = (i / 16).toFloat
      (i.toLong, Array(u, t, t, -u))
    }.toDF("id", "vec")
    val a = Opq.trainRotation(df, "id", "vec", dim = 4, m = 2, k = 4,
      iters = 3, sweeps = 3)
    // orthogonality: A Aᵀ = I
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(l => a(i)(l).toDouble * a(j)(l).toDouble).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-4, s"AAᵀ[$i][$j] = $dot")
    }
    // the rotation preserves pairwise L2 (orthogonality, end to end
    // through the MatVec kernel)
    val rot = df.withColumn("vr", graft.functions.mat_vec($"vec", a))
    val pair = rot.orderBy("id").limit(2).collect()
    def l2(x: Seq[Float], y: Seq[Float]): Double =
      math.sqrt(x.zip(y).map { case (p, q) => (p - q).toDouble * (p - q) }.sum)
    val dOrig = l2(pair(0).getSeq[Float](1), pair(1).getSeq[Float](1))
    val dRot = l2(pair(0).getSeq[Float](2), pair(1).getSeq[Float](2))
    assert(math.abs(dOrig - dRot) < 1e-3)
    // the point of OPQ: strictly better (here) reconstruction at the
    // same (m, k) budget than the identity rotation
    val errId = Opq.reconError(df, "id", "vec", 4, 2, 4, 3, Opq.identityMat(4))
    val errOpq = Opq.reconError(df, "id", "vec", 4, 2, 4, 3, a)
    assert(errOpq <= errId + 1e-9, s"opq $errOpq vs identity $errId")
    assert(errOpq < 0.7 * errId,
      s"correlated fixture should improve materially: $errOpq vs $errId")
  }

  test("sq: round trip bounded by half a grid step; constant dims exact; saturation") {
    import graft.operators.Sq
    val df = (0 until 30).map { i =>
      (i.toLong, Array.tabulate(6)(j =>
        if (j == 5) 2.5f else ((i * 7 + j * 3) % 13).toFloat - 4f))
    }.toDF("id", "vec")
    val p = Sq.fit(df, "vec", dim = 6)
    // dim 5 is constant: scale 0, every code 0, decode returns the constant
    assert(p.scale(5) == 0f && p.vmin(5) == 2.5f)
    val rt = df
      .withColumn("dec", Sq.decodeCol(Sq.encodeCol($"vec", p), p))
      .select($"vec", $"dec").collect()
    rt.foreach { r =>
      val v = r.getSeq[Float](0); val d = r.getSeq[Float](1)
      (0 until 6).foreach { j =>
        val bound = p.scale(j) / 2f + 1e-5f
        assert(math.abs(v(j) - d(j)) <= bound,
          s"dim $j: ${v(j)} decoded to ${d(j)}, half-step $bound")
      }
    }
    // out-of-range values saturate at the grid edge (FAISS SQ contract)
    val out = Seq((0L, Array(100f, -100f, 0f, 0f, 0f, 9f))).toDF("id", "vec")
      .select(Sq.encodeCol($"vec", p).as("c")).head().getSeq[Int](0)
    assert(out(0) == 255 && out(1) == 0)
    // persisted params round-trip exactly
    val dir = java.nio.file.Files.createTempDirectory("graft-sq").toString
    Sq.writeParams(spark, dir, p)
    val p2 = Sq.readParams(spark, dir)
    assert(p2.vmin.toSeq == p.vmin.toSeq && p2.scale.toSeq == p.scale.toSeq)
  }

  test("sq: quantile-clipped grid resists outliers, inlier error shrinks") {
    import graft.operators.Sq
    // dim 0 has one wild outlier (1000 vs inliers in [0, 29]) that
    // stretches the exact-range grid's step ~34x
    val df = (0 until 100).map { i =>
      (i.toLong, Array(if (i == 0) 1000f else (i % 30).toFloat, i % 7f))
    }.toDF("id", "vec")
    val exact = Sq.fit(df, "vec", dim = 2)
    val clipped = Sq.fit(df, "vec", dim = 2, clipQuantile = 0.02)
    assert(clipped.scale(0) < exact.scale(0) / 20,
      s"clipped step ${clipped.scale(0)} vs exact ${exact.scale(0)}")
    intercept[IllegalArgumentException](Sq.fit(df, "vec", 2, clipQuantile = 0.5))
    // inlier reconstruction error shrinks by the same factor; the
    // outlier saturates at the clipped edge instead of erroring
    val errs = df
      .withColumn("dE", Sq.decodeCol(Sq.encodeCol($"vec", exact), exact))
      .withColumn("dC", Sq.decodeCol(Sq.encodeCol($"vec", clipped), clipped))
      .select($"id", $"vec", $"dE", $"dC").collect()
    errs.filter(_.getLong(0) != 0L).foreach { r =>
      val v = r.getSeq[Float](1); val e = r.getSeq[Float](2); val c = r.getSeq[Float](3)
      assert(math.abs(v(0) - c(0)) <= clipped.scale(0) / 2 + 1e-5f)
      assert(math.abs(v(0) - c(0)) <= math.abs(v(0) - e(0)) + 1e-5f,
        s"inlier ${v(0)}: clipped ${c(0)} should beat exact ${e(0)}")
    }
    val outlier = errs.find(_.getLong(0) == 0L).get
    val code0 = df.filter($"id" === 0L)
      .select(Sq.encodeCol($"vec", clipped).as("c")).head().getSeq[Int](0)
    assert(code0(0) == 255, "outlier must saturate at the clipped grid edge")
    assert(outlier.getSeq[Float](3)(0) <= 30f, "decode stays in the inlier range")
  }

  test("matryoshka rescore: degenerate forms are exact, partial shortlist returns true distances") {
    val n = emb.count().toInt
    def exact(k: Int) = SimilarityJoin
      .knnL2(emb, "vec_id", "embedding", queries, "qid", "qvec", k)
      .select($"qid", $"vec_id", $"rn").orderBy("qid", "rn")
      .as[(Long, Long, Int)].collect().toSeq
    // prefixDim = dim: stage 1 is already exact, any shortlist >= k works
    val degen = Ann.matryoshkaRescoreTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", prefixDim = 64, shortlist = 10, k = 5)
      .select($"qid", $"vec_id", $"rn").orderBy("qid", "rn")
      .as[(Long, Long, Int)].collect().toSeq
    assert(degen == exact(5))
    // shortlist = corpus: the full-dim rescore sees everything, so the
    // prefix stage only reorders candidates the rescore re-ranks exactly
    val fullShort = Ann.matryoshkaRescoreTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", prefixDim = 16, shortlist = n, k = 5)
      .select($"qid", $"vec_id", $"rn").orderBy("qid", "rn")
      .as[(Long, Long, Int)].collect().toSeq
    assert(fullShort == exact(5))
    // partial shortlist: distances are TRUE full-dim distances (each
    // returned row matches the exact scan's distance for that id)
    val exD = SimilarityJoin
      .knnL2(emb, "vec_id", "embedding", queries, "qid", "qvec", n)
      .select($"qid", $"vec_id", $"distance")
      .as[(Long, Long, Float)].collect()
      .map { case (q, i, d) => (q, i) -> d }.toMap
    Ann.matryoshkaRescoreTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", prefixDim = 8, shortlist = 20, k = 5)
      .select($"qid", $"vec_id", $"distance")
      .as[(Long, Long, Float)].collect()
      .foreach { case (q, i, d) =>
        assert(math.abs(d - exD((q, i))) < 1e-5f, s"($q,$i): $d vs ${exD((q, i))}")
      }
    // contracts
    intercept[IllegalArgumentException](Ann.matryoshkaRescoreTopK(
      emb, "vec_id", "embedding", queries, "qid", "qvec", 0, 10, 5))
    intercept[IllegalArgumentException](Ann.matryoshkaRescoreTopK(
      emb, "vec_id", "embedding", queries, "qid", "qvec", 16, 3, 5))
  }

  test("bq: mean thresholds, bit packing, hamming = disagreeing half-spaces, round-trip") {
    import graft.operators.{Bq, VectorOps}
    // dim 40 spans two packed words (32-bit layout)
    val dim = 40
    val df = (0 until 10).map { i =>
      (i.toLong, Array.tabulate(dim)(j => ((i + j) % 5).toFloat))
    }.toDF("id", "vec")
    val p = Bq.fit(df, "vec", dim)
    // thresholds are the per-dim means
    val rows = df.select($"vec").collect().map(_.getSeq[Float](0))
    (0 until dim).foreach { j =>
      val m = rows.map(_(j)).sum / rows.length
      assert(math.abs(p.thr(j) - m) < 1e-5f, s"dim $j: ${p.thr(j)} vs $m")
    }
    // packed bits match the sign test, across the word boundary
    val enc = df.orderBy("id")
      .select($"id", Bq.encodeCol($"vec", p).as("c")).collect()
    assert(enc.head.getSeq[Long](1).length == 2) // ceil(40/32)
    enc.zip(rows).foreach { case (r, v) =>
      val words = r.getSeq[Long](1)
      (0 until dim).foreach { j =>
        val bit = (words(j / 32) >> (j % 32)) & 1L
        val expect = if (v(j) > p.thr(j)) 1L else 0L
        assert(bit == expect, s"id ${r.getLong(0)} dim $j: $bit vs $expect")
      }
    }
    // hamming over codes counts exactly the disagreeing half-spaces
    val two = df.filter($"id".isin(0L, 7L)).orderBy("id")
      .select(Bq.encodeCol($"vec", p).as("c")).collect().map(_.getSeq[Long](0))
    val got = df.sparkSession.range(1)
      .select(VectorOps.hammingDistance(
        typedLit(two(0)), typedLit(two(1))).as("h"))
      .head().getLong(0)
    val v0 = rows(0); val v7 = rows(7)
    val expect = (0 until dim).count(j => (v0(j) > p.thr(j)) != (v7(j) > p.thr(j)))
    assert(got == expect.toLong)
    // persisted params round-trip exactly
    val dir = java.nio.file.Files.createTempDirectory("graft-bq").toString
    Bq.writeParams(spark, dir, p)
    assert(Bq.readParams(spark, dir).thr.toSeq == p.thr.toSeq)
  }
}
