package graft

import org.apache.spark.sql.functions.{col, when}

/** Plan-shape regression tests: the scale properties SCALE.md claims
  * (pushdown, pruning, broadcast, partial top-k, codegen) asserted
  * against the actual physical plans, so a refactor that silently
  * de-optimizes a query fails CI.
  */
class PlanSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def planString(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("q2_filter: predicates pushed to parquet, schema pruned") {
    val s = planString("q2_filter")
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected shipdate pushdown in:\n$s")
    assert(s.contains("(l_quantity#") && s.contains("> 45.0"), "quantity filter present")
    // 4 of 11 columns read (3 projected + the filtered shipdate)
    assert(s.contains(
      "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate"),
      "expected pruned read schema")
  }

  test("q5_topk plans as TakeOrderedAndProject (no global sort)") {
    val s = planString("q5_topk")
    assert(s.contains("TakeOrderedAndProject"), s)
  }

  test("q3_join_agg uses a broadcast hash join") {
    val s = planString("q3_join_agg")
    assert(s.contains("BroadcastHashJoin"), s)
    assert(!s.contains("SortMergeJoin"), "dim join must not sort-merge")
  }

  test("vs_knn: query side broadcast, index side streamed") {
    val s = planString("vs_knn")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"), s)
    // the distance expression is codegen'd, not a fallback row eval
    assert(s.contains("l2_distance"), s)
    assert(!s.toLowerCase.contains("codegenfallback"), "kernel fell out of codegen")
    // per-partition top-k prune BEFORE the shuffle (bounded shuffle volume)
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"),
      s"expected partial window group limit:\n$s")
  }

  test("vs_select_ids / vs_delete_antijoin: broadcast semi/anti joins") {
    assert(planString("vs_select_ids").contains("LeftSemi, BuildRight"))
    assert(planString("vs_delete_antijoin").contains("LeftAnti, BuildRight"))
  }

  test("vs_knn_agg: partial aggregation before the shuffle") {
    val df = SparkEntry.queries("vs_knn_agg")(spark, sf)
    val s = df.queryExecution.executedPlan.toString
    // typed-aggregator top-k must plan as two-phase hash/object agg
    // (partial map-side, final after exchange)
    val aggCount = "(?i)aggregate".r.findAllIn(s).length
    assert(aggCount >= 2, s"expected two-phase aggregation:\n$s")
    assert(s.contains("Exchange hashpartitioning(qid"), s)
  }

  test("dedup exact groups: map-side partial aggregation on content hash") {
    val df = graft.operators.Dedup.exactGroups(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val s = df.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(s).length >= 2, s)
  }

  test("ivf assign: pure projection — no Exchange, no join, no window") {
    val docs = spark.read.parquet(s"$sf/embeddings.parquet")
    val centroids = graft.operators.Ann.kmeans(docs, "vec_id", "embedding", 4, iters = 1)
    val assigned = graft.operators.Ann.assign(docs, "vec_id", "embedding", centroids)
    val s = assigned.queryExecution.executedPlan.toString
    assert(!s.contains("Exchange"), s"assign must not shuffle:\n$s")
    assert(!s.contains("Join"), s"assign must not join:\n$s")
    assert(!s.contains("Window"), s"assign must not window:\n$s")
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "20KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one heavy-hitter key (~80% of rows) against a uniform dim side
      val left = spark.range(100000)
        .select(when($"id" < 80000, 0L).otherwise($"id" % 128).as("k"), $"id".as("v"))
      val right = spark.range(128).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
      // execute THIS QueryExecution (count() would plan a new one) so
      // the adaptive plan finalizes
      joined.queryExecution.toRdd.count()
      val s = joined.queryExecution.executedPlan.toString
      assert(s.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$s")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("minhash LSH candidates: equi-join on band key, no cross join") {
    val df = graft.operators.Dedup.minHashLshPairs(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"LSH candidate generation must not be a cross join:\n$s")
  }

  test("pk_spans: bucket-local windows, broadcast bases, no partitionless doc window") {
    val df = graft.operators.Packing.tokenSpans(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
      seqLen = 512, bucketSize = 64)
    val s = df.queryExecution.executedPlan.toString
    // the doc-side cumsum must be partitioned by bucket...
    assert(s.contains("hashpartitioning(_bkt"),
      s"expected bucket-partitioned window exchange:\n$s")
    // ...and the bucket bases must come back as a broadcast, not a shuffle join
    assert(s.contains("BroadcastExchange"), s"expected broadcast base join:\n$s")
  }

  test("semdedup candidates: within-cluster equi-join, no cross join") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = graft.operators.SemDedup.semanticNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.4, nClusters = 4, iters = 1)
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"semantic pair generation must join on centroid_id:\n$s")
  }

  test("weighted sampling and chunking are pure scan-side operators (no Exchange)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val w = graft.operators.Sampling.weightedHashSample(
      docs, "doc_id", graft.operators.TextAnalysis.qualityScore(
        org.apache.spark.sql.functions.col("text")))
    assert(!w.queryExecution.executedPlan.toString.contains("Exchange"),
      "weighted sampling must stay a scan predicate")
    val c = graft.operators.Packing.chunkSpans(docs, "doc_id", "text", 64, 16)
    assert(!c.queryExecution.executedPlan.toString.contains("Exchange"),
      "chunking must stay a generator projection")
  }

  test("tokenBudgetSample: source-partitioned running sum, no global window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.operators.Sampling.tokenBudgetSample(
      docs, "doc_id", "source", "text", 1000L, "tb")
    val s = out.queryExecution.executedPlan.toString
    assert(s.contains("hashpartitioning(source"),
      s"expected source-partitioned window exchange:\n$s")
    assert(!s.contains("SinglePartition"),
      s"budget cumsum must never collapse to one partition:\n$s")
  }

  test("bm25 topK plans as TakeOrderedAndProject over the checkpointed tf frame") {
    val df = graft.operators.Bm25.topK(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
      Seq("spark", "window"), k = 10)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(!s.contains("Exchange"),
      s"scoring over the checkpointed tf frame must not shuffle:\n$s")
  }

  test("perKeyCap: per-key top-k bounded BEFORE the exchange (WindowGroupLimit)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s = graft.operators.Sampling.perKeyCap(docs, "source", "doc_id", 5, "c")
      .queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit") && s.contains("Partial"),
      s"expected partial window group limit:\n$s")
  }

  test("tfidf topTerms: per-doc top-k bounded as WindowGroupLimit, no cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = graft.operators.Tfidf.topTerms(docs, "doc_id", "text", 3)
    val s = q.queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit"), s"expected window group limit:\n$s")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"),
      s"idf join must stay an equi-join:\n$s")
    // tf feeds both the df branch and the join WITHOUT a persisted
    // frame (pure two-pass): repeated in-session runs must leave NO
    // storage behind — the old eager localCheckpoint leaked its blocks
    // unless every caller remembered to release them
    val before = spark.sparkContext.getPersistentRDDs.keySet
    q.count()
    q.count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"tfidf run left persisted RDDs behind: $leaked")
  }

  test("outlier z-scores and winsorize: stats broadcast back, fact table never windowed") {
    val ev = graft.sources.Sources.nanosTimestampParquet(
      spark, s"$sf/events.parquet", "ts")
    for (df <- Seq(
        graft.operators.Outliers.zScores(ev, Seq("event_type"), "value", 3.0),
        graft.operators.Outliers.winsorize(ev, Seq("event_type"), "value", 0.01, 0.99))) {
      val s = df.queryExecution.executedPlan.toString
      assert(s.contains("BroadcastHashJoin"), s"stats join must broadcast:\n$s")
      assert(!s.contains("Window"), s"no window over the fact table:\n$s")
    }
  }

  test("kAnonymitySuppress: equi-join on quasi cols, no broadcast assumption, no BNLJ") {
    val ev = graft.sources.Sources.nanosTimestampParquet(
      spark, s"$sf/events.parquet", "ts")
    val s = graft.operators.Pii.kAnonymitySuppress(
        ev, Seq("user_id", "event_type"), 5)
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"), s)
  }

  test("hourlyFfill: bucket top-1 bounded before exchange; ffill windows the grid only") {
    val ev = graft.sources.Sources.nanosTimestampParquet(
      spark, s"$sf/events.parquet", "ts")
    val s = graft.operators.Resample.hourlyFfill(ev, "user_id", "ts", "value")
      .queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit"), s"per-bucket last must be top-1 bounded:\n$s")
    assert(s.contains("Generate"), s"grid must come from an explode, not a join:\n$s")
  }

  test("duplicatedSpans: equi-joins only — no cartesian, no sort-merge on strings") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s = graft.operators.Dedup.duplicatedSpans(docs, "doc_id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"),
      s"span counting must stay an equi-join:\n$s")
  }

  test("stripBoilerplate: broadcast flag join, hash aggs only, no window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s = graft.operators.TextAnalysis
      .stripBoilerplate(docs, "doc_id", "text", minDf = 5)
      .queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"),
      s"frequent-line set must ride a broadcast:\n$s")
    assert(!s.contains("Window"), s"no window in the rebuild:\n$s")
    assert(!s.contains("CartesianProduct"), "no cartesian")
  }

  test("dedupParagraphs: two hash aggregations, no window, no join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s = graft.operators.Dedup.dedupParagraphs(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!s.contains("Window"), s"no window:\n$s")
    assert(!s.contains("Join"), s"no join:\n$s")
  }

  test("shuffleOrder: shard-partitioned ranking, never SinglePartition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val s = graft.operators.Sampling.shuffleOrder(docs, "doc_id", "s", 16)
      .queryExecution.executedPlan.toString
    assert(s.contains("hashpartitioning(shard"),
      s"window must partition by shard:\n$s")
    assert(!s.contains("SinglePartition"),
      s"a global row_number would serialize the corpus:\n$s")
  }

  test("hashSplitLabeled and quality-model scoring are pure scan projections") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val split = graft.operators.Sampling.hashSplitLabeled(
      docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
    assert(!split.queryExecution.executedPlan.toString.contains("Exchange"),
      "labeled split must not shuffle")
    val m = graft.operators.QualityModel.Model(4096, 0.0, new Array[Double](4096))
    val scored = graft.operators.QualityModel.score(docs, "text", m)
    assert(!scored.queryExecution.executedPlan.toString.contains("Exchange"),
      "model scoring must not shuffle")
  }

  test("distinctiveTerms: one corpus-sized shuffle; window over counts only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val s = graft.operators.TextAnalysis
      .distinctiveTerms(docs, "source", "text", k = 3)
      .queryExecution.executedPlan.toString
    // group totals ride a broadcast; the 1-row corpus frame is a
    // broadcast nested loop by design; never a real cartesian, and the
    // top-k window partitions by group, not the whole frame
    assert(s.contains("BroadcastExchange"),
      s"group totals / corpus row should broadcast:\n$s")
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
    assert(s.contains("windowspecdefinition(grp"),
      s"top-k window must partition by grp:\n$s")
  }

  test("intrinsicDimension: ANN-fed path has no cross join; sampled path prunes queries") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (indexed, cents) = graft.operators.Ann.ivfBuild(
      emb, "vec_id", "embedding", nCentroids = 4, iters = 1)
    val qs = emb.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val nnRaw = graft.operators.Ann.ivfSearchL2(
        indexed, "vec_id", "embedding", cents, qs, "qid", "qvec",
        k = 3, nProbe = 2)
      .filter(col("vec_id") =!= col("qid"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("distance"), col("vec_id"))
    val wide = nnRaw.withColumn("r", row_number().over(w)).filter(col("r") <= 2)
      .groupBy("qid").agg(
        min(when(col("r") === 1, col("distance"))).as("r1"),
        min(when(col("r") === 2, col("distance"))).as("r2"))
    val out = graft.operators.VectorOps
      .intrinsicDimensionFromNN(wide, "qid", "r1", "r2")
    val s = out.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"),
      s"ANN-fed TwoNN must not cross-join:\n$s")
    // the only nested-loop join allowed is the bounded query×centroids
    // probe ranking (nCentroids rows broadcast); the index side must
    // join on centroid_id via a hash join
    assert(s.count(_ == '\n') > 0 &&
      "BroadcastNestedLoopJoin".r.findAllIn(s).size <= 1,
      s"only the probe ranking may nested-loop:\n$s")
    assert(s.contains("BroadcastHashJoin [centroid_id"),
      s"index side must equi-join on centroid_id:\n$s")
    // sampled exact path: the query side is filtered BEFORE the join
    // (the membership hash is a pure projection of the query frame)
    val sampled = graft.operators.VectorOps.intrinsicDimension(
      emb, "vec_id", "embedding", sample = Some(0.25))
    val s2 = sampled.queryExecution.executedPlan.toString
    assert(s2.contains("md5"), s"expected hash-sample filter in:\n$s2")
    // both paths agree with the exact estimator on identical inputs:
    // sample = None ≡ the pre-sample operator (vq_twonn gate covers it)
  }

  test("spearman: rank windows bucket-partitioned, bases broadcast, no data window") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val s = graft.operators.Outliers
      .spearman(li, "l_quantity", "l_extendedprice")
      .queryExecution.executedPlan.toString
    // both midrank cumsums run partitioned by bucket over DISTINCT
    // values; the bucket bases come back as broadcasts
    assert(s.contains("hashpartitioning(_bkt"),
      s"expected bucket-partitioned rank window:\n$s")
    assert(s.contains("BroadcastExchange"),
      s"expected broadcast bucket bases:\n$s")
    // no window may run over the raw (un-aggregated) rows: every
    // windowspecdefinition in this plan partitions by _bkt or orders
    // the tiny bucket frame
    assert(!s.contains("windowspecdefinition(_x") && !s.contains("windowspecdefinition(_y"),
      s"no window over raw data columns:\n$s")
  }

  test("ksTest: dual CDFs share one bucket-partitioned prefix-sum frame") {
    val ev = graft.sources.Sources
      .nanosTimestampParquet(spark, s"$sf/events.parquet", "ts")
    val s = graft.operators.Outliers.ksTest(
        ev.filter(col("event_type") === "click"), "value",
        ev.filter(col("event_type") === "purchase"), "value")
      .queryExecution.executedPlan.toString
    assert(s.contains("hashpartitioning(_bkt"),
      s"expected bucket-partitioned cumulative counts:\n$s")
    assert(s.contains("BroadcastExchange"),
      s"expected broadcast bucket bases:\n$s")
  }

  test("valueCounts equi-depth path: skew-bounded window partitions, exact _below") {
    import spark.implicits._
    // Heavy-tailed column: exp(i/1500) spans ~9 decades, so uniform-width
    // bucketing would put ~97% of the 20k distinct values in bucket 0 and
    // sort them in ONE window partition — the 100 TB failure mode the
    // sketch-boundary path exists to prevent.
    val n = 20000
    val d = (1 to n).map(i => math.exp(i / 1500.0)).toDF("v")
    val uniform = graft.operators.Outliers.valueCounts(d, "v", 64)
      .orderBy("v").collect().toSeq
    val target = 500L
    val eq = graft.operators.Outliers.valueCounts(d, "v", 64,
      targetPerBucket = target)
    // path choice must never change results — both are exact
    assert(eq.orderBy("v").collect().toSeq == uniform)
    // the equi-depth plan probes buckets via the codegen binary search
    // (visible in the optimized plan; the physical plan folds it into a
    // HashAggregate result projection whose toString elides expressions)
    // and still runs its cumsum bucket-partitioned with broadcast bases
    assert(eq.queryExecution.optimizedPlan.toString.contains("bucket_index"),
      "expected bucket_index probe in optimized plan")
    val s = eq.queryExecution.executedPlan.toString
    assert(s.contains("hashpartitioning(_bkt"),
      s"expected bucket-partitioned cumsum:\n$s")
    assert(s.contains("BroadcastExchange"), s"expected broadcast bases:\n$s")
    // replay the boundary derivation (same sketch params valueCounts
    // uses: nB = ceil(20000/500) = 40, acc = 10000) and assert no bucket
    // holds more than target + sketch slack distinct values
    val nB = math.ceil(n.toDouble / target).toInt
    val ps = (1 until nB).map(_.toDouble / nB).toArray
    val bounds = d.distinct()
      .agg(org.apache.spark.sql.functions.percentile_approx(
        col("v"), org.apache.spark.sql.functions.lit(ps),
        org.apache.spark.sql.functions.lit(10000)))
      .head().getSeq[Double](0).toArray
    val sizes = (1 to n).map(i => math.exp(i / 1500.0))
      .groupBy(v => graft.expressions.Kernels.bucketIndex(v, bounds))
      .map(_._2.size)
    assert(sizes.sum == n)
    assert(sizes.max <= target + 50,
      s"window partition bound violated: max bucket ${sizes.max}")
  }

  test("blockedEditPairs: block-key equi-join, no cartesian, size gate broadcast") {
    val part = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("id"),
        org.apache.spark.sql.functions.lower(col("p_name")).as("s"))
    val p = graft.operators.RecordLinkage.blockedEditPairs(
      part, "id", "s",
      org.apache.spark.sql.functions.substring(col("s"), 1, 2), maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$p")
    // the block-size gate joins back as a broadcast, never a shuffle
    // of the data side per size lookup
    assert(p.contains("BroadcastHashJoin"), s"size gate should broadcast:\n$p")
  }

  test("linkPrediction: wedge and anti joins are equi-joins, no cartesian") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val e = li.toDF("ok", "src").join(li.toDF("ok", "dst"), "ok")
      .filter(col("src") =!= col("dst")).select("src", "dst")
    val p = graft.operators.Graphs.linkPrediction(e, "src", "dst",
      minCommon = 2).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$p")
  }

  test("autocorrelation: lag equi-joins only — no window over the data") {
    import spark.implicits._
    val d = (1 to 40).map(t => ("k", t.toLong, t.toDouble)).toDF("k", "t", "x")
    val p = graft.operators.Resample.autocorrelation(d, "k", "t", "x",
      maxLag = 3).queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"ACF must not window the series:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("validate report: one scan — no join, no repeated aggregation") {
    val p = graft.operators.Validate.report(
      spark.read.parquet(s"$sf/lineitem.parquet"), Seq(
        "a" -> (col("l_quantity") > 0),
        "b" -> col("l_shipdate").isNotNull,
        "c" -> (col("l_discount") <= 0.1)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"rules must share one scan:\n$p")
    assert(p.split("Scan parquet").length - 1 == 1,
      s"exactly one scan expected:\n$p")
  }

  test("triangleCount: equi-joins only — no cartesian, no nested loop") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val e = li.toDF("ok", "src").join(li.toDF("ok", "dst"), "ok")
      .filter(col("src") =!= col("dst")).select("src", "dst")
    val s = graft.operators.Graphs.triangleCount(e, "src", "dst")
      .queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct"), s"no cartesian:\n$s")
    assert(!s.contains("BroadcastNestedLoopJoin"), s"no BNLJ:\n$s")
  }
  test("saltedJoin: identical to plain join; shuffle keys carry the salt") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, lit, sum, when}
    import graft.operators.Skew
    val big = spark.range(20000)
      .select(when($"id" % 4 === 0, 0L).otherwise($"id" % 37).as("k"),
        $"id".as("v"))
    val dim = spark.range(37).select($"id".as("k"), ($"id" * 10).as("w"))
    val salted = Skew.saltedJoin(big, dim, Seq("k"), saltFactor = 8,
        bigSaltExpr = $"v")
      .groupBy("k").agg(count(lit(1)).as("n"), sum($"w").as("sw"))
    val plain = big.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum($"w").as("sw"))
    assert(salted.orderBy("k").collect().toSeq ==
      plain.orderBy("k").collect().toSeq)
    // with broadcast off, the join exchange must hash on (k, _salt) —
    // the hot key spreads across saltFactor reducers
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Skew.saltedJoin(big, dim, Seq("k"), 8, $"v")
        .queryExecution.executedPlan.toString
      assert(plan.contains("hashpartitioning(k"), s"join must shuffle on keys:\n$plan")
      assert(plan.contains("_salt"), s"shuffle keys must carry the salt:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
