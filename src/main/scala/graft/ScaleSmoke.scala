package graft

import org.apache.spark.sql.functions._

/** Scale-stress smoke for the 100 TB-shaped paths: replicates the sf0.1
  * fixtures ~20-50× into /tmp (100k near-duplicate documents, 100k
  * embeddings), then times the operators whose execution shape is the
  * scale story — LSH candidate generation, star-contraction connected
  * components over ~1M edges, brute-force and IVF k-NN over 100k
  * vectors. Numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmoke" }}}
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = "/tmp/graft_scale_smoke"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-smoke")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SMOKE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- synthesize: 20x documents (near-dup replicas, one differing
    // token per replica so exact dedup does NOT collapse them but
    // near-dup at jaccard 0.5 must), 50x embeddings -------------------
    val docReps = 20
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    timed("synthesize documents x20") {
      docs.crossJoin(spark.range(docReps).select(col("id").as("rep")))
        .select(
          (col("doc_id") * docReps + col("rep")).as("doc_id"),
          concat(col("text"), lit(" replicatoken"), col("rep")).as("text"))
        .write.mode("overwrite").parquet(s"$base/documents")
    }
    val embReps = 50
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    timed("synthesize embeddings x50") {
      emb.crossJoin(spark.range(embReps).select(col("id").as("rep")))
        .select(
          (col("vec_id") * embReps + col("rep")).as("vec_id"),
          transform(col("embedding"),
            x => x + col("rep").cast("float") * lit(1e-4f)).as("embedding"))
        .write.mode("overwrite").parquet(s"$base/embeddings")
    }

    val bigDocs = spark.read.parquet(s"$base/documents")
    val bigEmb = spark.read.parquet(s"$base/embeddings")
    println(s"SMOKE corpus: ${bigDocs.count()} docs, ${bigEmb.count()} vectors")

    // ---- dedup scale paths ------------------------------------------
    timed("exactGroups (md5 groupBy)") {
      graft.operators.Dedup.exactGroups(bigDocs, "doc_id", "text").count()
    }
    // 4 bands x 8 rows: S-curve threshold ~(1/4)^(1/8) = 0.84, tuned to
    // the ~0.98-Jaccard replica groups. Even so, this templated corpus
    // has a brutal bucket histogram (measured: 4 buckets of 16-32k rows
    // = ~2B all-pairs, plus ~50 of 1-4k = ~220M) — without the
    // giant-bucket hub-star backstop ONE task ground quadratically for
    // 15+ min. The 512 threshold bounds candidates at ~25M while the
    // exact verify keeps precision 1.0.
    // minHashLshPairs returns an eager localCheckpoint — already
    // materialized, no extra persist needed
    val pairs = timed("minHashLshPairs candidates") {
      val p = graft.operators.Dedup.minHashLshPairs(
        bigDocs, "doc_id", "text", numHashes = 32, bands = 4,
        verifyThreshold = 0.8, giantBucketThreshold = 512)
      println(s"SMOKE   lsh pairs: ${p.count()}")
      p
    }
    timed("connectedComponents (stars)") {
      val (labels, rounds) = graft.operators.Dedup.connectedComponentsWithRounds(
        bigDocs, "doc_id", pairs)
      val nClusters = labels.select(countDistinct(col("comp"))).head().getLong(0)
      println(s"SMOKE   rounds=$rounds clusters=$nClusters")
    }

    // ---- similarity scale paths -------------------------------------
    val qs = bigEmb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    timed("brute-force knn (10q, k=10)") {
      graft.operators.SimilarityJoin.knnL2(
        bigEmb, "vec_id", "embedding", qs, "qid", "qvec", k = 10).count()
    }
    val (indexed, cents) = timed("ivfBuild (32 cells)") {
      graft.operators.Ann.ivfBuild(
        bigEmb, "vec_id", "embedding", nCentroids = 32, iters = 2)
    }
    timed("ivfSearchL2 (nProbe=4)") {
      graft.operators.Ann.ivfSearchL2(indexed, "vec_id", "embedding", cents,
        qs, "qid", "qvec", k = 10, nProbe = 4).count()
    }

    // ---- quantization at volume -------------------------------------
    timed("int8 quantize 100k vecs") {
      graft.operators.VectorOps.withInt8Quantized(bigEmb, "embedding", "codes", "scale")
        .agg(sum(element_at(col("codes"), 1).cast("long"))).head()
    }
    timed("pq fit(20k)+encode+adc 100k") {
      // codebook from a 20k sample (standard practice), every vector
      // encoded, one ADC top-k over all 100k codes
      val cb = graft.operators.Pq.fit(
        bigEmb.filter(col("vec_id") < 20000), "vec_id", "embedding",
        dim = 64, m = 8, k = 16, iters = 2)
      val coded = graft.operators.Pq.encode(bigEmb, "embedding", "pq_codes", cb)
      val q = bigEmb.orderBy("vec_id").limit(1)
        .select("embedding").head().getSeq[Float](0).toArray
      graft.operators.Pq.adcTopK(coded, "vec_id", "pq_codes", cb,
        Seq((0L, q)), k = 10).count()
    }

    // ---- semantic dedup: within-cluster pairs only (vs 5G all-pairs) --
    timed("semanticNearDupPairs (64 cl)") {
      val p = graft.operators.SemDedup.semanticNearDupPairs(
        bigEmb, "vec_id", "embedding", threshold = 0.95, nClusters = 64, iters = 2)
      println(s"SMOKE   semantic pairs: ${p.count()}")
    }

    // ---- text pipeline projections + packing prefix sum at 100k docs --
    timed("bm25 topK over 100k docs") {
      graft.operators.Bm25.topK(bigDocs, "doc_id", "text",
        Seq("spark", "window", "merge", "vector"), k = 20).count()
    }
    timed("pii redact 100k docs") {
      bigDocs.agg(sum(length(graft.operators.Pii.redact(col("text"))))).head()
    }
    timed("gopher rules 100k docs") {
      bigDocs.agg(sum(graft.operators.TextAnalysis.gopherPass(col("text"))
        .cast("long"))).head()
    }
    timed("tokenSpans (bucketed cumsum)") {
      graft.operators.Packing.tokenSpans(bigDocs, "doc_id", "text", seqLen = 2048)
        .agg(max(col("last_seq"))).head()
    }
    timed("mixtureSample 100k docs") {
      // synthesize a 4-way class column from the id; rates from one agg
      val classed = bigDocs.withColumn("cls",
        concat(lit("c"), (col("doc_id") % 4).cast("string")))
      graft.operators.Mixture.mixtureSample(classed, "doc_id", "cls",
        Map("c0" -> 0.4, "c1" -> 0.3, "c2" -> 0.2, "c3" -> 0.1), salt = "smoke")
        .count()
    }
    timed("weightedHashSample 100k docs") {
      graft.operators.Sampling.weightedHashSample(bigDocs, "doc_id",
        graft.operators.TextAnalysis.qualityScore(col("text")), salt = "smoke").count()
    }
    timed("tokenBudgetSample 100k (20 srcs)") {
      // 20 synthetic sources; source-partitioned running sum only
      val sourced = bigDocs.withColumn("source",
        concat(lit("s"), (col("doc_id") % 20).cast("string")))
      graft.operators.Sampling.tokenBudgetSample(
        sourced, "doc_id", "source", "text", budgetTokens = 100000L, salt = "smoke")
        .count()
    }
    timed("curriculumBatches 100k docs") {
      val scored = bigDocs.withColumn("score", length(col("text")).cast("long"))
      graft.operators.Packing.curriculumBatches(
        scored, "doc_id", "score", thresholds = Seq(400L, 250L), batchSize = 512)
        .groupBy("tier").agg(max(col("batch_id"))).count()
    }
    timed("keepBestNormalized 100k docs") {
      graft.operators.Dedup.keepBestNormalized(
        bigDocs.withColumn("score", length(col("text")).cast("long")),
        "doc_id", "text", "score").count()
    }
    val lm = timed("fitUnigram (vocab 1k)") {
      graft.operators.LangModel.fitUnigram(bigDocs, "text", vocabSize = 1000)
    }
    timed("perplexity score 100k docs") {
      graft.operators.LangModel.perplexity(bigDocs, "doc_id", "text", lm)
        .agg(avg(col("perplexity"))).head()
    }
    timed("invertedIndex 100k docs") {
      graft.operators.TextAnalysis.invertedIndex(bigDocs, "doc_id", "text")
        .agg(sum(col("df"))).head()
    }
    timed("invertedIndex capped (1024)") {
      // bounded agg buffers: the widest posting row must honor the cap
      // even though stop-like tokens contain O(corpus) docs
      val r = graft.operators.TextAnalysis
        .invertedIndex(bigDocs, "doc_id", "text", maxPostings = 1024)
        .agg(max(size(col("postings"))).as("widest"), sum(col("df")).as("df"))
        .head()
      println(s"SMOKE   widest postings row: ${r.getInt(0)} (cap 1024)")
      require(r.getInt(0) <= 1024)
    }
    timed("invertedPostings relation") {
      graft.operators.TextAnalysis.invertedPostings(bigDocs, "doc_id", "text").count()
    }
    timed("tfidf topTerms(3) 100k docs") {
      graft.operators.Tfidf.topTerms(bigDocs, "doc_id", "text", 3).count()
    }
    val blm = timed("fitBigram (vocab 1k, 4k pairs)") {
      graft.operators.LangModel.fitBigram(bigDocs, "text",
        vocabSize = 1000, maxPairs = 4000)
    }
    timed("bigram ppl join-score 100k") {
      // join form: the literal-map projection is O(vocab+pairs) PER
      // TOKEN at this model size (41 s here); broadcast hash joins
      // score the same model at probe cost
      graft.operators.LangModel.bigramPerplexityJoin(bigDocs, "doc_id", "text", blm)
        .agg(sum(col("perplexity"))).head()
    }
    timed("entropy+clean+urlnorm 100k") {
      // the scan-side text battery in one pass: char entropy fold plus
      // the cleanup/canonicalization projections
      val url = concat(lit("HTTPS://WWW.Site"), (col("doc_id") % 7).cast("string"),
        lit(".COM:8080/Path/"), col("doc_id").cast("string"), lit("?utm_source=x&id=1#f"))
      graft.operators.TextAnalysis.charEntropy(
          bigDocs.withColumn("text",
            concat(lit("<p>"), col("text"), lit("</p> &amp; "),
              graft.operators.Urls.normalize(url))),
          "doc_id", "text")
        .agg(sum(col("entropy"))).head()
    }
    timed("stripBoilerplate 100k docs") {
      // each replica group shares its nav/footer lines (df >= 20), body
      // lines stay unique -> the frequent slice is small and broadcast
      val crawl = bigDocs.select(col("doc_id"),
        concat_ws("\n", lit("Home | About | Contact"), col("text"),
          concat(lit("ref-"), col("doc_id").cast("string"))).as("text"))
      val out = graft.operators.TextAnalysis.stripBoilerplate(
        crawl, "doc_id", "text", minDf = 10)
      println(s"SMOKE   removed=${out.agg(sum(col("n_removed"))).head().getLong(0)}")
    }
    timed("dedupParagraphs 100k docs") {
      val rep = bigDocs.select(col("doc_id"),
        concat_ws("\n", col("text"), lit("Disclaimer."), col("text")).as("text"))
      graft.operators.Dedup.dedupParagraphs(rep, "doc_id", "text")
        .agg(sum(col("n_paras") - col("n_unique"))).head()
    }
    timed("quality model fit+score 100k") {
      // 4 GD iterations over 100k docs: per iteration one projection
      // against broadcast weight literals + one bounded (<=4096-row)
      // gradient aggregation; scoring is one scan
      val labeled = bigDocs.withColumn("y",
        graft.operators.TextAnalysis.gopherPass(col("text")).cast("int"))
      val (qm, _) = graft.operators.QualityModel.fit(
        labeled, "text", "y", iters = 4, lr = 0.5)
      val scored = graft.operators.QualityModel.score(labeled, "text", qm)
      val mp = scored.agg(avg(col("quality_prob"))).head().getDouble(0)
      println(f"SMOKE   mean_prob=$mp%.4f")
    }
    timed("hashSplitLabeled 100k docs") {
      graft.operators.Sampling.hashSplitLabeled(bigDocs, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "sm")
        .groupBy("split").count().collect()
    }
    timed("pca fit+project 100k vecs") {
      val model = graft.operators.Pca.fit(bigEmb, "embedding", dim = 64, nComponents = 4)
      graft.operators.Pca.transform(bigEmb, "embedding", model)
        .agg(sum(col("pc1"))).head()
    }
    timed("randproj 64->8 100k vecs") {
      graft.operators.RandomProjection.project(bigEmb, "embedding", "sm", 64, 8)
        .agg(sum(col("rp1"))).head()
    }
    val (indexedPq, centsPq, cbPq) = timed("ivfpq build 100k vecs") {
      graft.operators.Pq.ivfPqBuild(
        bigEmb, "vec_id", "embedding", dim = 64, nCells = 32, m = 8, k = 16, iters = 2)
    }
    // 1k-query batch through the ONE-JOB relational search (broadcast
    // probe relation + ADC tables, equi-join, window top-k) — the shape
    // that replaced one plan branch per query. Driver sees only the
    // final top-k rows.
    val batchQs = timed("collect 1k query vectors") {
      bigEmb.filter(col("vec_id") < 1000)
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    }
    timed("ivfpq search 1k q (nProbe=4)") {
      val n = graft.operators.Pq.ivfPqSearch(indexedPq, "vec_id", "codes",
        centsPq, cbPq, batchQs, k = 10, nProbe = 4).count()
      println(s"SMOKE   ivfpq batch results: $n")
    }
    // residual-encoding variant: same one-job relational shape, with
    // cell-dependent ADC tables riding the broadcast probe relation
    val (indexedRes, centsRes, cbRes) = timed("residual ivfpq build 100k vecs") {
      graft.operators.Pq.ivfPqBuildResidual(
        bigEmb, "vec_id", "embedding", dim = 64, nCells = 32, m = 8, k = 16, iters = 2)
    }
    timed("residual ivfpq search 1k q (nProbe=4)") {
      val n = graft.operators.Pq.ivfPqSearchResidual(indexedRes, "vec_id", "codes",
        centsRes, cbRes, batchQs, k = 10, nProbe = 4).count()
      println(s"SMOKE   residual ivfpq batch results: $n")
    }

    // ---- distributed MMR over 1k query shortlists ---------------------
    // shortlists from the pruned IVF probe (bounded candidate gen), then
    // the greedy MMR kernel per query ON EXECUTORS — no driver collect
    // of any vector, max driver rows = the final (qid,id,rank) output
    timed("mmr rerank 1k q (k=10/20)") {
      val qdf = bigEmb.filter(col("vec_id") < 1000)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val shortlists = graft.operators.Ann.ivfSearchL2(
          indexed, "vec_id", "embedding", cents,
          qdf, "qid", "qvec", k = 20, nProbe = 2)
        .select(col("qid"), col("vec_id"), (-col("distance")).as("rel"))
        .join(bigEmb.select(col("vec_id"), col("embedding")), "vec_id")
      val n = graft.operators.Mmr.rerankDistributed(
        shortlists, "qid", "vec_id", "rel", "embedding", k = 10, lambda = 0.5)
        .count()
      println(s"SMOKE   mmr reranked rows: $n")
    }

    // ---- PageRank over a ~1M-edge co-purchase graph -------------------
    // One shuffle join + map-side-combined sum per iteration; rank
    // frames localCheckpoint each round so lineage stays O(1). The
    // shape a host-graph quality prior runs at corpus scale.
    val coPurchase = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val a = li.toDF("ok", "src")
      val b = li.toDF("ok", "dst")
      a.join(b, "ok").filter(col("src") =!= col("dst"))
        .select("src", "dst").distinct().localCheckpoint()
    }
    timed("pagerank ~1M edges x5 iter") {
      println(s"SMOKE   pagerank edges: ${coPurchase.count()}")
      val pr = graft.operators.Graphs.pageRank(coPurchase, "src", "dst", iterations = 5)
      val top = pr.orderBy(col("rank").desc).limit(3)
        .as[(Long, Double)].collect()
      println(s"SMOKE   pagerank top: ${top.map(t => f"${t._1}:${t._2}%.2e").mkString(" ")}")
    }
    // one-shot relational triangle census on the same graph: the
    // degree-ordered wedge join is the skew-bound path
    timed("triangle census ~1M edges") {
      val tc = graft.operators.Graphs.triangleCount(coPurchase, "src", "dst")
      val tot = tc.agg(sum(col("triangles"))).head().getLong(0) / 3
      println(s"SMOKE   triangles: $tot")
    }

    // ---- the whole pipeline, end-to-end, LSH-mode dedup (default) ----
    // Stage-by-stage so SCALE.md records survivor counts; bands=4
    // (r=8, S-curve ~0.84) matches the ~0.98-Jaccard replica corpus —
    // the same knob any 100 TB run tunes to its dup profile.
    {
      val bench = bigDocs.filter(col("doc_id") < 200)
      val corpus = bigDocs.filter(col("doc_id") >= 200)
      val cfg = graft.pipelines.TrainingDataPipeline.Config(
        nearDupJaccard = 0.8, lshBands = 4, maxContamination = 0.05,
        testFraction = 0.05)
      val t0 = System.nanoTime()
      val q = timed("pipeline: qualityFilter") {
        val f = graft.pipelines.TrainingDataPipeline
          .qualityFilter(corpus, "doc_id", "text", cfg)
          .localCheckpoint()
        println(s"SMOKE   quality survivors: ${f.count()}")
        f
      }
      val d = timed("pipeline: dedup (LSH+CC)") {
        val f = graft.pipelines.TrainingDataPipeline
          .dedup(q, "doc_id", "text", cfg).localCheckpoint()
        println(s"SMOKE   dedup survivors: ${f.count()}")
        f
      }
      val c = timed("pipeline: decontaminate") {
        val f = graft.pipelines.TrainingDataPipeline
          .decontaminate(d, "doc_id", "text", bench, "doc_id", "text", cfg)
          .localCheckpoint()
        println(s"SMOKE   decontaminated survivors: ${f.count()}")
        f
      }
      timed("pipeline: split+pack") {
        val (train, _) = graft.operators.Sampling.hashSplit(
          c, "doc_id", cfg.testFraction, cfg.salt + "|split")
        val spans = graft.pipelines.TrainingDataPipeline
          .pack(train, "doc_id", "text", seqLen = 2048)
        println(s"SMOKE   train spans: ${spans.count()}")
      }
      println(f"SMOKE pipeline TOTAL              ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    // ---- round-6 additions: equi-depth order statistics on a skewed
    // column, curation funnel, incremental IVF append ---------------
    timed("equi-depth quantiles (skewed)") {
      // exp(value) spans decades: uniform-width buckets would put
      // nearly all distinct values in one window partition; force the
      // sketch-boundary path with a tight per-bucket target
      val skewed = spark.range(600000)
        .select(exp(col("id").cast("double") / 30000.0).as("v"))
      val r = graft.operators.Outliers.exactQuantiles(
        skewed, "v", Seq(0.5, 0.9, 0.99), nBuckets = 64,
        targetPerBucket = 20000L)
      println(s"SMOKE   quantiles: ${r.collect().map(_.toString).mkString(" ")}")
    }
    timed("funnel over 100k docs") {
      val corpus = spark.read.parquet(s"$base/documents")
      val rep = graft.operators.Funnel.report(corpus, Seq(
        "min_chars" -> (length(col("text")) >= 150),
        "max_words" -> (size(split(lower(col("text")), "\\s+")) <= 70)))
      println(s"SMOKE   funnel: ${rep.collect().map(_.toString).mkString(" ")}")
    }
    // ---- round-7: TwoNN intrinsic dimension at 100k vectors on the
    // BOUNDED path — 2-NN from the pruned IVF probe (no crossJoin),
    // queries a 5% deterministic hash-sample (the MLE is an i.i.d.
    // estimator over per-point ratios; 5k queries pin d to ~1.4%)
    timed("twonn 100k (IVF 2-NN, 5% q)") {
      val qs = graft.operators.Sampling.hashSample(
        bigEmb.select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "qid", 0.05, "twonn")
      val nnRaw = graft.operators.Ann.ivfSearchL2(
          indexed, "vec_id", "embedding", cents,
          qs, "qid", "qvec", k = 3, nProbe = 4)
        .filter(col("vec_id") =!= col("qid"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("distance"), col("vec_id"))
      val wide = nnRaw.withColumn("r", row_number().over(w))
        .filter(col("r") <= 2)
        .groupBy("qid").agg(
          min(when(col("r") === 1, col("distance"))).as("r1"),
          min(when(col("r") === 2, col("distance"))).as("r2"))
      val row = graft.operators.VectorOps
        .intrinsicDimensionFromNN(wide, "qid", "r1", "r2").head()
      println(f"SMOKE   twonn n=${row.getLong(0)} d=${row.getDouble(1)}%.3f")
    }
    // ---- round-7: perceptual image hashing + LSH pairing at 100k ----
    // 100k REAL 18×16 BMPs (synthesized in the scan, decoded by the
    // real ImageIO path inside codegen) → dHash64 → quarter-block LSH
    // near-dup pairs. 2k of the images are near-dup pairs by
    // construction (one-pixel variants); the hash+pair pipeline is the
    // image-dedup shape: one scan projection + one bounded equi-join.
    // Per-base QUADRATIC-FORM coefficients (coprime moduli, tuples
    // unique across 50k bases) so every base has a distinct gradient
    // STRUCTURE — an additive-only variation would leave all 100k
    // dHashes identical (dHash is gradient-based) and that first
    // attempt measured the pathology directly: ~1.6×10⁸ pairs through
    // one giant (block, value) bucket, 187 s. That run motivated the
    // giantBucketThreshold backstop now in hash64NearDupPairs.
    timed("image dhash+pairs 100k") {
      val imgs = spark.range(100000).select(col("id").as("media_id")).as[Long]
        .mapPartitions(_.map { id =>
          val base = if (id < 2000) id / 2 else id // 1k near-dup pairs
          val (ca, cb, cc) =
            (3 + base % 97, 7 + (base * 7) % 89, 5 + (base * 13) % 83)
          val rgb = Array.tabulate(18 * 16 * 3) { i =>
            val p = i / 3; val x = p % 18; val y = p / 18
            val v = (base * 37 + x * x * ca + y * y * cb + x * y * cc) % 251
            ((if (id < 2000 && (id & 1) == 1 && x == 3 && y == 3) v + 2 else v)
              & 0xff).toByte
          }
          (id, graft.multimodal.Multimodal.Codecs.encodeBmp(18, 16, rgb))
        }).toDF("media_id", "payload")
      val hashed = imgs.select(col("media_id"),
        graft.functions.image_dhash64(col("payload")).as("dh"))
      val pairs = graft.operators.Dedup.hash64NearDupPairs(
        hashed, "media_id", "dh", maxHamming = 3)
      println(s"SMOKE   image near-dup pairs: ${pairs.count()} (1000 planted)")
    }
    timed("blocked ER over 10k dirty records") {
      // 10k records over 64 base names × 7 near-dup suffixes: blocking
      // bounds every block, the size gate drops none, components
      // cluster the per-name near-cliques (~770k pair edges) — the
      // er_* gate shape at 20× its sf0.1 edge volume
      val recs = bigDocs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("id"),
          concat(lit("name"), (col("doc_id") % 64).cast("string"),
            lit(" suffix"), (col("doc_id") % 7).cast("string")).as("s"))
      val ents = graft.operators.RecordLinkage.resolveEntities(
        recs, "id", "s",
        concat(substring(col("s"), 1, 6), lit("|"),
          (length(col("s")) % 4).cast("string")),
        maxDist = 2, maxBlock = 25000)
      println(s"SMOKE   er entities: ${ents.select("entity").distinct().count()}")
    }
    timed("link prediction on the big co-purchase graph") {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey"))
      val e = li.toDF("ok", "src").join(li.toDF("ok", "dst"), "ok")
        .filter(col("src") =!= col("dst")).select("src", "dst")
      val lp = graft.operators.Graphs.linkPrediction(e, "src", "dst",
        minCommon = 3, maxCenterDegree = Some(500))
      println(s"SMOKE   linkpred candidates: ${lp.count()}")
    }
    timed("bm25 topKBatch 4 queries 100k") {
      // the one-pass batch: 4 queries over the SAME corpus scan —
      // compare against ~4x the solo "bm25 topK" number above
      graft.operators.Bm25.topKBatch(bigDocs, "doc_id", "text",
        Seq(0L -> Seq("spark", "window"), 1L -> Seq("merge", "vector"),
          2L -> Seq("spark", "vector"), 3L -> Seq("window", "merge")),
        k = 20).count()
    }
    timed("bm25 topKBatch 1000 queries 100k") {
      // the relational batch scorer's plan is O(1) in Q — 1000 queries
      // over a 64-term vocabulary, one corpus pass, one equi-join +
      // aggregate (the old Q-way unionAll stalled Catalyst here)
      val vocab = Vector("spark", "window", "merge", "vector", "join",
        "shuffle", "scan", "batch")
      val qs = (0L until 1000L).map(q => q -> Seq(
        vocab((q % 8).toInt), vocab(((q / 8) % 8).toInt) + "x",
        vocab(((q / 64) % 8).toInt) + "y").distinct)
      graft.operators.Bm25.topKBatch(bigDocs, "doc_id", "text",
        qs, k = 10).count()
    }
    timed("sorted-neighborhood 10k dirty recs") {
      val recs = spark.read.parquet(s"$sfDir/part.parquet")
        .filter(col("p_partkey") % 2 === 0)
        .select(col("p_partkey").as("id"), lower(col("p_name")).as("s"))
      val pairs = graft.operators.RecordLinkage.sortedNeighborhoodPairs(
        recs, "id", "s", col("s"), window = 10, maxDist = 2)
      println(s"SMOKE   sn pairs: ${pairs.count()}")
    }
    // Hub-heavy link prediction: a power-law-shaped graph — one 40k-
    // degree hub over a ring of bounded-degree nodes. Uncapped, the
    // hub alone contributes C(40k, 2) ≈ 8·10^8 wedges through the
    // self-join; the default cap (1000) prunes it BEFORE the join, so
    // the wedge work is the ring's. This is the default-path proof for
    // the no-silent-scale-killer contract (r7 advice).
    timed("link prediction, 40k-degree hub (default cap)") {
      val n = 40000L
      val hub = spark.range(1, n + 1)
        .select(lit(0L).as("src"), col("id").as("dst"))
      val ring = spark.range(1, n + 1)
        .select(col("id").as("src"), (col("id") % n + 1L).as("dst"))
      val lp = graft.operators.Graphs.linkPrediction(
        hub.unionAll(ring), "src", "dst", minCommon = 1)
      println(s"SMOKE   hub-capped candidates: ${lp.count()}")
    }
    timed("IVF append 20k to 80k index") {
      val e100k = spark.read.parquet(s"$base/embeddings")
      val baseIdx = e100k.filter(col("vec_id") % 5 =!= 0)
      val batch = e100k.filter(col("vec_id") % 5 === 0)
      val (indexed, cents) = graft.operators.Ann.ivfBuild(
        baseIdx, "vec_id", "embedding", nCentroids = 32, iters = 2)
      val p = s"$base/ivf_append"
      graft.operators.Ann.writeIvfIndex(indexed, cents, p)
      graft.operators.Ann.appendToIvfIndex(spark, p, batch, "vec_id", "embedding")
      println(s"SMOKE   appended index rows: ${spark.read.parquet(s"$p/index").count()}")
    }

    // ---- streaming store ingestion at 10-20x the gate volume --------
    // The st_stream_* gates cap at a few hundred rows by design (their
    // cost is lifecycle job-count); these arms measure the per-batch
    // costs a production ingester actually pays: plain append, and the
    // per-batch 1-NN dedup against a growing live store.
    def cleanDir(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
    timed("ingestStream 20k rows / 10 batches") {
      val root = s"$base/stream_ingest"
      cleanDir(root)
      val src = bigEmb.filter(col("vec_id") < 20000)
        .select(col("vec_id"), col("embedding").as("vec"))
      src.repartitionByRange(10, col("vec_id"))
        .write.mode("overwrite").parquet(s"$root/src")
      val store = graft.store.VectorStore.openOrCreate(
        spark, s"$root/store", 64, tombstoneDeletes = true)
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$root/src").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
        .select(col("vec"))
      store.ingestStream(stream, s"$root/ck").awaitTermination()
      println(s"SMOKE   streamed store rows: ${store.count()}")
    }
    timed("ingestStreamDedup 10k (50% dup) / 5 batches") {
      val root = s"$base/stream_dedup"
      cleanDir(root)
      val store = graft.store.VectorStore.openOrCreate(
        spark, s"$root/store", 64, tombstoneDeletes = true)
      // seed 10k, then stream 10k of which half are exact copies of
      // seeded rows — every batch pays a 1-NN search against the live
      // store (which GROWS as novel rows land)
      val seed = bigEmb.filter(col("vec_id") < 10000)
        .select(col("vec_id"), col("embedding"))
      store.insertDF(seed.orderBy("vec_id").coalesce(1)
        .select(col("embedding").as("vec")))
      val copies = seed.filter(col("vec_id") % 2 === 0)
      val novel = bigEmb
        .filter(col("vec_id") >= 10000 && col("vec_id") < 15000)
        .select(col("vec_id"), col("embedding"))
      copies.unionAll(novel)
        .select(col("vec_id"), col("embedding").as("vec"))
        .repartitionByRange(5, col("vec_id"))
        .write.mode("overwrite").parquet(s"$root/src")
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$root/src").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
        .select(col("vec"))
      store.ingestStreamDedup(stream, s"$root/ck", eps = 1e-4)
        .awaitTermination()
      println(s"SMOKE   dedup store rows: ${store.count()} (want 15000)")
    }

    // ---- ANN-gated streaming dedup: per-batch cost must stay ~flat
    // as the live store grows 10× (the exact path above is linear in
    // store size — 23 s/2k-row batch at 15k live, r9). Cells scale
    // with the store (live/cell ≈ 350 in both runs), so the probed
    // candidate set per query is O(nProbe × cellSize), independent of
    // total store size — the IVF scaling contract.
    def annDedupRun(label: String, seedN: Int, nCells: Int): Unit = {
      val root = s"$base/stream_dedup_ann_$seedN"
      cleanDir(root)
      val store = graft.store.VectorStore.openOrCreate(
        spark, s"$root/store", 64, tombstoneDeletes = true)
      val seed = bigEmb.filter(col("vec_id") < seedN)
        .select(col("vec_id"), col("embedding"))
      store.insertDF(seed.select(col("embedding").as("vec")))
      store.buildAnnIndex(nCentroids = nCells, iters = 2, seedRounds = 0)
      // 10k streamed in 5 batches: half exact copies of seeded rows,
      // half novel (disjoint id range) — same mix as the exact smoke
      val copies = bigEmb.filter(col("vec_id") < 10000 && col("vec_id") % 2 === 0)
      val novel = bigEmb
        .filter(col("vec_id") >= seedN && col("vec_id") < seedN + 5000)
      copies.unionAll(novel)
        .select(col("vec_id"), col("embedding").as("vec"))
        .repartitionByRange(5, col("vec_id"))
        .write.mode("overwrite").parquet(s"$root/src")
      val stream = spark.readStream
        .schema(spark.read.parquet(s"$root/src").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/src")
        .select(col("vec"))
      timed(label) {
        store.ingestStreamDedup(stream, s"$root/ck", eps = 1e-4,
            approx = true, nProbe = 8)
          .awaitTermination()
        println(s"SMOKE   ann-dedup store rows: ${store.count()} " +
          s"(want ${seedN + 5000})")
      }
    }
    annDedupRun("annDedup 10k live / 5 batches", seedN = 10000, nCells = 32)
    annDedupRun("annDedup 90k live / 5 batches", seedN = 90000, nCells = 256)

    // ---- PQ batch search at Q = 10^4: the chunked query batches keep
    // ADC driver/broadcast state bounded (1024 tables per chunk) while
    // the per-chunk searches stay one relational job each
    timed("ivfpq search Q=10k (chunked)") {
      val (indexed, cents, cb) = graft.operators.Pq.ivfPqBuild(
        bigEmb, "vec_id", "embedding", dim = 64, nCells = 64,
        m = 8, k = 16, iters = 2)
      val pinned = spark.createDataFrame(indexed.rdd, indexed.schema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pinned.count()
      val queries = bigEmb.filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
        .map { case (i, v) => (i, v.toArray) }.toSeq
      println(s"SMOKE   queries: ${queries.size}")
      val n = graft.operators.Pq.ivfPqSearch(pinned, "vec_id", "codes",
        cents, cb, queries, k = 10, nProbe = 4).count()
      println(s"SMOKE   result rows: $n")
      pinned.unpersist()
    }
    spark.stop()
  }
}
