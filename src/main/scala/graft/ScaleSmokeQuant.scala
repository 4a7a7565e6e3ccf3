package graft

import org.apache.spark.sql.functions._

/** Round-10 scale smoke for the quantization-ladder and
  * late-interaction additions: IVF-SQ8 store search at 100k rows, OPQ
  * rotation training cost, and MaxSim brute vs shortlist-rerank.
  * Split from [[ScaleSmoke]] so these arms iterate without re-running
  * the full 30-minute battery; same replicated corpus recipe
  * (100k × 64f embeddings from sf0.1 × 50). Numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmokeQuant" }}}
  */
object ScaleSmokeQuant {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = "/tmp/graft_scale_smoke_q"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-smoke-q")
    import spark.implicits._

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SMOKE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
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
    val bigEmb = spark.read.parquet(s"$base/embeddings")
    println(s"SMOKE corpus: ${bigEmb.count()} vectors")

    // ---- IVF-SQ8 store at 100k: the 4x-fewer-index-bytes rung -------
    val root = s"$base/store"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = graft.store.VectorStore.openOrCreate(spark, root, 64,
      tombstoneDeletes = true)
    timed("store insert 100k") {
      store.insertDF(bigEmb.select(col("embedding").as("vec")))
    }
    timed("buildAnnIndexSq 100k / 64 cells") {
      store.buildAnnIndexSq(nCentroids = 64, iters = 2, seedRounds = 0)
    }
    val qdf = bigEmb.filter(col("vec_id") < 50000 && col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    timed("SQ search 1k q (nProbe=4)") {
      println(s"SMOKE   rows: ${store.searchApproxDF(qdf, 10, 4).count()}")
    }
    timed("SQ search 1k q (nProbe=4, refine=50)") {
      println(s"SMOKE   rows: ${store.searchApproxDF(qdf, 10, 4, refine = 50).count()}")
    }
    // index bytes on disk: SQ codes vs what flat float32 rows would be
    val sqBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$root/ann/index")).getLength
    println(s"SMOKE   SQ index bytes: $sqBytes")

    // ---- IVF-BQ at 100k: the 32x packed-sign-bit rung ---------------
    timed("buildAnnIndexBq 100k / 64 cells") {
      store.buildAnnIndexBq(nCentroids = 64, iters = 2, seedRounds = 0)
    }
    timed("BQ search 1k q (nProbe=4, refine=50)") {
      println(s"SMOKE   rows: ${store.searchApproxDF(qdf, 10, 4, refine = 50).count()}")
    }
    val bqBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(s"$root/ann/index")).getLength
    println(s"SMOKE   BQ index bytes: $bqBytes")

    // ---- hot-cell rebalance vs full rebuild at 100k ------------------
    timed("buildAnnIndex flat 100k / 64 cells") {
      store.buildAnnIndex(nCentroids = 64, iters = 2, seedRounds = 0)
    }
    val cellCounts = spark.read.parquet(s"$root/ann/index")
      .groupBy("centroid_id").count()
      .select(col("count")).collect().map(_.getLong(0)).sorted
    val cap = cellCounts(cellCounts.length * 9 / 10) // p90: ~6 cells split
    println(s"SMOKE   cell rows p50/p90/max: ${cellCounts(cellCounts.length / 2)}" +
      s"/$cap/${cellCounts.last}")
    timed(s"rebalanceAnnIndex(cap=$cap)") {
      println(s"SMOKE   report: ${store.rebalanceAnnIndex(cap, iters = 2)}")
    }
    timed("mergeAnnIndexCells(floor=p50/4)") {
      println(s"SMOKE   report: ${store.mergeAnnIndexCells(
        cellCounts(cellCounts.length / 2) / 4)}")
    }
    timed("flat search 1k q (nProbe=4) post-maintenance") {
      println(s"SMOKE   rows: ${store.searchApproxDF(qdf, 10, 4).count()}")
    }

    // ---- Matryoshka prefix-slice shortlist vs full brute ------------
    val mq = qdf.limit(200)
    timed("brute L2 100k x 200 q (baseline)") {
      println(s"SMOKE   rows: ${graft.operators.SimilarityJoin.knnL2(
        bigEmb, "vec_id", "embedding", mq, "qid", "qvec", 10).count()}")
    }
    timed("matryoshka 16/64 shortlist=100, 200 q") {
      println(s"SMOKE   rows: ${graft.operators.Ann.matryoshkaRescoreTopK(
        bigEmb, "vec_id", "embedding", mq, "qid", "qvec",
        prefixDim = 16, shortlist = 100, k = 10).count()}")
    }

    // ---- OPQ training cost (sample-based, the production recipe) ----
    val sample = bigEmb.filter(col("vec_id") % 10 === 0) // 10k rows
    val aMat = timed("OPQ trainRotation 10k sample (2 sweeps)") {
      graft.operators.Opq.trainRotation(sample, "vec_id", "embedding",
        dim = 64, m = 8, k = 16, iters = 2, sweeps = 2)
    }
    timed("OPQ rotate+encode 100k (persisted-grid shape)") {
      val cb = graft.operators.Pq.fit(
        sample.withColumn("_vr", graft.functions.mat_vec(col("embedding"), aMat)),
        "vec_id", "_vr", 64, 8, 16, 2)
      val n = graft.operators.Pq.encode(
        bigEmb.withColumn("_vr", graft.functions.mat_vec(col("embedding"), aMat)),
        "_vr", "codes", cb).count()
      println(s"SMOKE   encoded rows: $n")
    }

    // ---- sparse retrieval: 100k-doc posting index, pruned vs full ---
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bigDocs = docs.crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("doc_id") * 20 + col("rep")).as("doc_id"), col("text"))
    timed("sparse postings build 100k docs") {
      graft.operators.SparseRetrieval.tfPostings(bigDocs, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$base/postings")
    }
    val post = spark.read.parquet(s"$base/postings")
    println(s"SMOKE   posting rows: ${post.count()}")
    val qp = graft.operators.SparseRetrieval.tfPostings(
      bigDocs.filter(col("doc_id") % 500 === 0), "doc_id", "text")
    timed("sparse topKDot 200 q x 100k docs (full)") {
      println(s"SMOKE   rows: ${graft.operators.SparseRetrieval.topKDot(
        post, qp, 10).count()}")
    }
    timed("prunePostings p=1000 (persisted)") {
      graft.operators.SparseRetrieval.prunePostings(post, 1000)
        .write.mode("overwrite").parquet(s"$base/postings_p")
    }
    val postP = spark.read.parquet(s"$base/postings_p")
    println(s"SMOKE   pruned posting rows: ${postP.count()}")
    timed("sparse topKDot 200 q (pruned p=1000)") {
      println(s"SMOKE   rows: ${graft.operators.SparseRetrieval.topKDot(
        postP, qp, 10).count()}")
    }

    // ---- MaxSim: brute grid vs pooled-shortlist rerank --------------
    // 25k docs x 4 token vectors, 100 queries x 2 tokens
    val dt = bigEmb.select((col("vec_id") / 4).cast("long").as("doc_id"),
      col("embedding").as("dvec"))
    val qt = bigEmb.filter(col("vec_id") % 500 === 0).limit(200)
      .select((col("vec_id") / 1000).cast("long").as("qid"),
        (col("vec_id") % 2).cast("long").as("qtok"),
        col("embedding").as("qvec"))
    timed("MaxSim brute 25k docs x 100 q") {
      val n = graft.operators.LateInteraction.maxSimTopK(
        dt, "doc_id", "dvec", qt, "qid", "qtok", "qvec", k = 10).count()
      println(s"SMOKE   rows: $n")
    }
    timed("MaxSim pooled-shortlist rerank (s=50)") {
      val pooled = graft.operators.LateInteraction.meanPoolTokens(dt, "doc_id", "dvec")
      val pq = graft.operators.LateInteraction.meanPoolTokens(
        qt.select(col("qid"), col("qvec")), "qid", "qvec")
        .select(col("qid"), col("pooled_vec").as("qvec"))
      val shortlist = graft.operators.SimilarityJoin.knnL2(
          pooled, "doc_id", "pooled_vec", pq, "qid", "qvec", k = 50)
        .select(col("qid"), col("doc_id"))
      val n = graft.operators.LateInteraction.maxSimRerank(shortlist,
        "qid", "doc_id", dt, "dvec", qt, "qtok", "qvec", k = 10).count()
      println(s"SMOKE   rows: $n")
    }
    spark.stop()
  }
}
