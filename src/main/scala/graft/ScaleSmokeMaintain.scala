package graft

import org.apache.spark.sql.functions._

/** 1M-row scale smoke for the IVF ladder under a ZIPF cell-size
  * distribution (r10 verdict #7) plus the auto-maintenance loop under
  * drifting ingest (r10 verdict #6) — the two failure shapes a real
  * 100 TB vector corpus has that uniform fixtures hide:
  *
  *   - Zipf cells: natural embeddings cluster unevenly; the hottest
  *     cell holds ~1/H(C) of the corpus, so a query probing it scans
  *     20-50× the mean. Rebalance is the fix; this measures what it
  *     costs and what it buys at 1M rows.
  *   - Drift: appended batches concentrate in one region, so a fixed
  *     centroid set degrades append-over-append. The maintenance
  *     POLICY (not an operator remembering to call rebalance) must
  *     keep per-probe cost bounded across 10 ingest cycles.
  *
  * Numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmokeMaintain" }}}
  */
object ScaleSmokeMaintain {
  def main(args: Array[String]): Unit = {
    val base = "/tmp/graft_scale_maintain"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-maintain")
    import spark.implicits._

    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE $label%-36s $s%8.2f s")
      (r, s)
    }

    // ---- Part B data: 1M 16-dim vectors in 64 Zipf-sized clusters ----
    // Zipf(s=1): cell j gets N/( (j+1) * H(64) ) rows -> hottest cell
    // ~211k rows, coldest ~3.3k. Deterministic hash noise per (id,dim)
    // keeps rows inside their cluster ball (radius << cluster spacing).
    val nCells = 64
    val nRows = 1000000L
    val dim = 16
    val h = (1 to nCells).map(1.0 / _).sum
    val sizes = (0 until nCells).map(j => (nRows / ((j + 1) * h)).toLong)
    val total = sizes.sum
    println(s"SMOKE zipf corpus: $total rows, hottest ${sizes.head}, " +
      s"coldest ${sizes.last}")
    val cellDf = sizes.zipWithIndex
      .map { case (n, j) => (j, sizes.take(j).sum, n) }
      .toDF("cell", "start", "n")
    val vecs = cellDf
      .select(col("cell"), explode(sequence(lit(0L), col("n") - 1)).as("i"),
        col("start"))
      .select((col("start") + col("i")).as("id"), col("cell"))
      .withColumn("vec", transform(sequence(lit(0), lit(dim - 1)),
        d => (col("cell") * lit(100) % lit(797)).cast("float")
          * when(d % 2 === 0, 1f).otherwise(-1f)
          + (pmod(xxhash64(col("id"), d), lit(1000)) / lit(1000.0))
            .cast("float")))
      .select(col("id"), col("vec"))
    timed("synthesize 1M zipf vectors") {
      vecs.write.mode("overwrite").parquet(s"$base/vecs")
    }
    val corpus = spark.read.parquet(s"$base/vecs")
      .withColumn("_gen", lit(0L))

    // ---- IVF build + probe cost on the skewed layout ----------------
    val ivfPath = s"$base/ivf"
    timed("ivf build 64 cells @ 1M") {
      val (indexed, cents) = operators.Ann.ivfBuild(
        corpus, "id", "vec", nCentroids = nCells, iters = 2)
      operators.Ann.writeIvfIndex(indexed, cents, ivfPath)
    }
    // queries biased toward the HOT region (cell 0..3 centers): the
    // worst case rebalance exists for
    val qs = (0 until 100).map { q =>
      val cell = q % 4
      (q.toLong, Array.tabulate(dim)(d =>
        (cell * 100 % 797).toFloat * (if (d % 2 == 0) 1f else -1f) + 0.5f))
    }.toDF("qid", "qvec")
    def probeTime(tag: String): Double =
      timed(s"probe nProbe=2 k=10 ($tag)") {
        operators.Ann.ivfSearchL2Pruned(spark, ivfPath, "id", "vec",
          qs, "qid", "qvec", k = 10, nProbe = 2).count()
      }._2
    val tHot = probeTime("zipf, pre-rebalance")
    val perCell0 = spark.read.parquet(s"$ivfPath/index")
      .groupBy("centroid_id").count().agg(max("count"), count(lit(1))).head()
    println(s"SMOKE pre-rebalance: maxCell=${perCell0.getLong(0)} " +
      s"cells=${perCell0.getLong(1)}")
    // rebalance to 2x the balanced mean
    val cap = 2L * total / nCells
    val (rep, tReb) = timed(s"rebalance maxCellRows=$cap") {
      operators.Ann.rebalanceIvfCells(spark, ivfPath, "id", "vec", cap,
        iters = 2)
    }
    println(s"SMOKE rebalance: split=${rep.splitCells} " +
      s"newCells=${rep.newCells}")
    val tBal = probeTime("post-rebalance")
    println(f"SMOKE probe speedup from rebalance: ${tHot / tBal}%.2fx " +
      "(hot-region queries)")
    // O(batch) append throughput against the rebalanced layout
    val batch = corpus.filter(col("id") % 100 === 0)
      .select((col("id") + lit(2000000L)).as("id"), col("vec"),
        col("_gen"))
    val (_, tApp) = timed("append 10k batch (O(batch))") {
      operators.Ann.appendToIvfIndex(spark, ivfPath, batch, "id", "vec")
    }
    println(f"SMOKE append throughput: ${10000 / tApp}%.0f rows/s")

    // ---- lex index at 1M docs (10x the ScaleSmokeLex tier) ----------
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val docReps = 200 // 5k docs x 200 = 1M
    val bigDocs = docs0.crossJoin(
        spark.range(docReps).select(col("id").as("rep")))
      .select((col("doc_id") * docReps + col("rep")).as("id"),
        concat(col("text"), lit(" rep"), col("rep")).as("doc"),
        lit(0L).as("_gen"))
    val lexRoot = s"$base/lex"
    val nDocs = bigDocs.count()
    println(s"SMOKE lex corpus: $nDocs docs")
    timed("lex build @ 1M docs") {
      operators.LexIndex.build(spark, lexRoot, bigDocs, "id", "doc", "_gen",
        buckets = 16)
    }
    val lexQs = Seq(0L -> Seq("the", "data"), 1L -> Seq("model", "learning"),
      2L -> Seq("spark"), 3L -> Seq("rep3", "training"), 4L -> Seq("quality"))
    timed("lex 5-query batch @ 1M docs") {
      operators.LexIndex.search(spark, lexRoot, lexQs, 10).count()
    }
    timed("lex append 5k batch") {
      operators.LexIndex.append(spark, lexRoot,
        bigDocs.filter(col("id") % 200 === 0)
          .select((col("id") + lit(5000000L)).as("id"), col("doc"),
            col("_gen")),
        "id", "doc", "_gen")
    }

    // ---- Part A: auto-maintenance under 10 drifting ingest cycles ---
    // Store seeded uniform, then every batch lands in ONE region (the
    // drift). Policy on: probe cost must stay ~flat because the hot
    // cell keeps splitting; policy off: the hot cell grows linearly.
    def runCycles(auto: Boolean): Seq[Double] = {
      val root = s"$base/store_${if (auto) "auto" else "manual"}"
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val store = graft.store.VectorStore.openOrCreate(spark, root, dim,
        tombstoneDeletes = true)
      store.insertDF(corpus.limit(100000).select(col("vec")))
      store.buildAnnIndex(nCentroids = 16, iters = 2, seedRounds = 0)
      if (auto) store.enableAutoMaintenance(
        graft.store.IndexMaintenancePolicy(maxCellRows = 20000))
      val qHot = (0 until 50).map { q =>
        (q.toLong, Array.tabulate(dim)(d =>
          500f * (if (d % 2 == 0) 1f else -1f) + q * 0.01f))
      }.toDF("qid", "qvec")
      (1 to 10).map { cyc =>
        // drifted batch: constant offset far from the seed clusters
        store.insertDF(corpus.limit(10000)
          .select(transform(col("vec"),
            x => x + lit(500f) * lit(1f)).as("vec")))
        val t0 = System.nanoTime()
        store.searchApproxDF(qHot, k = 10, nProbe = 1).count()
        val t = (System.nanoTime() - t0) / 1e9
        val mx = store.annIndexStats().maxCellRows
        println(f"SMOKE cycle $cyc%2d auto=$auto%-5s probe $t%6.2f s maxCell=$mx")
        t
      }
    }
    val off = runCycles(auto = false)
    val on = runCycles(auto = true)
    println(f"SMOKE maintenance: last-cycle probe off=${off.last}%.2f s " +
      f"on=${on.last}%.2f s (${off.last / on.last}%.2fx)")
    spark.stop()
  }
}
