package graft

import org.apache.spark.sql.functions._

import graft.store.{DocEquals, DocRange, IndexMaintenancePolicy, VectorStore}

/** 1M-row COMPOSED-serving smoke (r11 verdict #7): the
  * `vs_hier_filtered` shape — routed hierarchical probe + two-sidecar
  * compound filter + maintenance policy ON — measured end-to-end at
  * the 1M Zipf tier with hot-region queries, before and after the
  * policy-triggered hot-cell splits. The gates prove this composition
  * EXACT at sf0.01; this records what it costs (wall and records
  * read) where the pieces interact: the probe prunes partitions the
  * sidecar semi-join then filters, and the maintenance split is what
  * keeps the hot probe bounded as drift accumulates.
  *
  * Also exercises the adaptive dispatch: the same routed search with a
  * highly selective filter must switch to the exact arm and beat the
  * probed plan.
  *
  * Numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmokeServe" }}}
  */
object ScaleSmokeServe {
  def main(args: Array[String]): Unit = {
    val base = "/tmp/graft_scale_serve"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-serve")
    import spark.implicits._

    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE $label%-44s $s%8.2f s")
      (r, s)
    }
    def recordsRead(body: => Unit): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            total.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        var prev = -1L; var stable = 0; var tries = 0
        while (stable < 3 && tries < 60) {
          Thread.sleep(100)
          val cur = total.get
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
          tries += 1
        }
      } finally spark.sparkContext.removeSparkListener(l)
      total.get
    }

    // ---- 1M 16-dim Zipf-cluster corpus with doc metadata ------------
    val nCells = 64
    val nRows = 1000000L
    val dim = 16
    val h = (1 to nCells).map(1.0 / _).sum
    val sizes = (0 until nCells).map(j => (nRows / ((j + 1) * h)).toLong)
    println(s"SMOKE zipf corpus: ${sizes.sum} rows, hottest ${sizes.head}, " +
      s"coldest ${sizes.last}")
    val cellDf = sizes.zipWithIndex
      .map { case (n, j) => (j, sizes.take(j).sum, n) }
      .toDF("cell", "start", "n")
    val rows = cellDf
      .select(col("cell"), explode(sequence(lit(0L), col("n") - 1)).as("i"),
        col("start"))
      .select((col("start") + col("i")).as("rid"), col("cell"))
      .withColumn("vec", transform(sequence(lit(0), lit(dim - 1)),
        d => (col("cell") * lit(100) % lit(797)).cast("float")
          * when(d % 2 === 0, 1f).otherwise(-1f)
          + (pmod(xxhash64(col("rid"), d), lit(1000)) / lit(1000.0))
            .cast("float")))
      .select(col("vec"),
        concat(lit("{\"g\": \""), (col("cell") % 5).cast("string"),
          lit("\", \"score\": "), (col("rid") % 100).cast("string"),
          lit("}")).as("doc"))

    val root = s"$base/store"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = VectorStore.openOrCreate(spark, root, dim,
      tombstoneDeletes = true)
    timed("insertDF 1M rows") { store.insertDF(rows) }
    timed("materialize g + score sidecars") {
      store.materializeDocField(Seq("g"))
      store.materializeDocFieldNumeric(Seq("score"))
    }
    timed("build ivf(64) + super(8)") {
      store.buildAnnIndex(nCentroids = nCells, iters = 2, seedRounds = 0)
      store.buildAnnSuperQuantizer(nSuper = 8, iters = 3)
    }
    store.enableAutoMaintenance(IndexMaintenancePolicy(maxCellRows = 60000L))
    println(s"SMOKE cells=${store.annIndexStats().nCells} " +
      s"max=${store.annIndexStats().maxCellRows}")

    // hot-region queries: centers of the 4 hottest clusters, jittered
    val qs = (0 until 64).map { q =>
      val cell = q % 4
      (q.toLong, Array.tabulate(dim)(d =>
        (cell * 100 % 797).toFloat * (if (d % 2 == 0) 1f else -1f)
          + (q % 7) * 0.05f))
    }.toDF("qid", "qvec")
    val preds = Seq(DocEquals(Seq("g"), Seq("0")),
      DocRange(Seq("score"), Some(10.0), Some(60.0)))

    def serve(tag: String): Unit = {
      // warm once, then measure (min of 3) with records read
      store.searchApproxHierAllDF(qs, k = 10, nProbe = 4, superProbe = 2,
        preds).count()
      var best = Double.MaxValue
      var reads = 0L
      (0 until 3).foreach { _ =>
        var n = 0L
        val r = recordsRead {
          val (_, w) = timed(s"$tag routed+filtered serve (64q)") {
            n = store.searchApproxHierAllDF(qs, k = 10, nProbe = 4,
              superProbe = 2, preds).count()
          }
          best = math.min(best, w)
        }
        reads = r
      }
      println(f"SMOKE $tag best wall $best%.2f s, last records-read $reads")
    }
    serve("pre-split")

    // drifting ingest into the hot region: policy must split hot cells
    val drift = spark.range(60000L)
      .select(col("id").as("rid"))
      .withColumn("vec", transform(sequence(lit(0), lit(dim - 1)),
        d => lit(0f)
          + (pmod(xxhash64(col("rid"), d), lit(1000)) / lit(1000.0))
            .cast("float")))
      .select(col("vec"),
        concat(lit("{\"g\": \"0\", \"score\": "),
          (col("rid") % 100).cast("string"), lit("}")).as("doc"))
    val (_, wIngest) = timed("drift ingest 60k (policy ON)") {
      store.insertDF(drift)
    }
    val st = store.annIndexStats()
    println(s"SMOKE post-ingest cells=${st.nCells} max=${st.maxCellRows} " +
      f"(maintenance inside the $wIngest%.1f s ingest)")
    serve("post-split")

    // adaptive dispatch at the same tier: a 0.06%-selective filter must
    // beat the probed plan by switching to the exact arm
    val selPreds = Seq(DocEquals(Seq("g"), Seq("0")),
      DocRange(Seq("score"), Some(42.0), Some(42.0)),
      DocRange(Seq("score"), Some(42.0), None))
    store.searchApproxHierAllDF(qs, k = 10, nProbe = 4, superProbe = 2,
      selPreds).count() // warm
    var nProbed = 0L
    var nAdaptive = 0L
    val (_, wProbed) = timed("selective filter, probed plan") {
      nProbed = store.searchApproxHierAllDF(qs, k = 10, nProbe = 4,
        superProbe = 2, selPreds).count()
    }
    val (_, wAdaptive) = timed("selective filter, adaptive (exact arm)") {
      nAdaptive = store.searchApproxHierAllDF(qs, k = 10, nProbe = 4,
        superProbe = 2, selPreds, bruteForceThreshold = 20000L).count()
    }
    println(f"SMOKE adaptive speedup on 0.06%%-selective filter: " +
      f"${wProbed / wAdaptive}%.2fx")
    println(s"SMOKE result fill: probed $nProbed rows vs adaptive " +
      s"$nAdaptive rows (${qs.count() * 10} requested) — the probed plan " +
      "under-fills k whenever survivors fall outside the routed probe set; " +
      "the adaptive arm is recall 1.0 by construction")
    store.disableAutoMaintenance()
    spark.stop()
  }
}
