package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.store.{IndexMaintenancePolicy, VectorStore}

/** Round-12 maintenance-cost contracts: the auto-maintenance triggers
  * must be driven by INCREMENTAL stats (persisted per-cell counts
  * updated O(batch) from each append's own assignments, file counts
  * bookkept append-side), so an append with a policy enabled runs no
  * job proportional to index size unless a trigger actually fires.
  * Plus the round's convergence/robustness fixes: the quantized
  * retrain cooldown, the malformed-recipe fallback, and the clamped
  * super-quantizer refresh after a deep merge.
  */
class MaintenanceStatsSpec extends SparkSuite {
  import spark.implicits._

  private def mkRoot(tag: String): String =
    Files.createTempDirectory(s"graft-ms-$tag").toString + "/s"

  private def vec(i: Int): Array[Float] =
    Array((i % 13).toFloat, (i / 13 % 11).toFloat, (i % 5).toFloat, 1f)

  /** Total input records read by jobs run inside `body` (async
    * listener events are drained by polling the counter to
    * stability).
    */
  private def recordsReadDuring(body: => Unit): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          total.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      var prev = -1L; var stable = 0; var tries = 0
      while (stable < 3 && tries < 100) {
        Thread.sleep(100)
        val cur = total.get
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        tries += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    total.get
  }

  test("policy-on append runs no index-size job when no trigger fires") {
    val s = VectorStore.openOrCreate(spark, mkRoot("nojob"), 4,
      tombstoneDeletes = true)
    val n = 6000
    s.insert((0 until n).map(vec))
    s.buildAnnIndex(nCentroids = 8, iters = 2, seedRounds = 0)
    s.materializeDocField(Seq("g")) // exercise the sidecar bookkeeping too
    // warm both shapes once so lazy init (index cache, markers) is paid
    s.insert(Seq(vec(n + 1)), Seq("""{"g": "w"}"""))
    val off = recordsReadDuring {
      s.insert(Seq(vec(n + 2)), Seq("""{"g": "w"}"""))
    }
    // thresholds far above anything this corpus reaches: no trigger fires
    s.enableAutoMaintenance(IndexMaintenancePolicy(maxCellRows = 1000000L,
      minCellRows = 1L, docMaxFiles = 1000000L))
    s.insert(Seq(vec(n + 3)), Seq("""{"g": "w"}""")) // warm: stats seeded at enable
    val on = recordsReadDuring {
      s.insert(Seq(vec(n + 4)), Seq("""{"g": "w"}"""))
    }
    s.disableAutoMaintenance()
    // the policy's whole per-append cost is the batch's own cell-count
    // job plus marker IO — bounded by batch + centroids, NEVER ~n
    assert(on <= off + 500L,
      s"policy-on append read $on records vs $off with the policy off — " +
        "a maintenance check is scanning the index per mutation")
  }

  test("policy-on delete runs no sidecar-size job when no trigger fires") {
    // r12 verdict #2: the dead-fraction triggers used to run two
    // O(sidecar) counts per delete; they must now be pure marker
    // arithmetic folded from the delete's own tombstoned count.
    val s = VectorStore.openOrCreate(spark, mkRoot("delnojob"), 4,
      tombstoneDeletes = true)
    val n = 6000
    s.insert((0 until n).map(vec),
      (0 until n).map(i => s"""{"g": "${i % 3}", "t": "w${i % 5} pad"}"""))
    s.materializeDocField(Seq("g"))
    s.buildLexIndex()
    s.delete(Seq(0L)) // warm both delete shapes
    val off = recordsReadDuring { s.delete(Seq(1L)) }
    // thresholds no realistic delete reaches: triggers never fire
    s.enableAutoMaintenance(IndexMaintenancePolicy(
      lexMaxDeadFraction = 0.99, docMaxDeadFraction = 0.99))
    s.delete(Seq(2L)) // warm: dead-stats seeded at enable
    val on = recordsReadDuring { s.delete(Seq(3L)) }
    s.disableAutoMaintenance()
    assert(on <= off + 500L,
      s"policy-on delete read $on records vs $off with the policy off — " +
        "a dead-fraction check is scanning a sidecar per delete")
    // and the counters actually drive the trigger: crossing the
    // threshold still rebuilds (exactness of the fraction is asserted
    // by the existing DocIndexSpec/ParitySpec trigger tests)
    val stats = new Path(s.path, "_docidx.deadstats")
    val fs = stats.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(stats), "enable must seed the dead-stats counters")
  }

  test("persisted cell stats stay exact through append/delete/rebalance/merge") {
    val s = VectorStore.openOrCreate(spark, mkRoot("exact"), 4,
      tombstoneDeletes = true)
    s.insert((0 until 400).map(vec))
    s.buildAnnIndex(nCentroids = 4, iters = 2, seedRounds = 0)
    s.enableAutoMaintenance(IndexMaintenancePolicy(maxCellRows = 1000000L))
    def persisted(): Map[Long, Long] = {
      val p = new Path(s.path, "ann/cellstats")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      body.split("\n").filter(_.contains("\t")).map { l =>
        val Array(c, cn) = l.split("\t", 2); c.toLong -> cn.toLong
      }.toMap
    }
    def actual(): Map[Long, Long] =
      spark.read.parquet(s"${s.path}/ann/index")
        .groupBy(org.apache.spark.sql.functions
          .col("centroid_id").cast("long")).count()
        .as[(Long, Long)].collect().toMap
    assert(persisted() == actual(), "stats must match the index at enable")
    s.insert((400 until 520).map(vec))
    assert(persisted() == actual(), "O(batch) bump must stay exact")
    // tombstone deletes leave INDEX rows (and so the stats) unchanged
    s.delete((0L until 50L))
    assert(persisted() == actual(), "tombstone delete must not move stats")
    val rep = s.rebalanceAnnIndex(maxCellRows = 60)
    assert(rep.splitCells > 0)
    assert(persisted() == actual(), "rebalance must refresh stats")
    val mrep = s.mergeAnnIndexCells(minCellRows = 30)
    assert(mrep.mergedCells >= 0)
    assert(persisted() == actual(), "merge must refresh stats")
    s.compact()
    assert(persisted() == actual(), "compaction refresh must recount")
    s.disableAutoMaintenance()
  }

  test("cell stats stay exact across a disable/re-enable cycle with interleaved appends") {
    val s = VectorStore.openOrCreate(spark, mkRoot("reenable"), 4,
      tombstoneDeletes = true)
    s.insert((0 until 300).map(vec))
    s.buildAnnIndex(nCentroids = 4, iters = 2, seedRounds = 0)
    s.enableAutoMaintenance(IndexMaintenancePolicy(maxCellRows = 1000000L))
    s.disableAutoMaintenance()
    // appends with maintenance OFF must still keep the persisted table
    // exact (r12 advice: enable only recounts when the file is MISSING,
    // so a skipped bump here would leave triggers undercounted forever)
    s.insert((300 until 420).map(vec))
    s.enableAutoMaintenance(IndexMaintenancePolicy(maxCellRows = 1000000L))
    val p = new Path(s.path, "ann/cellstats")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val persisted = body.split("\n").filter(_.contains("\t")).map { l =>
      val Array(c, cn) = l.split("\t", 2); c.toLong -> cn.toLong
    }.toMap
    val actual = spark.read.parquet(s"${s.path}/ann/index")
      .groupBy(org.apache.spark.sql.functions
        .col("centroid_id").cast("long")).count()
      .as[(Long, Long)].collect().toMap
    assert(persisted == actual,
      "stats must reflect appends made while maintenance was disabled")
    s.disableAutoMaintenance()
  }

  test("quantized retrain cooldown: inherent skew fires ONE retrain, then suppresses") {
    val s = VectorStore.openOrCreate(spark, mkRoot("cooldown"), 4,
      tombstoneDeletes = true)
    // inherently imbalanced: one huge duplicate clump + a few satellites.
    // NO centroid placement can even out cell sizes, so the retrain
    // cannot bring max/mean under the threshold.
    val clump = (0 until 2000).map(_ => Array(0f, 0f, 0f, 1f))
    val sats = (0 until 12).map(i => Array(50f + i * 10, 90f, 9f, 1f))
    s.insert(clump ++ sats)
    s.buildAnnIndexSq(nCentroids = 4, iters = 2, seedRounds = 0)
    val base = recordsReadDuring { s.insert(Seq(Array(0f, 0f, 0f, 1f))) }
    s.enableAutoMaintenance(
      IndexMaintenancePolicy(quantizedRebuildImbalance = 2.0))
    // first over-threshold append: the retrain fires (reads ~corpus
    // several times over), fails to converge, and records the cooldown
    val first = recordsReadDuring { s.insert(Seq(Array(0f, 0f, 0f, 1f))) }
    assert(first > base + 1500L,
      s"first over-threshold append must retrain ($first vs base $base)")
    assert(s.annIndexStats().imbalance > 2.0, "skew must be inherent")
    // later appends: the suppressed trigger must NOT re-fire the
    // O(corpus) retrain that cannot help
    val second = recordsReadDuring { s.insert(Seq(Array(0f, 0f, 0f, 1f))) }
    assert(second <= base + 500L,
      s"cooldown must suppress the re-retrain ($second vs base $base)")
    s.disableAutoMaintenance()
    // the store still searches correctly under the frozen imbalance
    val hits = s.searchApprox(Seq(Array(50f, 90f, 9f, 1f)), k = 3,
      nProbe = 4, refine = 10)
    assert(hits.head.nonEmpty)
  }

  test("malformed build.meta degrades to the pre-recipe rebuild, not a crash") {
    val s = VectorStore.openOrCreate(spark, mkRoot("badmeta"), 4,
      tombstoneDeletes = true)
    s.insert((0 until 60).map(vec))
    s.buildAnnIndexSq(nCentroids = 3, iters = 2, seedRounds = 0)
    val before = s.searchApprox(Seq(vec(7)), k = 4, nProbe = 64).map(_.map(_.id))
    // truncate the recipe the way a crash mid-write would have (builder
    // survives, hyperparameters gone)
    val p = new Path(s.path, "ann/build.meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write("builder=ivfsq".getBytes("UTF-8")) finally out.close()
    s.rebuildAnnIndex() // must fall back, not NoSuchElementException
    assert(s.annKind == "ivfsq")
    assert(s.annIndexStats().nCells == 3)
    assert(s.searchApprox(Seq(vec(7)), k = 4, nProbe = 64)
      .map(_.map(_.id)) == before)
  }

  test("deep merge clamps the super-quantizer refresh to surviving cells") {
    val s = VectorStore.openOrCreate(spark, mkRoot("clamp"), 4,
      tombstoneDeletes = true)
    s.insert((0 until 120).map(vec))
    s.buildAnnIndex(nCentroids = 4, iters = 2, seedRounds = 0)
    s.buildAnnSuperQuantizer(nSuper = 3, iters = 2)
    // dissolve everything mergeable: at most ONE cell survives, fewer
    // than the persisted 3 super-cells — the refresh must clamp, not
    // run k-means with k > point count
    val rep = s.mergeAnnIndexCells(minCellRows = Long.MaxValue / 2)
    assert(rep.survivingCells == 1)
    val qs = Seq((0L, vec(7))).toDF("qid", "qvec")
    val got = s.searchApproxHierDF(qs, k = 5, nProbe = 1, superProbe = 1)
      .select($"id").as[Long].collect().toSet
    val exact = s.search(Seq(vec(7)), k = 5).head.map(_.id).toSet
    assert(got == exact, "single-cell routed search must be exact")
  }

  test("posting-index file bookkeeping matches the real listing through append/rebuild") {
    val s = VectorStore.openOrCreate(spark, mkRoot("lexbook"), 4,
      tombstoneDeletes = true)
    def doc(i: Int) = s"""{"t": "w${i % 5} common pad${i % 3}"}"""
    s.insert((0 until 30).map(vec), (0 until 30).map(doc))
    s.buildLexIndex()
    def real(): Long = {
      val pp = new Path(graft.operators.LexIndex.postingsPath(
        new Path(s.path, "lex").toString))
      val fs = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var n = 0L
      val it = fs.listFiles(pp, true)
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    def kept(): Long = graft.operators.LexIndex.fileCount(spark,
      new Path(s.path, "lex").toString)
    assert(kept() == real(), "post-build bookkeeping must match a listing")
    (0 until 3).foreach(b => s.insert(Seq(vec(100 + b)), Seq(doc(100 + b))))
    assert(kept() == real(), "post-append bookkeeping must stay exact")
    s.buildLexIndex()
    assert(kept() == real(), "rebuild must reset the bookkeeping")
    // search is unaffected by the staged-append layout
    val ranks = s.searchLexDF(Seq(0L -> Seq("common", "w1")), k = 10)
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2).toSeq
    assert(ranks.nonEmpty)
  }

  test("doc-sidecar file bookkeeping matches the real listing through append/rebuild") {
    val s = VectorStore.openOrCreate(spark, mkRoot("docbook"), 4,
      tombstoneDeletes = true)
    def doc(i: Int) = s"""{"g": "${i % 3}", "x": $i}"""
    s.insert((0 until 20).map(vec), (0 until 20).map(doc))
    s.materializeDocField(Seq("g"))
    s.materializeDocFieldNumeric(Seq("x"))
    def real(sub: String): Long = {
      val dir = new Path(s.path, sub)
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var n = 0L
      val it = fs.listFiles(dir, true)
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    def marker(sub: String): Long = {
      val p = new Path(s.path, s"$sub/_nfiles")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) -1L
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      }
    }
    (0 until 3).foreach(b =>
      s.insert(Seq(vec(100 + b)), Seq(doc(100 + b))))
    assert(marker("docidx/g") == real("docidx/g"),
      "string sidecar bookkeeping must stay exact")
    assert(marker("docidx_num/x") == real("docidx_num/x"),
      "numeric sidecar bookkeeping must stay exact")
    // the sidecar route still answers exactly after staged appends
    val idx = s.queryByDoc(Seq("g"), Seq("1")).map(_.id)
    s.dropDocField(Seq("g"))
    assert(s.queryByDoc(Seq("g"), Seq("1")).map(_.id) == idx)
  }
}
