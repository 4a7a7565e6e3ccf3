package graft

import org.apache.spark.sql.functions._

/** 1M-row graph-SERVING smoke (r12 verdict #1 "Done" criterion): the
  * persisted [[graft.operators.KnnGraphIndex]] layout vs the
  * standalone [[graft.operators.KnnGraph.searchGraph]] operator on the
  * same graph — the round-12 finding was that the standalone path pays
  * O(E) adjacency derivation + O(n) entry selection PER CALL, which
  * the built layout amortizes into the build. This measures both on
  * one corpus: wall and records-read for a 64-query batch, plus the
  * delete-repair path (bounded by the dead nodes' rev sets).
  *
  * The 1M graph here is SYNTHETIC (cluster-local ring adjacency with
  * real computed distances): a converged NN-Descent build at 1M is a
  * multi-hour job whose per-iteration scaling is already recorded at
  * the 100k tier (ScaleSmokeKnnGraph) — serving and repair COST does
  * not depend on edge quality, only on degree/bucket shape, which the
  * ring reproduces (k = 10, bucketed 512 ways).
  *
  * Numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmokeGraphServe" }}}
  */
object ScaleSmokeGraphServe {
  def main(args: Array[String]): Unit = {
    val base = "/tmp/graft_scale_gserve"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-gserve")
    import spark.implicits._

    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE $label%-52s $s%8.2f s")
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

    val nRows = 1000000L
    val nClusters = 4096
    val dim = 16
    val k = 10
    val vecs = spark.range(nRows)
      .select(col("id"), (col("id") % nClusters).as("cell"))
      .withColumn("vec", transform(sequence(lit(0), lit(dim - 1)),
        d => (col("cell") * lit(37) % lit(509)).cast("float")
          * when(d % 3 === 0, 1f).otherwise(-0.5f)
          + (pmod(xxhash64(col("id"), d), lit(1000)) / lit(250.0))
            .cast("float")))
      .select(col("id"), col("vec"))
    timed("synthesize 1M clustered vectors") {
      vecs.write.mode("overwrite").parquet(s"$base/vecs")
    }
    val pts = spark.read.parquet(s"$base/vecs")

    // cluster-local ring adjacency (id ± j*nClusters stays in-cluster),
    // distances computed for real so the layout is schema-faithful
    val strides = (1 to k / 2).map(_.toLong)
    val fwd = pts.select(col("id"))
      .select(col("id"), explode(array(
        strides.flatMap(j => Seq(
          (col("id") + lit(j * nClusters)) % nRows,
          (col("id") - lit(j * nClusters) + nRows) % nRows)): _*)).as("nbr"))
      .filter(col("id") =!= col("nbr"))
    val scored = fwd
      .join(pts, Seq("id"))
      .join(pts.select(col("id").as("nbr"), col("vec").as("nvec")),
        Seq("nbr"))
      .select(col("id"), col("nbr"),
        graft.functions.l2_distance(col("vec"), col("nvec")).as("distance"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("distance"), col("nbr"))))
    timed("persist graph layout (1M nodes, k=10, 512 buckets)") {
      graft.operators.KnnGraphIndex.write(spark, s"$base/graph",
        pts.withColumn("gen", lit(0L)), scored, k = k, buildK = 2 * k,
        nEntries = 8, nBuckets = 512)
    }

    val qs = spark.range(64).select(
      (col("id") + 7L).as("qid"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => ((col("id") * lit(37) % lit(509))).cast("float")
          * when(d % 3 === 0, 1f).otherwise(-0.5f)).as("qvec"))
      .localCheckpoint(true)

    // persisted layout: entries from the built file, bucket-pruned hops
    timed("persisted serve 64 queries ef=64 (warm)") {
      graft.operators.KnnGraphIndex.search(spark, s"$base/graph", qs,
        k = k, ef = 64, maxHops = 12).count()
    }
    val persistedReads = recordsRead {
      val (_, _) = timed("persisted serve 64 queries ef=64") {
        graft.operators.KnnGraphIndex.search(spark, s"$base/graph", qs,
          k = k, ef = 64, maxHops = 12).count()
      }
    }
    println(s"SMOKE persisted-serve records read: $persistedReads " +
      s"(corpus $nRows; a full-scan-per-hop design reads >= hops x n)")

    // PQ-coded traversal tier — at 16 dims the vector column (64 B)
    // is SMALLER than the adjacency payload, so PQ cannot pay there
    // (measured: pq read 1.24x MORE bytes than plain at this dim);
    // the DiskANN trade exists for EMBEDDING dims, where the vector
    // dominates the node record. Own 1M x 128-dim corpus, same ring
    // adjacency, plain-vs-pq serve compared on bytes and wall.
    def bytesRead(body: => Unit): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong(0L)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            total.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
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
    val dimBig = 128
    val vecsBig = spark.range(nRows)
      .select(col("id"), (col("id") % nClusters).as("cell"))
      .withColumn("vec", transform(sequence(lit(0), lit(dimBig - 1)),
        d => (col("cell") * lit(37) % lit(509)).cast("float")
          * when(d % 3 === 0, 1f).otherwise(-0.5f)
          + (pmod(xxhash64(col("id"), d), lit(1000)) / lit(250.0))
            .cast("float")))
      .select(col("id"), col("vec"))
    timed("synthesize 1M x 128-dim vectors") {
      vecsBig.write.mode("overwrite").parquet(s"$base/vecs128")
    }
    val ptsBig = spark.read.parquet(s"$base/vecs128")
    val scoredBig = fwd
      .join(ptsBig, Seq("id"))
      .join(ptsBig.select(col("id").as("nbr"), col("vec").as("nvec")),
        Seq("nbr"))
      .select(col("id"), col("nbr"),
        graft.functions.l2_distance(col("vec"), col("nvec")).as("distance"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("distance"), col("nbr"))))
      .localCheckpoint(true)
    timed("persist 128-dim plain layout") {
      graft.operators.KnnGraphIndex.write(spark, s"$base/graph128",
        ptsBig.withColumn("gen", lit(0L)), scoredBig, k = k, buildK = 2 * k,
        nEntries = 8, nBuckets = 512)
    }
    timed("persist 128-dim PQ layout (pqM=16)") {
      graft.operators.KnnGraphIndex.write(spark, s"$base/graph128_pq",
        ptsBig.withColumn("gen", lit(0L)), scoredBig, k = k, buildK = 2 * k,
        nEntries = 8, nBuckets = 512, pqM = 16)
    }
    org.apache.spark.sql.graftshim.GraftShim
      .unpersistLocalCheckpoint(scoredBig)
    val qsBig = spark.range(64).select(
      (col("id") + 7L).as("qid"),
      transform(sequence(lit(0), lit(dimBig - 1)),
        d => ((col("id") * lit(37) % lit(509))).cast("float")
          * when(d % 3 === 0, 1f).otherwise(-0.5f)).as("qvec"))
      .localCheckpoint(true)
    def serveBig(root: String): Unit =
      graft.operators.KnnGraphIndex.search(spark, root, qsBig,
        k = k, ef = 64, maxHops = 12).count()
    serveBig(s"$base/graph128"); serveBig(s"$base/graph128_pq") // warm
    val plainBytes = bytesRead {
      timed("128-dim full-vector serve 64 queries") {
        serveBig(s"$base/graph128")
      }
    }
    val pqBytes = bytesRead {
      timed("128-dim PQ-coded serve 64 queries") {
        serveBig(s"$base/graph128_pq")
      }
    }
    println(s"SMOKE 128-dim serve bytes read: pq=$pqBytes plain=$plainBytes")

    // standalone operator on the same graph: pays the O(E) undirected
    // distinct + O(n) entry scan before the first hop — the round-12
    // perf-weak this layout closes
    val g = graft.operators.KnnGraphIndex.edges(spark, s"$base/graph")
    val standaloneReads = recordsRead {
      timed("standalone searchGraph same 64 queries") {
        graft.operators.KnnGraph.searchGraph(pts, g, qs, "qid", "qvec",
          k = k, ef = 64, nEntries = 8, maxHops = 12).count()
      }
    }
    println(s"SMOKE standalone-serve records read: $standaloneReads")

    // delete-repair: 200 dead nodes -> affected = their rev sets
    // (bucket-pruned), repaired by masked beam re-search
    val dead = spark.range(200).select((col("id") * 37L % nRows).as("id"))
    val repairReads = recordsRead {
      timed("deleteAndRepair 200 nodes (affected ~ rev sets)") {
        graft.operators.KnnGraphIndex.deleteAndRepair(spark,
          s"$base/graph", dead)
      }
    }
    println(s"SMOKE delete-repair records read: $repairReads")

    spark.stop()
  }
}
