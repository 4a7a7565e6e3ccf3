package graft

import org.apache.spark.sql.functions._

/** Delete-repair on a REAL converged NN-Descent graph (100k rows, the
  * ScaleSmokeKnnGraph fixture) — the ring-adjacency 1M smoke measures
  * repair under an ADVERSARIAL layout (edges uncorrelated with
  * distance, so beams percolate instead of descending a gradient);
  * this one measures the realistic case: a converged graph whose
  * locally-seeded repair beams should stop in a handful of hops.
  * Run with GRAFT_KNNGRAPH_DEBUG=1 to see the hop trace.
  *
  * Numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmokeGraphRepair" }}}
  */
object ScaleSmokeGraphRepair {
  def main(args: Array[String]): Unit = {
    val base = "/tmp/graft_scale_grepair"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-grepair")

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

    // the ScaleSmokeKnnGraph corpus: 100k 16-dim in 256 clusters
    val nRows = 100000L
    val nClusters = 256
    val dim = 16
    val vecs = spark.range(nRows)
      .select(col("id"), (col("id") % nClusters).as("cell"))
      .withColumn("vec", transform(sequence(lit(0), lit(dim - 1)),
        d => (col("cell") * lit(37) % lit(509)).cast("float")
          * when(d % 3 === 0, 1f).otherwise(-0.5f)
          + (pmod(xxhash64(col("id"), d), lit(1000)) / lit(250.0))
            .cast("float")))
      .select(col("id"), col("vec"))
    timed("synthesize 100k clustered vectors") {
      vecs.write.mode("overwrite").parquet(s"$base/vecs")
    }
    val pts = spark.read.parquet(s"$base/vecs")

    val k = 10
    val (rep, wall) = timed(s"nnDescent k=$k buildK=32 @ 100k") {
      operators.KnnGraph.nnDescent(pts, "id", "vec", k = k,
        maxIters = 15, buildK = 32)
    }
    println(s"SMOKE converged=${rep.converged} iterations=${rep.iterations} " +
      f"(${wall / rep.iterations}%.2f s/iter)")
    timed("persist layout (128 buckets)") {
      operators.KnnGraphIndex.write(spark, s"$base/graph",
        pts.withColumn("gen", lit(0L)), rep.graph, k = k, buildK = 32,
        nEntries = 8, nBuckets = 128)
    }
    org.apache.spark.sql.graftshim.GraftShim
      .unpersistLocalCheckpoint(rep.graph)

    val dead = spark.range(200).select((col("id") * 37L % nRows).as("id"))
    val reads = recordsRead {
      timed("deleteAndRepair 200 nodes (real converged graph)") {
        operators.KnnGraphIndex.deleteAndRepair(spark, s"$base/graph", dead)
      }
    }
    println(s"SMOKE real-graph repair records read: $reads (corpus $nRows)")
    spark.stop()
  }
}
