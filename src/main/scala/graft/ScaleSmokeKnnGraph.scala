package graft

import org.apache.spark.sql.functions._

/** 100k-row scale smoke for the NN-Descent k-NN graph build (r11
  * verdict #6): wall per iteration, convergence behavior under the
  * update-count stop, and sampled recall against brute-force truth —
  * the numbers that say whether the equi-join shape would hold on a
  * real corpus (per-node state is bounded by buildK, proposals by
  * n·(2·buildK)², vectors travel only through two id joins per
  * iteration).
  *
  * Numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmokeKnnGraph" }}}
  */
object ScaleSmokeKnnGraph {
  def main(args: Array[String]): Unit = {
    val base = "/tmp/graft_scale_knng"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-knng")
    import spark.implicits._

    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE $label%-36s $s%8.2f s")
      (r, s)
    }

    // 100k 16-dim vectors in 256 clusters (locality present — the
    // workload NN-Descent exists for), deterministic hash noise
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
    val (_, wWrite) = timed("persist graph") {
      rep.graph.write.mode("overwrite").parquet(s"$base/graph")
    }
    val graph = spark.read.parquet(s"$base/graph")
    println(s"SMOKE graph edges: ${graph.count()}")

    // sampled recall: brute truth for 500 query nodes over all 100k
    val sample = pts.filter(pmod(xxhash64(col("id")), lit(200)) === 0)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    println(s"SMOKE sampled queries: ${sample.count()}")
    val truth = operators.SimilarityJoin.knnL2(
        pts.select(col("id").as("nbr"), col("vec")), "nbr", "vec",
        sample, "qid", "qvec", k + 1)
      .filter(col("qid") =!= col("nbr"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("distance"), col("nbr"))))
      .filter(col("rk") <= k)
      .select(col("qid").as("id"), col("nbr"))
    val (recall, _) = timed("sampled recall vs brute") {
      val hit = graph.join(truth, Seq("id", "nbr"), "left_semi").count()
      hit.toDouble / (truth.count().toDouble)
    }
    println(f"SMOKE sampled recall@$k: $recall%.4f")
    println(f"SMOKE wall ${wall + wWrite}%.1f s build+persist")
    spark.stop()
  }
}
