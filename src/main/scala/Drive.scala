import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Scratch profiler: per-phase wall + job counts for the vs_ann_*
  * store lifecycle (delete before committing — see verify skill).
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = graft.GraftSession.local(32, "graft-profile")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def phase[T](name: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-28s ${dt}%8.3f s  jobs=${jobs.get() - j0}")
      r
    }

    def runLifecycle(tag: String): Unit = {
      println(s"=== lifecycle rep: $tag ===")
      val root = s"/tmp/profile_store_$tag"
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      val store = phase("openOrCreate") {
        graft.store.VectorStore.openOrCreate(s, root, 64,
          tombstoneDeletes = true)
      }
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 500)
      phase("insertDF") {
        store.insertDF(emb.orderBy("vec_id").coalesce(1)
          .select(col("embedding").as("vec")))
      }
      phase("buildAnnIndex") {
        store.buildAnnIndex(nCentroids = 8, iters = 2, seedRounds = 0)
      }
      phase("delete") { store.delete(Seq(0L, 5L, 10L, 15L, 20L)) }
      val v7 = phase("fetch v7") {
        emb.filter(col("vec_id") === 7)
          .select("embedding").head().getSeq[Float](0).toArray
      }
      phase("upsert") { store.upsert(Seq(3L), Seq(v7)) }
      val qs = emb.filter(col("vec_id").isin(2, 5, 7))
        .select(col("vec_id").cast("int").as("qid"),
          col("embedding").as("qvec"))
      phase("searchApproxDF+count") {
        store.searchApproxDF(qs, k = 5, nProbe = 8).count()
      }
      phase("buildAnnIndexSq") {
        store.buildAnnIndexSq(nCentroids = 8, iters = 1)
      }
      phase("search sq") {
        store.searchApproxDF(qs, k = 5, nProbe = 8, refine = 495).count()
      }
      phase("buildAnnIndexPq") {
        store.buildAnnIndexPq(nCells = 8, m = 4, k = 8, iters = 1)
      }
      phase("search pq") {
        store.searchApproxDF(qs, k = 5, nProbe = 8, refine = 495).count()
      }
    }
    // copy-cost probe: how fast is a driver-side dir copy of a built store?
    def copyProbe(): Unit = {
      val conf = s.sparkContext.hadoopConfiguration
      val src = new org.apache.hadoop.fs.Path("/tmp/profile_store_warm")
      val dst = new org.apache.hadoop.fs.Path("/tmp/profile_store_copy")
      val fs = src.getFileSystem(conf)
      if (fs.exists(dst)) fs.delete(dst, true)
      val t0 = System.nanoTime()
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
      println(f"PHASE dirCopy ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    runLifecycle("cold")
    runLifecycle("warm")
    copyProbe()
    s.stop()
  }
}
