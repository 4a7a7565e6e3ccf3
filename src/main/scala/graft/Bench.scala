package graft

import java.util.Locale

/** Per-round benchmark: runs every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and prints ONE JSON line.
  *
  * Timing = full query execution to a count() action (result
  * materialization without driver-side collect). One untimed JVM/codegen
  * warm-up block precedes the timed loop.
  *
  * Isolation: queries share one JVM, so without care a heavy query
  * poisons the heap for everything after it (r2 showed unchanged
  * queries regressing 3-9x from GC churn alone). Between timed queries
  * we clear the SQL cache and give the collector a breather; each query
  * reports the min of `SPARK_GRAFT_BENCH_REPS` (default 3) runs so a
  * one-off GC pause or a burst of background machine load doesn't
  * masquerade as a plan regression (two reps proved too few: identical
  * code drifted 1.3-1.5x between same-day runs on sub-second queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = GraftSession.local(cpus, "graft-bench")

    // warm-up: JVM + codegen + parquet footer caches (untimed). The
    // array-kernel path (intersect/minhash) pays ~4 s of one-time C2
    // JIT — warm it here so the first array-heavy TIMED query (the
    // alphabetical accident of the round) measures steady-state work
    // rather than absorbing the JIT for every later query.
    SparkEntry.queries("q1_agg")(spark, sfDir).count()
    SparkEntry.queries("vs_knn")(spark, sfDir).count()
    SparkEntry.queries("dd_minhash_lsh")(spark, sfDir).count()
    SparkEntry.queries("ann_lsh_topk")(spark, sfDir).count()

    def jnum(v: Double): String = String.format(Locale.ROOT, "%.3f", Double.box(v))

    // SPARK_GRAFT_BENCH_ONLY: comma-separated query names — the local
    // flagged-arm adjudication loop (min-of-5 over a handful of
    // queries) shouldn't pay for the full battery. The driver never
    // sets it, so per-round records always cover every query.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // min over successful reps; stop repeating after a failure (a
      // deterministic failure would just fail `reps` times over), and
      // report -1 only when NO rep succeeded
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var failed = false
      var r = 0
      while (r < reps && !failed) {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); times += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); failed = true
        }
        r += 1
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val json =
      s"""{"metric":"total_sec","value":${jnum(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The driver's capture truncates around ~2 KB, which has cut the
    // ~4 KB named per-query map mid-JSON three rounds running (only 91
    // of 181 entries survived in r5/r6). A 181-entry map with full
    // names cannot fit under that cap, so ALSO emit a compact line
    // (~1 KB) that always survives whole: integer milliseconds in
    // sorted-query-name order (the names are deterministic — the
    // sorted key set of SparkEntry.queries, identical to the
    // CORRECTNESS artifact's key set). Print it FIRST and LAST so it
    // survives whichever end the capture truncates from; the full
    // named map still goes to stdout and bench.json for humans.
    val compact = {
      val ms = results.map { case (_, v) =>
        if (v < 0) "-1" else math.round(v * 1000).toString }
      s"""{"metric":"total_sec","value":${jnum(total)},"unit":"sec","sf":"$sfDir","n_queries":${results.size},"queries_ms_by_sorted_name":[${ms.mkString(",")}]}"""
    }
    println(compact)
    println(json)
    println(compact)
    // Belt-and-braces: also drop the line in a file where the driver
    // (and humans) can always find it, whatever the log decoration.
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json"))
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
