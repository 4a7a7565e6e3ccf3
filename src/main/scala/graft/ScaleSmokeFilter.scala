package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the round-11 compound-predicate dispatch: at 500k
  * store rows with a ~1 KB doc column, measure the conjunctive filter
  * `lang = en AND score ∈ [lo, hi]` on the SCAN route (one full-table
  * pass parsing every doc JSON twice) vs the SIDECAR route (two slim
  * pushed scans intersected by an id semi-join). The wall-time ratio at
  * smoke scale understates the structural win — the bytes ratio is
  * (doc column + table) : (two 3-column sidecars), which is what
  * survives the 1000× scale-up (the ScaleSmokeLex lesson).
  *
  * {{{ sbt "runMain graft.ScaleSmokeFilter" }}}
  */
object ScaleSmokeFilter {
  def main(args: Array[String]): Unit = {
    val base = "/tmp/graft_scale_filter"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-filter")

    def timed[A](label: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SMOKE $label%-40s $s%8.2f s")
      (r, s)
    }

    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = graft.store.VectorStore.openOrCreate(spark, s"$base/store",
      8, tombstoneDeletes = true)
    // 500k rows, ~1 KB doc payload each (the "real corpus" shape where
    // re-parsing the doc column per filter is the dominant cost)
    val n = 500000L
    // INCOMPRESSIBLE ~1 KB payload (30 chained md5 hexes per row): a
    // constant pad would dictionary-encode to nothing in parquet and
    // silently erase the byte cost the smoke exists to measure
    val pad = concat_ws("", (0 until 30).map(k =>
      md5(concat(col("id").cast("string"), lit(s"-$k")))): _*)
    timed("insert 500k rows (~1KB docs)") {
      store.insertDF(spark.range(n).select(
        transform(sequence(lit(0), lit(7)),
          d => (pmod(xxhash64(col("id"), d), lit(1000)) / lit(1000.0))
            .cast("float")).as("vec"),
        concat(lit("{\"lang\": \""),
          when(pmod(col("id"), lit(5)) === 0, "en").otherwise("xx"),
          lit("\", \"score\": "), pmod(col("id"), lit(100)).cast("string"),
          lit(", \"pad\": \""), pad, lit("\"}")).as("doc")))
    }
    import graft.store.{DocEquals, DocRange}
    val preds = Seq(
      DocEquals(Seq("lang"), Seq("en")),
      DocRange(Seq("score"), Some(20.0), Some(60.0)))
    def q(): Long = store.queryByDocAllDF(preds).count()
    val expect = q()
    println(s"SMOKE conjunction matches: $expect rows")
    def minOf3(label: String): Double =
      (0 until 3).map(_ => timed(label)(q())._2).min
    val tScan = minOf3("compound filter, scan route")
    timed("materialize both sidecars") {
      store.materializeDocField(Seq("lang"))
      store.materializeDocFieldNumeric(Seq("score"))
    }
    assert(q() == expect, "sidecar route must return identical rows")
    val tIdx = minOf3("compound filter, sidecar route")
    println(f"SMOKE compound dispatch speedup: ${tScan / tIdx}%.2fx " +
      "(bytes ratio is the scale story: full ~1KB-doc table scan vs " +
      "two 3-column sidecars)")
    // ids-only shape (the deleteWhereAll / aggregation input): no row
    // materialization diluting the filter cost — the table is touched
    // only for its 8-byte id column, so the doc parse IS the delta
    def qStats(): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = store.docFieldHistogramDF(Seq("lang")).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val tHistIdx = (0 until 3).map(_ => qStats()._2).min
    store.dropDocField(Seq("lang"))
    store.dropDocFieldNumeric(Seq("score"))
    val tHistScan = (0 until 3).map(_ => qStats()._2).min
    println(f"SMOKE histogram (ids-only shape): scan ${tHistScan}%.2f s vs " +
      f"sidecar ${tHistIdx}%.2f s = ${tHistScan / tHistIdx}%.2fx")
    spark.stop()
  }
}
