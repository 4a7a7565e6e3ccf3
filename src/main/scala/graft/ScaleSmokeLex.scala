package graft

import org.apache.spark.sql.functions._

/** Round-10 scale smoke for the store's posting-list (BM25) index:
  * quantifies what the index buys over the scan route at 100k docs —
  * the scan route re-tokenizes the corpus per query batch, the indexed
  * route reads only the queried terms' postings. Same replicated
  * corpus recipe as [[ScaleSmokeQuant]]; numbers land in SCALE.md.
  *
  * {{{ sbt "runMain graft.ScaleSmokeLex" }}}
  */
object ScaleSmokeLex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val base = "/tmp/graft_scale_smoke_lex"
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-scale-smoke-lex")

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SMOKE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val reps = 20
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val big = docs.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        concat(lit("{\"t\": \""),
          regexp_replace(col("text"), "[\"\\\\]", " "),
          lit(" rep"), col("rep").cast("string"), lit("\"}")).as("doc"))
    val root = s"$base/store"
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val store = graft.store.VectorStore.openOrCreate(spark, root, 4,
      tombstoneDeletes = true)
    timed("store insert 100k docs") {
      store.insertDF(big.select(
        array(lit(0f), lit(1f), lit(2f), lit(3f)).as("vec"), col("doc")))
    }

    // 100-query batch over the corpus' (hub-skewed, ~31-word) vocab —
    // the WORST case for a posting index: every term's posting list is
    // ~N rows, so nothing prunes and the win is purely "read postings
    // instead of tokenizing text"
    val vocab = Seq("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "small", "join", "filter",
      "big", "group", "hash", "customer", "sort", "order", "slow",
      "line", "part", "fast", "row", "agg", "key")
    val queries: Seq[(Long, Seq[String])] = (0 until 100).map { i =>
      i.toLong -> Seq(vocab(i % vocab.size), vocab((i + 7) % vocab.size),
        vocab((i + 13) % vocab.size))
    }

    timed("scan route: 100-q BM25 batch (tokenize corpus)") {
      println(s"SMOKE   rows: ${store.searchLexDF(queries, 10).count()}")
    }
    timed("buildLexIndex 100k") { store.buildLexIndex() }
    val post = spark.read.parquet(s"$root/lex/postings")
    println(s"SMOKE posting rows: ${post.count()}")
    timed("indexed route: 100-q BM25 batch (cold)") {
      println(s"SMOKE   rows: ${store.searchLexDF(queries, 10).count()}")
    }
    timed("indexed route: 100-q BM25 batch (repeat)") {
      println(s"SMOKE   rows: ${store.searchLexDF(queries, 10).count()}")
    }
    timed("O(batch) append: 500-doc insert with live index") {
      store.insertDF(docs.limit(500).select(
        array(lit(0f), lit(1f), lit(2f), lit(3f)).as("vec"),
        concat(lit("{\"t\": \""),
          regexp_replace(col("text"), "[\"\\\\]", " "), lit("\"}")).as("doc")))
    }
    timed("indexed route after append (stats current)") {
      println(s"SMOKE   rows: ${store.searchLexDF(queries, 10).count()}")
    }

    // ---- doc-field sidecar at 100k: JSON parse vs pushed scan ------
    val root2 = s"$base/store_dx"
    val p2 = new org.apache.hadoop.fs.Path(root2)
    if (fs.exists(p2)) fs.delete(p2, true)
    val store2 = graft.store.VectorStore.openOrCreate(spark, root2, 4,
      tombstoneDeletes = true)
    timed("docidx store insert 100k") {
      store2.insertDF(big.select(
        array(lit(0f), lit(1f), lit(2f), lit(3f)).as("vec"),
        concat(lit("{\"src\": \"s"), (col("doc_id") % 97).cast("string"),
          lit("\", \"blob\": \""),
          regexp_replace(col("doc"), "[\"\\\\]", " "),
          lit("\"}")).as("doc")))
    }
    timed("queryByDoc scan route x5 (JSON parse per query)") {
      (0 until 5).foreach { i =>
        store2.queryByDocDF(Seq("src"), Seq(s"s${i * 7}")).count()
      }
    }
    timed("materializeDocField 100k") {
      store2.materializeDocField(Seq("src"))
    }
    timed("queryByDoc indexed route x5 (pushed sidecar scan)") {
      (0 until 5).foreach { i =>
        store2.queryByDocDF(Seq("src"), Seq(s"s${i * 7}")).count()
      }
    }

    // ---- zipfian-vocab tier (r14 verdict #7): the 31-word corpus
    // above is the posting index's documented WORST case (every
    // posting spans every page, nothing prunes). This tier is the
    // regime the index EXISTS for: 100k docs over a ~5000-term
    // log-uniform (zipf-like) vocabulary, queries weighted toward the
    // tail — queried postings are a sliver of the corpus, and the
    // one-term-sorted-file-per-bucket layout turns the pushed term
    // IN-list into page pruning with most pages skipped.
    val root4 = s"$base/store_zipf"
    val p4 = new org.apache.hadoop.fs.Path(root4)
    if (fs.exists(p4)) fs.delete(p4, true)
    val store4 = graft.store.VectorStore.openOrCreate(spark, root4, 4,
      tombstoneDeletes = true)
    val vocabN = 5000
    // deterministic zipf-ish draw per (doc, slot): u ~ U(0,1) from the
    // hash, rank = floor(exp(u·ln V)) → P(rank) ∝ 1/rank (log-uniform)
    def zterm(slot: Int) = concat(lit("z"),
      floor(exp((pmod(xxhash64(col("doc_id"), lit(slot)), lit(100000))
        / lit(100000.0)) * lit(math.log(vocabN.toDouble)))).cast("long")
        .cast("string"))
    timed("zipf store insert 100k docs (8 terms each, V=5000)") {
      store4.insertDF(big.select(col("doc_id")).select(
        array(lit(0f), lit(1f), lit(2f), lit(3f)).as("vec"),
        concat(lit("{\"t\": \""),
          concat_ws(" ", (0 until 8).map(zterm): _*),
          lit("\"}")).as("doc")))
    }
    // 100 queries, 3 terms each, skewed to the TAIL (the selective
    // regime): ranks ~ 500 + 37·i cover z500..z4200
    val zQueries: Seq[(Long, Seq[String])] = (0 until 100).map { i =>
      i.toLong -> Seq(s"z${500 + 37 * i}", s"z${40 + i}", s"z${1000 + 31 * i}")
    }
    timed("zipf scan route: 100-q BM25 batch (tokenize corpus)") {
      println(s"SMOKE   rows: ${store4.searchLexDF(zQueries, 10).count()}")
    }
    timed("zipf buildLexIndex 100k") { store4.buildLexIndex() }
    val zpost = spark.read.parquet(s"$root4/lex/postings")
    println(s"SMOKE zipf posting rows: ${zpost.count()}")
    timed("zipf indexed route: 100-q BM25 batch (cold)") {
      println(s"SMOKE   rows: ${store4.searchLexDF(zQueries, 10).count()}")
    }
    timed("zipf indexed route: 100-q BM25 batch (repeat)") {
      println(s"SMOKE   rows: ${store4.searchLexDF(zQueries, 10).count()}")
    }
    spark.stop()
  }
}
