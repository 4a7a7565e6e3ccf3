package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.VectorStore

/** Posting-list (BM25) index: indexed route ranks identically to the
  * one-pass scan route through the full store lifecycle, appends are
  * O(batch), and query plans never read the corpus text.
  */
class LexIndexSpec extends SparkSuite {
  import spark.implicits._

  private def mkStore(tag: String, tombstones: Boolean = true): VectorStore = {
    val root = Files.createTempDirectory(s"graft-lx-$tag").toString + "/s"
    VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = tombstones)
  }

  private def vec(seed: Int): Array[Float] =
    Array(seed.toFloat, (seed % 3).toFloat, 1f, 0f)

  // docs with VARYING lengths and term overlaps so BM25's dl norm and
  // idf actually discriminate (not an integer-rank fixture)
  private def docText(i: Int): String = {
    val words = Seq.fill(i % 4 + 1)(s"w${i % 5}") ++
      Seq("common", s"rare${i % 11}") ++ Seq.fill(i % 3)("pad")
    s"""{"t": "${words.mkString(" ")}"}"""
  }

  private def seed(store: VectorStore, n: Int): Unit =
    store.insert((0 until n).map(vec), (0 until n).map(docText))

  private val queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("w1", "common"),
    1L -> Seq("rare3"),
    2L -> Seq("w2", "pad", "rare7"))

  private def ranked(df: org.apache.spark.sql.DataFrame) =
    df.select($"qid", $"id", $"bm25", $"rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq

  test("indexed route ≡ scan route through insert/delete/upsert/compact") {
    val store = mkStore("par")
    seed(store, 40)
    val scanRoute = ranked(store.searchLexDF(queries, k = 7))
    assert(scanRoute.nonEmpty)
    store.buildLexIndex()
    assert(store.hasLexIndex)
    assert(ranked(store.searchLexDF(queries, k = 7)) == scanRoute,
      "indexed route must rank identically to the scan route")

    // post-build insert: O(batch) append keeps stats exact
    store.insert(Seq(vec(100), vec(101)), Seq(docText(41), docText(42)))
    val s1 = ranked(store.searchLexDF(queries, k = 7))
    store.dropLexIndex()
    val scan1 = ranked(store.searchLexDF(queries, k = 7))
    assert(s1 == scan1, "stats must be exact after append")
    store.buildLexIndex()

    // delete: df/N/avgdl all shrink; masked index must agree with scan
    val victims = store.searchLexDF(queries, k = 1)
      .select($"id").as[Long].collect().distinct.take(2).toSeq
    store.delete(victims)
    val s2 = ranked(store.searchLexDF(queries, k = 7))
    store.dropLexIndex()
    val scan2 = ranked(store.searchLexDF(queries, k = 7))
    assert(s2 == scan2, "masked index must agree with scan after delete")
    store.buildLexIndex()

    // upsert with changed text under a reused id
    val target = store.searchLexDF(Seq(0L -> Seq("common")), k = 1)
      .select($"id").as[Long].head()
    store.upsert(Seq(target), Seq(vec(9)), Seq("""{"t": "entirely different"}"""))
    val s3 = ranked(store.searchLexDF(queries, k = 7))
    assert(!s3.exists(_._2 == target) ||
      !store.searchLexDF(Seq(0L -> Seq("common")), k = 40)
        .select($"id").as[Long].collect().contains(target),
      "stale postings matched after upsert")
    store.dropLexIndex()
    assert(ranked(store.searchLexDF(queries, k = 7)) == s3)
    store.buildLexIndex()

    // compact folds tombstones: rebuilt index still agrees
    store.compact()
    val s4 = ranked(store.searchLexDF(queries, k = 7))
    store.dropLexIndex()
    assert(ranked(store.searchLexDF(queries, k = 7)) == s4)
  }

  test("append is O(batch): posting files grow, none rewritten") {
    val store = mkStore("app")
    seed(store, 30)
    store.buildLexIndex()
    val root = new org.apache.hadoop.fs.Path(store.path, "lex/postings")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files() = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        b += f.getPath.toString -> f.getLen
      }
      b.result().toMap
    }
    val before = files()
    store.insert(Seq(vec(1)), Seq(docText(77)))
    val after = files()
    assert(before.forall { case (name, len) => after.get(name).contains(len) },
      "existing posting files must not be rewritten by an append")
    assert(after.size > before.size, "append must add posting files")
  }

  test("query plan reads postings, not the corpus text") {
    val store = mkStore("plan")
    seed(store, 25)
    store.buildLexIndex()
    val plan = store.searchLexDF(queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("lex/postings"),
      s"indexed route must scan the posting table:\n$plan")
    assert(!plan.contains("/s/data"),
      s"indexed route must not scan the corpus data files:\n$plan")
    assert(plan.contains("PushedFilters: [In(term") || plan.contains("In(term,"),
      s"query terms must be pushed into the posting scan:\n$plan")
    assert(plan.contains("PartitionFilters: [") && plan.contains("bucket"),
      s"term-hash buckets must prune posting partitions at listing time:\n$plan")
    // hybrid search composes the indexed lexical side
    val emb = (0 until 25).map(i => vec(i))
    val hybrid = store.searchHybrid(Seq(emb(3)), Seq("w1 common"), k = 3,
      shortlist = 10)
    assert(hybrid.count() > 0)
  }

  test("lexIndexStats: dead accounting after delete, file growth after append") {
    val store = mkStore("stats")
    seed(store, 20)
    store.buildLexIndex()
    val s0 = store.lexIndexStats()
    assert(s0.nDocs == 20 && s0.nDeadDocs == 0 && s0.nDeadPostings == 0)
    assert(s0.nPostingRows > 0 && s0.nDistinctTerms > 0)
    assert(s0.avgdl > 0.0 && s0.nBuckets == 16 && s0.nFiles > 0)
    store.delete(Seq(0L, 1L))
    val s1 = store.lexIndexStats()
    assert(s1.nDocs == 18 && s1.nDeadDocs == 2)
    assert(s1.nDeadPostings > 0 && s1.deadPostingFraction > 0.0)
    store.insert(Seq(vec(5)), Seq(docText(9)))
    val s2 = store.lexIndexStats()
    assert(s2.nDocs == 19)
    assert(s2.nFiles > s1.nFiles, "append must add posting files (rebuild is the compaction)")
  }

  test("filtered search restricts postings AND statistics") {
    val store = mkStore("filt")
    // two sources; equal text per id parity so the filter is the only difference
    store.insert((0 until 20).map(vec),
      (0 until 20).map(i =>
        s"""{"t": "${docText(i).split("\"")(3)}", "src": "${if (i % 2 == 0) "a" else "b"}"}"""))
    store.buildLexIndex()
    val idx = ranked(graft.operators.LexIndex.search(spark,
      storeLexRoot(store), queries, 5,
      idFilter = Some(store.queryByDocDF(Seq("src"), Seq("a")).select($"id"))))
    store.dropLexIndex()
    // scan route over the sub-corpus only
    val sub = store.queryByDocDF(Seq("src"), Seq("a")).select($"id", $"doc")
    val scan = ranked(graft.operators.Bm25.topKBatch(sub, "id", "doc", queries, 5))
    assert(idx == scan, "filtered stats must match the sub-corpus fit")
  }

  test("rebuild with a different bucket count: marker-last protocol, no stale pruning") {
    val root = Files.createTempDirectory("graft-lx-rebkt").toString + "/lex"
    val docs = (0 until 25).map(i => (i.toLong, docText(i), 0L))
      .toDF("id", "doc", "gen")
    graft.operators.LexIndex.build(spark, root, docs, "id", "doc", "gen",
      buckets = 4)
    val base = ranked(graft.operators.LexIndex.search(spark, root, queries, 5))
    assert(base.nonEmpty)
    // rebuild with a different partition count: results identical
    graft.operators.LexIndex.build(spark, root, docs, "id", "doc", "gen",
      buckets = 7)
    assert(graft.operators.LexIndex.buckets(spark, root) == 7)
    assert(ranked(graft.operators.LexIndex.search(spark, root, queries, 5)) == base)
    // the crash window the protocol guarantees: marker retracted, new
    // bucketed postings in place. Search must fall back to the unpruned
    // scan and still return EXACTLY the same rankings — never map terms
    // with a stale count against the new directory layout.
    val mp = new org.apache.hadoop.fs.Path(root, "nbuckets")
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(mp, false)
    assert(graft.operators.LexIndex.buckets(spark, root) == 0)
    assert(ranked(graft.operators.LexIndex.search(spark, root, queries, 5)) == base,
      "marker-less window must degrade to an unpruned but correct scan")
  }

  test("compound-filtered lexical search: stats fit on the conjunction sub-corpus") {
    import graft.store.{DocEquals, DocNotEquals}
    val store = mkStore("lexmulti")
    store.insert((0 until 30).map(vec),
      (0 until 30).map { i =>
        val words = docText(i).split("\"")(3)
        s"""{"t": "$words", "src": "${if (i % 2 == 0) "a" else "b"}", "q": "${i % 5}"}"""
      })
    val preds = Seq(
      DocEquals(Seq("src"), Seq("a")),
      DocNotEquals(Seq("q"), Seq("0")))
    def ranked2(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"id", $"bm25", $"rank")
        .as[(Long, Long, Double, Int)].collect()
        .sortBy(r => (r._1, r._4)).toSeq
    // scan route over the conjunction sub-corpus is the truth
    val sub = store.queryByDocAllDF(preds).select($"id", $"doc")
    val truth = ranked2(graft.operators.Bm25.topKBatch(sub, "id", "doc",
      queries, 5))
    assert(truth.nonEmpty)
    assert(ranked2(store.searchLexAllDF(queries, 5, preds)) == truth,
      "scan dispatch must fit on the sub-corpus")
    // posting index + sidecar dispatch: identical ranking
    store.buildLexIndex()
    store.materializeDocField(Seq("src"))
    store.materializeDocField(Seq("q"))
    assert(ranked2(store.searchLexAllDF(queries, 5, preds)) == truth,
      "indexed dispatch must fit on the sub-corpus")
    // survivors only: every hit satisfies the conjunction
    val hits = store.searchLexAllDF(queries, 5, preds)
      .select($"id").as[Long].collect().toSet
    assert(hits.forall(id => id % 2 == 0 && id % 5 != 0), s"$hits")
  }

  private def storeLexRoot(store: VectorStore): String =
    new org.apache.hadoop.fs.Path(store.path, "lex").toString
}
