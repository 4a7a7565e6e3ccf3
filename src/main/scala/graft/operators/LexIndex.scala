package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted (posting-list) index for BM25 retrieval — the
  * lexical twin of the IVF vector index: built once O(corpus), appended
  * O(batch) on every insert, masked by the store's tombstone generation
  * on deletes, and searched WITHOUT touching the corpus text.
  *
  * Why it exists: [[Bm25.topKBatch]] re-tokenizes and re-fits corpus
  * statistics on EVERY query batch — one full text scan per search,
  * the wrong cost model at 100 TB where the corpus is petabytes but a
  * query touches a handful of terms. With the index, a query batch
  * reads (a) the posting rows of ITS OWN terms — a predicate-pushed
  * scan of a slim (term, id, tf, dl) table, so parquet row-group
  * pruning on the sorted term column skips everything else — and
  * (b) one aggregate over the (id, dl) doc-length table for N/avgdl.
  * Statistics (per-term df, N, avgdl) are therefore EXACT and current
  * under ingest; scoring reuses [[Bm25.scorePairs]] verbatim, so the
  * indexed route ranks identically to the scan route (spec-pinned).
  *
  * Layout under `root`:
  *   - `postings/`: (term, id, tf, dl, <genCol>) — one row per
  *     distinct (doc, term), written sorted by term within each batch
  *     so min/max row-group stats prune unqueried terms.
  *   - `doclens/`:  (id, dl, <genCol>) — one row per doc (zero-token
  *     and NULL-text docs included at dl = 0: they count toward N and
  *     avgdl exactly as the scan route counts them).
  */
object LexIndex {

  def postingsPath(root: String): String = new Path(root, "postings").toString
  def doclensPath(root: String): String = new Path(root, "doclens").toString

  /** Number of term-hash partitions of the posting table. Postings are
    * written `PARTITIONED BY (bucket = pmod(xxhash64(term), n))`, so a
    * query's terms resolve to a handful of partition DIRECTORIES and
    * the scan skips every other one at file-listing time — the
    * guarantee row-group min/max stats only give probabilistically.
    * Persisted beside the postings so append and search always agree
    * with the build.
    */
  private def bucketsPath(root: String) = new Path(root, "nbuckets")

  /** The persisted partition count (0 = legacy unbucketed layout). */
  def buckets(spark: SparkSession, root: String): Int =
    readBuckets(spark, root)

  private def readBuckets(spark: SparkSession, root: String): Int = {
    val p = bucketsPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close()
    }
  }

  private def writeBuckets(spark: SparkSession, root: String, n: Int): Unit = {
    val p = bucketsPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  // Exact posting-table data-file count, maintained by append-side
  // bookkeeping: the build lists its own output ONCE (noise next to
  // the O(corpus) build), every append stages its files and counts
  // them as it moves them in (O(batch files) metadata), so the store's
  // file-count maintenance trigger never walks the index's listing per
  // micro-batch. Legacy layouts without the marker pay one listing on
  // first read.
  private def nfilesPath(root: String) = new Path(root, "nfiles")

  /** Current parquet file count of the posting table (bookkept). */
  def fileCount(spark: SparkSession, root: String): Long = {
    val p = nfilesPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
    } else {
      val n = listPostingFiles(spark, root)
      writeNfiles(spark, root, n)
      n
    }
  }

  private def listPostingFiles(spark: SparkSession, root: String): Long = {
    val pp = new Path(postingsPath(root))
    val fs = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(pp)) 0L
    else {
      var n = 0L
      val it = fs.listFiles(pp, true)
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
  }

  private def writeNfiles(spark: SparkSession, root: String, n: Long): Unit = {
    val p = nfilesPath(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  private def bucketOf(term: Column, n: Int): Column =
    pmod(xxhash64(term), lit(n.toLong))

  /** Partition buckets of the given terms — one tiny local job (the
    * hash must be Spark's own xxhash64, so it is evaluated by Spark,
    * not re-implemented on the driver).
    */
  private def termBuckets(spark: SparkSession, terms: Seq[String],
      n: Int): Seq[Long] = {
    import spark.implicits._
    terms.toDF("term").select(bucketOf(col("term"), n))
      .collect().map(_.getLong(0)).distinct.toSeq
  }

  def exists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(postingsPath(root))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def drop(spark: SparkSession, root: String): Unit = {
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** The per-batch (or full-build) index rows for `docs`, which must
    * carry `genCol`. One tokenization pass; postings are the sparse
    * (doc, term) aggregation of the exploded token stream.
    */
  private def indexRows(docs: DataFrame, idCol: String, textCol: String,
      genCol: String): (DataFrame, DataFrame) = {
    val toks = docs.select(col(idCol).cast("long").as("id"), col(genCol),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
      .withColumn("dl", coalesce(size(col("_toks")), lit(0)))
    val doclens = toks.select(col("id"), col("dl"), col(genCol))
    val postings = toks
      .select(col("id"), col("dl"), col(genCol), explode(col("_toks")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("int").as("tf"),
        first(col("dl")).as("dl"), first(col(genCol)).as(genCol))
      .select(col("term"), col("id"), col("tf"), col("dl"), col(genCol))
      .sortWithinPartitions(col("term"))
    (postings, doclens)
  }

  /** Full build (overwrite): one pass over the live corpus.
    * `buckets >= 1` partitions the postings by term hash (see
    * [[bucketsPath]]); the bucket count is persisted so appends and
    * searches stay consistent.
    */
  def build(spark: SparkSession, root: String, docs: DataFrame,
      idCol: String, textCol: String, genCol: String,
      buckets: Int = 16): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    // Marker-last rebuild protocol: RETRACT the bucket marker before
    // touching the postings, restore it only after both tables are
    // fully written. A crash (or a concurrent reader) mid-rebuild then
    // sees "no marker" = legacy-unbucketed, and search degrades to the
    // unpruned-but-CORRECT full posting scan — never a stale bucket
    // count mapping query terms to the wrong partition directories of a
    // new layout (which silently drops matching postings).
    val mp = bucketsPath(root)
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(mp)) fs.delete(mp, false)
    val (postings, doclens) = indexRows(docs, idCol, textCol, genCol)
    // one TERM-SORTED file per bucket: searches push the query terms
    // as an IN-list into the scan, so sorted postings let parquet's
    // row-group/page statistics prune within the bucket — and a
    // q-term lookup pays one footer per touched bucket instead of one
    // per shuffle task that held rows of it
    // the postings and doc-length tables are independent writes over
    // the same (lazily shared) tokenize pass — overlap them (§2.6):
    // the doclens job back-fills executors the postings shuffle's tail
    // leaves idle
    val doclensJob = scala.concurrent.Future(
      doclens.write.mode("overwrite").parquet(doclensPath(root)))(
      scala.concurrent.ExecutionContext.global)
    postings.withColumn("bucket", bucketOf(col("term"), buckets))
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("term"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(postingsPath(root))
    scala.concurrent.Await.result(doclensJob,
      scala.concurrent.duration.Duration.Inf)
    writeBuckets(spark, root, buckets)
    // reset the file-count bookkeeping from the rebuilt layout, and
    // clear crash debris from any append that died mid-stage
    val rootP = new Path(root)
    val rootFs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    rootFs.listStatus(rootP).map(_.getPath)
      .filter(_.getName.startsWith("_postings-append-"))
      .foreach(p => try rootFs.delete(p, true)
        catch { case _: java.io.IOException => })
    writeNfiles(spark, root, listPostingFiles(spark, root))
  }

  /** O(batch) append — the insert-path hook. Postings are staged then
    * moved into their bucket partitions so the file-count bookkeeping
    * stays EXACT without listing the index (same visibility contract
    * as a plain append-mode write: a crash mid-append loses the batch
    * from the sidecar either way, and the next rebuild re-lists).
    */
  def append(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String, textCol: String, genCol: String): Unit = {
    val buckets = readBuckets(spark, root)
    require(buckets >= 1, s"no bucket marker under $root — build first")
    val (postings, doclens) = indexRows(batch, idCol, textCol, genCol)
    val pp = new Path(postingsPath(root))
    val fs = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(root,
      s"_postings-append-${java.util.UUID.randomUUID()}")
    // overlap the two independent per-batch writes (§2.6) — on the
    // streaming ingest path this is one of the micro-batch's fixed
    // driver round trips
    val doclensJob = scala.concurrent.Future(
      doclens.write.mode("append").parquet(doclensPath(root)))(
      scala.concurrent.ExecutionContext.global)
    postings.withColumn("bucket", bucketOf(col("term"), buckets))
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("term"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(staging.toString)
    scala.concurrent.Await.result(doclensJob,
      scala.concurrent.duration.Duration.Inf)
    var added = 0L
    fs.listStatus(staging).map(_.getPath)
      .filter(_.getName.startsWith("bucket=")).foreach { d =>
        val dest = new Path(pp, d.getName)
        if (!fs.exists(dest)) fs.mkdirs(dest)
        fs.listStatus(d).map(_.getPath).foreach { f =>
          if (f.getName.endsWith(".parquet")) added += 1
          // Hadoop rename signals failure by RETURNING false — an
          // unchecked call would silently drop the posting file while
          // `added` still counts it (queries then silently miss the
          // batch); throw like writeBuildMeta's activation rename
          if (!fs.rename(f, new Path(dest, f.getName)))
            throw new java.io.IOException(
              s"lex append: could not move $f into $dest")
        }
      }
    fs.delete(staging, true)
    if (added > 0L) writeNfiles(spark, root, fileCount(spark, root) + added)
  }

  /** Batched BM25 top-k from the index — no corpus text is read.
    *
    * `mask` is the store's tombstone-generation mask (applied to both
    * posting and doc-length rows, so deleted docs neither score nor
    * count toward the statistics); `idFilter` optionally restricts
    * retrieval AND statistics to a live id subset (the filtered-search
    * composition: "wiki-relative relevance", same contract as the scan
    * route fitting on the matching sub-corpus).
    *
    * Ranking is exactly [[Bm25.topKBatch]]'s: rounded score desc, id
    * asc, positive scores only. Returns (qid, id, bm25, rank).
    */
  def search(spark: SparkSession, root: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      mask: DataFrame => DataFrame = identity,
      idFilter: Option[DataFrame] = None,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(queries.nonEmpty, "need at least one query")
    require(queries.map(_._1).distinct.size == queries.size,
      s"duplicate qids in ${queries.map(_._1)}")
    import spark.implicits._
    val normQ = queries.map { case (qid, ts) =>
      qid -> Bm25.lowercasedDistinct(ts)
    }
    val allTerms = normQ.flatMap(_._2).distinct
    val restrict = (df: DataFrame) =>
      idFilter.fold(df)(ids =>
        df.join(broadcast(ids.select(col("id"))), Seq("id"), "left_semi"))
    // stats: N and avgdl over the (masked, filtered) doc-length table —
    // one aggregate row; df per query term from the pruned posting scan
    val dls = restrict(mask(spark.read.parquet(doclensPath(root))))
    val nBuckets = readBuckets(spark, root)
    val qBuckets = if (nBuckets >= 1)
      termBuckets(spark, allTerms, nBuckets) else Seq.empty
    val postRaw = spark.read.parquet(postingsPath(root))
    val postPruned = if (nBuckets >= 1)
      // partition-directory pruning: only the query terms' buckets are
      // even LISTED, before the row-level term filter applies
      postRaw.filter(col("bucket").isin(qBuckets: _*))
    else postRaw
    val post = restrict(mask(postPruned))
      .filter(col("term").isin(allTerms: _*)) // pushed into the scan
    // the two preparatory driver actions read independent tables
    // (doc lengths vs pruned postings) — overlap them (§2.6) instead
    // of paying two serial round trips per search
    val statsJob = scala.concurrent.Future(
      dls.agg(count(lit(1)), avg(col("dl"))).head())(
      scala.concurrent.ExecutionContext.global)
    val dfByTerm = post.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val statsRow = scala.concurrent.Await.result(statsJob,
      scala.concurrent.duration.Duration.Inf)
    val n = statsRow.getLong(0)
    val empty = Seq.empty[(Long, Long, Double, Int)]
      .toDF("qid", "id", "bm25", "rank")
    if (n == 0L) return empty
    val avgdl = statsRow.getDouble(1)
    val avgdlSafe = if (avgdl <= 0.0) 1.0 else avgdl
    val termIdx = allTerms.zipWithIndex.toMap
    // (term, _ti) relation: maps posting rows into scorePairs' sparse
    // pair shape without a plan-sized literal per term
    val termRel = allTerms.map(t => (t, termIdx(t))).toDF("term", "_ti")
    val pairs = post.join(broadcast(termRel), "term")
      .select(col("id"), col("dl"), col("_ti"), col("tf").as("_tf"))
    val qRel = normQ.flatMap { case (qid, ts) =>
      ts.map { t =>
        (qid, termIdx(t), Bm25.robertsonIdf(n, dfByTerm.getOrElse(t, 0L)))
      }
    }.toDF("_qid", "_ti", "_idf")
    Bm25.scorePairs(pairs, "id", qRel, avgdlSafe, k, k1, b)
  }
}
