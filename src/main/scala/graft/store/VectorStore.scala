package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{indel_similarity, l2_distance, mat_vec}

/** Row shapes of the public API (reference: vector_store.py:13-25). */
case class SelectRecord(id: Long, vec: Array[Float], doc: String)
case class SearchRecord(id: Long, vec: Array[Float], doc: String, distance: Float)

/** Operational snapshot of a store — see [[VectorStore.stats]]. */
case class StoreStats(nLive: Long, nTombstones: Long, maxId: Long,
    version: Option[Long], hasAnnIndex: Boolean, nIndexCells: Long)

/** ANN-index health snapshot — the numbers that drive the maintenance
  * loop: `maxCellRows / meanCellRows` (imbalance) argues for
  * [[VectorStore.rebalanceAnnIndex]], a tail of cells far below the
  * mean (plus `nEmptyCells`) for [[VectorStore.mergeAnnIndexCells]],
  * and `deadRowFraction` for a compaction (the index carries
  * tombstoned rows until then). Row counts are INDEX rows (live +
  * dead): that is what probes scan and what the cell-size caps govern.
  */
case class AnnIndexStats(kind: String, metric: String, nCells: Long,
    nEmptyCells: Long, nIndexRows: Long, nDeadRows: Long,
    minCellRows: Long, p50CellRows: Long, maxCellRows: Long,
    imbalance: Double, deadRowFraction: Double)
/** Posting-index health snapshot — the numbers that drive its
  * maintenance loop: `deadPostingFraction` (tombstoned rows the scans
  * still read) and `nFiles` (append accumulation: every O(batch)
  * insert adds up to `nBuckets` small files) both argue for a
  * [[VectorStore.buildLexIndex]] rebuild, which is the index's
  * compaction.
  */
case class LexIndexStats(nPostingRows: Long, nDeadPostings: Long,
    deadPostingFraction: Double, nDistinctTerms: Long, nDocs: Long,
    nDeadDocs: Long, avgdl: Double, nBuckets: Int, nFiles: Long)

/** Fuzzy doc search distances are float64 (reference: vector_store.py:386-387). */
case class DocSearchRecord(id: Long, vec: Array[Float], doc: String, distance: Double)

/** Threshold policy for AUTOMATIC index maintenance — the missing
  * trigger around the existing rebalance/merge/rebuild moves (the
  * [[TombstoneStorage]] auto-compaction pattern applied to the
  * secondary indexes): at 100 TB the rebuild cadence is the
  * difference between flat and degrading probe cost, and "an operator
  * remembers to call rebalance" is not a cadence. Every knob defaults
  * to 0 = OFF; a store opts in via
  * [[VectorStore.enableAutoMaintenance]].
  *
  * @param maxCellRows after any append, split flat-IVF cells that grew
  *   past this row count ([[VectorStore.rebalanceAnnIndex]] — only hot
  *   partitions rewritten). The check is one per-cell count aggregate
  *   over the slim index.
  * @param minCellRows after any delete, dissolve flat-IVF cells that
  *   shrank below this ([[VectorStore.mergeAnnIndexCells]] — per-cell
  *   probe floor reclaimed).
  * @param lexMaxFiles after any append, rebuild the posting index once
  *   its file count passes this (every O(batch) append adds up to
  *   nBuckets files; the rebuild IS the index's compaction). The check
  *   is filesystem metadata only.
  * @param lexMaxDeadFraction after any delete, rebuild the posting
  *   index once the fraction of its DOCS tombstoned since the last
  *   rebuild passes this (dead rows' postings are scanned and then
  *   discarded by every query). Measured from bookkept (total, dead)
  *   counters folded O(batch) per mutation — never a per-delete
  *   posting scan; each dead doc drags its own postings, so the doc
  *   fraction tracks the posting fraction.
  * @param docMaxDeadFraction after any delete, rebuild every
  *   materialized doc-field sidecar (string and numeric) once the
  *   fraction of table rows tombstoned since the last family rebuild
  *   passes this — sidecars share the table's tombstone set, so the
  *   bookkept table-level counters (folded O(batch) per mutation)
  *   speak for all of them.
  * @param docMaxFiles after any append, rebuild ALL doc-field
  *   sidecars once the file count of the largest sidecar passes this
  *   (every O(batch) insert appends one file per materialized field;
  *   the rebuild is the sidecar's compaction, same as the posting
  *   index's). Filesystem metadata only.
  * @param quantizedRebuildImbalance after any append to a QUANTIZED
  *   layout (SQ/PQ/BQ — kinds the in-place split cannot serve because
  *   codes are grid/codebook/cell-relative), retrain the index via its
  *   persisted build recipe once max-cell/mean-cell imbalance passes
  *   this (e.g. 4.0). The flat layout uses `maxCellRows` instead —
  *   splitting only the hot cells is strictly cheaper there.
  * @param graphMaxChurnFraction after any append or delete on a
  *   graph-bearing store, rebuild the k-NN graph via its persisted
  *   recipe ([[VectorStore.rebuildKnnGraph]]) once rows churned since
  *   the last FULL build exceed this fraction of the rows AT that
  *   build (e.g. 0.5). Incremental folds and edge repair keep every
  *   touched list locally correct, but under sustained churn the
  *   entry medoids drift off-center and appended regions accumulate
  *   fold-order dependence — the rebuild restores a converged
  *   baseline. Bookkept O(batch) per mutation (the cellstats
  *   pattern); the trigger check itself reads two marker files.
  */
case class IndexMaintenancePolicy(
    maxCellRows: Long = 0L,
    minCellRows: Long = 0L,
    lexMaxFiles: Long = 0L,
    lexMaxDeadFraction: Double = 0.0,
    docMaxDeadFraction: Double = 0.0,
    docMaxFiles: Long = 0L,
    quantizedRebuildImbalance: Double = 0.0,
    graphMaxChurnFraction: Double = 0.0) {
  require(maxCellRows >= 0L && minCellRows >= 0L && lexMaxFiles >= 0L
      && docMaxFiles >= 0L,
    "maintenance thresholds must be >= 0 (0 = off)")
  require(lexMaxDeadFraction >= 0.0 && lexMaxDeadFraction < 1.0,
    s"lexMaxDeadFraction must be in [0, 1), got $lexMaxDeadFraction")
  require(docMaxDeadFraction >= 0.0 && docMaxDeadFraction < 1.0,
    s"docMaxDeadFraction must be in [0, 1), got $docMaxDeadFraction")
  require(quantizedRebuildImbalance == 0.0 || quantizedRebuildImbalance >= 1.0,
    s"quantizedRebuildImbalance must be 0 (off) or >= 1, got $quantizedRebuildImbalance")
  require(graphMaxChurnFraction >= 0.0,
    s"graphMaxChurnFraction must be >= 0 (0 = off), got $graphMaxChurnFraction")
}

/** One term of a conjunctive metadata filter over the doc JSON — the
  * compound-predicate surface (`lang = "en" AND score >= 0.5`, the most
  * common vector-store filter shape). Each term dispatches
  * independently to its materialized sidecar when one exists
  * ([[VectorStore.materializeDocField]] for equality,
  * [[VectorStore.materializeDocFieldNumeric]] for ranges); all
  * unmaterialized terms fold into ONE table scan with the conjunction
  * pushed as a single filter — never one scan per term.
  */
sealed trait DocPredicate { def pathSteps: Seq[String] }

/** Doc value at `$.path` is in `values` — string comparison, the
  * reference's `query_by_doc` contract (vector_store.py:334-356).
  */
case class DocEquals(pathSteps: Seq[String], values: Seq[Any])
  extends DocPredicate

/** Doc value at `$.path` (cast to double, SQL cast semantics:
  * non-numeric ⇒ NULL ⇒ never matches) lies in `[lo, hi]`; `None` is
  * an unbounded side, at least one bound required.
  */
case class DocRange(pathSteps: Seq[String], lo: Option[Double],
    hi: Option[Double]) extends DocPredicate

/** SET-COMPLEMENT exclusion — the blocklist term ("exclude
  * source=spam"): keeps every live row that does NOT match
  * `DocEquals(pathSteps, values)`, INCLUDING rows whose doc lacks the
  * path entirely (complement semantics, not SQL ternary logic — a
  * missing `lang` is "not spanish"). Dispatched as an anti-join
  * against the positive term's id set, so the sidecar pushdown is
  * identical to the equality term it negates.
  */
case class DocNotEquals(pathSteps: Seq[String], values: Seq[Any])
  extends DocPredicate

/** Disjunction term inside the conjunction — `(lang = "en" OR
  * score >= 90) AND source = "web"` shapes. Matches rows satisfying
  * AT LEAST ONE member; dispatched as the DISTINCT UNION of the
  * members' id sets (each member through its own sidecar scan when
  * materialized), then intersected into the enclosing chain like any
  * other term. Members must be positive forms ([[DocEquals]] /
  * [[DocRange]] / nested [[DocAnyOf]]): an exclusion inside an OR is
  * almost always a mis-stated blocklist — write it as a top-level
  * [[DocNotEquals]] instead.
  */
case class DocAnyOf(members: Seq[DocPredicate]) extends DocPredicate {
  def pathSteps: Seq[String] = members.flatMap(_.pathSteps)
}

/** EXISTENCE term — "has field X" ("keep only rows that carry a
  * license field"): matches live rows whose doc extraction at `$.path`
  * is non-NULL. A positive form: dispatches through the materialized
  * string sidecar's non-NULL scan when one exists (the sidecar stores
  * exactly the extraction, every live row present), the extraction
  * scan otherwise; composes inside [[DocAnyOf]] like any other
  * positive term.
  */
case class DocExists(pathSteps: Seq[String]) extends DocPredicate

/** The complement — "lacks field X" ("drop rows with no license
  * field", the NULL bucket [[VectorStore.docFieldHistogramDF]] shows):
  * matches live rows whose extraction at `$.path` IS NULL. Also a
  * positive selection (the sidecar carries the NULL rows too), so it
  * dispatches as a pushed IS NULL sidecar scan — no anti-join needed.
  */
case class DocMissing(pathSteps: Seq[String]) extends DocPredicate

/** Spark-native re-implementation of the reference engine's single-table
  * vector store (reference: vector_store.py:29-404).
  *
  * Semantics preserved (see SURVEY.md §1-2): contiguous 0-based id
  * assignment with never-reused holes, float32 L2 brute-force search with
  * insertion-order tie-breaks, JSON doc column with null⇒`{}` defaults,
  * fuzzy Indel-distance doc search, silent-missing select, warning-missing
  * delete, `k>n` error in `search` vs `k>n` cap in `searchByDoc`.
  *
  * Architecture differences (Spark-first, not a port):
  *   - Parquet at rest; the reference's in-memory NumPy `(id, vec)` slab
  *     becomes a cached column-pruned DataFrame projection.
  *   - Search is a broadcast cross-join + native codegen L2 expression +
  *     per-query top-k window, instead of a per-query Python loop
  *     (vector_store.py:290, `TODO: vectorize` — Spark parallelizes both
  *     across queries and across index partitions).
  *   - Single-writer assumption retained (the reference reads max-id and
  *     inserts in two separate transactions, vector_store.py:195-225).
  */
class VectorStore private (
    val spark: SparkSession,
    val path: String,
    val dim: Int,
    storage: StorageLayer) extends Logging {
  import spark.implicits._

  private var indexDf: DataFrame = _
  refreshIndex()

  /** Last dtype-coercion warning emitted by [[insertDF]] — the testing
    * hook for the reference's `assertWarns(UserWarning)` dtype-matrix
    * parity (test/tests.py:62-160); cleared at the start of each insert.
    */
  private[graft] var lastCoercionWarning: Option[String] = None

  private def warnCoercion(got: String): Unit = {
    val msg = s"Expected an array with a dtype of float32, but got an " +
      s"array of $got. Coercing to float32"
    lastCoercionWarning = Some(msg)
    logWarning(msg)
  }

  /** Cached `(id, vec)` projection — the analogue of the reference's
    * in-memory structured-array index (vector_store.py:64-67). Parquet
    * column pruning makes this a 2-column scan; caching pins it for the
    * repeated-search hot path.
    */
  private def refreshIndex(): Unit = {
    if (indexDf != null) indexDf.unpersist()
    indexDf = storage.read().select("id", "vec").cache()
  }

  private def table: DataFrame = storage.read()

  /** Live row count, cached in the handle under the same
    * single-writer reasoning as [[maxIdCache]]: every mutation knows
    * its exact delta (inserts +n, deletes −present, upserts
    * +new-only). Trusted only while this handle has been the
    * CONTINUOUS lease holder since priming — both caches are dropped
    * whenever the handle (re)claims the lease and whenever it detects
    * it lost the lease (see [[invalidateHandleCaches]]), because a
    * value primed while another handle held the lease can be stale.
    */
  private var liveCountCache: Option[Long] = None

  def count(): Long = liveCountCache.getOrElse {
    val n = table.count()
    liveCountCache = Some(n)
    n
  }

  /** Live max-id, cached in the handle: while this handle holds the
    * single-writer lease (see [[assertSingleWriter]]) no other handle
    * can move it underneath us, so inserts maintain it arithmetically
    * (one fewer Spark job per insert — per MICRO-BATCH on the
    * streaming ingest path) and deletes invalidate it (deleting the
    * current max row must let the next insert re-read the live max,
    * which may have dropped — the id-reuse hole semantics, R4). A
    * value primed BEFORE this handle claimed the lease is untrusted:
    * the claim drops it (see [[invalidateHandleCaches]]), otherwise a
    * reader-primed handle that later takes the lease could compute
    * `start = staleMax + 1` and assign colliding ids.
    */
  private var maxIdCache: Option[Long] = None

  /** Drop the handle-level derived caches (live count, max id). Called
    * on every lease (re)claim and on detected lease loss: the caches
    * are only sound while this handle's token has been the continuous
    * lease holder since they were primed.
    */
  private def invalidateHandleCaches(): Unit = {
    maxIdCache = None
    liveCountCache = None
  }

  private def maxId(): Long = maxIdCache.getOrElse {
    val m = table.agg(max($"id")).as[Option[Long]].head().getOrElse(-1L)
    maxIdCache = Some(m)
    m
  }

  /** `ORDER BY id LIMIT n` (reference: vector_store.py:144-161). */
  def head(n: Int = 5): Seq[SelectRecord] =
    if (n <= 0) Seq.empty
    else table.orderBy($"id").limit(n).as[SelectRecord].collect().toSeq

  /** Batch insert with contiguous id assignment (reference:
    * vector_store.py:183-234). Returns the assigned ids.
    */
  def insert(vecs: Seq[Array[Float]], docs: Seq[String] = null): Seq[Long] = {
    assertSingleWriter()
    require(vecs.nonEmpty, "insert requires at least one vector")
    vecs.zipWithIndex.foreach { case (v, i) =>
      if (v.length != dim)
        throw new IllegalArgumentException(
          s"vector $i has dimension ${v.length}, store dimension is $dim")
    }
    val effDocs: Seq[String] =
      if (docs == null) Seq.fill(vecs.size)("{}")
      else {
        if (docs.size != vecs.size)
          throw new IllegalArgumentException(
            s"got ${vecs.size} vectors but ${docs.size} docs")
        docs.map(d => if (d == null) "{}" else d)
      }
    val start = maxId() + 1
    val ids = vecs.indices.map(i => start + i)
    val rows = ids.lazyZip(vecs).lazyZip(effDocs).map((i, v, d) => Row(i, v.toSeq, d))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 100000)),
      VectorStore.schema)
    storage.append(df)
    maxIdCache = Some(start + vecs.size - 1)
    liveCountCache = liveCountCache.map(_ + vecs.size)
    annAppend(df)
    graphAppend(df)
    docIdxAppend(df, ids.size.toLong)
    lexAppend(df, ids.size.toLong)
    refreshIndex()
    ids
  }

  /** Row-shaped insert (reference `insert_dicts`,
    * vector_store.py:163-181): each record is a map with a required
    * `"vec"` (Array[Float]) and an optional `"doc"` whose value is
    * JSON-serialized here. Non-serializable docs fail the WHOLE batch
    * up front with a clear error — the reference's TypeError contract
    * (test/tests.py:426-429) — before anything is written.
    *
    * A record without a doc stores `{}` (the store-wide null default),
    * not the literal `"null"` the reference happens to write on this
    * path (json.dumps(None), vector_store.py:215) — its own read path
    * parses that back to an empty-ish doc and no reference test
    * observes the difference.
    */
  def insertDicts(records: Seq[Map[String, Any]]): Seq[Long] = {
    require(records.nonEmpty, "insertDicts requires at least one record")
    // C1 coercion matrix applies here too: the reference's insert_dicts
    // delegates to insert's float32 coercion-with-warning path, so every
    // working dtype (e.g. default float64 np.ones) is accepted, not just
    // float32 (tests.py:426-464 + vector_store.py:163-181).
    lastCoercionWarning = None
    val vecs = records.zipWithIndex.map {
      case (r, i) => r.get("vec") match {
        case Some(v: Array[Float]) => v
        case Some(v: Array[Double]) =>
          warnCoercion("array<double>"); v.map(_.toFloat)
        case Some(v: Array[Int]) =>
          warnCoercion("array<int>"); v.map(_.toFloat)
        case Some(v: Array[Long]) =>
          warnCoercion("array<bigint>"); v.map(_.toFloat)
        case Some(v: Array[Short]) =>
          warnCoercion("array<smallint>"); v.map(_.toFloat)
        case Some(v: Array[Byte]) =>
          warnCoercion("array<tinyint>"); v.map(_.toFloat)
        case Some(v: Array[Boolean]) =>
          warnCoercion("array<boolean>"); v.map(b => if (b) 1f else 0f)
        case Some(other) => throw new IllegalArgumentException(
          s"record $i: 'vec' must be a numeric array, got ${other.getClass.getName}")
        case None => throw new IllegalArgumentException(
          s"record $i: missing required 'vec'")
      }
    }
    // serialize (and thereby validate) every doc before any write
    val docs = records.map(_.get("doc").map(VectorStore.jsonDump).orNull)
    insert(vecs, docs)
  }

  /** Distributed batch insert: contiguous ids assigned in the input's
    * partition-then-row order via `zipWithIndex` (stable, unlike
    * `monotonically_increasing_id`). For pipelines feeding from another
    * Dataset — the reference has no analogue (its API is driver-side
    * arrays only).
    */
  /** Run `body` with a session conf pinned, restoring after. */
  private def withSessionConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  def insertDF(batch: DataFrame): Long = withSessionConf(
      // AQE has nothing to re-plan on the insert path at ANY scale —
      // its exchanges (the per-partition offsets groupBy, the posting
      // bucket repartition) are bounded by the batch's own partition
      // count and the write reads the batch cache with no exchange —
      // while its per-stage query-stage materialization DOUBLES the
      // driver round trips of every job here. On the streaming ingest
      // path that is a fixed per-micro-batch tax: 4-batch stream
      // 4.6 -> 3.8 s at sf0.1 with AQE pinned off for the insert.
      "spark.sql.adaptive.enabled", "false") {
    assertSingleWriter()
    val cols = batch.columns.toSet
    require(cols.contains("vec"), "insertDF requires a 'vec' column")
    // C1 parity (vector_store.py:34-55,104-112 + tests.py:62-160): the
    // accepted-input matrix is bool plus every int/float width — coerced
    // to float32 WITH a warning, as the reference's float32_row_vecs
    // does; anything else (string/binary/struct/nested — the analogue of
    // np.void/str_/complex/bytes_/object_) rejects with an error. Bool
    // needs an explicit 1f/0f projection: a blind cast would null it.
    lastCoercionWarning = None
    val vecExpr = batch.schema("vec").dataType match {
      case ArrayType(FloatType, _) => $"vec"
      case ArrayType(BooleanType, _) =>
        warnCoercion("array<boolean>")
        // null-propagating (a bare otherwise(0f) would fabricate data
        // from null elements; the numeric cast branch keeps them null)
        transform($"vec", e => when(e, lit(1f)).when(!e, lit(0f)))
      case ArrayType(et: NumericType, _) =>
        warnCoercion(s"array<${et.simpleString}>")
        $"vec".cast(ArrayType(FloatType))
      case other => throw new IllegalArgumentException(
        s"input vectors of type ${other.simpleString} are not supported")
    }
    val withDoc =
      if (cols.contains("doc"))
        batch.select(vecExpr.as("vec"), coalesce($"doc", lit("{}")).as("doc"))
      else batch.select(vecExpr.as("vec"), lit("{}").as("doc"))
    val start = maxId() + 1
    // contiguous (partition, offset)-ordered id assignment WITHOUT the
    // old `.rdd.zipWithIndex` round-trip: the RDD path deserialized
    // every row to external objects and re-serialized them through
    // createDataFrame — pure overhead on the per-micro-batch streaming
    // ingest path. monotonically_increasing_id encodes
    // (partitionId << 33 | offset); one tiny per-partition count job
    // (the same job zipWithIndex ran internally) yields both the
    // cumulative id bases and n, so the old separate count() job is
    // folded away and the whole assignment stays in codegen.
    val pre = withDoc
      .select($"vec", $"doc") // vecExpr already produced float32
      // per-row dimension guard evaluated inside the write job (no extra
      // pass) — mirrors the driver-side insert validation
      .withColumn("_dim_ok",
        assert_true(size($"vec") === dim,
          lit(s"insertDF: vector dimension must be $dim")))
      .drop("_dim_ok")
      .withColumn("_pid", spark_partition_id())
      .withColumn("_mono", monotonically_increasing_id())
      // persist: the offsets job and append() must see the SAME
      // materialization — re-running the lineage twice would double
      // the compute and could assign different ids for
      // non-deterministic inputs
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val partCounts = pre.groupBy($"_pid")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("_c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      val n = partCounts.map(_._2).sum
      val bases: Map[Int, Long] = {
        var acc = 0L
        partCounts.map { case (pid, c) =>
          val b = acc; acc += c; pid -> b
        }.toMap
      }
      val df = pre.select(
        (lit(start) + element_at(typedLit(bases), $"_pid") +
          ($"_mono" - ($"_pid".cast("long") * lit(1L << 33)))).as("id"),
        $"vec", $"doc")
      storage.append(df)
      maxIdCache = Some(start + n - 1)
      liveCountCache = liveCountCache.map(_ + n)
      annAppend(df)
      graphAppend(df)
      docIdxAppend(df, n)
      lexAppend(df, n)
      refreshIndex()
      n
    } finally pre.unpersist()
  }

  /** Upsert: replace-or-insert by EXPLICIT id — beyond-reference API
    * (the reference can only append with assigned ids, then delete).
    * Rows whose id exists are replaced; new ids are inserted as-is
    * (id holes allowed, same as after [[delete]]). Duplicate ids in
    * one batch are an error — "last wins" would depend on input order.
    * Returns (replaced, inserted) counts. Storage cost is one delete
    * (a tombstone append on [[TombstoneStorage]]) plus one append —
    * O(batch) IO on the tombstone layout, never a table rewrite.
    */
  def upsert(ids: Seq[Long], vecs: Seq[Array[Float]],
      docs: Seq[String] = null): (Long, Long) = {
    if (ids.isEmpty) return (0L, 0L)
    assertSingleWriter()
    if (ids.size != vecs.size)
      throw new IllegalArgumentException(
        s"got ${ids.size} ids but ${vecs.size} vectors")
    if (ids.distinct.size != ids.size)
      throw new IllegalArgumentException("upsert batch contains duplicate ids")
    vecs.zipWithIndex.foreach { case (v, i) =>
      if (v.length != dim)
        throw new IllegalArgumentException(
          s"vector $i has dimension ${v.length}, store dimension is $dim")
    }
    val effDocs: Seq[String] =
      if (docs == null) Seq.fill(ids.size)("{}")
      else {
        if (docs.size != ids.size)
          throw new IllegalArgumentException(
            s"got ${ids.size} ids but ${docs.size} docs")
        docs.map(d => if (d == null) "{}" else d)
      }
    val idsDf = ids.toDF("id")
    val replaced = table.join(broadcast(idsDf), Seq("id"), "left_semi").count()
    if (replaced > 0) { storage.delete(idsDf); annAfterDelete(); graphAfterDelete(idsDf); docIdxAfterDelete(replaced); lexAfterDelete(replaced) }
    val rows = ids.lazyZip(vecs).lazyZip(effDocs).map((i, v, d) => Row(i, v.toSeq, d))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, math.max(1, rows.size / 100000)),
      VectorStore.schema)
    storage.append(df)
    // every id this batch touched (replaced OR new) is now live, so
    // the live max can only grow: the cached high-water stays exact
    maxIdCache = maxIdCache.map(m => math.max(m, ids.max))
    liveCountCache = liveCountCache.map(_ + (ids.size - replaced))
    annAppend(df)
    graphAppend(df)
    docIdxAppend(df, ids.size.toLong)
    lexAppend(df, ids.size.toLong)
    refreshIndex()
    (replaced, ids.size - replaced)
  }

  /** Delete by id; ids not present are skipped with a warning (reference:
    * vector_store.py:236-254). Returns the number of rows deleted.
    * Parquet is immutable → read-antijoin-rewrite; see [[StorageLayer]]
    * for the scale-out path.
    */
  def delete(ids: Seq[Long]): Long = {
    if (ids.isEmpty) return 0L
    assertSingleWriter()
    val idsDf = ids.toDF("id")
    val present = table.join(broadcast(idsDf), Seq("id"), "left_semi").count()
    val distinctIds = ids.distinct.size
    if (present < distinctIds)
      logWarning(s"delete: ${distinctIds - present} of $distinctIds ids not present in store")
    storage.delete(idsDf)
    maxIdCache = None // the deleted set may have contained the live max
    liveCountCache = liveCountCache.map(_ - present)
    annAfterDelete()
    graphAfterDelete(idsDf)
    docIdxAfterDelete(present); lexAfterDelete(present)
    refreshIndex()
    present
  }

  /** Predicate delete: [[delete]] driven by the JSON-path metadata
    * filter instead of a driver-side id list — the reference's
    * query_by_doc filter (vector_store.py:334-356) composed with its
    * delete (:219-254), and the form a retention/GDPR job needs at
    * scale: the matching id set flows storage-to-storage (predicate-
    * pushed, column-pruned scan of (id, doc)) and never visits the
    * driver. The id frame is locally checkpointed before the delete so
    * the storage rewrite can never race its own input scan. Returns
    * the deleted count; deleting zero matches is a no-op.
    */
  def deleteWhere(pathSteps: Seq[String], values: Seq[Any]): Long = {
    assertSingleWriter()
    require(pathSteps.nonEmpty, "path must have at least one step")
    val ids = docMatchIds(pathSteps, values).localCheckpoint(true)
    val n = ids.count()
    if (n > 0) {
      storage.delete(ids)
      maxIdCache = None // the matched set may have contained the live max
      liveCountCache = liveCountCache.map(_ - n)
      annAfterDelete()
      graphAfterDelete(ids)
      docIdxAfterDelete(n); lexAfterDelete(n)
      refreshIndex()
    }
    n
  }

  /** Batch-commit marker for a streaming sink: one tiny file INSIDE
    * the stream's checkpoint dir, holding the last batchId whose
    * insert completed. Written AFTER the insert, so a replayed batch
    * (crash between insert and the stream's own offset commit) is
    * detected and skipped instead of appended twice under fresh ids.
    * Living inside the checkpoint ties the marker's lifetime to the
    * batchId sequence it guards: wiping the checkpoint to reprocess
    * from scratch (batchIds restart at 0) also wipes the marker, so
    * the restarted stream is NOT silently skipped up to the old
    * high-water mark — the failure mode of a store-rooted marker.
    * Keyed by store-path hash so one checkpoint feeding two stores
    * (not a supported shape, but cheap to defend) cannot cross-skip.
    * Single-writer contract, like the store itself.
    */
  private def streamCommitPath(checkpointDir: String): Path = {
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(path.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    new Path(checkpointDir, s"_graft_store_commit_$key")
  }

  private def lastCommittedBatch(p: Path): Long = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def recordCommittedBatch(p: Path, batchId: Long): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.getParent, p.getName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** One micro-batch of [[ingestStream]] — factored out so the replay
    * guard is unit-testable without crashing a real stream. Returns
    * true when the batch was applied, false when skipped as a replay.
    */
  private[graft] def applyIngestBatch(batch: DataFrame, batchId: Long,
      checkpointDir: String,
      orderCols: Seq[org.apache.spark.sql.Column]): Boolean = {
    val cp = streamCommitPath(checkpointDir)
    if (batchId <= lastCommittedBatch(cp)) {
      logWarning(s"ingestStream: skipping replayed batch $batchId " +
        s"(already committed to $cp)")
      false
    } else {
      val ordered =
        if (orderCols.isEmpty) batch
        // equivalent to orderBy(...).coalesce(1) — a single output
        // partition sorted in place — but skips the global sort's
        // range-partitioning SAMPLING job and exchange, a fixed
        // per-micro-batch cost on this hot path
        else batch.coalesce(1).sortWithinPartitions(orderCols: _*)
      insertDF(ordered)
      recordCommittedBatch(cp, batchId)
      true
    }
  }

  /** Structured-Streaming ingestion: append every micro-batch to the
    * store through the same [[insertDF]] path, so the dtype gate,
    * float32 coercion, id assignment, doc defaulting, and the O(batch)
    * ANN index append all apply per batch. `foreachBatch` because the
    * store is a multi-file layout with its own staged-swap txn, not a
    * file sink. Crash recovery: foreachBatch is at-least-once, so a
    * batch whose insert finished but whose streaming offset never
    * committed WILL be replayed — the per-batch commit marker
    * ([[streamCommitPath]]) detects that and skips the re-insert.
    * The marker is written after the insert, so the remaining
    * duplicate window is a crash BETWEEN insert and marker write
    * (milliseconds, vs the whole batch previously); exactly-once would
    * need the marker folded into the storage txn itself. `orderCols`
    * (e.g. the source's natural key) pins the WITHIN-batch id
    * assignment order — across batches ids continue from the persisted
    * max, so a restart never reuses an id.
    */
  def ingestStream(stream: DataFrame, checkpointDir: String,
      orderCols: Seq[org.apache.spark.sql.Column] = Seq.empty,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyIngestBatch(batch, batchId, checkpointDir, orderCols)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** [[ingestStream]] with ONLINE SEMANTIC DEDUP: each micro-batch is
    * first searched against the CURRENT store (exact 1-NN, float32
    * L2), and only rows farther than `eps` from every stored vector
    * are inserted — the streaming form of the ingest-time dedup a
    * training-data pipeline runs so a re-crawled page never lands
    * twice. Cross-batch by construction (batch N is checked against
    * everything batches 1..N−1 kept); duplicates WITHIN one batch are
    * the caller's contract (pre-dedup the batch, or lower
    * maxFilesPerTrigger — checking a batch against itself would need a
    * self-join this sink deliberately leaves to the batch [[graft.operators.SemDedup]]
    * path). An empty store accepts the whole first batch.
    *
    * '''Scale mode''' (`approx = true`): the exact per-batch 1-NN
    * scores every batch row against EVERY live row — O(batch × live)
    * pairs per micro-batch, linear in store size (measured: 23 s per
    * 2k-row batch at only 15k live rows — SCALE.md §Round 9), which is
    * the wrong cost model for a continuous-crawl ingester whose store
    * only grows. With `approx = true` and an ANN index present
    * ([[buildAnnIndex]]), candidate generation routes through
    * [[searchApproxDF]]: only the `nProbe` probed cells are scanned
    * (partition-pruned at the source), distances WITHIN the candidates
    * stay exact float32, and per-batch cost tracks cell size, not
    * store size. The index stays current for free — every accepted
    * batch is O(batch)-appended to it by [[insertDF]]. The trade is
    * recall: a duplicate whose nearest stored vector lives outside the
    * probed cells is missed and KEPT (a false non-dup — the safe
    * direction for dedup; `nProbe` = cell count degenerates to the
    * exact check). If no index exists yet, batches fall back to the
    * exact scan with a warning (e.g. the empty/seed phase before the
    * first [[buildAnnIndex]]).
    *
    * Note: pinning `orderCols` serializes each batch's survivors
    * through one task (`coalesce(1)`) for deterministic id assignment
    * — fine at micro-batch sizes; for very large batches leave
    * `orderCols` empty and accept partition-order ids.
    */
  def ingestStreamDedup(stream: DataFrame, checkpointDir: String,
      eps: Double,
      orderCols: Seq[org.apache.spark.sql.Column] = Seq.empty,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      approx: Boolean = false,
      nProbe: Int = 8)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(eps >= 0.0, s"eps must be >= 0, got $eps")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyDedupIngestBatch(batch, batchId, checkpointDir, eps,
          orderCols, approx, nProbe)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }

  /** One micro-batch of [[ingestStreamDedup]] — factored out (like
    * [[applyIngestBatch]]) so the approx/exact candidate paths are
    * unit-testable without a live stream. Returns true when the batch
    * was applied (even if fully deduped away), false on a replay skip.
    */
  private[graft] def applyDedupIngestBatch(batch: DataFrame, batchId: Long,
      checkpointDir: String, eps: Double,
      orderCols: Seq[org.apache.spark.sql.Column],
      approx: Boolean, nProbe: Int): Boolean = {
    // same replay guard as ingestStream: within eps the 1-NN check
    // is incidentally idempotent, but an exact replay would still
    // burn ids and a replay of NOVEL rows (eps-distinct batch)
    // would duplicate them outright
    val cp = streamCommitPath(checkpointDir)
    if (batchId <= lastCommittedBatch(cp)) {
      logWarning(s"ingestStreamDedup: skipping replayed batch $batchId")
      false
    } else {
      val deduped =
        if (count() == 0L) batch
        else {
          val keyed = batch
            .withColumn("_qid", monotonically_increasing_id())
            .localCheckpoint(true)
          val queries = keyed.select($"_qid".as("qid"),
            $"vec".cast("array<float>").as("qvec"))
          val useApprox = approx && hasAnnIndex
          if (approx && !useApprox)
            logWarning("ingestStreamDedup: approx = true but the " +
              "store has no ANN index yet — falling back to the " +
              "exact scan for this batch (buildAnnIndex() to " +
              "enable the probed path)")
          // on a PQ index the ADC distance is a reconstruction
          // approximation (and BQ hamming is not a distance at all —
          // its refine is mandatory) — refine so the eps gate compares
          // TRUE float32 distances (candidates still come from probes)
          val nn = (if (useApprox && (annKindIsPq || annKind == "ivfbq"))
                      searchApproxDF(queries, k = 1, nProbe,
                        refine = math.max(32, nProbe))
                    else if (useApprox)
                      searchApproxDF(queries, k = 1, nProbe)
                    else searchDF(queries, k = 1))
            .filter($"distance".cast("double") <= eps)
            .select($"qid".as("_qid"))
          keyed.join(nn, Seq("_qid"), "left_anti").drop("_qid")
        }
      // order AFTER the dedup join: the anti-join may plan as a
      // shuffle for large batches, which would scramble a
      // pre-applied order and make id assignment nondeterministic
      val survivors =
        if (orderCols.isEmpty) deduped
        // single-partition in-place sort — see applyIngestBatch
        else deduped.coalesce(1).sortWithinPartitions(orderCols: _*)
      if (!survivors.isEmpty) insertDF(survivors)
      recordCommittedBatch(cp, batchId)
      true
    }
  }

  /** Fold any pending tombstones into a rewrite (no-op on the plain
    * Parquet layout). Run when the tombstone set grows large enough that
    * the per-read anti-join matters.
    */
  def compact(): Unit = {
    assertSingleWriter()
    storage match {
      case t: TombstoneStorage =>
        t.compact()
        // tombstones are gone — the search-time mask can no longer
        // hide the compacted-away rows still present in the index
        rebuildAnnRowsFromCentroids()
        materializedDocFields.foreach(materializeDocField)
        materializedNumericDocFields.foreach(materializeDocFieldNumeric)
        resetDeadStatsAfterRewrite(docDeadStatsPath)
        if (hasLexIndex) buildLexIndex()
        reconcileGraphAfterPurge()
      case _ => ()
    }
    refreshIndex()
  }

  /** Crash-debris reconcile for the graph layout after tombstones are
    * purged (compact/vacuum): a delete whose tombstone landed but
    * whose graph repair did not was hidden by the gen mask — which the
    * purge just cleared. Remove any graph row absent from the live
    * table (O(debris); normally empty — the anti-join is one pass over
    * the node ids, no vectors travel).
    */
  private def reconcileGraphAfterPurge(): Unit = if (hasKnnGraph) {
    val debris = graft.operators.KnnGraphIndex.nodesDF(spark, graphRoot)
      .select($"id")
      .join(storage.read().select($"id"), Seq("id"), "left_anti")
    if (!debris.isEmpty)
      graft.operators.KnnGraphIndex.deleteAndRepair(spark, graphRoot,
        debris)
  }

  /** Select by ids, ascending id; unknown ids silently absent (reference:
    * vector_store.py:256-273, test/tests.py:508-514).
    */
  def selectIds(ids: Seq[Long]): Seq[SelectRecord] = {
    if (ids.isEmpty) return Seq.empty
    table
      .join(broadcast(ids.toDF("id")), Seq("id"), "left_semi")
      .orderBy($"id")
      .as[SelectRecord].collect().toSeq
  }

  /** Exact brute-force k-NN by float32 L2 distance (reference:
    * vector_store.py:275-332). Ties break toward the earlier-inserted
    * (lower-id) row, matching argsort-by-position (SURVEY.md §2.4).
    * `k > count` raises (reference :279-284).
    */
  def search(queries: Seq[Array[Float]], k: Int): Seq[Seq[SearchRecord]] = {
    val n = count()
    if (k > n)
      throw new IllegalArgumentException(
        s"k ($k) is larger than the number of stored vectors ($n)")
    queries.zipWithIndex.foreach { case (q, i) =>
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"query $i has dimension ${q.length}, store dimension is $dim")
    }
    val qdf = queries.zipWithIndex.map { case (v, i) => (i, v) }.toDF("qid", "qvec")
    val w = Window.partitionBy($"qid").orderBy($"distance", $"id")
    val hits = indexDf
      .crossJoin(broadcast(qdf))
      .withColumn("distance", l2_distance($"vec", $"qvec"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"qid", $"rn", $"id", $"distance")
      // fetch join for doc (+vec) — the reference's dedup'd second-phase
      // fetch (vector_store.py:303-320) expressed as a broadcast join
      .join(table.select($"id", $"vec", $"doc"), Seq("id"))
      .select($"qid", $"rn", $"id", $"vec", $"doc", $"distance")
      .collect()
    assemble(hits, queries.size)(r =>
      SearchRecord(r.getLong(2), r.getSeq[Float](3).toArray, r.getString(4), r.getFloat(5)))
  }

  /** Filtered k-NN: exact top-k by L2 among rows whose `doc` JSON value
    * at `$.path` is in `values` — the filter-then-search contract every
    * modern vector store exposes (pre-filter: distances are computed
    * ONLY on survivors, so recall is exact over the filtered set;
    * post-filtering a plain top-k would under-fill k whenever matches
    * are rare). No reference analogue (beyond-reference surface:
    * vector_store.py has query_by_doc :334-356 and search :275-332 but
    * not their composition). `k` caps at the match count — the filter
    * decides the candidate set size, and erroring on a selective filter
    * would make the API unusable; ties and dimension checks follow
    * [[search]].
    */
  def searchWhere(queries: Seq[Array[Float]], k: Int,
      pathSteps: Seq[String], values: Seq[Any]): Seq[Seq[SearchRecord]] = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    if (k <= 0)
      throw new IllegalArgumentException(s"k must be a positive integer, got $k")
    queries.zipWithIndex.foreach { case (q, i) =>
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"query $i has dimension ${q.length}, store dimension is $dim")
    }
    val qdf = queries.zipWithIndex.map { case (v, i) => (i, v) }.toDF("qid", "qvec")
    val w = Window.partitionBy($"qid").orderBy($"distance", $"id")
    val hits = docMatchRows(pathSteps, values)
      .crossJoin(broadcast(qdf))
      .withColumn("distance", l2_distance($"vec", $"qvec"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"qid", $"rn", $"id", $"vec", $"doc", $"distance")
      .collect()
    assemble(hits, queries.size)(r =>
      SearchRecord(r.getLong(2), r.getSeq[Float](3).toArray, r.getString(4), r.getFloat(5)))
  }

  /** Fuzzy doc search: top-k by Indel distance over the raw JSON text
    * (reference: vector_store.py:358-401). `k <= 0` raises; `k > n` caps
    * at n (the reference's documented asymmetry, test/tests.py:609-617).
    */
  def searchByDoc(queryDocs: Seq[String], k: Int): Seq[Seq[DocSearchRecord]] = {
    if (k <= 0)
      throw new IllegalArgumentException(s"k must be a positive integer, got $k")
    val qdf = queryDocs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("qid", "qdoc")
    val w = Window.partitionBy($"qid").orderBy($"distance", $"id")
    val hits = table
      .crossJoin(broadcast(qdf))
      .withColumn("distance", lit(100.0) - indel_similarity($"doc", $"qdoc"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= k)
      .select($"qid", $"rn", $"id", $"vec", $"doc", $"distance")
      .collect()
    assemble(hits, queryDocs.size)(r =>
      DocSearchRecord(r.getLong(2), r.getSeq[Float](3).toArray, r.getString(4), r.getDouble(5)))
  }

  private def assemble[T](rows: Array[Row], numQueries: Int)(mk: Row => T): Seq[Seq[T]] = {
    val byQuery = rows.groupBy(_.getInt(0))
    (0 until numQueries).map { qid =>
      byQuery.getOrElse(qid, Array.empty[Row]).sortBy(_.getInt(1)).toSeq.map(mk)
    }
  }

  // ------------------------- approximate search -------------------- //
  //
  // The reference's whole point is a STORE you search
  // (vector_store.py:275-332); past ~10^7 rows the brute-force scan
  // stops being a search engine. searchApprox is the same user journey
  // against a persisted IVF layout (`<path>/ann`), partitioned by cell
  // so probes prune at the source, and TOMBSTONE-CONSISTENT: index rows
  // carry the same write-generation as their data rows, and the search
  // applies the storage layer's `data.gen < tomb.gen` delete mask to
  // candidates BEFORE the top-k window — a delete is visible in the
  // next search with no index rebuild, and an upsert's replacement row
  // (same id, newer gen) is never masked by the tombstone that killed
  // its predecessor. Maintenance contract:
  //   - insert/insertDF/upsert APPEND new rows to the index (assignment
  //     to the existing centroids, O(batch) — appendToIvfIndex);
  //   - delete is O(batch): a tombstone masks index rows at query time;
  //   - compaction (auto or explicit) clears tombstones, so it REBUILDS
  //     the index rows from the live table against the existing
  //     centroids (one map-side assign + write, no k-means retrain);
  //     the plain Parquet layout has no tombstones, so its deletes
  //     rebuild the same way.

  private def annPath: String = new Path(path, "ann").toString
  private def annIndexPath = new Path(s"$annPath/index")
  private def annFs =
    annIndexPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val GenCol = TombstoneStorage.GenCol

  /** Live rows with their write-generation (lit 0 on the plain layout,
    * which has no versions — its deletes rebuild the index instead).
    */
  private def liveWithGen: DataFrame = storage match {
    case t: TombstoneStorage => t.readLiveWithGen()
    case _ => table.withColumn(GenCol, lit(0L))
  }

  def hasAnnIndex: Boolean = annFs.exists(annIndexPath)

  /** Fit an IVF layout over the current live rows and persist it under
    * `<path>/ann` (k-means|| seeding, rows partitioned by cell). Call
    * once the store outgrows brute force; subsequent writes maintain
    * the index incrementally (see the contract above). Rebuilding (new
    * centroids) is this same call — e.g. when [[graft.operators.Ann.inertia]]
    * drift says recall has decayed.
    */
  /** @param seedRounds k-means|| oversampling rounds (2 = full ||,
    *   the production default; 0 = the cheap one-job sample-++ tier —
    *   right for small stores and tests, where per-job latency
    *   dominates seed quality).
    */
  def buildAnnIndex(nCentroids: Int, iters: Int = 5, seedRounds: Int = 2,
      metric: String = "l2"): Unit = {
    require(metric == "l2" || metric == "cosine",
      s"metric must be 'l2' or 'cosine', got '$metric'")
    val proj = liveWithGen.select($"id", $"vec", col(GenCol))
    val (cents, indexed) =
      if (metric == "cosine") {
        // spherical k-means + max-similarity assignment — the index a
        // normalized-text-embedding corpus needs (most embedding
        // models ship cosine/IP; an L2 index over unnormalized
        // vectors ranks by magnitude, not angle)
        val c = graft.operators.Ann.kmeansCosine(proj, "id", "vec",
          nCentroids, iters, seedRounds)
        (c, graft.operators.Ann.assignCosine(proj, "id", "vec", c))
      } else {
        val c = graft.operators.Ann.kmeans(proj, "id", "vec", nCentroids,
          iters, seedRounds)
        (c, graft.operators.Ann.assign(proj, "id", "vec", c))
      }
    graft.operators.Ann.writeIvfIndex(indexed, cents, annPath, metric)
    // a rebuild over a previous buildAnnIndexPq/Sq must not leave the
    // old kind marker (searchApproxDF would dispatch to the PQ/SQ
    // path and expect a `codes` column) or stale aux state behind
    writeAnnKindMarker("ivf")
    clearAnnAux(keep = "")
    writeBuildMeta(Map("builder" -> "ivf", "nCentroids" -> nCentroids,
      "iters" -> iters, "seedRounds" -> seedRounds, "metric" -> metric))
    writeMaintMeta(Map.empty) // a fresh recipe resets any retrain cooldown
    refreshAnnCellStatsAfterRewrite()
  }

  // Self-describing build recipe: the builder and its hyperparameters,
  // persisted beside the layout so [[rebuildAnnIndex]] (and the
  // quantized auto-maintenance trigger) can replay the EXACT build on
  // the current live rows without the caller re-supplying arguments —
  // the same one-source-of-truth move as the metric/kind markers.
  private def buildMetaPath = new Path(annPath, "build.meta")

  /** Activate a staged marker file over its destination in ONE rename
    * (FileContext rename with OVERWRITE) — delete-then-rename leaves a
    * crash window with NO file at all, which downstream readers treat
    * as "pre-recipe layout" and silently fall back to defaults. Where
    * an FS genuinely cannot overwrite-rename, the delete+rename
    * fallback keeps the old (accepted, logged) window.
    */
  private def activateMarker(staging: Path, dest: Path): Unit =
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        dest.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(staging, dest,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException =>
        logWarning(s"FS for $dest lacks overwrite-rename — falling back " +
          "to delete+rename (non-atomic: a crash between the two leaves " +
          "no marker, and the next reader takes the missing-file path)")
        val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(dest)) fs.delete(dest, false)
        if (!fs.rename(staging, dest))
          throw new java.io.IOException(s"could not activate $staging")
    }

  private def writeBuildMeta(kv: Map[String, Any]): Unit = {
    // staging + atomic activation: a crash mid-write must never leave
    // a TRUNCATED recipe behind (a half-written key set would send
    // rebuildAnnIndex down the recipe path missing hyperparameters),
    // and the overwrite-rename closes the no-file window too
    val staging = new Path(annPath,
      s"_build.meta.staging-${java.util.UUID.randomUUID()}")
    val out = annFs.create(staging, true)
    val body = kv.map { case (k, v) => s"$k=$v" }.mkString("\n")
    try out.write(body.getBytes("UTF-8")) finally out.close()
    activateMarker(staging, buildMetaPath)
  }

  private def readBuildMeta(): Option[Map[String, String]] =
    if (!annFs.exists(buildMetaPath)) None
    else {
      val in = annFs.open(buildMetaPath)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Some(body.split("\n").filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap)
    }

  /** Re-run the index's OWN build recipe on the current live rows —
    * the full-retrain maintenance move for layouts the in-place
    * rebalance/merge cannot serve (quantized codes are grid/codebook/
    * cell-relative; cosine cells are angular). Hyperparameters come
    * from the persisted `build.meta`; pre-recipe layouts fall back to
    * (centroid count, default iters) with a warning.
    */
  def rebuildAnnIndex(): Unit = {
    require(hasAnnIndex, "no ANN index to rebuild — buildAnnIndex first")
    // parse the recipe FIRST (a truncated/malformed meta map — crash
    // debris — degrades to the pre-recipe fallback below, never a bare
    // NoSuchElementException), invoke the builder OUTSIDE the parse
    // guard so genuine build failures surface unswallowed
    val recipe: Option[() => Unit] = readBuildMeta().flatMap { m =>
      try Some(m("builder") match {
        case "ivf" =>
          val (nc, it, sr) = (m("nCentroids").toInt, m("iters").toInt,
            m("seedRounds").toInt)
          val me = m.getOrElse("metric", "l2")
          () => buildAnnIndex(nc, it, sr, me)
        case "ivfsq" =>
          val (nc, it, sr) = (m("nCentroids").toInt, m("iters").toInt,
            m("seedRounds").toInt)
          val cq = m.getOrElse("clipQuantile", "0.0").toDouble
          () => buildAnnIndexSq(nc, it, sr, cq)
        case "ivfbq" =>
          val (nc, it, sr) = (m("nCentroids").toInt, m("iters").toInt,
            m("seedRounds").toInt)
          () => buildAnnIndexBq(nc, it, sr)
        case "ivfpq" =>
          val (nc, mm, kk, it) = (m("nCells").toInt, m("m").toInt,
            m("k").toInt, m("iters").toInt)
          val res = m.getOrElse("residual", "false").toBoolean
          val opq = m.getOrElse("opq", "false").toBoolean
          val sweeps = m.getOrElse("opqSweeps", "2").toInt
          () => buildAnnIndexPq(nc, mm, kk, it, residual = res, opq = opq,
            opqSweeps = sweeps)
        case other => throw new IllegalStateException(
          s"unknown builder '$other' in $buildMetaPath")
      }) catch {
        case e @ (_: NoSuchElementException | _: NumberFormatException
            | _: IllegalArgumentException) =>
          logWarning(s"malformed build recipe at $buildMetaPath " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}) — treating " +
            "it like a missing recipe")
          None
      }
    }
    recipe match {
      case Some(run) => run()
      case None =>
        val nc = spark.read.parquet(s"$annPath/centroids").count().toInt
        logWarning(s"no usable build recipe at $buildMetaPath (pre-recipe " +
          s"layout, or crash debris) — rebuilding kind '$annKind' with " +
          s"$nc cells and default training arguments")
        annKind match {
          case "ivf" => buildAnnIndex(nc, metric = annMetric)
          case "ivfsq" => buildAnnIndexSq(nc)
          case "ivfbq" => buildAnnIndexBq(nc)
          case pq if pq.startsWith("ivfpq") =>
            val cb = graft.operators.Pq.readCodebook(spark, s"$annPath/codebook")
            buildAnnIndexPq(nc, cb.m, cb.k,
              residual = pq == "ivfpq_res", opq = pq == "ivfpq_opq")
          case other => throw new IllegalStateException(
            s"unknown index kind '$other'")
        }
    }
  }

  /** Split oversized index cells in place (see
    * [[graft.operators.Ann.rebalanceIvfCells]]) — the maintenance
    * move between O(batch) appends (which keep centroids fixed and so
    * concentrate drifting data in few cells) and a full rebuild (which
    * re-scans every row). Only the oversized cells' partitions are
    * read and rewritten; searches return identical full-probe results
    * before and after, and partial probes rank the finer cells like
    * any others. Flat L2 layout only: quantized kinds re-encode on
    * rebuild (residual codes are cell-relative), and cosine cells are
    * angular — rebuild those instead.
    */
  def rebalanceAnnIndex(maxCellRows: Long, iters: Int = 3):
      graft.operators.Ann.RebalanceReport = {
    require(hasAnnIndex, "no ANN index to rebalance — buildAnnIndex first")
    require(annKind == "ivf",
      s"rebalance supports the flat 'ivf' layout; a '$annKind' index rebuilds instead")
    val rep = graft.operators.Ann.rebalanceIvfCells(spark, annPath, "id", "vec",
      maxCellRows, iters)
    if (rep.splitCells > 0) {
      refreshSuperQuantizerAfterCellRewrite()
      refreshAnnCellStatsAfterRewrite()
    }
    rep
  }

  /** Dissolve undersized index cells (see
    * [[graft.operators.Ann.mergeIvfCells]]) — the delete-side
    * complement of [[rebalanceAnnIndex]]: compactions and deletes
    * leave near-empty cells whose per-cell probe floor (centroid
    * scoring, partition dir, file opens) dwarfs their row count. Only
    * the dissolved cells' rows move; full-probe results are identical
    * before and after. Flat L2 layout only, as with the split.
    */
  def mergeAnnIndexCells(minCellRows: Long):
      graft.operators.Ann.MergeReport = {
    require(hasAnnIndex, "no ANN index to merge — buildAnnIndex first")
    require(annKind == "ivf",
      s"merge supports the flat 'ivf' layout; a '$annKind' index rebuilds instead")
    val rep = graft.operators.Ann.mergeIvfCells(spark, annPath, "id", "vec",
      minCellRows)
    if (rep.mergedCells > 0) {
      refreshSuperQuantizerAfterCellRewrite()
      refreshAnnCellStatsAfterRewrite()
    }
    rep
  }

  /** The routing table maps cells that no longer exist after a
    * rebalance/merge rewrote the centroid table — REBUILD it in place
    * at the same super-cell count rather than misroute (or silently
    * drop hierarchical routing): the retrain is a k-means over √C
    * rows, trivially cheap next to the cell rewrite that triggered it.
    */
  private def refreshSuperQuantizerAfterCellRewrite(): Unit = {
    val p = new Path(s"$annPath/super")
    if (annFs.exists(p)) {
      val persisted = spark.read.parquet(s"$annPath/super/centroids")
        .count().toInt
      // a merge can dissolve cells BELOW the persisted super count —
      // clamp so the retrain never runs k-means with k > point count
      // (e.g. 1 surviving cell with nSuper=2)
      val nCells = spark.read.parquet(s"$annPath/centroids").count().toInt
      val nSuper = math.max(1, math.min(persisted, nCells))
      graft.operators.Ann.buildSuperQuantizer(spark, annPath, nSuper)
      logInfo(s"rebuilt the super quantizer ($nSuper super-cells, " +
        s"persisted $persisted, $nCells cells) over the rewritten cell set")
    }
  }

  /** Two-level coarse-quantizer routing for the flat L2 index (see
    * [[graft.operators.Ann.buildSuperQuantizer]]) — the probe-stage
    * scale fix for cell counts where scoring every centroid per query
    * stops being free. Auxiliary state only: index rows, appends,
    * deletes, and every existing search path are untouched.
    */
  def buildAnnSuperQuantizer(nSuper: Int, iters: Int = 5): Unit = {
    require(hasAnnIndex, "no ANN index - buildAnnIndex first")
    require(annKind == "ivf",
      s"the super quantizer routes the flat 'ivf' layout, not '$annKind'")
    graft.operators.Ann.buildSuperQuantizer(spark, annPath, nSuper, iters)
  }

  /** Hierarchically-routed approximate search (flat L2 index +
    * [[buildAnnSuperQuantizer]]): probe `superProbe` super-cells, rank
    * only their routed cells, keep `nProbe`, then the usual
    * partition-pruned masked scan. superProbe = nSuper and nProbe =
    * nCells degenerate to the exact flat search.
    */
  def searchApproxHierDF(queries: DataFrame, k: Int, nProbe: Int,
      superProbe: Int): DataFrame =
    searchApproxHierMatchDF(queries, k, nProbe, superProbe, None)

  /** Compound-filter hierarchically-routed search: the
    * [[searchApproxWhereAllDF]] composition on the routed probe path —
    * the 100 TB serving shape (√C-cell index needs the super router;
    * real queries carry metadata filters). Same probe-coverage caveat
    * as the flat filtered search: survivors outside the routed probe
    * set under-fill k — raise `nProbe`/`superProbe` for very selective
    * filters.
    */
  def searchApproxHierAllDF(queries: DataFrame, k: Int, nProbe: Int,
      superProbe: Int, preds: Seq[DocPredicate],
      bruteForceThreshold: Long = 0L): DataFrame =
    if (bruteForceThreshold <= 0L)
      searchApproxHierMatchDF(queries, k, nProbe, superProbe,
        Some(docMatchIdsAll(preds)))
    else adaptiveFiltered(queries, k, preds, bruteForceThreshold) { ids =>
      searchApproxHierMatchDF(queries, k, nProbe, superProbe, Some(ids))
    }

  private def searchApproxHierMatchDF(queries: DataFrame, k: Int,
      nProbe: Int, superProbe: Int,
      matchIds: Option[DataFrame]): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(hasAnnIndex, "no ANN index - buildAnnIndex first")
    require(annKind == "ivf",
      s"hierarchical routing serves the flat 'ivf' layout, not '$annKind'")
    require(graft.operators.Ann.hasSuperQuantizer(spark, annPath),
      "no super quantizer - buildAnnSuperQuantizer first (and rebuild " +
        "it after any rebalance/merge/retrain)")
    val rowFilter: DataFrame => DataFrame = matchIds match {
      case Some(ids) => df =>
        annTombstoneMask(df).join(ids, Seq("id"), "left_semi")
      case None => annTombstoneMask
    }
    graft.operators.Ann.ivfSearchL2PrunedHier(spark, annPath, "id", "vec",
      queries.select(col("qid"), col("qvec")), "qid", "qvec", k, nProbe,
      superProbe, rowFilter = rowFilter)
  }

  /** Delete any quantizer aux dirs a PREVIOUS build persisted except
    * those in `keep` ("+"-separated) — rebuild hygiene: the kind
    * marker and its aux state must change together or searches
    * misdispatch/misread.
    */
  private def clearAnnAux(keep: String): Unit = {
    val keeps = keep.split('+').toSet
    Seq("codebook", "sq", "opq", "bq", "super").filterNot(keeps.contains).foreach { d =>
      val p = new Path(s"$annPath/$d")
      if (annFs.exists(p)) annFs.delete(p, true)
    }
  }

  /** IVF-SQ8 index through the store facade (FAISS `IVFx,SQ8`): index
    * rows carry `dim` 8-bit codes on a per-dimension linear grid
    * instead of `dim` float32s — 4× fewer index bytes scanned per
    * probe, NO codebook k-means to train (the grid is one min/max
    * pass), and reconstruction error bounded by half a grid step per
    * dimension (vs PQ's unbounded subspace-centroid error). The
    * middle rung of the quantization ladder the facade now offers:
    * flat (exact, 1×) → SQ8 (~4×, near-exact) → PQ/residual-PQ
    * (~16-32×, ADC-approximate). Search ranks by SQDC distance (exact
    * float32 L2 to the decoded reconstruction) via the SAME pruned
    * flat-IVF core, and accepts `refine` for exact re-ranking over the
    * live vectors. Maintenance matches the PQ contract: O(batch)
    * append encodes with the PERSISTED grid (out-of-range values
    * saturate at the grid edge — drift is a rebuild trigger, not an
    * ingest side effect), deletes mask through tombstone generations,
    * post-compaction rebuilds re-encode without retraining. L2 only
    * (cosine callers normalize, as with PQ).
    */
  /** @param clipQuantile train the 8-bit grid on per-dimension
    *   [q, 1−q] quantiles instead of [min, max] (0 = exact range) —
    *   see [[graft.operators.Sq.fit]]; out-of-range values saturate
    *   at the grid edge on search, append, and rebuild alike.
    */
  def buildAnnIndexSq(nCentroids: Int, iters: Int = 5,
      seedRounds: Int = 2, clipQuantile: Double = 0.0): Unit = {
    val proj = liveWithGen.select($"id", $"vec", col(GenCol))
    val cents = graft.operators.Ann.kmeans(proj, "id", "vec", nCentroids,
      iters, seedRounds)
    val params = graft.operators.Sq.fit(proj, "vec", dim, clipQuantile)
    val enc = graft.operators.Ann.assign(proj, "id", "vec", cents)
      .withColumn("codes", graft.operators.Sq.encodeCol($"vec", params))
      .drop("vec")
    graft.operators.Ann.writeIvfIndex(enc, cents, annPath)
    graft.operators.Sq.writeParams(spark, s"$annPath/sq", params)
    writeAnnKindMarker("ivfsq")
    clearAnnAux(keep = "sq")
    writeBuildMeta(Map("builder" -> "ivfsq", "nCentroids" -> nCentroids,
      "iters" -> iters, "seedRounds" -> seedRounds,
      "clipQuantile" -> clipQuantile))
    writeMaintMeta(Map.empty) // a fresh recipe resets any retrain cooldown
    refreshAnnCellStatsAfterRewrite()
  }

  /** IVF-BQ index through the store facade (pgvector binary-quantize
    * + rescore): index rows carry `ceil(dim/32)` packed sign-bit
    * words instead of `dim` float32s — 32× fewer index bytes scanned
    * per probe, the bottom rung of the facade's quantization ladder
    * (flat 1× → SQ8 4× → PQ/OPQ/residual 16-32× → BQ 32×). Candidate
    * generation ranks by XOR+popcount hamming (integer ALU inside
    * whole-stage codegen); because hamming is a rank signal rather
    * than a distance estimate, search REQUIRES `refine >= k` — the
    * shortlist always re-ranks by exact float32 L2 over the live
    * vectors, and returned distances are TRUE distances (the
    * [[graft.operators.Bq]] contract). Maintenance matches the SQ/PQ
    * contract: O(batch) append packs with the PERSISTED thresholds,
    * deletes mask through tombstone generations, post-compaction
    * rebuilds re-pack without retraining. L2 probing only (cosine
    * callers normalize, as with PQ/SQ).
    */
  def buildAnnIndexBq(nCentroids: Int, iters: Int = 5,
      seedRounds: Int = 2): Unit = {
    val proj = liveWithGen.select($"id", $"vec", col(GenCol))
    val cents = graft.operators.Ann.kmeans(proj, "id", "vec", nCentroids,
      iters, seedRounds)
    val params = graft.operators.Bq.fit(proj, "vec", dim)
    val enc = graft.operators.Ann.assign(proj, "id", "vec", cents)
      .withColumn("codes", graft.operators.Bq.encodeCol($"vec", params))
      .drop("vec")
    graft.operators.Ann.writeIvfIndex(enc, cents, annPath)
    graft.operators.Bq.writeParams(spark, s"$annPath/bq", params)
    writeAnnKindMarker("ivfbq")
    clearAnnAux(keep = "bq")
    writeBuildMeta(Map("builder" -> "ivfbq", "nCentroids" -> nCentroids,
      "iters" -> iters, "seedRounds" -> seedRounds))
    writeMaintMeta(Map.empty) // a fresh recipe resets any retrain cooldown
    refreshAnnCellStatsAfterRewrite()
  }

  /** The persisted ANN index's metric ("l2" | "cosine"); "l2" when no
    * index exists (the only metric a pre-metric layout can carry).
    */
  def annMetric: String = graft.operators.Ann.readIvfMetric(spark, annPath)

  /** The persisted index kind: "ivf" (flat vectors), "ivfsq" (8-bit
    * scalar-quantized codes), "ivfbq" (packed sign bits),
    * or "ivfpq"/"ivfpq_res" (PQ codes); "ivf" when no marker exists.
    */
  def annKind: String = {
    val p = new Path(s"$annPath/kind")
    if (!annFs.exists(p)) "ivf"
    else {
      val in = annFs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
  }

  private def writeAnnKindMarker(kind: String): Unit = {
    val p = new Path(s"$annPath/kind")
    val out = annFs.create(p, true)
    try out.write(kind.getBytes("UTF-8")) finally out.close()
  }

  /** IVF-PQ index through the store facade — the 100 TB memory story:
    * the index rows carry `m` byte-ish codes (array<int> of sub-cell
    * ids) instead of `dim` floats, so a 64-dim float32 corpus indexes
    * at ~1/16th the bytes scanned per probe; search ranks by ADC
    * distance (exact L2 to the PQ reconstruction — approximate for the
    * true vector, the PQ trade). Same maintenance contract as the flat
    * index: O(batch) append re-uses the persisted coarse centroids AND
    * codebook (drift is a rebuild trigger, not an ingestion side
    * effect), deletes mask through the same tombstone generations, and
    * post-compaction rebuilds re-encode live rows without retraining.
    * L2 only (the FAISS default pairing; cosine callers normalize and
    * use the flat cosine index).
    *
    * `residual = true` selects residual encoding (the FAISS
    * `IVFx,PQy` default): codes quantize `v − centroid(cell)` instead
    * of the raw vector — once the coarse quantizer has localized a
    * cell, residual magnitudes are far smaller, so the same (m, k)
    * budget buys lower reconstruction error at identical storage
    * ([[graft.operators.Pq.ivfPqBuildResidual]]). Search, O(batch)
    * append, and post-compaction rebuild all dispatch on the persisted
    * kind marker, so the choice is a build-time flag, not an API fork.
    */
  /** `opq = true` (raw layout only) trains an Optimized-PQ rotation
    * first (Ge et al. CVPR 2013; FAISS `OPQx,...,PQy`) and builds the
    * whole IVF-PQ index in the ROTATED space — the orthogonal rotation
    * preserves L2 exactly, so search/append/delete semantics are
    * unchanged while the codebooks fit correlated dims with lower
    * reconstruction error at the same (m, k) budget. Queries are
    * rotated driver-side before probing/ADC; the exact-refine stage
    * re-ranks with the ORIGINAL vectors (L2 is rotation-invariant).
    */
  def buildAnnIndexPq(nCells: Int, m: Int, k: Int, iters: Int = 5,
      residual: Boolean = false, opq: Boolean = false,
      opqSweeps: Int = 2): Unit = {
    require(!(residual && opq),
      "residual + opq in one index is not supported — pick one " +
        "(FAISS pairs OPQ with the raw PQ layout)")
    val proj0 = liveWithGen.select($"id", $"vec", col(GenCol))
    val proj =
      if (!opq) proj0
      else {
        val aMat = graft.operators.Opq.trainRotation(
          proj0.select($"id", $"vec"), "id", "vec", dim, m, k, iters,
          sweeps = opqSweeps)
        graft.operators.Opq.writeRotation(spark, s"$annPath/opq", aMat)
        proj0.withColumn("vec", mat_vec($"vec", aMat))
      }
    val (enc, cents, cb) =
      if (residual)
        graft.operators.Pq.ivfPqBuildResidual(
          proj.select($"id", $"vec"), "id", "vec", dim, nCells, m, k, iters)
      else
        graft.operators.Pq.ivfPqBuild(
          proj.select($"id", $"vec"), "id", "vec", dim, nCells, m, k, iters)
    // the encoder projects to (id, centroid_id, codes) — join the
    // write generation back so the tombstone mask works on index rows
    val encG = enc.join(proj.select($"id", col(GenCol)), Seq("id"))
    graft.operators.Ann.writeIvfIndex(encG, cents, annPath)
    graft.operators.Pq.writeCodebook(spark, s"$annPath/codebook", cb)
    writeAnnKindMarker(
      if (residual) "ivfpq_res" else if (opq) "ivfpq_opq" else "ivfpq")
    clearAnnAux(keep = if (opq) "codebook+opq" else "codebook")
    writeBuildMeta(Map("builder" -> "ivfpq", "nCells" -> nCells,
      "m" -> m, "k" -> k, "iters" -> iters, "residual" -> residual,
      "opq" -> opq, "opqSweeps" -> opqSweeps))
    writeMaintMeta(Map.empty) // a fresh recipe resets any retrain cooldown
    refreshAnnCellStatsAfterRewrite()
  }

  /** True when the persisted index is PQ-compressed (raw or residual). */
  private def annKindIsPq: Boolean = annKind.startsWith("ivfpq")

  /** The PQ search core: driver-held queries probe the persisted
    * layout with source-level partition pruning, the tombstone mask
    * (and any extra row filter) composes BEFORE the ADC top-k.
    * Dispatches on the kind marker: raw-vector codes ("ivfpq") score
    * with per-query ADC tables, residual codes ("ivfpq_res") with
    * per-(query, probed-cell) tables. Query batches are chunked inside
    * [[graft.operators.Pq.ivfPqSearch]], so driver/broadcast ADC state
    * is bounded at any batch size.
    *
    * `refine > 0` adds the standard exact-refine stage (FAISS
    * refine / pgvector BQ+rescore): take the top-`refine` ADC
    * candidates per query, join them back to the LIVE float32 vectors,
    * and re-rank by exact L2 with the [[search]] (distance, id)
    * tie-break — the returned distances are then TRUE distances, not
    * reconstructions. `refine` = live-count degenerates to exact
    * brute-force (gated: `vs_ann_pq_refine`). Requires `refine >= k`.
    */
  private def searchApproxPqDF(queries: DataFrame, k: Int, nProbe: Int,
      extraFilter: DataFrame => DataFrame, refine: Int = 0): DataFrame = {
    require(refine == 0 || refine >= k,
      s"refine ($refine) must be 0 (off) or >= k ($k)")
    val qSeq = queries
      .select(col("qid").cast("long"), col("qvec").cast("array<float>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    qSeq.foreach { case (qid, q) =>
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"query $qid has dimension ${q.length}, store dimension is $dim")
    }
    // OPQ layout: probe/ADC run in the ROTATED space (the index was
    // built there); the exact-refine stage below keeps the ORIGINAL
    // queries — L2 is rotation-invariant, so refined distances are
    // true distances either way
    val qSeqAdc =
      if (annKind == "ivfpq_opq") {
        val aMat = graft.operators.Opq.readRotation(spark, s"$annPath/opq")
        qSeq.map { case (qid, q) =>
          (qid, graft.operators.Opq.rotate(aMat, q)) }
      } else qSeq
    val cents = spark.read.parquet(s"$annPath/centroids")
    val cb = graft.operators.Pq.readCodebook(spark, s"$annPath/codebook")
    val cells = graft.operators.Pq.probedCells(cents, qSeqAdc, nProbe)
    val idx = extraFilter(annTombstoneMask(
      spark.read.parquet(s"$annPath/index")
        .filter(col("centroid_id").isin(cells: _*)) // → PartitionFilters
        .withColumn("centroid_id", col("centroid_id").cast("long"))))
    val shortK = if (refine > 0) refine else k
    val adc =
      if (annKind == "ivfpq_res")
        graft.operators.Pq.ivfPqSearchResidual(idx, "id", "codes", cents, cb,
          qSeqAdc, shortK, nProbe)
      else
        graft.operators.Pq.ivfPqSearch(idx, "id", "codes", cents, cb,
          qSeqAdc, shortK, nProbe)
    if (refine == 0)
      adc.select(col("qid"), col("id"),
        col("adc_dist").cast("float").as("distance"), col("rn"))
    else {
      import spark.implicits._
      refineRerank(adc, qSeq.toDF("qid", "qvec"), k)
    }
  }

  /** Exact-refine (FAISS refine / pgvector rescore), shared by the PQ
    * and SQ search cores: |Q| × refine shortlist rows join the live
    * (id, vec) projection (shortlist ids are live by construction —
    * the tombstone mask runs before the shortlist top-k), re-rank by
    * exact float32 L2 against the broadcast queries with the
    * [[search]] (distance, id) tie-break. Returned distances are TRUE
    * distances, not reconstructions.
    */
  private def refineRerank(shortlist: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val rescored = shortlist.select(col("qid"), col("id"))
      .join(indexDf, Seq("id"))
      .join(broadcast(queries.select(col("qid"), col("qvec"))), Seq("qid"))
      .withColumn("distance", l2_distance($"vec", $"qvec"))
      .select(col("qid"), col("id"), col("distance"))
    graft.operators.TopKAggregator.topKRows(
        rescored, "qid", "id", "distance", k)
      .select(col("qid"), col("id"),
        col("distance").cast("float").as("distance"), col("rn"))
  }

  /** The SQ search core: decode index codes to their grid
    * reconstruction (a `transform` projection over the persisted
    * params — bounded plan state, Q-independent) and run the SAME
    * pruned flat-IVF search over the decoded rows: queries stay a
    * DataFrame end to end (no driver collect, unlike the PQ path's
    * ADC tables), the tombstone mask (and any extra row filter)
    * composes BEFORE the top-k, and distances are exact float32 L2 to
    * the reconstruction (SQDC). `refine > 0` re-ranks the top-`refine`
    * SQDC candidates by exact L2 over the LIVE vectors; `refine` =
    * live-count degenerates to exact brute force (gated: `vs_ann_sq`).
    */
  private def searchApproxSqDF(queries: DataFrame, k: Int, nProbe: Int,
      extraFilter: DataFrame => DataFrame, refine: Int = 0): DataFrame = {
    require(refine == 0 || refine >= k,
      s"refine ($refine) must be 0 (off) or >= k ($k)")
    val params = graft.operators.Sq.readParams(spark, s"$annPath/sq")
    val rowFilter: DataFrame => DataFrame = df =>
      extraFilter(annTombstoneMask(df))
        .withColumn("vec", graft.operators.Sq.decodeCol(col("codes"), params))
    val shortK = if (refine > 0) refine else k
    val q = queries.select(col("qid"), col("qvec"))
    val sqdc = graft.operators.Ann.ivfSearchL2Pruned(spark, annPath,
      "id", "vec", q, "qid", "qvec", shortK, nProbe, rowFilter)
    if (refine == 0)
      sqdc.select(col("qid"), col("id"),
        col("distance").cast("float").as("distance"), col("rn"))
    else refineRerank(sqdc, q, k)
  }

  /** The BQ search core: hamming candidate generation over packed
    * sign bits ([[graft.operators.Bq.ivfBqSearch]] — probed cells
    * partition-pruned, tombstone mask and any caller predicate
    * composed BEFORE the shortlist cut) followed by the MANDATORY
    * exact re-rank over the live vectors. Hamming counts disagreeing
    * half-spaces — a rank signal, not an L2 estimate — so unlike
    * PQ/SQ there is no refine-free mode: `refine >= k` is the
    * contract (pgvector BQ+rescore), and `refine` = live-count
    * degenerates to exact brute force (gated: `vs_ann_bq`).
    */
  private def searchApproxBqDF(queries: DataFrame, k: Int, nProbe: Int,
      extraFilter: DataFrame => DataFrame, refine: Int): DataFrame = {
    require(refine >= k,
      s"BQ search requires refine >= k (got refine=$refine, k=$k): " +
        "hamming over sign bits ranks candidates but is not an L2 " +
        "estimate — the exact rescore is mandatory")
    val rowFilter: DataFrame => DataFrame = df =>
      extraFilter(annTombstoneMask(df))
    val q = queries.select(col("qid"), col("qvec"))
    val shortlist = graft.operators.Bq.ivfBqSearch(spark, annPath,
      q, "qid", "qvec", refine, nProbe, rowFilter)
    refineRerank(shortlist, q, k)
  }

  def dropAnnIndex(): Unit = {
    val p = new Path(annPath)
    if (annFs.exists(p)) annFs.delete(p, true)
  }

  /** Re-assign the live table against the EXISTING centroids and swap
    * the index rows — the post-compaction (or plain-layout delete)
    * refresh: O(live) map-side work, no k-means retrain.
    */
  private def rebuildAnnRowsFromCentroids(): Unit = if (hasAnnIndex) {
    val cents = spark.read.parquet(s"$annPath/centroids")
    val proj = liveWithGen.select($"id", $"vec", col(GenCol))
    val staged = s"$annPath/_index-staging"
    val assigned =
      if (annKind == "ivfpq_res") {
        // re-encode live-row RESIDUALS with the persisted codebook
        val cb = graft.operators.Pq.readCodebook(spark, s"$annPath/codebook")
        graft.operators.Pq.encodeResidualAssigned(
            graft.operators.Ann.assign(proj, "id", "vec", cents),
            "vec", "codes", cents, cb)
          .drop("vec")
      } else if (annKind == "ivfpq" || annKind == "ivfpq_opq") {
        // re-encode live rows with the PERSISTED codebook — no retrain
        // (OPQ layout: rotate into index space with the PERSISTED
        // rotation first)
        val cb = graft.operators.Pq.readCodebook(spark, s"$annPath/codebook")
        val src =
          if (annKind == "ivfpq_opq") {
            val aMat = graft.operators.Opq.readRotation(spark, s"$annPath/opq")
            proj.withColumn("vec", mat_vec($"vec", aMat))
          } else proj
        graft.operators.Pq.encode(
            graft.operators.Ann.assign(src, "id", "vec", cents),
            "vec", "codes", cb)
          .drop("vec")
      } else if (annKind == "ivfsq") {
        // re-encode live rows with the PERSISTED grid — no retrain
        val params = graft.operators.Sq.readParams(spark, s"$annPath/sq")
        graft.operators.Ann.assign(proj, "id", "vec", cents)
          .withColumn("codes", graft.operators.Sq.encodeCol($"vec", params))
          .drop("vec")
      } else if (annKind == "ivfbq") {
        // re-pack live rows with the PERSISTED thresholds — no retrain
        val params = graft.operators.Bq.readParams(spark, s"$annPath/bq")
        graft.operators.Ann.assign(proj, "id", "vec", cents)
          .withColumn("codes", graft.operators.Bq.encodeCol($"vec", params))
          .drop("vec")
      } else if (annMetric == "cosine")
        graft.operators.Ann.assignCosine(proj, "id", "vec", cents)
      else graft.operators.Ann.assign(proj, "id", "vec", cents)
    assigned
      .repartition(col("centroid_id"))
      .sortWithinPartitions(col("centroid_id"))
      .write.mode("overwrite").partitionBy("centroid_id").parquet(staged)
    if (!annFs.delete(annIndexPath, true) && annFs.exists(annIndexPath))
      throw new java.io.IOException(s"could not clear $annIndexPath")
    if (!annFs.rename(new Path(staged), annIndexPath))
      throw new java.io.IOException(s"could not activate rebuilt index at $annIndexPath")
    refreshAnnCellStatsAfterRewrite()
  }

  /** Append freshly-written rows (id, vec) to the index at their
    * current write-generation — the O(batch) insert maintenance step.
    */
  private def annAppend(rows: DataFrame): Unit = if (hasAnnIndex) {
    val gen = storage match {
      case t: TombstoneStorage => t.currentVersion()
      case _ => 0L
    }
    val batch = rows.select($"id", $"vec").withColumn(GenCol, lit(gen))
    // per-cell assignment counts are collected from the append's own
    // cached batch whenever a policy consumes them OR a persisted
    // stats table exists — the latter keeps the table exact across a
    // disable/re-enable cycle (and across handles that never enabled
    // maintenance): without it, appends with maintenance off would
    // skip the O(batch) bump while enableAutoMaintenance only recounts
    // when the file is MISSING, leaving triggers on undercounted cells
    val wantCounts = maintenance.isDefined || annFs.exists(annCellStatsPath)
    val deltas = annKind match {
      case "ivfpq_res" =>
        graft.operators.Pq.appendToIvfPqIndexResidual(spark, annPath, batch,
          "id", "vec", wantCounts)
      case "ivfpq" =>
        graft.operators.Pq.appendToIvfPqIndex(spark, annPath, batch,
          "id", "vec", wantCounts)
      case "ivfpq_opq" =>
        // rotate the fresh batch into index space with the PERSISTED
        // rotation, then the standard O(batch) PQ append
        val aMat = graft.operators.Opq.readRotation(spark, s"$annPath/opq")
        graft.operators.Pq.appendToIvfPqIndex(spark, annPath,
          batch.withColumn("vec", mat_vec($"vec", aMat)), "id", "vec",
          wantCounts)
      case "ivfsq" =>
        graft.operators.Sq.appendToIvfSqIndex(spark, annPath, batch,
          "id", "vec", wantCounts)
      case "ivfbq" =>
        graft.operators.Bq.appendToIvfBqIndex(spark, annPath, batch,
          "id", "vec", wantCounts)
      case _ =>
        graft.operators.Ann.appendToIvfIndex(spark, annPath, batch,
          "id", "vec", wantCounts)
    }
    if (wantCounts) bumpAnnCellStats(deltas)
    maybeMaintainAnnAfterAppend()
  }

  // ----------------------- single-writer lease --------------------- //
  //
  // The store is single-writer BY CONSTRUCTION in the reference (id
  // assignment reads max(id) then appends — two steps no second writer
  // may interleave; SURVEY §1.4) and the Spark port inherits the
  // assumption. This makes it CHECKED instead of silent: a handle
  // claims a lease file under the root ON ITS FIRST MUTATION (opening
  // a handle purely to read never touches the lease, so reporting/
  // diagnostic opens cannot invalidate a live writer), last claimer
  // wins — the sequential-reopen pattern stays legal — and every
  // mutating entry point verifies the lease still carries this
  // handle's token. A second writer therefore makes the FIRST handle
  // fail fast on its next write, instead of both assigning the same
  // ids and silently corrupting the table. Reads never check: any
  // number of readers is fine.
  //
  // The claim itself is fenced: the lease file is written via
  // create-no-overwrite and read back, so of two RACING claimers
  // exactly one reads its own token and proceeds — the other fails at
  // claim time instead of both "re-claiming a missing lease" and
  // writing concurrently. The residual window is BEST-EFFORT and
  // documented: a mutation verifies the token BEFORE it runs, so a
  // second writer whose claim lands between that check and the
  // mutation's storage commit still interleaves that one batch (the
  // stale handle then fails on its NEXT write). A filesystem-lock-free
  // lease cannot close that window completely; the contract here is
  // fail-fast detection, not mutual exclusion.

  private val writerToken = java.util.UUID.randomUUID().toString
  private def leasePath = new Path(path, "_writer.lease")
  @volatile private var leaseClaimed = false

  private def readLeaseToken(fs: org.apache.hadoop.fs.FileSystem): Option[String] =
    if (!fs.exists(leasePath)) None
    else {
      val in = fs.open(leasePath)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }

  /** Take the writer lease over (last claimer wins): remove the
    * current holder's lease, create ours no-overwrite, then VERIFY by
    * reading back — a racer that lost the create sees the winner's
    * token and throws here instead of proceeding to write.
    */
  private[graft] def claimWriterLease(): Unit = {
    // anything primed before this handle held the lease may be stale
    // (another writer could have mutated in between) — drop it before
    // the first lease-protected read re-primes it
    invalidateHandleCaches()
    val fs = leasePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(leasePath)) fs.delete(leasePath, false)
    // keep the create failure: a transient FS error (permissions,
    // quota) must surface as the CAUSE, not be misdiagnosed as a lost
    // claim race by the verify below
    var createFailure: Option[java.io.IOException] = None
    try {
      val out = fs.create(leasePath, false)
      try out.write(writerToken.getBytes("UTF-8")) finally out.close()
    } catch {
      // another claimer's create won the race — the verify below fails
      case e: java.io.IOException => createFailure = Some(e)
    }
    if (!readLeaseToken(fs).contains(writerToken)) {
      val ex = new IllegalStateException(
        s"single-writer violation: lost the writer-lease claim race on " +
        s"$path to another handle" +
        createFailure.fold("")(e =>
          s" (lease create failed: ${e.getMessage} — if that error is " +
          "not a plain already-exists, suspect an FS fault, not a " +
          "racing writer)") +
        ". The winning claimer owns the store; re-open (or retry the " +
        "mutation) to take over.")
      createFailure.foreach(ex.initCause)
      throw ex
    }
    leaseClaimed = true
  }

  /** Fail fast if another handle claimed the writer lease since this
    * one did (the single-writer contract, checked). The FIRST mutation
    * through this handle claims the lease (reads never do); a missing
    * lease (pre-lease layout, or manually deleted) is re-claimed.
    */
  private def assertSingleWriter(): Unit = {
    val fs = leasePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!leaseClaimed || !fs.exists(leasePath)) { claimWriterLease(); return }
    if (!readLeaseToken(fs).contains(writerToken)) {
      // this handle lost the lease: its derived caches may already be
      // stale (the new writer has been mutating), so drop them before
      // failing fast — later reads through this handle stay live-exact
      invalidateHandleCaches()
      throw new IllegalStateException(
        s"single-writer violation: store at $path was claimed by another " +
        "writer handle after this one (the lease token changed). The " +
        "newest claimer owns the store; re-open to take over.")
    }
  }

  // ------------------- automatic index maintenance ----------------- //
  //
  // The trigger loop around the existing maintenance moves
  // ([[rebalanceAnnIndex]], [[mergeAnnIndexCells]], [[buildLexIndex]]
  // as posting compaction), hooked INSIDE the index lifecycle methods
  // so every mutation path — insert/insertDF/upsert/deleteWhere*/
  // streaming ingest — is covered without per-call-site wiring, the
  // same choke-point placement as TombstoneStorage.maybeAutoCompact.
  // No recursion: the triggered moves rewrite index partitions
  // directly and never re-enter the append/delete hooks.

  @volatile private var maintenance: Option[IndexMaintenancePolicy] = None

  /** Opt in to threshold-driven automatic maintenance (see
    * [[IndexMaintenancePolicy]]). In effect for this handle from now
    * on; call [[disableAutoMaintenance]] to stop. Enabling seeds the
    * persisted per-cell stats once (one aggregate over the slim index)
    * so every later append pays only its own O(batch) delta — no
    * per-mutation job ever scales with the index again.
    */
  def enableAutoMaintenance(policy: IndexMaintenancePolicy): Unit = {
    maintenance = Some(policy)
    if (hasAnnIndex && readAnnCellStats().isEmpty) recomputeAnnCellStats()
    // dead-fraction counters seed once here (exact: live + pending
    // tombstones) so every later delete pays only a marker write
    if (policy.docMaxDeadFraction > 0.0
        && (materializedDocFields.nonEmpty
          || materializedNumericDocFields.nonEmpty)
        && readDeadStats(docDeadStatsPath).isEmpty)
      seedDeadStats(docDeadStatsPath)
    if (policy.lexMaxDeadFraction > 0.0 && hasLexIndex
        && readDeadStats(lexDeadStatsPath).isEmpty)
      seedDeadStats(lexDeadStatsPath)
  }

  def disableAutoMaintenance(): Unit = maintenance = None

  // -------------------- incremental index stats -------------------- //
  //
  // The maintenance triggers' source of truth: per-cell index row
  // counts persisted as a tiny text table beside the layout, updated
  // O(batch) from each append's own assignment counts (the append
  // computes them anyway) and left untouched by tombstone deletes
  // (index rows don't move). The full `groupBy(centroid_id).count()`
  // aggregate runs ONLY when the rows themselves were rewritten —
  // build/rebuild/rebalance/merge/compaction — where it is noise next
  // to the rewrite. A trigger check is therefore pure driver-side
  // arithmetic over O(cells) numbers: an append with a policy enabled
  // runs NO job proportional to index size unless a trigger fires.

  private def annCellStatsPath = new Path(annPath, "cellstats")

  private def readAnnCellStats(): Option[Map[Long, Long]] =
    if (!annFs.exists(annCellStatsPath)) None
    else {
      val in = annFs.open(annCellStatsPath)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      Some(body.split("\n").iterator.filter(_.contains("\t")).map { l =>
        val Array(c, n) = l.split("\t", 2); c.toLong -> n.toLong
      }.toMap)
    }

  private def writeAnnCellStats(m: Map[Long, Long]): Unit = {
    val staging = new Path(annPath,
      s"_cellstats.staging-${java.util.UUID.randomUUID()}")
    val body = m.toSeq.sorted.map { case (c, n) => s"$c\t$n" }.mkString("\n")
    val out = annFs.create(staging, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    activateMarker(staging, annCellStatsPath)
  }

  /** The one O(index) stats path: recount every cell from the index
    * rows and persist. Runs at policy enable and after full row
    * rewrites — never per mutation.
    */
  private[graft] def recomputeAnnCellStats(): Map[Long, Long] = {
    val m = spark.read.parquet(s"$annPath/index")
      .groupBy(col("centroid_id").cast("long").as("c")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    writeAnnCellStats(m)
    m
  }

  /** Fold an append's per-cell assignment counts into the persisted
    * stats — O(batch) input, O(cells) state, zero Spark jobs. A
    * missing stats file (pre-stats layout, policy enabled mid-flight)
    * recounts once; the recount runs AFTER the append landed, so the
    * deltas are already included and must not be re-added.
    */
  private def bumpAnnCellStats(deltas: Array[(Long, Long)]): Unit =
    if (deltas.nonEmpty) readAnnCellStats() match {
      case Some(cur) =>
        val m = scala.collection.mutable.Map.empty[Long, Long] ++= cur
        deltas.foreach { case (c, n) => m(c) = m.getOrElse(c, 0L) + n }
        writeAnnCellStats(m.toMap)
      case None => recomputeAnnCellStats()
    }

  /** Row rewrites (build/rebuild/rebalance/merge/compaction refresh)
    * invalidate the per-cell stats; with an active policy they are
    * recounted immediately (the rewrite was O(index) anyway) so the
    * next O(batch) append stays job-free.
    */
  private def refreshAnnCellStatsAfterRewrite(): Unit = {
    if (annFs.exists(annCellStatsPath))
      annFs.delete(annCellStatsPath, false)
    if (maintenance.isDefined && hasAnnIndex) recomputeAnnCellStats()
  }

  /** Stats for a trigger decision: the persisted table, or ONE recount
    * for layouts that predate it.
    */
  private def annCellStatsForTriggers(): Map[Long, Long] =
    readAnnCellStats().getOrElse(recomputeAnnCellStats())

  // Cooldown marker for the quantized-imbalance retrain: when a
  // policy-triggered full retrain does NOT bring the imbalance under
  // the threshold (the skew is inherent to the data distribution, not
  // centroid drift), the post-rebuild imbalance is recorded here and
  // the trigger stays suppressed until the observed imbalance exceeds
  // it again (the data actually got worse) — without this, EVERY
  // append above the threshold re-fires a synchronous O(corpus)
  // retrain that cannot help (the `frozen` discipline
  // rebalanceIvfCells applies to unsplittable cells, applied to the
  // retrain trigger).
  private def maintMetaPath = new Path(annPath, "maint.meta")

  private def readMaintMeta(): Map[String, String] =
    if (!annFs.exists(maintMetaPath)) Map.empty
    else {
      val in = annFs.open(maintMetaPath)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      body.split("\n").filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    }

  private def writeMaintMeta(kv: Map[String, String]): Unit =
    if (kv.isEmpty) {
      if (annFs.exists(maintMetaPath)) annFs.delete(maintMetaPath, false)
    } else {
      val out = annFs.create(maintMetaPath, true)
      val body = kv.map { case (k, v) => s"$k=$v" }.mkString("\n")
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }

  private def maybeMaintainAnnAfterAppend(): Unit = maintenance.foreach { p =>
    if ((p.maxCellRows > 0L || p.quantizedRebuildImbalance > 0.0)
        && hasAnnIndex) {
      val stats = annCellStatsForTriggers()
      if (stats.nonEmpty) {
        if (p.maxCellRows > 0L && annKind == "ivf") {
          val mx = stats.values.max
          if (mx > p.maxCellRows) {
            val rep = rebalanceAnnIndex(p.maxCellRows)
            logInfo(s"auto-maintenance: hottest cell $mx rows " +
              s"> ${p.maxCellRows}, split ${rep.splitCells} cells")
          }
        }
        if (p.quantizedRebuildImbalance > 0.0 && annKind != "ivf") {
          val imb = stats.values.max /
            math.max(stats.values.sum.toDouble / stats.size, 1e-12)
          val frozenAt = readMaintMeta().get("quantFrozenImbalance")
            .flatMap(_.toDoubleOption)
          if (imb > p.quantizedRebuildImbalance) {
            // 25% headroom over the frozen value: appends into the hot
            // cell nudge the ratio up a hair per batch, which must not
            // defeat the cooldown — only a materially worse skew
            // (data actually changed) earns another retrain attempt
            if (frozenAt.exists(f => imb <= f * 1.25)) {
              logInfo(f"auto-maintenance: quantized '$annKind' imbalance " +
                f"$imb%.2f > ${p.quantizedRebuildImbalance} but a previous " +
                f"retrain converged at ${frozenAt.get}%.2f — trigger " +
                "suppressed (inherent skew, a retrain cannot help)")
            } else {
              rebuildAnnIndex()
              val after = annCellStatsForTriggers()
              val newImb =
                if (after.isEmpty) 0.0
                else after.values.max /
                  math.max(after.values.sum.toDouble / after.size, 1e-12)
              if (newImb > p.quantizedRebuildImbalance)
                writeMaintMeta(Map("quantFrozenImbalance" -> newImb.toString))
              else writeMaintMeta(Map.empty)
              logInfo(f"auto-maintenance: quantized '$annKind' imbalance " +
                f"$imb%.2f > ${p.quantizedRebuildImbalance}, retrained via " +
                f"the persisted build recipe (now $newImb%.2f)")
            }
          }
        }
      }
    }
  }

  private def maybeMaintainAnnAfterDelete(): Unit = maintenance.foreach { p =>
    if (p.minCellRows > 0L && hasAnnIndex && annKind == "ivf") {
      // per-cell INDEX rows: tombstone deletes leave them unchanged,
      // so the persisted stats are still exact here (a compaction that
      // rewrote the rows refreshed them on its own path)
      val stats = annCellStatsForTriggers()
      // merging needs >= 2 non-empty cells to move rows
      if (stats.size > 1 && stats.values.min < p.minCellRows) {
        val rep = mergeAnnIndexCells(p.minCellRows)
        logInfo(s"auto-maintenance: coldest cell ${stats.values.min} rows " +
          s"< ${p.minCellRows}, dissolved ${rep.mergedCells} cells")
      }
    }
  }

  private def maybeMaintainDocIdxAfterAppend(): Unit =
    maintenance.foreach { p =>
      if (p.docMaxFiles > 0L) {
        val fields = materializedDocFields
        val numFields = materializedNumericDocFields
        // bookkept per-sidecar counts (append-side, exact) — tiny
        // marker reads, never a per-append recursive walk
        val worst = (fields.map(docIdxDir) ++ numFields.map(docIdxNumDir))
          .map(sidecarFileCount).maxOption.getOrElse(0L)
        if (worst > p.docMaxFiles) {
          fields.foreach(materializeDocField)
          numFields.foreach(materializeDocFieldNumeric)
          logInfo(s"auto-maintenance: a doc sidecar passed ${p.docMaxFiles} " +
            "files, rebuilt all sidecars (compaction)")
        }
      }
    }

  private def maybeMaintainLexAfterAppend(): Unit = maintenance.foreach { p =>
    if (p.lexMaxFiles > 0L && hasLexIndex) {
      // bookkept count (append-side, exact) — one tiny marker read,
      // never a per-append walk of the posting table's listing
      if (graft.operators.LexIndex.fileCount(spark, lexRoot) > p.lexMaxFiles) {
        buildLexIndex()
        logInfo(s"auto-maintenance: posting index passed ${p.lexMaxFiles} " +
          "files, rebuilt (compaction)")
      }
    }
  }

  // ------------------ dead-fraction bookkeeping ------------------- //
  //
  // The delete-side twin of the cellstats pattern (r12 verdict #2):
  // the dead-fraction triggers used to run TWO index-sized count jobs
  // per delete. Instead, each family persists a tiny (total, dead)
  // counter pair — appends fold their own batch size into `total`,
  // deletes fold their own tombstoned-row count into `dead`, and a
  // full family rebuild resets to (live, 0). A trigger check is then
  // pure driver arithmetic over two numbers. The fraction measures the
  // TABLE rows tombstoned since the family's last rebuild — the same
  // "one measurement speaks for all sidecars" approximation the old
  // probe-based check made (per-field sidecars, and posting rows per
  // doc, track the table's tombstone set). Seeding (at policy enable,
  // or lazily at the first stats-less check) charges one tombstone-log
  // count + one table count — never again per mutation.

  // markers live at the STORE root, not inside the family dirs:
  // listSidecarFields treats docidx/* entries as field names, and the
  // posting layout owns lex/* — a marker inside either would read back
  // as a phantom field / posting artifact
  private def docDeadStatsPath = new Path(path, "_docidx.deadstats")
  private def lexDeadStatsPath = new Path(path, "_lex.deadstats")

  private def readDeadStats(p: Path): Option[(Long, Long)] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val m = body.split("\n").filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim.toLong }
        .toMap
      Some((m.getOrElse("total", 0L), m.getOrElse("dead", 0L)))
    }
  }

  private def writeDeadStats(p: Path, total: Long, dead: Long): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(p.getParent,
      s"_deadstats.staging-${java.util.UUID.randomUUID()}")
    val out = fs.create(staging, true)
    try out.write(s"total=$total\ndead=$dead".getBytes("UTF-8"))
    finally out.close()
    activateMarker(staging, p)
  }

  /** Exact-at-seed: live rows plus the pending tombstone count (rows
    * masked in the sidecars but not yet folded), so deletes that
    * PREDATE the seed still count toward the fraction.
    */
  private def seedDeadStats(p: Path): (Long, Long) = {
    val tomb = storage match {
      case t: TombstoneStorage => t.tombstoneCount()
      case _ => 0L
    }
    val stats = (table.count() + tomb, tomb)
    writeDeadStats(p, stats._1, stats._2)
    stats
  }

  /** Fold a mutation's own counts — no Spark job, maintained whenever
    * the file exists (the cellstats discipline: surviving a policy
    * disable/re-enable cycle).
    */
  private def bumpDeadStats(p: Path, dTotal: Long, dDead: Long): Unit =
    if (dTotal != 0L || dDead != 0L) readDeadStats(p).foreach {
      case (t, d) => writeDeadStats(p, t + dTotal, d + dDead)
    }

  /** A family rebuild folded its masked rows away: reset to (live, 0)
    * — the count is noise next to the rebuild that just ran.
    */
  private def resetDeadStatsAfterRewrite(p: Path): Unit =
    if (readDeadStats(p).isDefined) writeDeadStats(p, table.count(), 0L)

  private def maybeMaintainDocIdxAfterDelete(): Unit =
    maintenance.foreach { p =>
      if (p.docMaxDeadFraction > 0.0) {
        val fields = materializedDocFields
        val numFields = materializedNumericDocFields
        if (fields.nonEmpty || numFields.nonEmpty) {
          val (total, dead) = readDeadStats(docDeadStatsPath)
            .getOrElse(seedDeadStats(docDeadStatsPath))
          if (total > 0L && dead.toDouble / total > p.docMaxDeadFraction) {
            fields.foreach(materializeDocField)
            numFields.foreach(materializeDocFieldNumeric)
            resetDeadStatsAfterRewrite(docDeadStatsPath)
            logInfo(f"auto-maintenance: dead sidecar fraction " +
              f"${dead.toDouble / total}%.3f > ${p.docMaxDeadFraction}, " +
              s"rebuilt ${fields.size} string and ${numFields.size} " +
              "numeric doc-field sidecars")
          }
        }
      }
    }

  private def maybeMaintainLexAfterDelete(): Unit = maintenance.foreach { p =>
    if (p.lexMaxDeadFraction > 0.0 && hasLexIndex) {
      val (total, dead) = readDeadStats(lexDeadStatsPath)
        .getOrElse(seedDeadStats(lexDeadStatsPath))
      if (total > 0L && dead.toDouble / total > p.lexMaxDeadFraction) {
        buildLexIndex()
        logInfo(f"auto-maintenance: dead doc fraction " +
          f"${dead.toDouble / total}%.3f > ${p.lexMaxDeadFraction}, " +
          "rebuilt posting index")
      }
    }
  }

  /** Post-delete index maintenance: on the tombstone layout the query-
    * time mask covers the delete UNLESS this delete triggered a
    * compaction (tombstones folded ⇒ nothing left to mask with); the
    * plain layout rewrote the data and has no mask, so always rebuild.
    */
  private def annAfterDelete(): Unit = if (hasAnnIndex) {
    storage match {
      case t: TombstoneStorage =>
        if (t.tombstoneCount() == 0L) rebuildAnnRowsFromCentroids()
      case _ => rebuildAnnRowsFromCentroids()
    }
    maybeMaintainAnnAfterDelete()
  }

  private def annTombstoneMask: DataFrame => DataFrame = storage match {
    case t: TombstoneStorage => t.tombstoneFrame() match {
      case Some(tomb) => df =>
        df.join(broadcast(tomb),
          df("id") === tomb("id") && df(GenCol) < tomb("gen"), "left_anti")
      case None => identity
    }
    case _ => identity
  }

  /** Approximate k-NN against the persisted IVF layout: probe the
    * `nProbe` nearest cells per query (partition-pruned scan), mask
    * tombstoned rows, top-k by float32 L2 with the [[search]]
    * tie-break. `nProbe` = the built cell count degenerates to exact
    * search over live rows (gated: `vs_ann_search`). Same `k > n` and
    * dimension contracts as [[search]].
    */
  def searchApprox(queries: Seq[Array[Float]], k: Int, nProbe: Int,
      refine: Int = 0): Seq[Seq[SearchRecord]] = {
    val n = count()
    if (k > n)
      throw new IllegalArgumentException(
        s"k ($k) is larger than the number of stored vectors ($n)")
    queries.zipWithIndex.foreach { case (q, i) =>
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"query $i has dimension ${q.length}, store dimension is $dim")
    }
    val qdf = queries.zipWithIndex.map { case (v, i) => (i, v) }.toDF("qid", "qvec")
    val hits = searchApproxDF(qdf, k, nProbe, refine)
      .join(table.select($"id", $"vec", $"doc"), Seq("id"))
      .select($"qid".cast("int"), $"rn".cast("int"), $"id", $"vec", $"doc",
        $"distance")
      .collect()
    assemble(hits, queries.size)(r =>
      SearchRecord(r.getLong(2), r.getSeq[Float](3).toArray, r.getString(4), r.getFloat(5)))
  }

  /** DataFrame-in/DataFrame-out approximate search (`qid`, `qvec` →
    * `qid`, `id`, `distance`, `rn`) — the pipeline-facing variant, like
    * [[searchDF]] for [[search]]. Requires [[buildAnnIndex]].
    *
    * `refine` (quantized PQ/SQ indexes only): re-rank the top-`refine`
    * candidates per query by exact float32 L2 over the live vectors —
    * see [[searchApproxPqDF]]. On a flat index `refine` must be 0:
    * flat IVF distances are already exact, there is nothing to refine.
    */
  def searchApproxDF(queries: DataFrame, k: Int, nProbe: Int,
      refine: Int = 0): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(refine >= 0, s"refine must be >= 0, got $refine")
    if (!hasAnnIndex)
      throw new IllegalStateException(
        s"no ANN index at $annPath — call buildAnnIndex() first")
    if (annKindIsPq)
      searchApproxPqDF(queries, k, nProbe, identity, refine)
    else if (annKind == "ivfsq")
      searchApproxSqDF(queries, k, nProbe, identity, refine)
    else if (annKind == "ivfbq")
      searchApproxBqDF(queries, k, nProbe, identity, refine)
    else {
      require(refine == 0,
        "refine applies to quantized (PQ/SQ/BQ) indexes only — flat IVF " +
          "distances are already exact float32")
      graft.operators.Ann.ivfSearchPruned(spark, annPath, "id", "vec",
        queries.select(col("qid"), col("qvec")), "qid", "qvec", k, nProbe,
        rowFilter = annTombstoneMask)
    }
  }

  /** Filtered approximate search — [[searchWhere]]'s JSON-path
    * predicate composed with the pruned IVF probe: the metadata filter
    * becomes a semi-join of the probed (partition-pruned) index rows
    * against the live ids passing the predicate — a column-pruned,
    * predicate-pushed scan of the data files that never materializes
    * vectors — and, like the tombstone mask, it applies BEFORE the
    * top-k window, so k fills from filtered live survivors exactly as
    * [[searchWhere]] fills it (k caps at the match count; a selective
    * filter never errors). This is the filter+ANN contract every
    * large-scale vector store needs: at 10^8 rows [[searchWhere]]'s
    * brute-force scan stops being interactive, and post-filtering an
    * unfiltered top-k under-fills k whenever matches are rare.
    * Composes the reference's two search features
    * (vector_store.py:275-332 search, :334-356 query_by_doc) on the
    * indexed path. Recall caveat: candidates still come from the
    * `nProbe` probed cells, so a filter whose survivors live outside
    * the probe set returns fewer than k — raise `nProbe` (cells count
    * degenerates to exact) when the filter is very selective.
    */
  def searchApproxWhere(queries: Seq[Array[Float]], k: Int, nProbe: Int,
      pathSteps: Seq[String], values: Seq[Any]): Seq[Seq[SearchRecord]] = {
    if (k <= 0)
      throw new IllegalArgumentException(s"k must be a positive integer, got $k")
    queries.zipWithIndex.foreach { case (q, i) =>
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"query $i has dimension ${q.length}, store dimension is $dim")
    }
    val qdf = queries.zipWithIndex.map { case (v, i) => (i, v) }.toDF("qid", "qvec")
    val hits = searchApproxWhereDF(qdf, k, nProbe, pathSteps, values)
      .join(table.select($"id", $"vec", $"doc"), Seq("id"))
      .select($"qid".cast("int"), $"rn".cast("int"), $"id", $"vec", $"doc",
        $"distance")
      .collect()
    assemble(hits, queries.size)(r =>
      SearchRecord(r.getLong(2), r.getSeq[Float](3).toArray, r.getString(4), r.getFloat(5)))
  }

  /** DataFrame-in/DataFrame-out [[searchApproxWhere]] (`qid`, `qvec` →
    * `qid`, `id`, `distance`, `rn`) — the pipeline-facing variant.
    */
  def searchApproxWhereDF(queries: DataFrame, k: Int, nProbe: Int,
      pathSteps: Seq[String], values: Seq[Any],
      refine: Int = 0): DataFrame = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    searchApproxMatchDF(queries, k, nProbe,
      docMatchIds(pathSteps, values), refine)
  }

  /** Compound-filter twin of [[searchApproxWhereDF]]: the candidate
    * set is the CONJUNCTION of `preds` (each term through its own
    * pushed sidecar scan when materialized — see [[docMatchIdsAll]]),
    * then the same probed/quantized search over the survivors.
    *
    * `bruteForceThreshold` (0 = off) makes the dispatch
    * SELECTIVITY-AWARE, the pgvector/Qdrant filtered-search planning
    * move: the matched-id count is already one aggregate over the
    * pushed sidecar scans, and when it comes in at or under the
    * threshold the probed index is skipped entirely — the matched rows
    * are ranked EXACTLY (recall 1.0, float32 distances, the
    * [[searchWhereAllDF]] plan shape), which is both cheaper than
    * probing once survivors are scarce and immune to the
    * probe-coverage recall caveat above. On quantized layouts the
    * selective side returns exact distances where the probed side
    * returns ADC/SQDC approximations — the refine-degenerate contract.
    */
  def searchApproxWhereAllDF(queries: DataFrame, k: Int, nProbe: Int,
      preds: Seq[DocPredicate], refine: Int = 0,
      bruteForceThreshold: Long = 0L): DataFrame =
    if (bruteForceThreshold <= 0L)
      searchApproxMatchDF(queries, k, nProbe, docMatchIdsAll(preds), refine)
    else adaptiveFiltered(queries, k, preds, bruteForceThreshold) { ids =>
      searchApproxMatchDF(queries, k, nProbe, ids, refine)
    }

  /** Count the conjunction's matched ids once (materialized, so both
    * the count and the chosen path reuse the same scan), then either
    * rank them exactly (selective side — never touches the index) or
    * hand them to the probed plan.
    */
  private def adaptiveFiltered(queries: DataFrame, k: Int,
      preds: Seq[DocPredicate], threshold: Long)(
      probed: DataFrame => DataFrame): DataFrame = {
    val ids = docMatchIdsAll(preds).localCheckpoint(true)
    val n = ids.count()
    if (n <= threshold) {
      logInfo(s"filtered search: $n matched ids <= threshold $threshold — " +
        "exact ranking over the survivors, index untouched")
      bruteForceOverMatched(queries, k, ids)
    } else probed(ids)
  }

  /** Exact metric-aware ranking over ONLY the matched live rows, in
    * the probed paths' output schema (float32 distances, (distance,
    * id) tie-break): the selective arm of the adaptive dispatch.
    */
  private def bruteForceOverMatched(queries: DataFrame, k: Int,
      matchIds: DataFrame): DataFrame = {
    // metric follows whichever index would have served the probed arm:
    // IVF when built, else the k-NN graph (its layout records one)
    val cosine =
      if (hasAnnIndex) annMetric == "cosine"
      else hasKnnGraph && knnGraphMetric == "cosine"
    val scored = indexDf
      .join(matchIds, Seq("id"), "left_semi")
      .crossJoin(broadcast(queries.select(col("qid"), col("qvec"))))
      .withColumn("distance",
        if (cosine) lit(1.0f) - graft.functions.cosine_similarity($"vec", $"qvec")
        else l2_distance($"vec", $"qvec"))
      .select($"qid", $"id", $"distance")
    graft.operators.SimilarityJoin.topKByDistance(
      scored, "qid", "id", "distance", k)
  }

  private def searchApproxMatchDF(queries: DataFrame, k: Int, nProbe: Int,
      matchIds: DataFrame, refine: Int): DataFrame = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(refine >= 0, s"refine must be >= 0, got $refine")
    if (!hasAnnIndex)
      throw new IllegalStateException(
        s"no ANN index at $annPath — call buildAnnIndex() first")
    if (annKindIsPq)
      // searchApproxPqDF already masks tombstones; compose only the
      // predicate semi-join here (the refine re-rank inherits the
      // filter through the shortlist ids)
      searchApproxPqDF(queries, k, nProbe,
        df => df.join(matchIds, Seq("id"), "left_semi"), refine)
    else if (annKind == "ivfsq")
      searchApproxSqDF(queries, k, nProbe,
        df => df.join(matchIds, Seq("id"), "left_semi"), refine)
    else if (annKind == "ivfbq")
      searchApproxBqDF(queries, k, nProbe,
        df => df.join(matchIds, Seq("id"), "left_semi"), refine)
    else {
      require(refine == 0,
        "refine applies to quantized (PQ/SQ/BQ) indexes only — flat IVF " +
          "distances are already exact float32")
      val maskAndFilter: DataFrame => DataFrame = df =>
        annTombstoneMask(df).join(matchIds, Seq("id"), "left_semi")
      graft.operators.Ann.ivfSearchPruned(spark, annPath, "id", "vec",
        queries.select(col("qid"), col("qvec")), "qid", "qvec", k, nProbe,
        rowFilter = maskAndFilter)
    }
  }

  /** Parent-document retrieval over a chunked corpus — the RAG
    * serving journey the reference's flat store grows into: store rows
    * are CHUNK vectors whose doc JSON carries the parent document id
    * at `parentPath`; search retrieves a per-query chunk shortlist
    * (`chunksPerQuery` hits through the indexed pruned path when
    * `nProbe >= 1`, exact brute force otherwise), joins each hit to
    * its parent id (a column-pruned scan of the doc column), and rolls
    * chunks up per parent
    * ([[graft.operators.Evaluation.docTopKFromChunks]]) — best-chunk
    * (`pool = "max"`) or evidence-sum (`"sum"`) ranking, top `k`
    * parents per query. Scores are `−distance` (larger is better), so
    * max-pool ranks parents by their closest chunk.
    *
    * Scale shape: chunk candidate generation is the partition-pruned
    * probe; the rollup's shuffle carries ≤ `chunksPerQuery` rows per
    * query into a map-side-combined aggregate and an aggregator top-k
    * (≤ k parents per query past it). Returns (qid, parent,
    * max_score, sum_score, n_chunks, rank).
    *
    * Parent ids must be NUMERIC (the store's own id discipline — the
    * natural layout stores the chunking of doc `p` under `{"p": <p>}`):
    * the rollup's aggregator carries long ids, so the JSON value is
    * cast explicitly here, and chunks whose doc lacks a numeric value
    * at `parentPath` are excluded from the rollup (their hits can
    * claim no parent).
    */
  def searchParentDocsDF(queries: DataFrame, k: Int,
      parentPath: Seq[String], chunksPerQuery: Int, nProbe: Int = 0,
      pool: String = "max", refine: Int = 0): DataFrame =
    searchParentDocsMatchDF(queries, k, parentPath, chunksPerQuery,
      nProbe, pool, refine, None)

  /** Compound-filter parent retrieval: the chunk shortlist is
    * restricted to chunks every predicate term matches ("RAG over
    * en-language wiki chunks"), then the standard per-parent rollup —
    * chunk-level filtering, so a parent ranks only on its MATCHING
    * chunks.
    */
  def searchParentDocsAllDF(queries: DataFrame, k: Int,
      parentPath: Seq[String], chunksPerQuery: Int,
      preds: Seq[DocPredicate], nProbe: Int = 0,
      pool: String = "max", refine: Int = 0): DataFrame =
    searchParentDocsMatchDF(queries, k, parentPath, chunksPerQuery,
      nProbe, pool, refine, Some(docMatchIdsAll(preds)))

  private def searchParentDocsMatchDF(queries: DataFrame, k: Int,
      parentPath: Seq[String], chunksPerQuery: Int, nProbe: Int,
      pool: String, refine: Int, matchIds: Option[DataFrame]): DataFrame = {
    require(parentPath.nonEmpty, "parentPath must have at least one step")
    require(chunksPerQuery >= 1,
      s"chunksPerQuery must be >= 1, got $chunksPerQuery")
    val hits = matchIds match {
      case Some(ids) =>
        if (nProbe >= 1)
          searchApproxMatchDF(queries, chunksPerQuery, nProbe, ids, refine)
        else searchWhereMatchDF(queries, chunksPerQuery, ids)
      case None =>
        if (nProbe >= 1) searchApproxDF(queries, chunksPerQuery, nProbe, refine)
        else searchDF(queries, chunksPerQuery)
    }
    val scored = hits.join(parentFrame(parentPath), Seq("id"))
      .withColumn("_score", -col("distance").cast("double"))
    graft.operators.Evaluation.docTopKFromChunks(
      scored, "qid", "parent", "_score", k, pool)
  }

  /** Late-interaction (ColBERT MaxSim, Khattab & Zaharia SIGIR 2020)
    * retrieval through the store — the multi-vector serving journey:
    * store rows are TOKEN vectors whose doc JSON carries the parent
    * document id at `parentPath`; `queryTokens` is a (qid, qtok, qvec)
    * token bag. Two stages, the ColBERT serving pattern:
    *
    *  1. candidate generation — each query's MEAN-POOLED vector runs
    *     the [[searchParentDocsDF]] journey (token-level search, exact
    *     or partition-pruned ANN via `nProbe`, then best-token-per-
    *     parent rollup) for a `shortlist`-sized parent candidate set;
    *  2. exact re-rank — full token-level MaxSim
    *     ([[graft.operators.LateInteraction.maxSimRerank]]) over ONLY
    *     the shortlisted (query, parent) pairs with the LIVE token
    *     vectors: cost O(queries × shortlist × tokens²), independent
    *     of corpus size.
    *
    * Returns (qid, parent, score, n_qtok, rn) ranked by (MaxSim desc,
    * parent asc). Deleted token rows participate in neither stage (the
    * live projection feeds both). `tokensPerQuery` bounds stage 1's
    * token shortlist — it should comfortably exceed `shortlist` × the
    * tokens-per-doc so pooling, not truncation, decides the candidates.
    */
  def searchMaxSimDF(queryTokens: DataFrame, k: Int,
      parentPath: Seq[String], shortlist: Int,
      tokensPerQuery: Int, nProbe: Int = 0, refine: Int = 0,
      metric: String = "dot"): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) — stage 2 only re-ranks")
    val pooledQ = graft.operators.LateInteraction.meanPoolTokens(
        queryTokens.select(col("qid"), col("qvec")), "qid", "qvec")
      .select(col("qid"), col("pooled_vec").as("qvec"))
    val slPairs = searchParentDocsDF(pooledQ, shortlist, parentPath,
        tokensPerQuery, nProbe, pool = "max", refine)
      .select(col("qid"), col("parent"))
    val jsonPath = "$." + parentPath.mkString(".")
    val docTokens = table.select(
        get_json_object($"doc", jsonPath).cast("long").as("parent"), $"vec")
      .filter($"parent".isNotNull)
    graft.operators.LateInteraction.maxSimRerank(slPairs, "qid", "parent",
      docTokens, "vec", queryTokens, "qtok", "qvec", k, metric)
  }

  /** Distributed batch k-NN: queries as a DataFrame (`qid`, `qvec`),
    * result as a DataFrame `(qid, id, distance, rn)` — the pipeline-
    * facing variant of [[search]] that never collects to the driver.
    *
    * Uses the aggregator top-k ([[graft.operators.TopKAggregator]]) so
    * each partition reduces to ≤ k candidates per query before the
    * shuffle; shuffle volume is independent of store size. No reference
    * analogue (its API is driver arrays only); semantics match [[search]]
    * modulo the float64 distance column the aggregator buffer uses.
    */
  def searchDF(queries: DataFrame, k: Int): DataFrame = {
    val scored = indexDf
      .crossJoin(broadcast(queries.select(col("qid"), col("qvec"))))
      .withColumn("distance", l2_distance($"vec", $"qvec"))
      .select($"qid", $"id", $"distance")
    graft.operators.TopKAggregator.topKRows(scored, "qid", "id", "distance", k)
  }

  /** Filtered exact batch k-NN, DataFrame in/out — the [[searchWhere]]
    * semantics (pre-filter, distances only on survivors) in the
    * [[searchDF]] shape, completing the filter×{exact, approx} DF
    * matrix. Distances compute on the column-pruned live projection
    * semi-joined to the matching ids, so non-matching vectors are
    * never scored.
    */
  def searchWhereDF(queries: DataFrame, k: Int,
      pathSteps: Seq[String], values: Seq[Any]): DataFrame = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    searchWhereMatchDF(queries, k, docMatchIds(pathSteps, values))
  }

  /** Compound-filter twin of [[searchWhereDF]]: exact top-k among rows
    * satisfying EVERY predicate (see [[docMatchIdsAll]] for the
    * sidecar-intersection dispatch).
    */
  def searchWhereAllDF(queries: DataFrame, k: Int,
      preds: Seq[DocPredicate]): DataFrame =
    searchWhereMatchDF(queries, k, docMatchIdsAll(preds))

  private def searchWhereMatchDF(queries: DataFrame, k: Int,
      matchIds: DataFrame): DataFrame = {
    val scored = indexDf
      .join(matchIds, Seq("id"), "left_semi")
      .crossJoin(broadcast(queries.select(col("qid"), col("qvec"))))
      .withColumn("distance", l2_distance($"vec", $"qvec"))
      .select($"qid", $"id", $"distance")
    graft.operators.TopKAggregator.topKRows(scored, "qid", "id", "distance", k)
  }

  /** Record-shaped compound filtered k-NN — [[searchWhere]] with a
    * conjunction of metadata terms; same k/dimension contracts.
    */
  def searchWhereAll(queries: Seq[Array[Float]], k: Int,
      preds: Seq[DocPredicate]): Seq[Seq[SearchRecord]] = {
    if (k <= 0)
      throw new IllegalArgumentException(s"k must be a positive integer, got $k")
    queries.zipWithIndex.foreach { case (q, i) =>
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"query $i has dimension ${q.length}, store dimension is $dim")
    }
    val qdf = queries.zipWithIndex.map { case (v, i) => (i, v) }.toDF("qid", "qvec")
    val hits = searchWhereAllDF(qdf, k, preds)
      .join(table.select($"id", $"vec", $"doc"), Seq("id"))
      // topKRows carries the distance as double for aggregation; the
      // value was computed in float32, so the down-cast is exact
      .select($"qid".cast("int"), $"rn".cast("int"), $"id", $"vec", $"doc",
        $"distance".cast("float").as("distance"))
      .collect()
    assemble(hits, queries.size)(r =>
      SearchRecord(r.getLong(2), r.getSeq[Float](3).toArray, r.getString(4),
        r.getFloat(5)))
  }

  /** Store-level hybrid retrieval: a dense shortlist (approximate via
    * the IVF index when one exists, else the k-NN graph when one is
    * built, exact otherwise) and a BM25
    * lexical shortlist over the stored doc strings, fused by
    * reciprocal-rank fusion — `rrf = Σ 1/(k0 + rank)` over the two
    * runs, ties by id. The reference ships both modalities separately
    * (vector_store.py:275-332 vector search, :358-401 doc search);
    * this owns the "lexical + dense → fused top-k" journey at store
    * level, reusing [[graft.operators.Bm25]], the ANN path, and
    * [[graft.operators.Evaluation.reciprocalRankFusion]].
    *
    * Query texts are tokenized like the BM25 corpus side (lowercased
    * whitespace split). The lexical side runs as ONE batched pass
    * ([[graft.operators.Bm25.topKBatch]]): every query's terms share a
    * single corpus scan and a single checkpointed tf frame, however
    * many queries the batch carries; the fused frame never collects.
    *
    * Returns (qid, id, rrf, rank), rank 1..k per qid. RRF's two-term
    * reciprocal sums are single correctly-rounded IEEE ops, so the
    * fused ordering is engine-reproducible (no ln anywhere).
    */
  def searchHybrid(queries: Seq[Array[Float]], textQueries: Seq[String],
      k: Int, shortlist: Int = 100, nProbe: Int = 8, k0: Int = 60,
      pathSteps: Seq[String] = Seq.empty,
      values: Seq[Any] = Seq.empty,
      bruteForceThreshold: Long = 0L): DataFrame = {
    require(pathSteps.nonEmpty || values.isEmpty,
      "values given without pathSteps — pass both or neither")
    searchHybridCore(queries, textQueries, k, shortlist, nProbe, k0,
      if (pathSteps.nonEmpty) Some(docMatchIds(pathSteps, values)) else None,
      bruteForceThreshold)
  }

  /** Compound-filter hybrid retrieval: [[searchHybrid]] restricted to
    * the CONJUNCTION of `preds` — both shortlists (dense candidates,
    * BM25 statistics and postings) see only the rows every term
    * matches, each materialized term through its own pushed sidecar
    * scan (see [[docMatchIdsAll]]).
    */
  /** `bruteForceThreshold` (0 = off) dispatches the DENSE arm through
    * the same selectivity-aware switch as [[searchApproxWhereAllDF]]:
    * the matched-id count is already computed here (it caps the
    * shortlist), so when it comes in at or under the threshold the
    * probed index is skipped and the dense shortlist ranks the
    * survivors EXACTLY — a selective filter under hybrid serving fills
    * k with recall 1.0 instead of re-creating the probe-coverage
    * under-fill the adaptive single-arm search already fixed.
    */
  def searchHybridAll(queries: Seq[Array[Float]], textQueries: Seq[String],
      k: Int, preds: Seq[DocPredicate], shortlist: Int = 100,
      nProbe: Int = 8, k0: Int = 60,
      bruteForceThreshold: Long = 0L): DataFrame =
    searchHybridCore(queries, textQueries, k, shortlist, nProbe, k0,
      Some(docMatchIdsAll(preds)), bruteForceThreshold)

  private def searchHybridCore(queries: Seq[Array[Float]],
      textQueries: Seq[String], k: Int, shortlist: Int, nProbe: Int,
      k0: Int, matchIds0: Option[DataFrame],
      bruteForceThreshold: Long = 0L): DataFrame = {
    // the match-id set feeds the shortlist cap, the dense arm, and the
    // lexical semi-joins — materialize it once
    val matchIds = matchIds0.map(_.localCheckpoint(true))
    require(queries.size == textQueries.size,
      s"got ${queries.size} vector queries but ${textQueries.size} text queries")
    require(queries.nonEmpty, "need at least one query")
    if (k <= 0)
      throw new IllegalArgumentException(s"k must be a positive integer, got $k")
    require(shortlist >= k, s"shortlist ($shortlist) must be >= k ($k)")
    queries.zipWithIndex.foreach { case (q, i) =>
      if (q.length != dim)
        throw new IllegalArgumentException(
          s"query $i has dimension ${q.length}, store dimension is $dim")
    }
    // both shortlists are restricted to live rows matching the
    // predicate id set: dense pre-filters (distances only on
    // survivors), lexical fits BM25 stats on the matching sub-corpus —
    // "search for X restricted to source=wiki" means wiki-relative
    // relevance, and k fills from filtered survivors only
    val docsAll = table.select($"id", $"doc")
    val docsProj = matchIds.fold(docsAll)(ids =>
      docsAll.join(ids, Seq("id"), "left_semi"))
    val qdf = queries.zipWithIndex.map { case (v, i) => (i, v) }.toDF("qid", "qvec")
    val matched = docsProj.count()
    val cap = math.min(shortlist.toLong, matched).toInt
    if (cap == 0)
      // empty store (or a predicate matching nothing): a well-typed
      // empty fused frame, not a crash inside the shortlist builders
      return spark.emptyDataFrame
        .select(lit(0).as("qid"), lit(0L).as("id"),
          lit(0.0).as("rrf"), lit(0).as("rank")).limit(0)
    // dense-arm dispatch: IVF when built (probed, or exact under the
    // adaptive threshold), else the k-NN graph when built (beam walk
    // with the id set as a result mask — same adaptive escape hatch:
    // a selective filter would under-fill the k-bounded walk results,
    // so at/below the threshold the survivors rank exactly; the
    // escape hatch ranks by the index's RECORDED metric — the IVF
    // metric when an IVF index exists, else the graph layout's
    // l2|cosine — so both dispatch arms order identically), else
    // exact scan
    val dense =
      (matchIds match {
        case Some(ids) =>
          if ((hasAnnIndex || hasKnnGraph) && bruteForceThreshold > 0L
              && matched <= bruteForceThreshold) {
            logInfo(s"hybrid dense arm: $matched matched ids <= threshold " +
              s"$bruteForceThreshold — exact ranking over the survivors, " +
              "index untouched")
            bruteForceOverMatched(qdf, cap, ids)
          } else if (hasAnnIndex) searchApproxMatchDF(qdf, cap, nProbe, ids, 0)
          else if (hasKnnGraph) graphShortlist(qdf, cap, Some(ids))
          else searchWhereMatchDF(qdf, cap, ids)
        case None =>
          if (hasAnnIndex) searchApproxDF(qdf, cap, nProbe)
          else if (hasKnnGraph) graphShortlist(qdf, cap, None)
          else searchDF(qdf, cap)
      }).select(col("qid").cast("int").as("qid"), col("id"),
        col("rn").cast("int").as("rank"))
    val termsByQid = textQueries.zipWithIndex.map { case (text, i) =>
      // distinct: natural-language queries repeat words ("the cat and
      // the dog") and BM25 scores each TERM once — the duplicate would
      // otherwise trip Bm25's duplicate-terms contract
      val terms = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .distinct.toSeq
      require(terms.nonEmpty, s"text query $i has no tokens")
      i.toLong -> terms
    }
    // lexical shortlist: through the posting index when built (no
    // corpus tokenization — term-pruned posting scan, stats exact and
    // current; the filter composes as an id semi-join on BOTH the
    // postings and the doc-length stats), else the one-pass scan route
    val lexical = (
      if (hasLexIndex)
        graft.operators.LexIndex.search(spark, lexRoot, termsByQid, cap,
          annTombstoneMask, matchIds)
      else
        graft.operators.Bm25.topKBatch(docsProj, "id", "doc", termsByQid, cap))
      .select(col("qid").cast("int").as("qid"), col("id"),
        col("rank").cast("int").as("rank"))
    graft.operators.Evaluation.reciprocalRankFusion(
        Seq(dense, lexical), "qid", "id", "rank", topK = k, k0 = k0)
      .select(col("qid"), col("id"), col("rrf"), col("rank"))
  }

  // --------------------- lexical (BM25) index --------------------- //
  //
  // The posting-list twin of the ANN index (see
  // [[graft.operators.LexIndex]]): without it every [[searchHybrid]]
  // call re-tokenizes the WHOLE corpus to fit BM25 statistics — an
  // O(corpus) text scan per query batch, the one remaining full-scan
  // on the hybrid path. With it, a query batch reads only its own
  // terms' posting rows (term-pushed pruned scan) plus one doc-length
  // aggregate, and statistics stay exact under ingest because the
  // index appends O(batch) on every insert and masks by tombstone gen
  // on every delete — the same lifecycle contract as the ANN and
  // doc-field sidecars.

  private def lexRoot: String = new Path(path, "lex").toString

  def hasLexIndex: Boolean = graft.operators.LexIndex.exists(spark, lexRoot)

  /** Build (or rebuild) the posting index over the live rows. */
  def buildLexIndex(): Unit = {
    graft.operators.LexIndex.build(spark, lexRoot, liveWithGen,
      "id", "doc", GenCol)
    resetDeadStatsAfterRewrite(lexDeadStatsPath)
  }

  def dropLexIndex(): Unit = graft.operators.LexIndex.drop(spark, lexRoot)

  private def lexAppend(batch: DataFrame, batchRows: Long): Unit =
    if (hasLexIndex) {
      bumpDeadStats(lexDeadStatsPath, dTotal = batchRows, dDead = 0L)
      val gen = storage match {
        case t: TombstoneStorage => t.currentVersion()
        case _ => 0L
      }
      graft.operators.LexIndex.append(spark, lexRoot,
        batch.withColumn(GenCol, lit(gen)), "id", "doc", GenCol)
      maybeMaintainLexAfterAppend()
    }

  private def lexAfterDelete(deleted: Long): Unit = if (hasLexIndex) {
    val rebuild = storage match {
      case t: TombstoneStorage => t.tombstoneCount() == 0L
      case _ => true
    }
    if (rebuild) buildLexIndex()
    else {
      bumpDeadStats(lexDeadStatsPath, dTotal = 0L, dDead = deleted)
      maybeMaintainLexAfterDelete()
    }
  }

  /** Batched BM25 top-k over the store's docs: through the posting
    * index when built (no corpus text read — term-pruned posting scan
    * + one doc-length aggregate), else [[graft.operators.Bm25.topKBatch]]'s
    * one-pass scan route. Identical ranking either way (spec-pinned).
    * Returns (qid, id, bm25, rank).
    */
  def searchLexDF(queries: Seq[(Long, Seq[String])], k: Int): DataFrame =
    if (hasLexIndex)
      graft.operators.LexIndex.search(spark, lexRoot, queries, k,
        annTombstoneMask, None)
    else
      graft.operators.Bm25.topKBatch(
        table.select($"id", $"doc"), "id", "doc", queries, k)

  /** Compound-filter lexical retrieval: BM25 over ONLY the rows every
    * predicate term matches — retrieval AND statistics (N, avgdl, df)
    * fit on the conjunction sub-corpus ("wiki-relative relevance", the
    * same contract as the single-path filtered hybrid). The id set
    * composes as a semi-join on the postings and the doc-length stats
    * on the indexed route, and pre-filters the scan route.
    */
  def searchLexAllDF(queries: Seq[(Long, Seq[String])], k: Int,
      preds: Seq[DocPredicate]): DataFrame = {
    val ids = docMatchIdsAll(preds)
    if (hasLexIndex)
      graft.operators.LexIndex.search(spark, lexRoot, queries, k,
        annTombstoneMask, Some(ids))
    else
      graft.operators.Bm25.topKBatch(
        table.join(ids, Seq("id"), "left_semi").select($"id", $"doc"),
        "id", "doc", queries, k)
  }

  // --------------------- k-NN-graph index ------------------------- //
  //
  // The graph-ANN index family (see [[graft.operators.KnnGraphIndex]]):
  // a persisted NN-Descent graph under `<path>/graph` — node records
  // (vector + fwd/rev adjacency) bucketed by id hash so a serving hop
  // is two bucket-pruned lookups, entry-point MEDOIDS materialized at
  // build. Same lifecycle contract as the IVF layouts: inserts fold
  // the batch in via the O(batch)-seeded incremental descent (only
  // touched buckets rewritten), deletes remove the dead nodes and
  // repair exactly the survivors that listed them (their `rev` sets —
  // a pruned lookup) by a masked beam re-search, and serving composes
  // the storage layer's tombstone mask over candidates, so a delete is
  // visible in the next search even before its repair lands.

  private def graphRoot: String = new Path(path, "graph").toString

  def hasKnnGraph: Boolean =
    graft.operators.KnnGraphIndex.exists(spark, graphRoot)

  /** Adapt [[annTombstoneMask]] (keyed on the internal gen column) to
    * the graph layout's `gen`-named rows.
    */
  private def graphRowMask: DataFrame => DataFrame = df =>
    annTombstoneMask(df.withColumnRenamed("gen", GenCol))
      .withColumnRenamed(GenCol, "gen")

  /** Fit the k-NN graph over the current live rows and persist it
    * under `<path>/graph`. Subsequent writes maintain it incrementally
    * (see the contract above); rebuilding is this same call.
    *
    * @param k        the served neighbor-list width
    * @param buildK   the descent's list width (0 = auto; the NN-Descent
    *                 recall knob — see [[graft.operators.KnnGraph.nnDescent]])
    * @param nEntries entry-point medoids persisted for serving
    * @param nBuckets id-hash partitions of the node table; size so one
    *                 bucket's rows fit an executor scan (at 100 TB this
    *                 is thousands; tests use a handful)
    * @param pqM      > 0 co-locates an m-subspace PQ code with each
    *                 node record (the DiskANN serve shape): the walk
    *                 scores on codes — column pruning keeps the d-dim
    *                 vector out of traversal IO — and the final beam
    *                 refines on full vectors; l2 only
    * @param pqBits   code width per subspace: 4 (16 codes — the cheap
    *                 traversal steer) or 8 (256 codes — buys back
    *                 code-space fidelity on real high-dim embeddings
    *                 where 4-bit distortion prunes true neighbors
    *                 before the refine sees them)
    * @param opq      learn an OPQ rotation on the fit sample and
    *                 encode rotated vectors (queries rotate at serve
    *                 time; the stored vector — and the exact refine —
    *                 stay raw); requires pqM > 0
    */
  def buildKnnGraph(k: Int, buildK: Int = 0, maxIters: Int = 25,
      nEntries: Int = 4, nBuckets: Int = 16,
      metric: String = "l2", pqM: Int = 0, pqBits: Int = 4,
      opq: Boolean = false): Unit = {
    graft.operators.KnnGraphIndex.build(spark, graphRoot,
      liveWithGen.select($"id", $"vec", col(GenCol).as("gen")),
      k, buildK, maxIters, nEntries, nBuckets, metric, pqM, pqBits, opq)
    ()
  }

  /** [[buildKnnGraph]] minus the descent: persist the layout from an
    * ALREADY-CONVERGED (id, nbr, distance, rank) graph over the
    * current live rows — for callers that hold one (a prior
    * [[knnGraphEdgesDF]], a shared fixture build). The graph's ids
    * must be the store's live ids; its distances must be `metric`'s.
    */
  def buildKnnGraphFrom(graph: DataFrame, k: Int, buildK: Int = 0,
      maxIters: Int = 25, nEntries: Int = 4, nBuckets: Int = 16,
      metric: String = "l2", pqM: Int = 0, pqBits: Int = 4,
      opq: Boolean = false): Unit =
    graft.operators.KnnGraphIndex.write(spark, graphRoot,
      liveWithGen.select($"id", $"vec", col(GenCol).as("gen")),
      graph, k, buildK, maxIters, nEntries, nBuckets, metric, pqM,
      pqBits, opq)

  /** The persisted graph's metric ("l2" | "cosine"); "l2" when the
    * layout predates the metric marker — the only metric it can carry.
    */
  def knnGraphMetric: String = {
    require(hasKnnGraph,
      s"no k-NN graph at $graphRoot — call buildKnnGraph() first")
    graft.operators.KnnGraphIndex.readMeta(spark, graphRoot).metric
  }

  def dropKnnGraph(): Unit =
    graft.operators.KnnGraphIndex.drop(spark, graphRoot)

  /** The persisted graph as (id, nbr, distance, rank) — live lists
    * only (tombstone-masked like every read surface).
    */
  def knnGraphEdgesDF: DataFrame = {
    require(hasKnnGraph,
      s"no k-NN graph at $graphRoot — call buildKnnGraph() first")
    val live = graphRowMask(
      graft.operators.KnnGraphIndex.nodesDF(spark, graphRoot)
        .select($"id", col("gen"))).select($"id")
    graft.operators.KnnGraphIndex.edges(spark, graphRoot)
      .join(live, Seq("id"), "left_semi")
  }

  /** Graph-ANN serving (`qid`, `qvec` → `qid`, `id`, `distance`,
    * `rank`): batch greedy beam search over the PERSISTED layout —
    * entry medoids from the built artifact (no O(n) scan), hops as
    * bucket-pruned lookups (no O(E) adjacency derivation), tombstoned
    * rows masked before they can rank or expand. `ef` is the recall
    * knob (≥ k; 0 = auto `max(32, 4k)`).
    */
  def searchGraphDF(queries: DataFrame, k: Int, ef: Int = 0,
      maxHops: Int = 30): DataFrame = {
    require(hasKnnGraph,
      s"no k-NN graph at $graphRoot — call buildKnnGraph() first")
    val effEf = if (ef > 0) ef else math.max(32, 4 * k)
    graft.operators.KnnGraphIndex.search(spark, graphRoot,
      queries.select(col("qid"), col("qvec")), k, effEf, maxHops,
      graphRowMask)
  }

  /** Filtered graph serving — [[searchGraphDF]] restricted to the
    * CONJUNCTION of `preds` with the same selectivity-aware dispatch
    * as [[searchApproxWhereAllDF]]: at or under `bruteForceThreshold`
    * matched ids the survivors are ranked EXACTLY (recall 1.0, the
    * graph untouched); above it the beam walks the UNFILTERED graph
    * (restricting traversal to the filtered subgraph would disconnect
    * it — the HNSW-filter discipline) while only matching live rows
    * rank, with per-query result state k-bounded. Returns (qid, id,
    * distance, rank).
    */
  def searchGraphWhereAllDF(queries: DataFrame, k: Int,
      preds: Seq[DocPredicate], ef: Int = 0,
      bruteForceThreshold: Long = 0L, maxHops: Int = 30): DataFrame = {
    require(hasKnnGraph,
      s"no k-NN graph at $graphRoot — call buildKnnGraph() first")
    val ids = docMatchIdsAll(preds).localCheckpoint(true)
    val selective = bruteForceThreshold > 0L && {
      val n = ids.count()
      if (n <= bruteForceThreshold)
        logInfo(s"filtered graph search: $n matched ids <= threshold " +
          s"$bruteForceThreshold — exact ranking over the survivors, " +
          "graph untouched")
      n <= bruteForceThreshold
    }
    if (selective) {
      // rank by the graph's metric (the layout records it), so both
      // dispatch arms order identically
      val scored = indexDf
        .join(ids, Seq("id"), "left_semi")
        .crossJoin(broadcast(queries.select(col("qid"), col("qvec"))))
        .withColumn("distance", graft.operators.KnnGraph.distExpr(
          knnGraphMetric, $"vec", $"qvec"))
        .select($"qid", $"id", $"distance")
      graft.operators.SimilarityJoin
        .topKByDistance(scored, "qid", "id", "distance", k)
        .withColumnRenamed("rn", "rank")
        .select(col("qid"), col("id"), col("distance"), col("rank"))
    } else {
      val effEf = if (ef > 0) ef else math.max(32, 4 * k)
      graft.operators.KnnGraphIndex.search(spark, graphRoot,
        queries.select(col("qid"), col("qvec")), k, effEf, maxHops,
        graphRowMask,
        resultMask = Some(df => df.join(ids, Seq("id"), "left_semi")))
    }
  }

  /** Dense shortlist from the graph layout for the hybrid fuser —
    * [[searchGraphDF]] with an optional id-set result mask (the
    * HNSW-filter discipline: the walk traverses the unfiltered graph,
    * only matching live rows rank), rn-shaped like the IVF arms.
    */
  private def graphShortlist(queries: DataFrame, cap: Int,
      ids: Option[DataFrame]): DataFrame = {
    val effEf = math.max(32, 4 * cap)
    graft.operators.KnnGraphIndex.search(spark, graphRoot,
        queries.select(col("qid"), col("qvec")), cap, effEf, 30,
        graphRowMask,
        resultMask = ids.map(i => (df: DataFrame) =>
          df.join(i, Seq("id"), "left_semi")))
      .withColumnRenamed("rank", "rn")
  }

  /** Graph layout shape for monitoring — the [[annIndexStats]] twin. */
  def knnGraphStats(): (Long, Long, Int, Int) = {
    require(hasKnnGraph,
      s"no k-NN graph at $graphRoot — call buildKnnGraph() first")
    val meta = graft.operators.KnnGraphIndex.readMeta(spark, graphRoot)
    val nodes = graft.operators.KnnGraphIndex.nodesDF(spark, graphRoot)
      .agg(org.apache.spark.sql.functions.count(lit(1)),
        sum(size(col("fwd")))).head()
    (nodes.getLong(0), nodes.getLong(1), meta.nBuckets,
      graft.operators.KnnGraphIndex.readEntries(spark, graphRoot).size)
  }

  /** Re-fit the graph over the current live rows with its PERSISTED
    * recipe — the [[rebuildAnnIndex]] twin (recall decayed after heavy
    * churn, or a fresh converged baseline before a big ingest).
    */
  def rebuildKnnGraph(): Unit = {
    require(hasKnnGraph,
      s"no k-NN graph at $graphRoot — call buildKnnGraph() first")
    val m = graft.operators.KnnGraphIndex.readMeta(spark, graphRoot)
    buildKnnGraph(m.k, m.buildK, m.maxIters, m.nEntries, m.nBuckets,
      m.metric, m.pqM, m.pqBits, m.opq)
  }

  /** O(batch) graph maintenance on insert — the [[annAppend]] twin.
    *
    * Scale note: the incremental descent's WORK is seeded by the batch
    * (prior entries enter not-fresh), but each iteration's scoring
    * joins read corpus-scale frames — on a graph-bearing store, ingest
    * should arrive in meaningful batches (micro-batch streaming, bulk
    * loads), not row-at-a-time; degenerate single-row appends pay the
    * same per-iteration fixed costs a thousand-row batch amortizes.
    */
  private def graphAppend(rows: DataFrame): Unit = if (hasKnnGraph) {
    val gen = storage match {
      case t: TombstoneStorage => t.currentVersion()
      case _ => 0L
    }
    graft.operators.KnnGraphIndex.append(spark, graphRoot,
      rows.select($"id", $"vec").withColumn("gen", lit(gen)))
    maybeMaintainGraphAfterWrite()
  }

  /** Post-delete graph maintenance: drop the dead nodes and repair the
    * survivors that listed them (O(affected × beam) — see
    * [[graft.operators.KnnGraphIndex.deleteAndRepair]]).
    */
  private def graphAfterDelete(ids: DataFrame): Unit = if (hasKnnGraph) {
    graft.operators.KnnGraphIndex.deleteAndRepair(spark, graphRoot, ids,
      graphRowMask)
    maybeMaintainGraphAfterWrite()
  }

  /** Staleness counters for the graph layout: (rows at the last full
    * build, rows churned since) — the numerator/denominator of
    * [[IndexMaintenancePolicy.graphMaxChurnFraction]], exposed for
    * monitoring. Two marker-file reads, no jobs.
    */
  def knnGraphChurn(): (Long, Long) = {
    require(hasKnnGraph,
      s"no k-NN graph at $graphRoot — call buildKnnGraph() first")
    (graft.operators.KnnGraphIndex.readMeta(spark, graphRoot).nAtBuild,
      graft.operators.KnnGraphIndex.readChurn(spark, graphRoot))
  }

  /** Churn-triggered graph rebuild (the annAutoMaintain twin for the
    * graph family): fires after any mutation a graph-bearing store
    * folds incrementally, replaying the persisted recipe once the
    * churn fraction passes the policy threshold. The check is two
    * marker-file reads; the rebuild resets the baseline.
    */
  private def maybeMaintainGraphAfterWrite(): Unit = maintenance.foreach { p =>
    if (p.graphMaxChurnFraction > 0.0 && hasKnnGraph) {
      val nAtBuild =
        graft.operators.KnnGraphIndex.readMeta(spark, graphRoot).nAtBuild
      if (nAtBuild > 0L) {
        val churned = graft.operators.KnnGraphIndex.readChurn(spark, graphRoot)
        if (churned.toDouble / nAtBuild > p.graphMaxChurnFraction) {
          logInfo(s"auto-maintenance: $churned rows churned since the " +
            s"graph build over $nAtBuild (> ${p.graphMaxChurnFraction}) " +
            "— rebuilding the k-NN graph with its persisted recipe")
          rebuildKnnGraph()
        }
      }
    }
  }

  /** Snapshot-export the WHOLE store — data, tombstones, version
    * counter, ANN/lex/doc-field sidecars, dim marker — to `destPath`
    * (a file-level recursive copy; single-writer contract: run it when
    * no write is in flight). The backup/promote primitive: the clone
    * opens as an independent store with identical contents, indexes
    * already built, and its own id/version lineage going forward.
    * Refuses ANY existing destination — even an empty directory:
    * Hadoop's `FileUtil.copy` nests the source UNDER an existing
    * directory target (`dst/<srcName>`), which would leave the clone's
    * data one level down while `openOrCreate(destPath)` silently
    * creates a fresh empty store at the top — a zero-row "backup".
    */
  def cloneTo(destPath: String): VectorStore = {
    val src = new Path(path)
    val dst = new Path(destPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dst))
      throw new IllegalArgumentException(
        s"cloneTo: destination $destPath already exists (a clone must " +
        "land at a fresh path; FileUtil.copy would nest the store under " +
        "an existing directory)")
    if (!org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, true,
        spark.sparkContext.hadoopConfiguration))
      throw new java.io.IOException(s"cloneTo: copy to $destPath failed")
    // Post-copy invariant: the dim marker must sit DIRECTLY under the
    // destination (catches any future copy-semantics drift).
    if (!fs.exists(new Path(dst, VectorStore.DimMarker)))
      throw new java.io.IOException(
        s"cloneTo: copy finished but ${VectorStore.DimMarker} is not " +
        s"directly under $destPath — copy layout drifted")
    VectorStore.openOrCreate(spark, destPath, dim,
      tombstoneDeletes = storage.isInstanceOf[TombstoneStorage])
  }

  /** Auto-tune the probe width: measure recall@k of the ANN index on a
    * QUERY SAMPLE against the exact search, walking `ladder` upward
    * until `targetRecall` is met (the ladder is clamped to the cell
    * count, whose full probe degenerates to exact — recall 1.0 — so
    * the walk always terminates). Returns the chosen `nProbe` plus the
    * measured frontier `(n_probe, recall, meets_target)` up to and
    * including the chosen arm.
    *
    * This is the operational loop `ir_ann_sweep` publishes as a study:
    * recall-vs-probe is DATA-dependent (cluster balance, query
    * distribution), so the right nProbe is measured, not guessed. Cost
    * model: ONE exact brute scan of the live rows (the ground truth)
    * plus one partition-pruned probed search per visited arm, all over
    * the sample only — run it at deploy/reindex time on a few hundred
    * held-out queries, not per query batch.
    */
  def tuneNProbe(sample: DataFrame, k: Int, targetRecall: Double,
      ladder: Seq[Int] = Seq(1, 2, 4, 8, 16, 32)): (Int, DataFrame) = {
    require(hasAnnIndex, s"no ANN index at $annPath — call buildAnnIndex() first")
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1], got $targetRecall")
    require(ladder.nonEmpty && ladder == ladder.sorted && ladder.head >= 1,
      s"ladder must be ascending positive ints, got $ladder")
    import spark.implicits._
    val nCells = spark.read.parquet(s"$annPath/centroids").count().toInt
    val lad = (ladder.filter(_ < nCells) :+ nCells).distinct
    val exact = searchDF(sample, k).select(col("qid"), col("id"))
      .localCheckpoint(true)
    val nTruth = exact.count().toDouble
    val rows = Seq.newBuilder[(Int, Double, Boolean)]
    var chosen = -1
    val it = lad.iterator
    while (it.hasNext && chosen < 0) {
      val p = it.next()
      val hits = searchApproxDF(sample, k, p).select(col("qid"), col("id"))
        .join(exact, Seq("qid", "id"), "left_semi").count()
      val recall = if (nTruth == 0.0) 1.0 else hits / nTruth
      val meets = recall >= targetRecall
      rows += ((p, recall, meets))
      if (meets) chosen = p
    }
    val frontier = rows.result().toDF("n_probe", "recall", "meets_target")
    (if (chosen < 0) nCells else chosen, frontier)
  }

  /** Diversity-aware retrieval — MMR (Carbonell & Goldstein 1998) over
    * a per-query shortlist: retrieve `shortlist` nearest live rows
    * (indexed pruned path when `nProbe >= 1`, exact otherwise), then
    * greedily re-rank by `lambda·relevance − (1−lambda)·max-cos-to-
    * picked` ([[graft.operators.Mmr.rerankDistributed]] — the greedy
    * runs per query ON THE EXECUTORS, one bounded shortlist per task).
    * Relevance is `−distance`; `lambda = 1` degenerates to plain
    * nearest-neighbor order. The RAG-serving "don't hand the LLM five
    * near-identical chunks" journey at store level. Returns
    * (qid, id, rank, mmr_score), rank 1..k per qid.
    */
  def searchDiverseDF(queries: DataFrame, k: Int, shortlist: Int,
      lambda: Double = 0.5, nProbe: Int = 0, refine: Int = 0): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) — MMR only re-ranks")
    val hits =
      if (nProbe >= 1) searchApproxDF(queries, shortlist, nProbe, refine)
      else searchDF(queries, shortlist)
    val cands = hits.join(indexDf, Seq("id"))
      .select(col("qid"), col("id"),
        (-col("distance").cast("double")).as("score"), col("vec"))
    graft.operators.Mmr.rerankDistributed(
      cands, "qid", "id", "score", "vec", k, lambda)
  }

  /** Posting-index health snapshot (see [[LexIndexStats]]): one
    * aggregate over the postings, one over the doc lengths, one
    * recursive file count — bounded driver state.
    */
  def lexIndexStats(): LexIndexStats = {
    require(hasLexIndex, "no posting index — buildLexIndex first")
    val postP = graft.operators.LexIndex.postingsPath(lexRoot)
    val post = spark.read.parquet(postP)
    val pAgg = post.agg(org.apache.spark.sql.functions.count(lit(1)),
      countDistinct(col("term"))).head()
    val (pRows, nTerms) = (pAgg.getLong(0), pAgg.getLong(1))
    val pLive = annTombstoneMask(post.select($"id", col(GenCol))).count()
    val dls = spark.read.parquet(graft.operators.LexIndex.doclensPath(lexRoot))
    val dRows = dls.count()
    val liveD = annTombstoneMask(dls)
    val dAgg = liveD.agg(org.apache.spark.sql.functions.count(lit(1)),
      avg(col("dl"))).head()
    val (nDocs, avgdl) = (dAgg.getLong(0),
      if (dAgg.isNullAt(1)) 0.0 else dAgg.getDouble(1))
    val pp = new Path(postP)
    val fs = pp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var nFiles = 0L
    val it = fs.listFiles(pp, true)
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) nFiles += 1 }
    LexIndexStats(pRows, pRows - pLive,
      (pRows - pLive).toDouble / math.max(pRows, 1L), nTerms,
      nDocs, dRows - nDocs, avgdl,
      graft.operators.LexIndex.buckets(spark, lexRoot), nFiles)
  }

  // ----------------------- doc-field index ----------------------- //
  //
  // Materialized JSON-path sidecars: at 100 TB, every metadata filter
  // that goes through `get_json_object` re-parses the doc column of
  // EVERY row per query, and the predicate can never reach the parquet
  // scan (no pushdown through a JSON extraction). A materialized field
  // is a slim (id, gen, value) parquet sidecar — the generated-column
  // idea from lakehouse engines, kept outside the data files so the
  // single-writer append path stays schema-stable. Filters on a
  // materialized path become a predicate-PUSHED scan of the sidecar
  // (~1% of table bytes: three columns, no vectors, no JSON) followed
  // by an id semi-join; the doc column is never parsed at query time.
  // Lifecycle mirrors the ANN index exactly: O(batch) append on every
  // insert, tombstone-gen masking for deletes/upserts (id reuse safe),
  // rebuild when tombstones fold (compact/vacuum/plain-layout delete).

  private def docIdxRoot = new Path(path, "docidx")
  private def docIdxFs =
    docIdxRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Directory-name encoding of a JSON path: steps joined by '.', each
    * percent-encoded so arbitrary doc keys stay filesystem-safe.
    */
  private def docIdxDir(pathSteps: Seq[String]): Path =
    new Path(docIdxRoot,
      pathSteps.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString("."))

  private def docValue(pathSteps: Seq[String]) =
    get_json_object($"doc", "$." + pathSteps.mkString("."))

  def hasDocIndex(pathSteps: Seq[String]): Boolean =
    pathSteps.nonEmpty && docIdxFs.exists(docIdxDir(pathSteps))

  /** List a sidecar root's ACTIVE field directories, decoded back to
    * path steps. `_staging-*` dirs (a rebuild that died between its
    * staging write and the activating rename) are NOT fields — they are
    * skipped and opportunistically deleted, so a crashed rebuild never
    * turns into a permanent garbage sidecar that every later insert
    * appends to.
    */
  private def listSidecarFields(root: Path): Seq[Seq[String]] =
    if (!docIdxFs.exists(root)) Seq.empty
    else docIdxFs.listStatus(root).toSeq.map(_.getPath)
      .flatMap { p =>
        if (p.getName.startsWith("_staging-")) {
          try docIdxFs.delete(p, true) catch { case _: java.io.IOException => }
          None
        } else Some(p.getName.split("\\.").toSeq
          .map(java.net.URLDecoder.decode(_, "UTF-8")))
      }

  /** Every materialized JSON path, decoded back to its steps. */
  def materializedDocFields: Seq[Seq[String]] = listSidecarFields(docIdxRoot)

  /** Materialize (or rebuild) the sidecar for one JSON path: one
    * column-pruned pass over the live rows extracting the value, each
    * row carrying its write-generation so the standard tombstone mask
    * applies. O(live rows) once; every later filter on this path skips
    * the JSON parse entirely.
    */
  def materializeDocField(pathSteps: Seq[String]): Unit = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    val staging = new Path(docIdxRoot,
      s"_staging-${java.util.UUID.randomUUID()}")
    liveWithGen.select($"id", docValue(pathSteps).as("value"), col(GenCol))
      .write.mode("overwrite").parquet(staging.toString)
    val target = docIdxDir(pathSteps)
    if (docIdxFs.exists(target)) docIdxFs.delete(target, true)
    if (!docIdxFs.rename(staging, target))
      throw new java.io.IOException(
        s"materializeDocField: could not activate $staging")
  }

  def dropDocField(pathSteps: Seq[String]): Unit = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    if (hasDocIndex(pathSteps)) docIdxFs.delete(docIdxDir(pathSteps), true)
  }

  /** O(batch) sidecar maintenance, called after every storage append
    * (the [[annAppend]] placement — the append already bumped the
    * version, so the batch rows carry the current one).
    */
  private def docIdxAppend(batch: DataFrame, batchRows: Long): Unit = {
    val fields = materializedDocFields
    val numFields = materializedNumericDocFields
    if (fields.nonEmpty || numFields.nonEmpty) {
      bumpDeadStats(docDeadStatsPath, dTotal = batchRows, dDead = 0L)
      val gen = storage match {
        case t: TombstoneStorage => t.currentVersion()
        case _ => 0L
      }
      fields.foreach { steps =>
        sidecarAppendCounted(
          batch.select($"id", docValue(steps).as("value"))
            .withColumn(GenCol, lit(gen)),
          docIdxRoot, docIdxDir(steps))
      }
      numFields.foreach { steps =>
        sidecarAppendCounted(
          batch.select($"id", docValue(steps).cast("double").as("value"))
            .withColumn(GenCol, lit(gen)),
          docIdxNumRoot, docIdxNumDir(steps))
      }
      maybeMaintainDocIdxAfterAppend()
    }
  }

  // Exact per-sidecar data-file bookkeeping: a `_nfiles` marker INSIDE
  // each field dir (underscore-prefixed, so parquet readers ignore it,
  // and a rebuild's dir swap naturally discards it) maintained by the
  // staged appends below. The file-count maintenance trigger then
  // reads a handful of tiny markers instead of recursively walking
  // every sidecar's listing on every ingest batch.
  private def sidecarNfilesPath(dir: Path) = new Path(dir, "_nfiles")

  private def sidecarFileCount(dir: Path): Long = {
    val p = sidecarNfilesPath(dir)
    if (docIdxFs.exists(p)) {
      val in = docIdxFs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
    } else {
      // legacy / freshly-rebuilt dir: one listing seeds the marker
      var n = 0L
      val it = docIdxFs.listFiles(dir, true)
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      writeSidecarFileCount(dir, n)
      n
    }
  }

  private def writeSidecarFileCount(dir: Path, n: Long): Unit = {
    val out = docIdxFs.create(sidecarNfilesPath(dir), true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Staged O(batch) sidecar append: write under a root-level staging
    * dir (skipped and reaped by [[listSidecarFields]] if a crash
    * orphans it), move the data files in, bump the dir's bookkeeping
    * marker by the EXACT count moved. Same visibility contract as a
    * plain append-mode write — a crash mid-append loses the batch from
    * the sidecar either way, and the next rebuild resets everything.
    */
  private def sidecarAppendCounted(frame: DataFrame, root: Path,
      dir: Path): Unit = {
    val before = sidecarFileCount(dir) // seed the marker BEFORE the move
    val staging = new Path(root,
      s"_staging-append-${java.util.UUID.randomUUID()}")
    frame.write.mode("overwrite").parquet(staging.toString)
    var added = 0L
    docIdxFs.listStatus(staging).map(_.getPath).foreach { f =>
      if (f.getName.endsWith(".parquet")) {
        added += 1
        // rename returns false on failure — unchecked, a failed move
        // silently drops the sidecar file while the marker still
        // counts it; throw like writeBuildMeta's activation rename
        if (!docIdxFs.rename(f, new Path(dir, f.getName)))
          throw new java.io.IOException(
            s"sidecar append: could not move $f into $dir")
      }
    }
    docIdxFs.delete(staging, true)
    if (added > 0L) writeSidecarFileCount(dir, before + added)
  }

  /** Post-delete sidecar maintenance — the [[annAfterDelete]] contract:
    * on the tombstone layout the query-time gen mask already hides the
    * deleted rows UNLESS this delete folded the tombstones (compaction),
    * and the plain layout has no mask, so both rebuild.
    */
  private def docIdxAfterDelete(deleted: Long): Unit = {
    val fields = materializedDocFields
    val numFields = materializedNumericDocFields
    if (fields.nonEmpty || numFields.nonEmpty) {
      val rebuild = storage match {
        case t: TombstoneStorage => t.tombstoneCount() == 0L
        case _ => true
      }
      if (rebuild) {
        fields.foreach(materializeDocField)
        numFields.foreach(materializeDocFieldNumeric)
        resetDeadStatsAfterRewrite(docDeadStatsPath)
      } else {
        bumpDeadStats(docDeadStatsPath, dTotal = 0L, dDead = deleted)
        maybeMaintainDocIdxAfterDelete()
      }
    }
  }

  // Numeric twin: a DOUBLE-typed sidecar serving RANGE predicates
  // (retention windows, score thresholds, timestamp cutoffs) with the
  // comparison pushed into the parquet scan — a cast inside the filter
  // would block pushdown, so the cast happens once at WRITE time.
  // Kept as a separate sidecar family (docidx_num/) because the
  // reference's equality contract compares doc values AS STRINGS
  // (SURVEY.md §2 R9): the string sidecar preserves that contract
  // verbatim, the numeric one serves the beyond-reference range API
  // with SQL cast semantics (non-numeric values ⇒ NULL ⇒ never match,
  // identical on the scan route).

  private def docIdxNumRoot = new Path(path, "docidx_num")

  private def docIdxNumDir(pathSteps: Seq[String]): Path =
    new Path(docIdxNumRoot,
      pathSteps.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString("."))

  def hasDocIndexNumeric(pathSteps: Seq[String]): Boolean =
    pathSteps.nonEmpty && docIdxFs.exists(docIdxNumDir(pathSteps))

  def materializedNumericDocFields: Seq[Seq[String]] =
    listSidecarFields(docIdxNumRoot)

  /** Materialize (or rebuild) the DOUBLE-typed sidecar for one JSON
    * path — the range-predicate index.
    */
  def materializeDocFieldNumeric(pathSteps: Seq[String]): Unit = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    val staging = new Path(docIdxNumRoot,
      s"_staging-${java.util.UUID.randomUUID()}")
    liveWithGen.select($"id",
      docValue(pathSteps).cast("double").as("value"), col(GenCol))
      .write.mode("overwrite").parquet(staging.toString)
    val target = docIdxNumDir(pathSteps)
    if (docIdxFs.exists(target)) docIdxFs.delete(target, true)
    if (!docIdxFs.rename(staging, target))
      throw new java.io.IOException(
        s"materializeDocFieldNumeric: could not activate $staging")
  }

  def dropDocFieldNumeric(pathSteps: Seq[String]): Unit = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    if (hasDocIndexNumeric(pathSteps))
      docIdxFs.delete(docIdxNumDir(pathSteps), true)
  }

  /** Matching LIVE ids for a numeric range over a JSON path
    * (inclusive bounds; `None` = unbounded side): the typed sidecar's
    * pushed range scan when materialized, else a cast-and-compare
    * table scan with identical SQL cast semantics.
    */
  private def docMatchIdsRange(pathSteps: Seq[String],
      lo: Option[Double], hi: Option[Double]): DataFrame =
    docMatchIdsAll(Seq(DocRange(pathSteps, lo, hi)))

  /** Rows whose doc value at `$.path` falls in `[lo, hi]` (numeric,
    * SQL cast semantics) — the range twin of [[queryByDocDF]].
    */
  def queryByDocRangeDF(pathSteps: Seq[String],
      lo: Option[Double], hi: Option[Double]): DataFrame = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    table.join(docMatchIdsRange(pathSteps, lo, hi), Seq("id"), "left_semi")
  }

  /** Predicate delete over a numeric range — the retention shape
    * ("drop everything with ts below the cutoff") with the matching id
    * set flowing storage-to-storage through the pushed sidecar scan.
    */
  def deleteWhereRange(pathSteps: Seq[String],
      lo: Option[Double], hi: Option[Double]): Long = {
    assertSingleWriter()
    require(pathSteps.nonEmpty, "path must have at least one step")
    val ids = docMatchIdsRange(pathSteps, lo, hi).localCheckpoint(true)
    val n = ids.count()
    if (n > 0) {
      storage.delete(ids)
      maxIdCache = None // the matched set may have contained the live max
      liveCountCache = liveCountCache.map(_ - n)
      annAfterDelete()
      graphAfterDelete(ids)
      docIdxAfterDelete(n); lexAfterDelete(n)
      refreshIndex()
    }
    n
  }

  /** Matching LIVE ids for a JSON-path filter: through the masked
    * sidecar (predicate-pushed scan, no JSON parse) when the path is
    * materialized, else the full-table extraction scan.
    */
  private def docMatchIds(pathSteps: Seq[String], values: Seq[Any]): DataFrame =
    docMatchIdsAll(Seq(DocEquals(pathSteps, values)))

  /** Whether `pred` can dispatch to a materialized sidecar. */
  private def predIndexed(pred: DocPredicate): Boolean = pred match {
    case DocEquals(p, _) => hasDocIndex(p)
    case DocRange(p, _, _) => hasDocIndexNumeric(p)
    case DocNotEquals(p, _) => hasDocIndex(p)
    case DocExists(p) => hasDocIndex(p)
    case DocMissing(p) => hasDocIndex(p)
    case _: DocAnyOf => false // dispatched per member, never as one scan
  }

  /** The predicate's filter over its sidecar's `value` column. */
  private def predSidecarFilter(pred: DocPredicate): Column = pred match {
    case DocEquals(_, vs) => col("value").isin(vs.map(_.toString): _*)
    case DocRange(_, lo, hi) =>
      Seq(lo.map(col("value") >= _), hi.map(col("value") <= _))
        .flatten.reduce(_ && _)
    case _: DocExists => col("value").isNotNull
    case _: DocMissing => col("value").isNull
    case _: DocNotEquals => throw new IllegalStateException(
      "exclusions dispatch as anti-joins, never as sidecar filters")
    case _: DocAnyOf => throw new IllegalStateException(
      "disjunctions dispatch per member, never as one sidecar filter")
  }

  /** The predicate's filter over the raw doc column — the scan route,
    * with IDENTICAL comparison semantics to the sidecar route (the
    * sidecar stores exactly this extraction, string or double-cast).
    */
  private def predScanFilter(pred: DocPredicate): Column = pred match {
    case DocEquals(p, vs) => docValue(p).isin(vs.map(_.toString): _*)
    case DocRange(p, lo, hi) =>
      val v = docValue(p).cast("double")
      Seq(lo.map(v >= _), hi.map(v <= _)).flatten.reduce(_ && _)
    case DocExists(p) => docValue(p).isNotNull
    case DocMissing(p) => docValue(p).isNull
    case _: DocNotEquals => throw new IllegalStateException(
      "exclusions dispatch as anti-joins, never as scan filters")
    case _: DocAnyOf => throw new IllegalStateException(
      "disjunctions dispatch per member, never as one scan filter")
  }

  /** Matching LIVE ids for a CONJUNCTION of metadata terms — the
    * compound-filter dispatcher. Each materialized term becomes its
    * own pushed sidecar scan; the id sets intersect via a left-semi
    * chain (slim (id) frames — the join carries 8 bytes/row whatever
    * the doc size). All unmaterialized terms collapse into ONE
    * column-pruned table scan carrying their ANDed JSON filters, so a
    * query with three unindexed terms still reads the table once.
    */
  private def validatePredicate(pr: DocPredicate): Unit = pr match {
    case DocRange(p, lo, hi) =>
      require(p.nonEmpty, "path must have at least one step")
      require(lo.nonEmpty || hi.nonEmpty, "need at least one bound")
    case DocEquals(p, vs) =>
      require(p.nonEmpty, "path must have at least one step")
      require(vs.nonEmpty, "need at least one value")
    case DocNotEquals(p, vs) =>
      require(p.nonEmpty, "path must have at least one step")
      require(vs.nonEmpty, "need at least one value")
    case DocExists(p) =>
      require(p.nonEmpty, "path must have at least one step")
    case DocMissing(p) =>
      require(p.nonEmpty, "path must have at least one step")
    case DocAnyOf(ms) =>
      require(ms.nonEmpty, "DocAnyOf needs at least one member")
      require(!ms.exists(_.isInstanceOf[DocNotEquals]),
        "exclusions inside a disjunction are not supported — state the " +
          "blocklist as a top-level DocNotEquals term")
      ms.foreach(validatePredicate)
  }

  /** The DISTINCT-union id frame of a disjunction: indexed members
    * read their own pushed sidecar scans; ALL unmaterialized members
    * fold into one table scan carrying their ORed filters (same
    * one-scan discipline as the conjunction's fold); nested
    * disjunctions recurse.
    */
  private def docAnyOfIds(members: Seq[DocPredicate]): DataFrame = {
    val (nested, flat) = members.partition(_.isInstanceOf[DocAnyOf])
    val (indexed, scanned) = flat.partition(predIndexed)
    val sidecarFrames = indexed.map { pr =>
      val dir = pr match {
        case DocEquals(p, _) => docIdxDir(p)
        case DocRange(p, _, _) => docIdxNumDir(p)
        case DocExists(p) => docIdxDir(p)
        case DocMissing(p) => docIdxDir(p)
        case _ => throw new IllegalStateException("unreachable")
      }
      annTombstoneMask(spark.read.parquet(dir.toString))
        .filter(predSidecarFilter(pr))
        .select($"id")
    }
    val scanFrame =
      if (scanned.isEmpty) None
      else Some(table
        .filter(scanned.map(predScanFilter).reduce(_ || _))
        .select($"id"))
    val nestedFrames = nested.map {
      case DocAnyOf(ms) => docAnyOfIds(ms)
      case _ => throw new IllegalStateException("unreachable")
    }
    (sidecarFrames ++ scanFrame ++ nestedFrames)
      .reduce(_ unionAll _).distinct()
  }

  private def docMatchIdsAll(preds: Seq[DocPredicate]): DataFrame = {
    require(preds.nonEmpty, "need at least one predicate")
    preds.foreach(validatePredicate)
    // negated terms apply as anti-joins AGAINST the positive
    // intersection (or the full live id set when every term is an
    // exclusion) — complement semantics: a row missing the path never
    // matches the positive form, so the exclusion keeps it
    val (negated, rest) = preds.partition(_.isInstanceOf[DocNotEquals])
    val (anyOfs, positive) = rest.partition(_.isInstanceOf[DocAnyOf])
    val (indexed, scanned) = positive.partition(predIndexed)
    val sidecarFrames = indexed.map { pr =>
      val dir = pr match {
        case DocEquals(p, _) => docIdxDir(p)
        case DocRange(p, _, _) => docIdxNumDir(p)
        case DocExists(p) => docIdxDir(p)
        case DocMissing(p) => docIdxDir(p)
        case _ => throw new IllegalStateException("unreachable")
      }
      annTombstoneMask(spark.read.parquet(dir.toString))
        .filter(predSidecarFilter(pr))
        .select($"id")
    }
    val scanFrame =
      if (scanned.isEmpty) None
      else Some(table
        .filter(scanned.map(predScanFilter).reduce(_ && _))
        .select($"id"))
    val anyFrames = anyOfs.map {
      case DocAnyOf(ms) => docAnyOfIds(ms)
      case _ => throw new IllegalStateException("unreachable")
    }
    val base = (sidecarFrames ++ scanFrame ++ anyFrames)
      .reduceOption((a, b) => a.join(b, Seq("id"), "left_semi"))
      .getOrElse(table.select($"id"))
    negated.foldLeft(base) { (acc, pr) =>
      val DocNotEquals(p, vs) = pr: @unchecked
      acc.join(docMatchIds(p, vs), Seq("id"), "left_anti")
    }
  }

  /** Matching live ROWS for a JSON-path filter — [[docMatchIds]]
    * semi-joined back to the table on the indexed route, the plain
    * filter scan otherwise (unchanged plan when no index exists).
    */
  private def docMatchRows(pathSteps: Seq[String], values: Seq[Any]): DataFrame =
    if (hasDocIndex(pathSteps))
      table.join(docMatchIds(pathSteps, values), Seq("id"), "left_semi")
    else
      table.filter(docValue(pathSteps).isin(values.map(_.toString): _*))

  /** Live `(id, parent)` pairs for the parent-rollup joins: through
    * the STRING sidecar when `parentPath` is materialized — same
    * string→long cast as the scan route, so semantics are identical,
    * but the scan reads a slim 3-column sidecar instead of parsing the
    * doc JSON of every row — else the column-pruned table scan.
    */
  private def parentFrame(parentPath: Seq[String]): DataFrame =
    (if (hasDocIndex(parentPath))
      annTombstoneMask(spark.read.parquet(docIdxDir(parentPath).toString))
        .select($"id", col("value").cast("long").as("parent"))
    else
      table.select($"id",
        docValue(parentPath).cast("long").as("parent")))
      .filter($"parent".isNotNull)

  /** JSON-path filter (reference: vector_store.py:334-356): rows whose
    * `doc` JSON value at `$.path` is in `values`. Values compare as
    * strings (SQLite's typed `json_extract` vs Spark's string-valued
    * `get_json_object` — SURVEY.md §2 R9). Routes through the
    * materialized sidecar when [[materializeDocField]] covered the
    * path.
    */
  def queryByDoc(pathSteps: Seq[String], values: Seq[Any]): Seq[SelectRecord] = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    docMatchRows(pathSteps, values)
      .orderBy($"id")
      .as[SelectRecord].collect().toSeq
  }

  /** DataFrame twin of [[queryByDoc]] (unordered). */
  def queryByDocDF(pathSteps: Seq[String], values: Seq[Any]): DataFrame = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    docMatchRows(pathSteps, values)
  }

  /** Value histogram of a JSON path over the LIVE rows — the curation
    * dashboard's "distribution of lang / source / label across the
    * corpus" in one aggregate. Through the materialized sidecar when
    * one exists (a slim pushed scan — the table's doc column is never
    * parsed), else the extraction scan. Rows whose doc lacks the path
    * report as the NULL value row ("how many docs are missing lang" is
    * itself a curation signal). Returns (value, n).
    */
  def docFieldHistogramDF(pathSteps: Seq[String]): DataFrame = {
    require(pathSteps.nonEmpty, "path must have at least one step")
    (if (hasDocIndex(pathSteps))
      annTombstoneMask(spark.read.parquet(docIdxDir(pathSteps).toString))
        .select(col("value"))
    else table.select(docValue(pathSteps).as("value")))
      .groupBy(col("value"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
  }

  /** Conjunctive metadata filter: live rows satisfying EVERY term —
    * `lang = "en" AND score >= 0.5` as
    * `Seq(DocEquals(Seq("lang"), Seq("en")),
    *      DocRange(Seq("score"), Some(0.5), None))`.
    * Dispatch per term: materialized terms read their own pushed
    * sidecar scans intersected by an id semi-join chain; all
    * unmaterialized terms share ONE table scan (see [[docMatchIdsAll]]).
    */
  def queryByDocAllDF(preds: Seq[DocPredicate]): DataFrame =
    table.join(docMatchIdsAll(preds), Seq("id"), "left_semi")

  /** Record-shaped [[queryByDocAllDF]], ordered by id. */
  def queryByDocAll(preds: Seq[DocPredicate]): Seq[SelectRecord] =
    queryByDocAllDF(preds).orderBy($"id").as[SelectRecord].collect().toSeq

  /** Predicate delete over a conjunction of metadata terms — the
    * compound twin of [[deleteWhere]]/[[deleteWhereRange]] (retention
    * jobs filter on `source AND timestamp`, not one path). Returns the
    * deleted count; zero matches is a no-op.
    */
  def deleteWhereAll(preds: Seq[DocPredicate]): Long = {
    assertSingleWriter()
    val ids = docMatchIdsAll(preds).localCheckpoint(true)
    val n = ids.count()
    if (n > 0) {
      storage.delete(ids)
      maxIdCache = None // the matched set may have contained the live max
      liveCountCache = liveCountCache.map(_ - n)
      annAfterDelete()
      graphAfterDelete(ids)
      docIdxAfterDelete(n); lexAfterDelete(n)
      refreshIndex()
    }
    n
  }

  /** All vectors in insertion (= ascending id) order (reference:
    * vector_store.py:403-404).
    */
  def dumpVecs(): Array[Array[Float]] =
    indexDf.orderBy($"id").select($"vec").as[Array[Float]].collect()

  /** The store as a DataFrame — the Spark-native view for composing with
    * arbitrary DataFrame operators (no reference analogue).
    */
  def toDF: DataFrame = table

  /** Operational snapshot — the maintenance dashboard a store admin
    * polls: live rows, pending tombstones (compaction debt — when
    * this grows, reads pay the anti-join mask), id high-water mark,
    * write version, and ANN index presence/centroid count. Bounded
    * cost: two counts plus file metadata, no data movement beyond a
    * column-pruned id scan.
    */
  def stats(): StoreStats = {
    val tombs = storage match {
      case t: TombstoneStorage => t.tombstoneCount()
      case _ => 0L
    }
    val cells =
      if (hasAnnIndex) spark.read.parquet(s"$annPath/centroids").count()
      else 0L
    StoreStats(count(), tombs, maxId(), currentVersion(), hasAnnIndex, cells)
  }

  /** ANN-index health snapshot (see [[AnnIndexStats]]) — ONE aggregate
    * over the index's (cell, count) frame plus a masked count for the
    * dead-row fraction; bounded driver state (a dozen numbers) at any
    * index size.
    */
  def annIndexStats(): AnnIndexStats = {
    require(hasAnnIndex, "no ANN index — buildAnnIndex first")
    val perCell = spark.read.parquet(s"$annPath/index")
      .groupBy(col("centroid_id").cast("long")).count()
    val agg = perCell.agg(
      org.apache.spark.sql.functions.count(lit(1)).as("nc"),
      sum(col("count")).as("rows"),
      min(col("count")).as("mn"),
      expr("percentile_approx(count, 0.5)").as("p50"),
      max(col("count")).as("mx")).head()
    val (nonEmpty, rows) = (agg.getLong(0), agg.getLong(1))
    val nCells = spark.read.parquet(s"$annPath/centroids").count()
    val live = annTombstoneMask(
      spark.read.parquet(s"$annPath/index").select(col("id"), col(GenCol)))
      .count()
    val mean = rows.toDouble / math.max(nonEmpty, 1L)
    AnnIndexStats(annKind, annMetric, nCells, nCells - nonEmpty, rows,
      rows - live, agg.getLong(2), agg.getLong(3), agg.getLong(4),
      agg.getLong(4) / math.max(mean, 1e-12),
      (rows - live).toDouble / math.max(rows, 1L))
  }

  /** The current write-version on the tombstone layout (None on plain
    * Parquet, which keeps no versions) — capture it before later
    * writes to pin a [[snapshotAt]] view.
    */
  def currentVersion(): Option[Long] = storage match {
    case t: TombstoneStorage => Some(t.currentVersion())
    case _ => None
  }

  /** Time travel: the store as of write-version `version` — rows
    * appended at or before it, minus deletes recorded at or before it
    * (reproduce the corpus a run trained on; audit what a delete
    * removed). Tombstone layout only; history is bounded by
    * compaction. See [[TombstoneStorage.readAt]].
    */
  def snapshotAt(version: Long): DataFrame = storage match {
    case t: TombstoneStorage => t.readAt(version)
    case _ => throw new UnsupportedOperationException(
      "snapshots need the tombstone layout " +
        "(openOrCreate(..., tombstoneDeletes = true))")
  }

  /** Retention vacuum — the GDPR true-delete / storage-reclamation
    * step [[snapshotAt]]'s history otherwise forbids: a deleted row
    * stays readable at old versions until vacuumed. Permanently
    * removes rows masked by tombstones at or below `beforeVersion`
    * and raises the snapshot floor (older snapshots then FAIL
    * explicitly rather than read incomplete); newer history — and the
    * live table — are untouched, so a retention job can trail the
    * write head by a fixed window
    * ([[graft.store.TombstoneStorage.vacuum]]). The ANN index is
    * re-derived from the live table afterwards: the purged rows'
    * masking tombstones are gone, so their index entries must not
    * outlive them. Returns the purged row count.
    */
  def vacuum(beforeVersion: Long): Long = storage match {
    case t: TombstoneStorage =>
      assertSingleWriter()
      val purged = t.vacuum(beforeVersion)
      if (purged > 0) {
        rebuildAnnRowsFromCentroids()
        materializedDocFields.foreach(materializeDocField)
        materializedNumericDocFields.foreach(materializeDocFieldNumeric)
        resetDeadStatsAfterRewrite(docDeadStatsPath)
        if (hasLexIndex) buildLexIndex()
        reconcileGraphAfterPurge()
      }
      refreshIndex()
      purged
    case _ => throw new UnsupportedOperationException(
      "vacuum needs the tombstone layout " +
        "(openOrCreate(..., tombstoneDeletes = true))")
  }

  /** Oldest version [[snapshotAt]] can still reproduce (0 = full
    * history); None on the plain layout.
    */
  def snapshotFloor: Option[Long] = storage match {
    case t: TombstoneStorage => Some(t.snapshotFloor())
    case _ => None
  }

  /** What changed between two write-versions: one row per id present
    * in either snapshot with status `added` / `removed` / `changed`
    * (vec OR doc differs) / `unchanged` — the audit a retention
    * request or a training-set freeze review runs ("what exactly did
    * this delete remove; what did the last ingest touch"). Pure
    * full-outer join of the two [[snapshotAt]] views on id; vectors
    * compare exactly (float32 round-trips losslessly through the
    * store). Tombstone layout only, history bounded by compaction.
    */
  def diffVersions(v1: Long, v2: Long): DataFrame = {
    val a = snapshotAt(v1).select($"id", $"vec".as("_va"), $"doc".as("_da"),
      lit(true).as("_pa"))
    val b = snapshotAt(v2).select($"id", $"vec".as("_vb"), $"doc".as("_db"),
      lit(true).as("_pb"))
    a.join(b, Seq("id"), "full_outer")
      .select($"id",
        when($"_pa".isNull, "added")
          .when($"_pb".isNull, "removed")
          .when($"_va" === $"_vb" && ($"_da" <=> $"_db"), "unchanged")
          .otherwise("changed").as("status"))
  }

  // `db_path=` matches the reference repr exactly (vector_store.py /
  // tests.py:488-491), even though the field here is `path`.
  override def toString: String = s"VectorStore(db_path=$path, dim=$dim)"
}

object VectorStore {
  /** File recording the store's vector dimension, written at create
    * time directly under the store root (layout invariant cloneTo
    * re-checks post-copy). */
  private[graft] val DimMarker = "dim.meta"

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("doc", StringType, nullable = true)))

  /** Minimal JSON writer matching Python `json.dumps`' default
    * formatting (`", "` / `": "` separators) for the doc value types the
    * reference round-trips (vector_store.py:133-137): null, strings,
    * booleans, integer and floating numbers, and nested string-keyed
    * maps / sequences thereof. Anything else raises — this is
    * `insert_dicts`' serializability contract (vector_store.py:163-181,
    * test/tests.py:426-429).
    */
  private[graft] def jsonDump(v: Any): String = v match {
    case null => "null"
    case s: String => jsonQuote(s)
    case b: Boolean => if (b) "true" else "false"
    case n @ (_: Byte | _: Short | _: Int | _: Long) => n.toString
    case f: Float => jsonDump(f.toDouble)
    case d: Double =>
      if (d.isNaN || d.isInfinite)
        throw new IllegalArgumentException(
          s"docs must be JSON serializable: $d is not valid JSON")
      else pythonDouble(d)
    case bd: BigDecimal => bd.toString
    case m: scala.collection.Map[_, _] =>
      m.map {
        case (k: String, value) => jsonQuote(k) + ": " + jsonDump(value)
        case (k, _) => throw new IllegalArgumentException(
          s"docs must be JSON serializable: non-string key $k")
      }.mkString("{", ", ", "}")
    case s: scala.collection.Seq[_] => s.map(jsonDump).mkString("[", ", ", "]")
    case a: Array[_] => a.map(jsonDump).mkString("[", ", ", "]")
    case other => throw new IllegalArgumentException(
      "docs must be JSON serializable: Object of type " +
        s"${other.getClass.getName} is not JSON serializable")
  }

  /** Python `repr`-compatible float rendering (json.dumps delegates to
    * it): fixed notation for 1e-4 ≤ |d| < 1e16, else `me±XX` exponent
    * form (lowercase e, signed, ≥2 exponent digits) — Java's toString
    * switches to scientific at different thresholds in both directions.
    */
  private def pythonDouble(d: Double): String = {
    val ad = math.abs(d)
    if (d == 0.0) (if (1 / d < 0) "-0.0" else "0.0")
    else if (ad >= 1e16 || ad < 1e-4) {
      val Array(m0, e0) = d.toString.split("E")
      val m = if (m0.endsWith(".0")) m0.dropRight(2) else m0
      val e = e0.toInt
      val digits = math.abs(e).toString
      val padded = if (digits.length < 2) "0" + digits else digits
      s"${m}e${if (e < 0) "-" else "+"}$padded"
    } else if (d == d.floor) s"${d.toLong}.0" // locale-free (f"%.1f" is not)
    else {
      val s = d.toString
      // Java goes scientific below 1e-3 and at/above 1e7; Python stays
      // fixed in this range — expand via the exact decimal string
      if (s.contains("E")) new java.math.BigDecimal(s).toPlainString else s
    }
  }

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      // json.dumps defaults to ensure_ascii=True: everything outside
      // printable ASCII escapes as \uXXXX (UTF-16 units, so astral
      // chars become surrogate pairs exactly like CPython emits them)
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  /** Open an existing store (validating its recorded dimension) or create
    * an empty one (reference: vector_store.py:29-77).
    *
    * `tombstoneDeletes = true` selects the [[TombstoneStorage]] layout:
    * O(batch) deletes with periodic [[VectorStore.compact]], the layout
    * for tables too large to rewrite per delete.
    */
  def openOrCreate(
      spark: SparkSession, path: String, dim: Int,
      tombstoneDeletes: Boolean = false): VectorStore = {
    require(dim > 0, s"dim must be positive, got $dim")
    graft.functions.registerAll(spark)
    val storage: StorageLayer =
      if (tombstoneDeletes) new TombstoneStorage(spark, path)
      else new ParquetStorage(spark, path)
    val metaPath = new Path(path, DimMarker)
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (storage.exists) {
      val stored = {
        val in = fs.open(metaPath)
        try new String(in.readAllBytes(), "UTF-8").trim.toInt finally in.close()
      }
      if (stored != dim)
        throw new IllegalArgumentException(
          s"store at $path has dimension $stored, requested $dim")
    } else {
      storage.initialize(schema)
      val out = fs.create(metaPath, true)
      try out.write(dim.toString.getBytes("UTF-8")) finally out.close()
    }
    // the single-writer lease is claimed LAZILY on the first mutation
    // (see assertSingleWriter): a handle opened purely to read never
    // invalidates a live writer's lease
    new VectorStore(spark, path, dim, storage)
  }
}
