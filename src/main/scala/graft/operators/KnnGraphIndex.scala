package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

import graft.functions.l2_distance

/** Persisted k-NN-graph index layout — the graph-ANN twin of the IVF
  * layout in [[Ann.writeIvfIndex]], built so SERVING never pays
  * corpus-sized prep (the round-12 finding against the standalone
  * [[KnnGraph.searchGraph]], which re-derived the undirected adjacency
  * — an O(E) shuffle — and re-scanned all ids for entry points on
  * every call).
  *
  * Layout under `<root>/` (every heavy artifact VERSION-SUFFIXED, the
  * `meta` manifest the single commit point — see "Crash discipline"):
  *
  *   - `nodes-v<N>/` — ONE parquet table partitioned by
  *     `bucket = pmod(xxhash64(id), nBuckets)`, EXACTLY ONE id-sorted
  *     file per bucket (serve lookups pay one parquet footer per
  *     touched bucket, not one per shuffle task that happened to hold
  *     rows of it), one row per node:
  *     `(id, vec, gen, fwd: array<struct<nbr,dist>>, rev: array<long>)`.
  *     `fwd` is the node's own k-NN list in rank order; `rev` is the
  *     exact set of nodes whose lists contain it. This is the
  *     DiskANN-style node record (Subramanya et al., NeurIPS'19):
  *     vector and adjacency co-located, so a beam hop is two
  *     BUCKET-PRUNED id lookups (expand the frontier's lists, fetch
  *     candidate vectors) — reads bounded by the hop's touched
  *     buckets, never by n or E. Keeping `fwd` and `rev` separate
  *     (instead of one undirected set) is what makes maintenance
  *     O(diff): a list change updates `fwd` at one node and `rev` at
  *     the symmetric-difference partners, with no membership-count
  *     ambiguity.
  *   - `entries-v<N>` — text file of entry-point ids: K-MEANS MEDOIDS
  *     (nearest real row to each of `nEntries` cluster centers), so
  *     beams start near every region of the corpus instead of at
  *     arbitrary scrambled-order heads. Materialized AT BUILD.
  *   - `meta` — build recipe (`k`, `buildK`, `maxIters`, `nBuckets`,
  *     `nEntries`, `metric` l2|cosine, `pqM`, `pqBits`, `opq`) plus the
  *     layout version `ver`, so incremental appends replay the descent
  *     with the recorded hyperparameters and every serving walk ranks
  *     by the metric the graph was BUILT under.
  *   - `pq_codebook-v<N>/` (when `pqM` > 0) — per-subspace PQ
  *     codebooks (`pqBits` 4 → 16 codes/subspace, 8 → 256); node
  *     records then carry a `codes` column and the WALK scores on
  *     codes (column-pruned scans — the d-dim vector never travels
  *     during traversal, the DiskANN trade), with the final beam
  *     refined on full vectors.
  *   - `opq-v<N>/` (when `opq`) — the OPQ rotation (Ge et al.,
  *     CVPR'13) trained on the fit sample; codes encode `A·vec`,
  *     serving rotates the query before ADC, and the stored vector —
  *     hence the exact refine — stays UNROTATED. WHEN IT PAYS: the
  *     rotation buys recall only where dimensions are correlated /
  *     anisotropically mixed (real text-embedding output usually is;
  *     the spec's correlated fixture shows +0.05..0.2 recall at 4-bit)
  *     — on near-iid dims it measurably buys nothing (the r14 sweep:
  *     +0.00 at 8-bit) and costs a rotation per fit and per query, so
  *     leave it off unless a PCA spectrum or a recall probe says the
  *     corpus has structure to align.
  *
  * Crash discipline (stage → commit): a rebuild writes `nodes`,
  * `pq_codebook`, `opq`, and `entries` under the NEXT version suffix
  * while the previous version keeps serving, then atomically renames
  * the new `meta` into place — the ONLY activation step. A crash
  * anywhere before that rename leaves the old meta pointing at the
  * old, mutually-consistent artifact set; it can never serve old node
  * codes against a new codebook (or a pqM>0 meta over codeless nodes),
  * which the previous overwrite-in-place codebook write allowed.
  * Superseded version dirs are swept best-effort AFTER the commit
  * with a ONE-GENERATION grace window (committing vN sweeps vN-2 and
  * older; vN-1 keeps serving any in-flight walk that resolved the old
  * meta) — a failed sweep leaves garbage for the next rebuild's
  * sweep, never an inconsistent layout, because every reader resolves
  * paths through the committed meta. Legacy layouts (`ver = 0`,
  * unsuffixed paths) stay readable; their first rebuild migrates them
  * to `v1`.
  *
  * Maintenance (the [[graft.store.VectorStore]] ingest contract):
  *
  *   - append: [[KnnGraph.nnDescentAppend]] folds the batch into the
  *     persisted graph (O(batch)-seeded descent), then ONLY the
  *     buckets whose rows changed are rewritten (Spark dynamic
  *     partition overwrite) — list diffs drive `fwd` updates at
  *     changed nodes and `rev` updates at their diff partners.
  *   - delete: affected nodes (exactly `rev` of the dead — a
  *     bucket-pruned lookup, never an O(E) reverse scan) drop dead
  *     entries and RE-SEARCH the masked graph seeded from their own
  *     surviving lists plus the entry medoids, keeping the beam's
  *     top-k as the repaired list (the FreshDiskANN §4 repair shape:
  *     O(affected × beam), not a from-scratch descent). Dead node
  *     rows are removed; every `rev` that referenced them is cleaned
  *     through the same diff machinery.
  *
  * Gen discipline: rows carry the store's write-generation so serving
  * composes the same `data.gen < tomb.gen` tombstone mask as every
  * other derived structure (repair removes dead rows eagerly; the mask
  * covers the window in between, and crash debris).
  */
object KnnGraphIndex {

  /** Build recipe + layout shape, persisted at `<root>/meta`.
    * `nAtBuild` is the row count at the last FULL build — the
    * denominator of the staleness fraction (0 on pre-churn layouts).
    * `ver` names the artifact set this meta commits (0 = legacy
    * unsuffixed paths).
    */
  case class Meta(k: Int, buildK: Int, maxIters: Int, nBuckets: Int,
      nEntries: Int, nAtBuild: Long = 0L, metric: String = "l2",
      pqM: Int = 0, pqBits: Int = 4, opq: Boolean = false, ver: Long = 0L)

  private def nodesPath(root: String, m: Meta) =
    if (m.ver == 0L) s"$root/nodes" else s"$root/nodes-v${m.ver}"
  private def pqPath(root: String, m: Meta) =
    if (m.ver == 0L) s"$root/pq_codebook" else s"$root/pq_codebook-v${m.ver}"
  private def opqPath(root: String, m: Meta) = s"$root/opq-v${m.ver}"
  private def entriesPath(root: String, m: Meta) =
    if (m.ver == 0L) new Path(root, "entries")
    else new Path(root, s"entries-v${m.ver}")
  private def metaPath(root: String) = new Path(root, "meta")
  private def churnPath(root: String) = new Path(root, "churn")

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def bucketOf(c: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(c), lit(nBuckets.toLong))

  /** Driver-side twin of [[bucketOf]] for ids already collected —
    * `xxhash64(longCol)` IS `XXH64.hashLong(v, seed = 42)` and `pmod`
    * IS `floorMod`, so a bounded lookup derives its touched buckets
    * with zero jobs (spec-asserted equal to the column form). A hash
    * divergence here would mis-prune every lookup and fail every
    * exactness gate, which is the regression net.
    */
  private[graft] def bucketOfDriver(id: Long, nBuckets: Int): Long =
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L),
      nBuckets.toLong)

  private val FwdType = "array<struct<nbr:bigint,dist:float>>"

  /** A layout exists when a committed meta names a readable node
    * table; staged-but-uncommitted builds (crash debris) don't count.
    * TOTAL predicate: a torn or corrupt meta (pre-versioning layouts
    * were written with a plain non-atomic create, so that debris can
    * exist) reads as `false` — every dispatch site treats this as a
    * boolean probe, never an exception channel.
    */
  def exists(spark: SparkSession, root: String): Boolean = {
    val f = fs(spark, root)
    f.exists(metaPath(root)) &&
      (try f.exists(new Path(nodesPath(root, readMeta(spark, root))))
       catch { case scala.util.control.NonFatal(_) => false })
  }

  def drop(spark: SparkSession, root: String): Unit = {
    val f = fs(spark, root)
    val p = new Path(root)
    if (f.exists(p) && !f.delete(p, true))
      throw new java.io.IOException(s"could not drop graph index at $root")
  }

  /** The committed node table, resolved through the meta manifest —
    * external readers must use this (or [[nodesDir]]) rather than a
    * hardcoded `nodes/`, which is version-suffixed.
    */
  def nodesDF(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(nodesPath(root, readMeta(spark, root)))

  /** The committed node table's directory (spec/diagnostic use). */
  private[graft] def nodesDir(spark: SparkSession, root: String): String =
    nodesPath(root, readMeta(spark, root))

  /** Read a marker file, falling back to its `.prev` parking copy when
    * the primary is missing — the recovery path for a crash inside
    * [[writeFileAtomic]]'s non-overwrite-rename fallback (the live file
    * is parked at the prev name before the swap, so the torn window
    * leaves the PREVIOUS content readable instead of orphaning the
    * layout).
    */
  private def readSmallFile(spark: SparkSession, root: String,
      dest: Path): String = {
    val f = fs(spark, root)
    val prev = prevPath(root, dest)
    val p = if (!f.exists(dest) && f.exists(prev)) prev else dest
    val in = f.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  private def prevPath(root: String, dest: Path) =
    new Path(root, s"_${dest.getName}.prev")

  def readMeta(spark: SparkSession, root: String): Meta = {
    val body = readSmallFile(spark, root, metaPath(root))
    val m = body.split("\n").filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
    Meta(m("k").toInt, m("buildK").toInt, m("maxIters").toInt,
      m("nBuckets").toInt, m("nEntries").toInt,
      m.getOrElse("nAtBuild", "0").toLong,
      m.getOrElse("metric", "l2"),
      m.getOrElse("pqM", "0").toInt,
      m.getOrElse("pqBits", "4").toInt,
      m.getOrElse("opq", "false").toBoolean,
      m.getOrElse("ver", "0").toLong)
  }

  /** Staged write + atomic rename of a small marker file — the
    * activation primitive for `meta`, `entries`, and `churn` (a torn
    * marker must never be readable). Where the FS lacks
    * overwrite-rename, the fallback PARKS the live file at a `.prev`
    * name (one atomic rename), swaps the staging in (another), then
    * drops the parking copy. A crash between the renames leaves the
    * destination MISSING but the parked copy intact, and every reader
    * routes through [[readSmallFile]]'s prev fallback — so for `meta`
    * the torn window serves the PREVIOUS committed layout rather than
    * orphaning an intact one (churn/entries degrade the same way:
    * stale-read, never unreadable).
    */
  private def writeFileAtomic(spark: SparkSession, root: String,
      dest: Path, body: String): Unit = {
    val staging = new Path(root,
      s"_${dest.getName}.staging-${java.util.UUID.randomUUID()}")
    val out = fs(spark, root).create(staging, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        dest.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(staging, dest,
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException =>
        val f = fs(spark, root)
        val prev = prevPath(root, dest)
        if (f.exists(prev)) f.delete(prev, false)
        val had = f.exists(dest)
        if (had && !f.rename(dest, prev))
          throw new java.io.IOException(s"could not park $dest")
        if (!f.rename(staging, dest)) {
          if (had) f.rename(prev, dest) // best-effort restore
          throw new java.io.IOException(s"could not activate $staging")
        }
        if (had) f.delete(prev, false)
    }
  }

  private def writeMeta(spark: SparkSession, root: String, m: Meta): Unit =
    writeFileAtomic(spark, root, metaPath(root),
      s"k=${m.k}\nbuildK=${m.buildK}\nmaxIters=${m.maxIters}\n" +
        s"nBuckets=${m.nBuckets}\nnEntries=${m.nEntries}\n" +
        s"nAtBuild=${m.nAtBuild}\nmetric=${m.metric}\npqM=${m.pqM}\n" +
        s"pqBits=${m.pqBits}\nopq=${m.opq}\nver=${m.ver}")

  /** Rows churned (appended + deleted) into the layout since the last
    * full [[write]] — the staleness numerator, folded O(batch) per
    * mutation (the cellstats pattern: each mutation already holds its
    * own batch, so the bump never scans the layout). Missing file = 0
    * (fresh build, or a pre-churn layout).
    */
  def readChurn(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    if (!f.exists(churnPath(root)) &&
        !f.exists(prevPath(root, churnPath(root)))) 0L
    else readSmallFile(spark, root, churnPath(root)).trim.toLong
  }

  private def writeChurn(spark: SparkSession, root: String,
      v: Long): Unit =
    // staged + atomic activation: a torn counter would silently
    // disable or misfire the staleness trigger; a torn-window MISSING
    // file reads 0, which delays — never corrupts — the rebuild
    writeFileAtomic(spark, root, churnPath(root), v.toString)

  /** Read-modify-write on the churn counter — correct under the
    * store's SINGLE-WRITER contract (every caller sits inside a
    * mutation that holds the writer lease, including the compact-time
    * reconcile, which routes through [[deleteAndRepair]] under the
    * same lease). Two genuinely concurrent mutators could lose an
    * increment, which would UNDER-count churn and delay the staleness
    * rebuild — the same degradation the missing-file case documents —
    * but that topology already violates the layout's write contract.
    */
  private def bumpChurn(spark: SparkSession, root: String,
      delta: Long): Unit =
    if (delta > 0L) writeChurn(spark, root, readChurn(spark, root) + delta)

  def readEntries(spark: SparkSession, root: String): Seq[Long] =
    readEntries(spark, root, readMeta(spark, root))

  private def readEntries(spark: SparkSession, root: String,
      meta: Meta): Seq[Long] = {
    val body = readSmallFile(spark, root, entriesPath(root, meta))
    body.split("\n").iterator.map(_.trim).filter(_.nonEmpty)
      .map(_.toLong).toSeq
  }

  private def writeEntries(spark: SparkSession, root: String, meta: Meta,
      ids: Seq[Long]): Unit =
    writeFileAtomic(spark, root, entriesPath(root, meta),
      ids.sorted.mkString("\n"))

  /** Entry-point medoids: the nearest REAL row to each of `nEntries`
    * k-means centers (cheap sample-seeded training — entry quality
    * needs coverage, not converged clustering). Deterministic.
    */
  private def pickMedoids(points: DataFrame, nEntries: Int,
      n: Long, metric: String): Seq[Long] = {
    val kk = math.min(nEntries.toLong, n).toInt
    val cosine = metric == "cosine"
    val cents =
      if (cosine) Ann.kmeansCosine(points, "id", "vec", kk, iters = 3,
        seedRounds = 0)
      else Ann.kmeans(points, "id", "vec", kk, iters = 3, seedRounds = 0)
    val assigned =
      if (cosine) Ann.assignCosine(points, "id", "vec", cents)
      else Ann.assign(points, "id", "vec", cents)
    assigned
      .join(broadcast(cents), Seq("centroid_id"))
      .withColumn("d", KnnGraph.distExpr(metric, col("vec"), col("centroid")))
      .groupBy(col("centroid_id"))
      .agg(min(struct(col("d"), col("id"))).as("m"))
      .select(col("m.id"))
      .collect().map(_.getLong(0)).toSeq.distinct
  }

  /** Fit the graph over `points` (`id`, `vec`, `gen`) and persist the
    * full layout. Returns the descent report (for callers that assert
    * convergence).
    */
  def build(spark: SparkSession, root: String, points: DataFrame,
      k: Int, buildK: Int = 0, maxIters: Int = 25, nEntries: Int = 4,
      nBuckets: Int = 16, metric: String = "l2",
      pqM: Int = 0, pqBits: Int = 4, opq: Boolean = false): KnnGraph.Report = {
    val pts = points.select(col("id").cast("long").as("id"), col("vec"),
      col("gen").cast("long").as("gen")).localCheckpoint(true)
    val rep = KnnGraph.nnDescent(pts.select(col("id"), col("vec")),
      "id", "vec", k, maxIters, buildK, metric)
    write(spark, root, pts, rep.graph, k, buildK, maxIters, nEntries,
      nBuckets, metric, pqM, pqBits, opq)
    GraftShim.unpersistLocalCheckpoint(rep.graph)
    GraftShim.unpersistLocalCheckpoint(pts)
    // the descent's checkpoint is released above (layout builds must
    // not accumulate cached blocks); the report's graph re-reads the
    // just-persisted artifact instead
    rep.copy(graph = edges(spark, root))
  }

  /** [[build]] with the SHARDED descent ([[KnnGraph.nnDescentSharded]]
    * — coarse k-means partition, shard-local descent, merge, warm
    * global polish): the cold-build path for corpora where a global
    * descent's iteration count is the wall. Same layout, same serving
    * contract; on well-behaved data the polish converges to the same
    * fixpoint as [[build]].
    */
  def buildSharded(spark: SparkSession, root: String, points: DataFrame,
      k: Int, nShards: Int, buildK: Int = 0, maxIters: Int = 25,
      nEntries: Int = 4, nBuckets: Int = 16, metric: String = "l2",
      pqM: Int = 0, pqBits: Int = 4, opq: Boolean = false,
      replicas: Int = 2, shardIters: Int = 0,
      polishIters: Int = 0, shardBuildK: Int = 0): KnnGraph.Report = {
    val pts = points.select(col("id").cast("long").as("id"), col("vec"),
      col("gen").cast("long").as("gen")).localCheckpoint(true)
    val rep = KnnGraph.nnDescentSharded(pts.select(col("id"), col("vec")),
      "id", "vec", k, nShards, maxIters, buildK, metric, replicas,
      shardIters, polishIters, shardBuildK)
    write(spark, root, pts, rep.graph, k, buildK, maxIters, nEntries,
      nBuckets, metric, pqM, pqBits, opq)
    GraftShim.unpersistLocalCheckpoint(rep.graph)
    GraftShim.unpersistLocalCheckpoint(pts)
    rep.copy(graph = edges(spark, root))
  }

  /** Persist a layout from an ALREADY-BUILT (id, nbr, distance, rank)
    * graph over `points` (`id`, `vec`, `gen`) — [[build]] minus the
    * descent, for callers that hold a converged graph.
    */
  def write(spark: SparkSession, root: String, points: DataFrame,
      graph: DataFrame, k: Int, buildK: Int = 0, maxIters: Int = 25,
      nEntries: Int = 4, nBuckets: Int = 16, metric: String = "l2",
      pqM: Int = 0, pqBits: Int = 4, opq: Boolean = false): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    require(nEntries >= 1, s"nEntries must be >= 1, got $nEntries")
    KnnGraph.requireMetric(metric)
    require(pqM == 0 || metric == "l2",
      "PQ-coded traversal requires the l2 metric (cosine corpora: " +
      "normalize the vectors and build l2)")
    require(pqBits == 4 || pqBits == 8,
      s"pqBits must be 4 or 8, got $pqBits")
    require(!opq || pqM > 0, "opq requires a PQ-coded layout (pqM > 0)")
    val f = fs(spark, root)
    // stage → commit: every artifact lands under the NEXT version
    // suffix while the previous version keeps serving; writeMeta at
    // the end is the single atomic activation (see the crash
    // discipline in the object scaladoc)
    val newVer =
      (if (f.exists(metaPath(root))) readMeta(spark, root).ver else 0L) + 1L
    val pts = points.select(col("id").cast("long").as("id"), col("vec"),
      col("gen").cast("long").as("gen")).localCheckpoint(true)
    val n = pts.count()
    val meta = Meta(k, buildK, maxIters, nBuckets, nEntries, nAtBuild = n,
      metric = metric, pqM = pqM, pqBits = pqBits, opq = opq, ver = newVer)
    // the DiskANN trade: co-locate a PQ code with each node record so
    // the WALK scores on codes (column-pruned reads — the d-dim float
    // vector never travels during traversal) and only the final beam
    // refines on full vectors
    val (cb, rot) =
      if (pqM > 0) {
        val dim = pts.select(size(col("vec"))).head().getInt(0)
        // 4-bit = 16 codes/subspace (the DiskANN traversal regime):
        // enough to steer the walk — the refine re-ranks exactly.
        // 8-bit = 256 codes buys back code-space fidelity on real
        // high-dim embeddings (where 4-bit distortion prunes true
        // neighbors before the refine can see them) for 2× the code
        // bytes; both encode tiers stay inside whole-stage codegen
        // (literal argmin at 16, the pqEncode loop kernel at 256)
        val kCodes = math.min(if (pqBits == 8) 256L else 16L, n).toInt
        // train on a bounded hash-ordered sample (the FAISS recipe):
        // Pq.fit's Lloyd iterations scan the frame it is given — the
        // full corpus made the 1M layout build pay 423 s of codebook
        // training for statistics a 16k sample carries
        val fitSample = pts
          .orderBy(xxhash64(col("id"), lit(77L)), col("id"))
          .limit(math.max(16384, 1024 * pqM))
          .localCheckpoint(true)
        // OPQ (Ge et al., CVPR'13): learn an orthogonal rotation on
        // the same sample, encode A·vec, rotate queries at serve time;
        // the STORED vector stays raw so the exact refine is untouched
        val rotOpt =
          if (opq) {
            val aMat = Opq.trainRotation(fitSample, "id", "vec", dim,
              pqM, kCodes, iters = 3)
            Opq.writeRotation(spark, opqPath(root, meta), aMat)
            Some(aMat)
          } else None
        val fitIn = rotOpt.fold(fitSample)(a =>
          fitSample.withColumn("vec",
            graft.functions.mat_vec(col("vec"), a)))
        val fitted = Pq.fit(fitIn, "id", "vec", dim, pqM, kCodes)
        Pq.writeCodebook(spark, pqPath(root, meta), fitted)
        GraftShim.unpersistLocalCheckpoint(fitSample)
        (Some(fitted), rotOpt)
      } else (None, None)
    val rows = assembleRows(pts, graph, meta, cb, rot)
    // exactly one id-sorted file per bucket: a serve lookup pays one
    // parquet footer/page-index per touched bucket instead of one per
    // shuffle task that held rows of it (the r13 PQ-negative's
    // attribution: per-file overhead dominated serve IO). Explicit
    // partition count so AQE cannot coalesce buckets together.
    rows.repartition(meta.nBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(nodesPath(root, meta))
    writeEntries(spark, root, meta, pickMedoids(pts, nEntries, n, metric))
    writeMeta(spark, root, meta) // THE commit point
    writeChurn(spark, root, 0L) // full build = fresh staleness baseline
    cleanupStaleVersions(spark, root, newVer)
    GraftShim.unpersistLocalCheckpoint(pts)
  }

  /** Best-effort sweep of superseded version dirs (and pre-versioning
    * legacy artifacts) after a successful commit of version `keep`.
    * A failed delete leaves garbage the next rebuild re-sweeps — never
    * inconsistency: readers resolve every path through the committed
    * meta.
    *
    * Grace window: version `keep - 1` is RETAINED and swept only at
    * the commit of `keep + 1` — an in-flight search that resolved the
    * superseded meta (the beam loop runs many actions over lazily-read
    * node/codebook paths) keeps a consistent artifact set for one full
    * rebuild cycle instead of hitting FileNotFoundException mid-walk.
    * Two consecutive rebuilds inside one walk still race it; that
    * topology needs external read-fencing, not a deeper window.
    *
    * Also swept: `_*.staging-<uuid>` files (writeFileAtomic debris
    * from a crash before its rename — never referenced by a committed
    * meta, so always safe) and `_*.prev` parking copies (only live
    * inside the fallback swap, which the single-writer contract
    * serializes against this sweep; the freshly-committed files all
    * exist here).
    */
  private def cleanupStaleVersions(spark: SparkSession, root: String,
      keep: Long): Unit = {
    val f = fs(spark, root)
    val keepNames = (for {
      v <- Seq(keep, keep - 1L) if v >= 1L
      n <- Seq("nodes", "pq_codebook", "opq", "entries")
    } yield s"$n-v$v").toSet
    val versioned = "^(nodes|pq_codebook|opq|entries)-v[0-9]+$".r
    val legacy = Set("nodes", "pq_codebook", "entries", "_nodes-staging")
    try {
      f.listStatus(new Path(root)).foreach { st =>
        val nm = st.getPath.getName
        val debris = nm.startsWith("_") &&
          (nm.contains(".staging-") || nm.endsWith(".prev"))
        val stale = (versioned.findFirstIn(nm).isDefined &&
          !keepNames.contains(nm)) || legacy.contains(nm) || debris
        if (stale) f.delete(st.getPath, true)
      }
    } catch { case _: java.io.IOException => () }
  }

  /** Node rows from a point set and a (id, nbr, distance, rank) edge
    * set: fwd lists in rank order, exact rev sets. PQ codes encode the
    * (optionally OPQ-rotated) vector; the stored `vec` stays raw.
    */
  private def assembleRows(pts: DataFrame, g: DataFrame,
      meta: Meta, cb: Option[Pq.PqCodebook],
      rot: Option[Array[Array[Float]]]): DataFrame = {
    val fwd = g.groupBy(col("id")).agg(
      transform(
        array_sort(collect_list(struct(col("rank"), col("nbr"),
          col("distance")))),
        t => struct(t("nbr").as("nbr"),
          t("distance").cast("float").as("dist"))).as("fwd"))
    val rev = g.select(col("nbr").as("id"), col("id").as("src"))
      .groupBy(col("id"))
      .agg(array_sort(collect_set(col("src"))).as("rev"))
    val joined = pts.join(fwd, Seq("id"), "left").join(rev, Seq("id"), "left")
    val base = joined
      .select(col("id"), col("vec"), col("gen"),
        coalesce(col("fwd"), array().cast(FwdType)).as("fwd"),
        coalesce(col("rev"), array().cast("array<bigint>")).as("rev"),
        bucketOf(col("id"), meta.nBuckets).as("bucket"))
    cb.fold(base)(c => encodeCodes(base, c, rot))
  }

  /** Append the `codes` column: PQ codes of the (OPQ-rotated, when the
    * layout says so) vector.
    */
  private def encodeCodes(df: DataFrame, cb: Pq.PqCodebook,
      rot: Option[Array[Array[Float]]]): DataFrame = rot match {
    case Some(a) =>
      Pq.encode(
        df.withColumn("_rvec", graft.functions.mat_vec(col("vec"), a)),
        "_rvec", "codes", cb).drop("_rvec")
    case None => Pq.encode(df, "vec", "codes", cb)
  }

  /** Ids-per-lookup bound under which the id set itself becomes a
    * literal `isin` filter on the scan (bounded driver state; beam
    * frontiers and repair batches under it skip the broadcast-semi-
    * join stage entirely). What the SOURCE actually receives depends
    * on `spark.sql.parquet.pushdown.inFilterThreshold` (default 10):
    * above it, parquet gets the list's MIN/MAX as a range predicate —
    * which the id-SORTED one-file-per-bucket layout turns into page
    * pruning (the row groups outside the frontier's id range never
    * decode) — and the literal IN list still evaluates post-scan
    * inside whole-stage codegen. So the win here is sorted-file range
    * pruning plus a skipped join stage, not per-value parquet
    * filtering. Above the bound — retention sweeps can carry 10^8
    * dead ids — the distributed semi-join path stands.
    */
  private val IdPushdownLimit = 8192

  /** The node rows of `ids`, read with source-level partition pruning:
    * the scan touches only the DISTINCT BUCKETS of `ids` (≤ nBuckets
    * partition values). Bounded id sets additionally push the id
    * IN-list into the scan; unbounded ones keep a broadcast semi-join.
    */
  /** The committed node table resolved ONCE for a whole walk/repair:
    * every hop's lookup filters this shared relation instead of
    * re-running `spark.read.parquet` (file listing + footer/schema
    * resolution) per hop — the fixed per-hop driver overhead the r15
    * verdict flagged on the `vs_graph_*` serve residue.
    */
  private def nodesRel(spark: SparkSession, root: String,
      meta: Meta): DataFrame =
    spark.read.parquet(nodesPath(root, meta))

  private def lookup(spark: SparkSession, root: String, meta: Meta,
      nodes: DataFrame, ids: DataFrame): DataFrame = {
    // probe with a RAW limit (CollectLimit early-exits; a distinct()
    // here would full-shuffle a 10^8-id retention sweep before the
    // limit could apply). The pushdown is taken only when the RAW
    // count fits the probe — that proves the sample is the WHOLE
    // frame (dedup after, on the driver); a larger frame with few
    // distinct ids merely loses the pushdown, never rows. Callers
    // pass distinct frames, so the raw count is the distinct count
    // in practice.
    val raw = ids.select(col("id"))
      .limit(IdPushdownLimit + 1).collect().map(_.getLong(0))
    if (raw.length <= IdPushdownLimit)
      lookupCollected(nodes, meta, raw.distinct)
    else {
      val buckets = ids.select(bucketOf(col("id"), meta.nBuckets).as("b"))
        .distinct().collect().map(_.getLong(0))
      nodes.filter(col("bucket").isin(buckets.toIndexedSeq: _*))
        .join(broadcast(ids.select(col("id"))), Seq("id"), "left_semi")
    }
  }

  /** [[lookup]] for an ALREADY-COLLECTED bounded id set: buckets derive
    * on the driver ([[bucketOfDriver]]), the bucket filter prunes
    * partitions at planning time, and the id list reaches the parquet
    * source as a range predicate over the sorted files (see
    * [[IdPushdownLimit]]) — zero preparatory jobs. The beam loop
    * collects each hop's frontier once anyway (it doubles as the
    * termination check), so serving hops take this path.
    */
  private def lookupCollected(nodes: DataFrame,
      meta: Meta, ids: Array[Long]): DataFrame = {
    if (ids.isEmpty) nodes.limit(0)
    else {
      val buckets = ids.map(bucketOfDriver(_, meta.nBuckets)).distinct
      nodes.filter(col("bucket").isin(buckets.toIndexedSeq: _*) &&
        col("id").isin(ids.toIndexedSeq: _*))
    }
  }

  /** All rows of the touched buckets (a rewrite must carry its whole
    * partition).
    */
  private def bucketRows(spark: SparkSession, root: String, meta: Meta,
      buckets: Array[Long]): DataFrame = {
    val nodes = spark.read.parquet(nodesPath(root, meta))
    if (buckets.isEmpty) nodes.limit(0)
    else nodes.filter(col("bucket").isin(buckets.toIndexedSeq: _*))
  }

  /** The directed graph as (id, nbr, distance, rank) — exploded fwd
    * lists (the [[KnnGraph.Report.graph]] shape; also the append
    * path's prior).
    */
  def edges(spark: SparkSession, root: String): DataFrame =
    nodesDF(spark, root)
      .select(col("id"), posexplode(col("fwd")).as(Seq("pos", "f")))
      .select(col("id"), col("f.nbr").as("nbr"),
        col("f.dist").as("distance"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Batch beam search against the persisted layout — same walk as
    * [[KnnGraph.searchGraph]] with serving-shaped IO: entry points are
    * the persisted medoids (a file read, no O(n) scan), and each hop's
    * expansion + vector fetch are bucket-pruned node lookups (no
    * undirected-adjacency derivation — `fwd ∪ rev` IS the undirected
    * neighborhood, materialized at build). `rowMask` composes the
    * store's tombstone mask over candidate rows (applied BEFORE
    * scoring, so dead nodes neither rank nor expand). Returns
    * (qid, id, distance float, rank 1..k).
    */
  /** `resultMask` (filtered graph search, the HNSW-filter discipline):
    * the WALK traverses the unfiltered graph — restricting traversal
    * to a filtered subgraph disconnects it under moderate selectivity
    * — while only rows passing the mask are eligible to RANK; the
    * per-query result state stays k-bounded (truncated each hop).
    */
  def search(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, ef: Int, maxHops: Int = 30,
      rowMask: DataFrame => DataFrame = identity,
      resultMask: Option[DataFrame => DataFrame] = None): DataFrame = {
    val meta = readMeta(spark, root)
    val qs = queries.select(col("qid").cast("long").as("qid"), col("qvec"))
      .localCheckpoint(true)
    val entryIds = readEntries(spark, root, meta)
    val seeds = qs.select(col("qid"))
      .crossJoin(broadcast(idsToDF(spark, entryIds)))
    val (out, _) = searchCore(spark, root, meta, qs, seeds, k, ef, maxHops,
      rowMask, excludeSelf = false, resultMask = resultMask)
    GraftShim.unpersistLocalCheckpoint(qs)
    out
  }

  /** [[search]] plus the walk's per-query COST frame `(qid, scanned)`:
    * the number of DISTINCT candidates the beam scored (the seen set —
    * seeds, every proposed expansion). This is the graph arm's row on
    * a recall-vs-cost frontier (`ir_ann_sweep`), directly comparable
    * to the IVF arms' probed-cell row counts: both count candidate
    * rows whose distance to the query was computed.
    */
  def searchWithCost(spark: SparkSession, root: String,
      queries: DataFrame, k: Int, ef: Int,
      maxHops: Int = 30): (DataFrame, DataFrame) = {
    val meta = readMeta(spark, root)
    val qs = queries.select(col("qid").cast("long").as("qid"), col("qvec"))
      .localCheckpoint(true)
    val entryIds = readEntries(spark, root, meta)
    val seeds = qs.select(col("qid"))
      .crossJoin(broadcast(idsToDF(spark, entryIds)))
    val (out, cost) = searchCore(spark, root, meta, qs, seeds, k, ef,
      maxHops, identity, excludeSelf = false, wantCost = true)
    GraftShim.unpersistLocalCheckpoint(qs)
    (out, cost.get)
  }

  private def idsToDF(spark: SparkSession, ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.toDF("id")
  }

  /** The PQ walk's scoring projection — the traversal reads (id,
    * codes, gen), never the d-dim vector (column pruning reaches the
    * scan; plan-asserted in GraphIndexSpec). Package-visible so the
    * spec asserts the REAL code path's ReadSchema.
    */
  private[graft] def codeNodes(spark: SparkSession, root: String,
      meta: Meta, ids: DataFrame): DataFrame =
    codeNodesRel(spark, root, meta, nodesRel(spark, root, meta), ids)

  private def codeNodesRel(spark: SparkSession, root: String, meta: Meta,
      nodes: DataFrame, ids: DataFrame): DataFrame =
    lookup(spark, root, meta, nodes, ids)
      .select(col("id"), col("codes"), col("gen"))

  /** Hops the last [[search]] walk on this thread executed — lets the
    * jobs-per-hop spec (GraphIndexSpec) divide a listener's job count
    * by the REAL hop count instead of maxHops. The bound that matters
    * at cluster latency is driver round-trips per hop; wall clock on a
    * shared box cannot lock it (box noise swamped the round-14
    * measurement), a job count can.
    */
  private[graft] val lastSearchHops = new ThreadLocal[Int]

  /** The shared beam loop: per-query state bounded by `ef`, per-hop IO
    * bounded by the frontier's touched buckets. `seeds` is (qid, id);
    * `excludeSelf` drops qid == id candidates (the repair path, where
    * queries ARE nodes re-finding their own neighborhoods).
    */
  private def searchCore(spark: SparkSession, root: String, meta: Meta,
      qs: DataFrame, seeds: DataFrame, k: Int, ef: Int, maxHops: Int,
      rowMask: DataFrame => DataFrame, excludeSelf: Boolean,
      resultMask: Option[DataFrame => DataFrame] = None,
      forceExact: Boolean = false,
      wantCost: Boolean = false): (DataFrame, Option[DataFrame]) = {
    require(k >= 1 && ef >= k, s"need ef ($ef) >= k ($k) >= 1")
    // ONE resolved node relation for the whole walk: every hop's
    // expansion lookup, scoring lookup, and the final refine filter
    // this shared frame instead of paying a fresh file-listing +
    // schema resolution per hop
    val nodesR = nodesRel(spark, root, meta)
    // PQ-coded traversal (the DiskANN serve shape): hops score on the
    // co-located codes — the lookup reads (id, codes, gen), column
    // pruning keeps the d-dim vector out of traversal IO entirely —
    // and the FINAL beam refines on full vectors (one pruned lookup of
    // ef rows/query). forceExact opts out (the repair path: repaired
    // lists are store state, they must carry exact distances)
    val cb = if (meta.pqM > 0 && !forceExact)
      Some(Pq.readCodebook(spark, pqPath(root, meta))) else None
    // OPQ layouts score in the rotated space: codes encode A·vec, so
    // the query rotates once (a projection over the bounded qs frame);
    // the refine ranks raw vec against raw qvec as always
    val qRot: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (cb.isDefined && meta.opq) {
        val a = Opq.readRotation(spark, opqPath(root, meta))
        q => graft.functions.mat_vec(q, a)
      } else identity
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("distance"), col("id"))
    def maskSelf(pairs: DataFrame): DataFrame =
      if (excludeSelf) pairs.filter(col("qid") =!= col("id")) else pairs
    def exactScore(pairs: DataFrame): DataFrame = {
      val vecs = rowMask(
        lookup(spark, root, meta, nodesR, pairs.select(col("id")).distinct())
          .select(col("id"), col("vec"), col("gen")))
      pairs.join(vecs.select(col("id"), col("vec")), Seq("id"))
        .join(qs, Seq("qid"))
        .select(col("qid"), col("id"),
          KnnGraph.distExpr(meta.metric, col("vec"), col("qvec"))
            .as("distance"))
    }
    def scoreCands(pairs: DataFrame): DataFrame = cb match {
      case Some(c) =>
        val nodes = rowMask(
          codeNodesRel(spark, root, meta, nodesR,
            pairs.select(col("id")).distinct()))
        pairs.join(nodes.select(col("id"), col("codes")), Seq("id"))
          .join(qs, Seq("qid"))
          .select(col("qid"), col("id"),
            graft.functions.l2_distance(qRot(col("qvec")),
              Pq.reconstructCol(col("codes"), c)).as("distance"))
      case None => exactScore(pairs)
    }
    // running result set for filtered search (None = the beam itself
    // is the result): k-truncated exact, ef-truncated under PQ (the
    // approximate walk order needs slack for the refine to re-rank)
    val hitsWidth = if (cb.isDefined) ef else k
    def fold(hits: DataFrame, scored: DataFrame): DataFrame =
      // re-project after the mask: a semi-join on `id` moves that
      // column first, and unionAll is positional
      hits.unionAll(resultMask.get(scored)
          .select(col("qid"), col("id"), col("distance")))
        .withColumn("rn", row_number().over(wq))
        .filter(col("rn") <= hitsWidth)
        .drop("rn").localCheckpoint(true)
    val seed = maskSelf(seeds.select(col("qid"), col("id")).distinct())
      .localCheckpoint(true)
    // the scored frame gets its own checkpoint ONLY when the filtered
    // path consumes it twice (beam + hits fold); on the plain walk the
    // beam checkpoint materializes it once — a separate checkpoint
    // would be a wasted driver round trip per hop (the walk is
    // scheduler-latency-bound: 5 round trips/hop before this change)
    val seedScored =
      if (resultMask.isDefined) scoreCands(seed).localCheckpoint(true)
      else scoreCands(seed)
    var beam = seedScored.withColumn("new", lit(true))
      .localCheckpoint(true)
    var hits: DataFrame = resultMask match {
      case Some(_) => fold(seedScored.limit(0), seedScored)
      case None => null
    }
    // only release a frame we actually checkpointed: on a
    // non-checkpointed frame, unpersistLocalCheckpoint walks the
    // LINEAGE and would release the live seed/qs checkpoints inside it
    if (resultMask.isDefined) GraftShim.unpersistLocalCheckpoint(seedScored)
    // seen holds every PROPOSED pair (masked seeds included — a dead
    // seed must not be re-proposed), separate from the beam: evicted
    // nodes can never re-enter (the ef-th distance only tightens).
    // Kept as a list of per-hop CHECKPOINTED DELTAS unioned lazily for
    // the anti-join — re-materializing the whole set each hop made
    // every tail hop pay O(total-seen) writes (the 1M repair probe's
    // dominant tail cost); the delta layout pays O(new) writes and a
    // cached read of the parts
    var seenParts: List[DataFrame] = List(seed)
    // one frontier-id collect per hop serves THREE roles: the loop's
    // termination check (empty frontier = no beam entry was fresh —
    // what the old per-hop count() job measured), the expansion
    // lookup's pushed id list, and its driver-derived bucket set —
    // replacing three preparatory jobs per hop with one
    def frontIdsOf(b: DataFrame): Array[Long] =
      b.filter(col("new")).select(col("id")).distinct()
        .limit(IdPushdownLimit + 1).collect().map(_.getLong(0))
    var frontIds = frontIdsOf(beam)
    var hops = 0
    while (hops < maxHops && frontIds.nonEmpty) {
      hops += 1
      val frontier = beam.filter(col("new")).select(col("qid"), col("id"))
      val fLookup =
        if (frontIds.length <= IdPushdownLimit)
          lookupCollected(nodesR, meta, frontIds)
        else lookup(spark, root, meta, nodesR,
          frontier.select(col("id")).distinct())
      val fNodes = fLookup
        .select(col("id"),
          concat(transform(col("fwd"), f => f("nbr")), col("rev")).as("out"))
      val unseen = maskSelf(
          frontier.join(fNodes, Seq("id"))
            .select(col("qid"), explode(col("out")).as("id")).distinct())
        .join(seenParts.reduce(_ unionAll _), Seq("qid", "id"), "left_anti")
        .localCheckpoint(true) // consumed twice: scoring + seen fold
      // checkpoint the hop's scored frame only when the hits fold is a
      // second consumer (filtered path) — see seedScored above
      val scored =
        if (resultMask.isDefined) scoreCands(unseen).localCheckpoint(true)
        else scoreCands(unseen)
      val merged = beam.select(col("qid"), col("id"), col("distance"),
          lit(false).as("fresh"))
        .unionAll(scored.withColumn("fresh", lit(true)))
        .withColumn("rn", row_number().over(wq)).filter(col("rn") <= ef)
        .drop("rn")
        .withColumnRenamed("fresh", "new")
        .localCheckpoint(true)
      seenParts = unseen :: seenParts // already checkpointed above
      if (resultMask.isDefined) {
        val nextHits = fold(hits, scored)
        GraftShim.unpersistLocalCheckpoint(hits)
        hits = nextHits
      }
      GraftShim.unpersistLocalCheckpoint(beam)
      // scored is only its own checkpoint on the filtered path — see
      // the release guard above seedScored
      if (resultMask.isDefined) GraftShim.unpersistLocalCheckpoint(scored)
      beam = merged
      frontIds = frontIdsOf(beam)
      if (sys.env.contains("GRAFT_KNNGRAPH_DEBUG"))
        println(s"searchCore hop $hops: ${frontIds.length} fresh beam ids")
    }
    // the cost frame folds BEFORE the seen deltas release: seen parts
    // are disjoint by construction (each hop anti-joins the prior
    // parts), so the count per qid is exactly the distinct candidates
    // scored for it
    val costOpt =
      if (wantCost)
        Some(seenParts.reduce(_ unionAll _)
          .groupBy(col("qid")).agg(count(lit(1)).as("scanned"))
          .localCheckpoint(true))
      else None
    seenParts.foreach(GraftShim.unpersistLocalCheckpoint)
    lastSearchHops.set(hops)
    val ranked = resultMask match {
      case Some(_) => hits
      case None => beam
    }
    // the refine must materialize INSIDE the walk scope: it references
    // qs (and the beam/hits checkpoint), which callers release right
    // after searchCore returns — the checkpoint swap keeps the
    // returned frame self-contained, as the exact path's beam is
    val rankable =
      if (cb.isDefined) {
        val refined = exactScore(ranked.select(col("qid"), col("id")))
          .localCheckpoint(true)
        GraftShim.unpersistLocalCheckpoint(ranked)
        refined
      } else ranked
    (rankable
      .withColumn("rank", row_number().over(wq)).filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("distance"), col("rank")),
      costOpt)
  }

  /** Fold `batch` (`id`, `vec`, `gen`) into the persisted graph:
    * [[KnnGraph.nnDescentAppend]] with the recorded recipe, then a
    * TOUCHED-BUCKETS-ONLY rewrite (list diffs → fwd at changed nodes,
    * rev at diff partners; dynamic partition overwrite).
    */
  def append(spark: SparkSession, root: String, batch: DataFrame): Unit = {
    val meta = readMeta(spark, root)
    val b = batch.select(col("id").cast("long").as("id"), col("vec"),
      col("gen").cast("long").as("gen")).localCheckpoint(true)
    if (b.isEmpty) { GraftShim.unpersistLocalCheckpoint(b); return }
    val nodes = spark.read.parquet(nodesPath(root, meta))
    val prior = edges(spark, root).localCheckpoint(true)
    val rep = KnnGraph.nnDescentAppend(nodes.select(col("id"), col("vec")),
      prior, b.select(col("id"), col("vec")), "id", "vec", meta.k,
      meta.maxIters, meta.buildK, meta.metric)
    applyListChanges(spark, root, meta, rep.graph, prior, newRows = b,
      removedIds = None)
    bumpChurn(spark, root, b.count()) // checkpointed batch — O(batch)
    GraftShim.unpersistLocalCheckpoint(rep.graph)
    GraftShim.unpersistLocalCheckpoint(prior)
    GraftShim.unpersistLocalCheckpoint(b)
  }

  /** Remove `deadIds` and repair the survivors' lists. Affected nodes
    * are EXACTLY the dead rows' `rev` sets (bucket-pruned lookup);
    * each drops its dead entries and re-searches the masked graph
    * seeded from its surviving list plus the entry medoids — beam
    * cost per affected node, never a corpus-wide descent. (Unaffected
    * lists stay exact by construction: a deletion only removes
    * competitors, so a list containing no dead entry is still its
    * node's exact top-k over the survivors.)
    */
  def deleteAndRepair(spark: SparkSession, root: String,
      deadIds: DataFrame, rowMask: DataFrame => DataFrame = identity,
      ef: Int = 0, maxHops: Int = 30): Unit = {
    val meta = readMeta(spark, root)
    val dead = deadIds.select(col("id").cast("long").as("id")).distinct()
      .localCheckpoint(true)
    val nodesR = nodesRel(spark, root, meta)
    val deadRows = lookup(spark, root, meta, nodesR, dead)
      .select(col("id"), col("fwd"), col("rev")).localCheckpoint(true)
    if (deadRows.isEmpty) {
      GraftShim.unpersistLocalCheckpoint(dead)
      GraftShim.unpersistLocalCheckpoint(deadRows)
      return
    }
    val affectedIds = deadRows.select(explode(col("rev")).as("id"))
      .distinct().join(dead, Seq("id"), "left_anti").localCheckpoint(true)
    val affRows = lookup(spark, root, meta, nodesR, affectedIds)
      .select(col("id"), col("vec"), col("fwd")).localCheckpoint(true)
    // prior pairs that must disappear or survive: affected lists plus
    // the dead nodes' own lists (whose reverse entries need cleanup)
    val affPairs = affRows
      .select(col("id"), explode(col("fwd")).as("f"))
      .select(col("id"), col("f.nbr").as("nbr"))
    val deadPairs = deadRows
      .select(col("id"), explode(col("fwd")).as("f"))
      .select(col("id"), col("f.nbr").as("nbr"))
    val priorPairs = affPairs.unionAll(deadPairs).localCheckpoint(true)
    val repaired =
      if (affRows.isEmpty)
        spark.emptyDataFrame.select(lit(0L).as("id"), lit(0L).as("nbr"),
          lit(0f).as("distance"), lit(0).as("rank")).limit(0)
      else {
        val qs = affRows.select(col("id").as("qid"), col("vec").as("qvec"))
          .localCheckpoint(true)
        // seeds: the node's own surviving neighbors — the beam
        // restarts where the list was already good (the FreshDiskANN
        // local-repair shape). Entry medoids seed ONLY orphans (every
        // listed neighbor dead): a medoid cross-seed on every query
        // makes each repair walk re-approach its node from across the
        // corpus — near-maxHops of full-frontier hops per batch (the
        // 1M smoke read ~100M records for 200 deletions), for beams
        // that local seeds converge in a handful of hops
        val live = idsToDF(spark, readEntries(spark, root, meta))
          .join(broadcast(dead), Seq("id"), "left_anti")
        // ... plus the dead REGION's surviving fringe, seeded
        // pairwise: survivors whose only path to each other ran
        // THROUGH dead nodes (a dead hub, or a chain of deads in one
        // batch) are unreachable by any walk of the masked graph, so
        // group the dead into connected components (over dead–dead
        // edges — O(batch-neighborhood), never the corpus) and let
        // every component's fringe members seed each other. Capped
        // per component (hash order, deterministic): a hub with a
        // 10^5-node fringe must not explode into 10^10 seed pairs —
        // beyond the cap the entry medoids carry reachability.
        val deadPartners = deadRows.select(col("id"),
            explode(concat(transform(col("fwd"), f => f("nbr")),
              col("rev"))).as("p"))
        val deadDead = deadPartners
          .join(broadcast(dead.select(col("id").as("p"))), Seq("p"))
          .select(col("id").as("a_id"), col("p").as("b_id"))
        val comps = Dedup.connectedComponents(dead, "id", deadDead)
        val fringe = deadPartners
          .join(broadcast(dead.select(col("id").as("p"))), Seq("p"),
            "left_anti")
          .join(comps, Seq("id"))
          .select(col("comp"), col("p").as("id")).distinct()
        val fringeCapped = fringe
          .withColumn("fr", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("comp")
              .orderBy(xxhash64(col("id")), col("id"))))
          .filter(col("fr") <= 128).drop("fr")
        val fringeSeeds = fringeCapped
          .join(fringe.select(col("comp"), col("id").as("qid")),
            Seq("comp"))
          .select(col("qid"), col("id"))
          // a self-pair is no seed (searchCore masks it) — dropping it
          // HERE keeps the orphan detection below honest: a fringe
          // whose only member is the query itself must fall through to
          // the medoid seeds
          .filter(col("qid") =!= col("id"))
          .join(affectedIds.select(col("id").as("qid")), Seq("qid"),
            "left_semi")
        val survivingSeeds = affPairs
          .join(broadcast(dead.select(col("id").as("nbr"))), Seq("nbr"),
            "left_anti")
          .select(col("id").as("qid"), col("nbr").as("id"))
        val orphanQids = qs.select(col("qid"))
          .join(survivingSeeds.select(col("qid")), Seq("qid"), "left_anti")
          .join(fringeSeeds.select(col("qid")), Seq("qid"), "left_anti")
        val seeds = survivingSeeds
          .unionAll(orphanQids.crossJoin(broadcast(live)))
          .unionAll(fringeSeeds)
        val maskDead: DataFrame => DataFrame = df =>
          rowMask(df).join(broadcast(dead), Seq("id"), "left_anti")
        // repair beams start AT the node's surviving neighborhood (its
        // own list + the dead region's fringe) — a wide exploratory ef
        // mostly churns beam slots k+1.. with marginal candidates the
        // batch hop loop then pays a full union-frontier hop each to
        // admit (the 1M probe ran to the 30-hop cap at ef = 4k, ~90%
        // of the repair wall). k + 8 slack absorbs the replacement
        // candidates; long-run recall decay under sustained churn is
        // the churn-policy rebuild's job, not the per-delete repair's
        val effEf = if (ef > 0) ef
          else math.max(16, meta.k + 8)
        val out = searchCore(spark, root, meta, qs, seeds, meta.k, effEf,
          maxHops, maskDead, excludeSelf = true, forceExact = true)._1
          .select(col("qid").as("id"), col("id").as("nbr"),
            col("distance"), col("rank"))
          .localCheckpoint(true)
        GraftShim.unpersistLocalCheckpoint(qs)
        out
      }
    applyListChanges(spark, root, meta, repaired, priorPairs,
      newRows = null, removedIds = Some(dead))
    // staleness: only rows the layout actually held count as churn
    bumpChurn(spark, root, deadRows.count())
    // entry hygiene: drop dead medoids; re-pick when coverage thinned.
    // The dead set stays distributed (a retention sweep can carry 10^8
    // ids) — only the nEntries-sized survivor list is collected.
    val liveEntries = idsToDF(spark, readEntries(spark, root, meta))
      .join(dead, Seq("id"), "left_anti")
      .collect().map(_.getLong(0)).toSeq
    if (liveEntries.size < math.max(1, meta.nEntries / 2)) {
      val pts = spark.read.parquet(nodesPath(root, meta))
        .select(col("id"), col("vec"))
      val n = pts.count()
      if (n > 0)
        writeEntries(spark, root, meta,
          pickMedoids(pts, meta.nEntries, n, meta.metric))
    } else writeEntries(spark, root, meta, liveEntries)
    for (df <- Seq(dead, deadRows, affectedIds, affRows, priorPairs,
        repaired))
      GraftShim.unpersistLocalCheckpoint(df)
  }

  /** The shared touched-buckets rewrite. `newG` holds the NEW lists
    * (id, nbr, distance[, rank]) for every node whose list may have
    * changed; `prior` the old (id, nbr) pairs of the same scope (full
    * graph on append, affected ∪ dead lists on delete). Only buckets
    * owning a changed row are rewritten (dynamic partition overwrite,
    * one id-sorted file per rewritten bucket); buckets left EMPTY by
    * removals are dropped explicitly (dynamic overwrite cannot write
    * an empty partition).
    */
  private def applyListChanges(spark: SparkSession, root: String,
      meta: Meta, newG: DataFrame, prior: DataFrame, newRows: DataFrame,
      removedIds: Option[DataFrame]): Unit = {
    val np = newG.select(col("id"), col("nbr"))
    val pp = prior.select(col("id"), col("nbr"))
    val added = np.except(pp).localCheckpoint(true)   // x now lists y
    val removed = pp.except(np).localCheckpoint(true) // x dropped y
    val changedIds = added.select(col("id"))
      .unionAll(removed.select(col("id"))).distinct()
    val partnerIds = added.select(col("nbr").as("id"))
      .unionAll(removed.select(col("nbr").as("id"))).distinct()
    val extraIds = Seq(
      Option(newRows).map(_.select(col("id"))),
      removedIds.map(_.select(col("id")))).flatten
    val touchedIds = extraIds
      .foldLeft(changedIds.unionAll(partnerIds))(_ unionAll _)
      .distinct().localCheckpoint(true)
    if (touchedIds.isEmpty) {
      for (df <- Seq(added, removed, touchedIds))
        GraftShim.unpersistLocalCheckpoint(df)
      return
    }
    val buckets = touchedIds
      .select(bucketOf(col("id"), meta.nBuckets).as("b"))
      .distinct().collect().map(_.getLong(0))
    val cb = if (meta.pqM > 0)
      Some(Pq.readCodebook(spark, pqPath(root, meta))) else None
    val rot = if (meta.pqM > 0 && meta.opq)
      Some(Opq.readRotation(spark, opqPath(root, meta))) else None
    val dataCols = Seq(col("id"), col("vec"), col("gen"), col("fwd"),
      col("rev")) ++ cb.map(_ => col("codes"))
    val oldRows = bucketRows(spark, root, meta, buckets).select(dataCols: _*)
    val base = Option(newRows) match {
      case Some(nr) =>
        val plain = nr.select(col("id"), col("vec"), col("gen"))
          .withColumn("fwd", array().cast(FwdType))
          .withColumn("rev", array().cast("array<bigint>"))
        // appended rows get their codes from the PERSISTED codebook
        // (and rotation) — the recipe replay, same as the descent
        // hyperparameters
        oldRows.unionByName(
          cb.fold(plain)(c => encodeCodes(plain, c, rot)))
      case None => oldRows
    }
    val newFwd = newG
      .join(changedIds, Seq("id"), "left_semi")
      .groupBy(col("id")).agg(
        transform(
          array_sort(collect_list(struct(col("distance"), col("nbr")))),
          t => struct(t("nbr").as("nbr"),
            t("distance").cast("float").as("dist"))).as("nf"))
    val revAdd = added.select(col("nbr").as("id"), col("id").as("src"))
      .groupBy(col("id")).agg(collect_set(col("src")).as("adds"))
    val revDel = removed.select(col("nbr").as("id"), col("id").as("src"))
      .groupBy(col("id")).agg(collect_set(col("src")).as("dels"))
    val masked = removedIds match {
      case Some(r) => base.join(broadcast(r), Seq("id"), "left_anti")
      case None => base
    }
    val updated = masked
      .join(newFwd, Seq("id"), "left")
      .join(revAdd, Seq("id"), "left")
      .join(revDel, Seq("id"), "left")
      .select(Seq(col("id"), col("vec"), col("gen"),
        coalesce(col("nf"), col("fwd")).as("fwd"),
        array_sort(array_union(
          array_except(col("rev"),
            coalesce(col("dels"), array().cast("array<bigint>"))),
          coalesce(col("adds"), array().cast("array<bigint>")))).as("rev"))
        ++ cb.map(_ => col("codes"))
        :+ bucketOf(col("id"), meta.nBuckets).as("bucket"): _*)
      .localCheckpoint(true)
    val written = updated.select(col("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    // keep the one-id-sorted-file-per-bucket invariant through
    // rewrites: a touched bucket's file count must not grow with the
    // number of shuffle tasks that happened to hold its rows
    updated.repartition(meta.nBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(nodesPath(root, meta))
    // removals can empty a bucket; dynamic overwrite leaves its old
    // files behind, so drop those partitions here
    val f = fs(spark, root)
    buckets.filterNot(written).foreach { bkt =>
      val dir = new Path(nodesPath(root, meta), s"bucket=$bkt")
      if (f.exists(dir) && !f.delete(dir, true))
        throw new java.io.IOException(s"could not drop emptied $dir")
    }
    for (df <- Seq(added, removed, touchedIds, updated))
      GraftShim.unpersistLocalCheckpoint(df)
  }
}
