package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

import graft.functions.{hamming64, minhash_signature, simhash64}

/** Deduplication operators for training-data pipelines, from exact to
  * fuzzy. All are shuffle-on-key designs: candidate generation buckets
  * rows by a short key (hash / band / simhash prefix) so the expensive
  * pairwise verification only runs inside buckets — the standard shape
  * that survives 100 TB (no global O(n²)).
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content hash with the
    * surviving (minimum) id and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Rows surviving exact dedup (minimum id per content hash). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(
      exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol)),
      Seq(idCol), "left_semi")

  /** Soft dedup: KEEP every row but downweight duplicates —
    * `weight` = n_copies^(−alpha), so a document with 100 exact copies
    * contributes total mass 100^(1−alpha) instead of 100 (alpha = 1,
    * the default, normalizes every duplicate group to unit mass — the
    * SoftDeDup training-objective reweighting; hard dedup is the
    * degenerate "drop all but one"). The scale shape is
    * [[exactGroups]] + one broadcast-free equi-join back on the hash —
    * no row is shuffled beyond its group key.
    *
    * alpha restricted to {1, 0.5, 0.25}: those weights are
    * 1/n, 1/√n, 1/√√n — division and sqrt are IEEE-correctly-rounded
    * everywhere, so gates can hash the weight exactly (a pow() would
    * reintroduce the transcendental-gate problem).
    */
  def softDedupWeights(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    val n = col("n_copies").cast("double")
    val w = alpha match {
      case 1.0 => lit(1.0) / n
      case 0.5 => lit(1.0) / sqrt(n)
      case 0.25 => lit(1.0) / sqrt(sqrt(n))
      case other => throw new IllegalArgumentException(
        s"alpha must be 1, 0.5 or 0.25 (sqrt-exact weights), got $other")
    }
    df.withColumn("content_hash", md5(col(textCol)))
      .join(exactGroups(df, idCol, textCol)
        .select(col("content_hash"), col("n_copies")), Seq("content_hash"))
      .withColumn("weight", w)
  }

  /** The DISTINCT content-hash frame of a standing corpus — the thing
    * an incremental-dedup deployment PERSISTS between ingests (16
    * bytes per distinct document) so each batch pays batch-sized cost:
    * write it out once, append each surviving batch's hashes, and feed
    * it to [[incrementalExactDedup]] instead of re-hashing corpus text
    * on every ingest.
    */
  def corpusContentHashes(corpus: DataFrame, textCol: String): DataFrame =
    corpus.select(md5(col(textCol)).as("content_hash")).distinct()

  /** Incremental exact dedup: the rows of `batch` that survive against
    * an already-ingested corpus represented by its
    * [[corpusContentHashes]] frame — the production shape where the
    * standing corpus was deduped once and each new crawl batch only
    * resolves (a) its in-batch duplicates (keep-min, like
    * [[exactDedup]]) and (b) collisions with corpus content via an
    * anti-join on the 16-byte hashes. With the hash frame persisted
    * across ingests, per-batch cost is batch-sized; corpus text is
    * never re-read and corpus×corpus work is never repeated.
    */
  def incrementalExactDedupByHashes(
      corpusHashes: DataFrame, batch: DataFrame, idCol: String, textCol: String): DataFrame =
    exactDedup(batch, idCol, textCol)
      .withColumn("content_hash", md5(col(textCol)))
      .join(corpusHashes, Seq("content_hash"), "left_anti")
      .drop("content_hash")

  /** Convenience form that derives the hash frame from raw corpus text
    * — one corpus scan per call; prefer
    * [[incrementalExactDedupByHashes]] with a persisted hash frame for
    * repeated ingests.
    */
  def incrementalExactDedup(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String): DataFrame =
    incrementalExactDedupByHashes(
      corpusContentHashes(corpus, textCol), batch, idCol, textCol)

  /** Normalized-exact dedup key: casefolded, whitespace-collapsed,
    * trimmed — catches re-encodings of the same content that byte-exact
    * hashing misses, still one map-side-combined groupBy. The standard
    * first fuzzy rung before MinHash.
    */
  def normalizedContentHash(textCol: Column): Column =
    md5(trim(regexp_replace(lower(textCol), "\\s+", " ")))

  /** [[normalizedContentHash]] with Unicode NFC applied FIRST — a
    * corpus that mixes encodings ("é" as e+COMBINING ACUTE vs
    * precomposed U+00E9) hashes re-encodings identically. NFC is the
    * right first rung: byte-cheap on ASCII (single-scan fast path in
    * the kernel), and every later step (casefold, whitespace collapse,
    * md5) operates on canonical code points.
    */
  def unicodeNormalizedContentHash(textCol: Column): Column =
    normalizedContentHash(graft.functions.nfc_normalize(textCol))

  /** [[exactGroups]] over the normalized key. */
  def normalizedGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(normalizedContentHash(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Quality-aware canonical selection: within each normalized-dup
    * group keep the row with the HIGHEST score (ties → lowest id)
    * instead of [[normalizedGroups]]'s lowest-id rule — the curation
    * policy when re-encodings differ in completeness (boilerplate
    * stripped vs not, truncated vs full) and "first crawled" is the
    * wrong winner. One max_by aggregation: map-side partial combine,
    * no window, no second scan — the same shuffle shape as
    * [[exactGroups]] at any corpus size.
    */
  def keepBestNormalized(
      df: DataFrame, idCol: String, textCol: String, scoreCol: String): DataFrame =
    df.groupBy(normalizedContentHash(col(textCol)).as("content_hash"))
      .agg(
        max_by(
          col(idCol),
          struct(col(scoreCol), -col(idCol))).as("keep_id"),
        max(col(scoreCol)).as("best_score"),
        count(lit(1)).as("n_copies"))

  /** Shared verification step: score candidate pairs carrying
    * `a_toks`/`b_toks` set columns with exact Jaccard and filter.
    */
  private def verifiedJaccard(pairs: DataFrame, threshold: Double): DataFrame =
    pairs
      .withColumn("n_common", size(array_intersect(col("a_toks"), col("b_toks"))))
      .withColumn(
        "jaccard",
        col("n_common").cast("double") /
          (size(col("a_toks")) + size(col("b_toks")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))

  /** All pairs (a < b) with distinct-token Jaccard ≥ threshold.
    * O(n²) verification — use [[minHashLshPairs]] at scale; this exact
    * variant doubles as its verification oracle.
    */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String, threshold: Double): DataFrame = {
    // materialize token sets behind an exchange so the O(n²) join stage
    // consumes pre-computed arrays (also ~5× faster cold: the pair stage
    // JITs as a small method instead of one giant fused region)
    val withTok = df.select(
      col(idCol).cast("long").as("id"),
      TextAnalysis.tokenSet(col(textCol)).as("toks"))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
    val a = withTok.select(col("id").as("a_id"), col("toks").as("a_toks"))
    val b = withTok.select(col("id").as("b_id"), col("toks").as("b_toks"))
    verifiedJaccard(a.join(b, col("a_id") < col("b_id")), threshold)
  }

  /** MinHash + LSH near-duplicate pairs: signature → bands → bucket join
    * → exact Jaccard verification inside buckets, with bounded
    * per-bucket work.
    *
    * Candidate generation is a self-join on (band index, band hash) —
    * a hash-partitioned equi-join, no cross join anywhere. `numHashes`
    * must be divisible by `bands`; rows per band r = numHashes/bands
    * gives the standard S-curve threshold ≈ (1/bands)^(1/r).
    *
    * `giantBucketThreshold` is the skew backstop: a bucket of size m
    * normally contributes O(m²) candidate pairs through the self-join,
    * and ONE mega-bucket (a near-identical template cluster — common in
    * scraped corpora) turns into a single task grinding hundreds of
    * millions of rows. Buckets above the threshold instead emit
    * hub-star candidates — every member paired with the bucket's
    * minimum id, O(m) rows, no join — which still merge the cluster in
    * the downstream connected components once verified. Precision
    * stays 1.0 (every candidate is exact-verified); the trade is
    * recall for a member that fails verification against the hub but
    * would have matched a different member — at the similarity levels
    * that produce giant buckets (near-identical text agreeing on a
    * whole band of minhashes) that loss is marginal, and the work
    * bound it buys is what survives a pathological corpus.
    */
  /** Slim (id, toks) projection every pair stage starts from. */
  private def tokFrame(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      TextAnalysis.tokenSet(col(textCol)).as("toks"))

  /** LSH band keys from a (id, toks) frame: one (id, band, band_hash)
    * row per band — the slim join-key relation of [[minHashLshPairs]].
    */
  private def bandedFromToks(
      withTok: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    // the signature is computed in its OWN projection and referenced
    // once per band below: inside a single `transform` lambda it was
    // loop-invariant but re-evaluated per band (higher-order-function
    // lambdas are not hoisted — the whole minhash ran `bands` times
    // per row). A non-cheap alias referenced `bands` times survives
    // CollapseProject, so the signature is computed exactly once.
    val sig = withTok.select(
      col("id"), minhash_signature(col("toks"), numHashes).as("sig"))
    val bandCols = array((0 until bands).map(b =>
      hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand), lit(b))): _*)
    sig.select(col("id"), posexplode(bandCols).as(Seq("band", "band_hash")))
  }

  /** Candidate pairs (a_id < b_id, NOT deduped) from a banded frame's
    * (band, band_hash) self-join — the bucket-join core both the
    * production and portable LSH variants run.
    */
  private def selfJoinCandidates(banded: DataFrame): DataFrame = {
    val a = banded.select(col("band"), col("band_hash"), col("id").as("a_id"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("b_id"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
  }

  /** Shared tail of the LSH variants: re-join token sets for surviving
    * candidates only, exact-Jaccard verify, materialize the result,
    * then release the banded checkpoint (the RETURNED frame's
    * checkpoint storage belongs to the caller —
    * `GraftShim.unpersistLocalCheckpoint` once consumed).
    */
  private def verifyAndRelease(candidates: DataFrame, withTok: DataFrame,
      banded: DataFrame, verifyThreshold: Double): DataFrame = {
    val verified = verifiedJaccard(
      candidates
        .join(withTok.select(col("id").as("a_id"), col("toks").as("a_toks")), Seq("a_id"))
        .join(withTok.select(col("id").as("b_id"), col("toks").as("b_toks")), Seq("b_id")),
      verifyThreshold)
    val result = verified.localCheckpoint(eager = true)
    GraftShim.unpersistLocalCheckpoint(banded)
    result
  }

  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8, verifyThreshold: Double = 0.5,
      giantBucketThreshold: Int = 4096): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(giantBucketThreshold >= 2, "giantBucketThreshold must be >= 2")
    val withTok = tokFrame(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // band keys only — the candidate self-join shuffles slim
      // (id, band, band_hash) rows, NOT the token arrays (which would
      // multiply corpus token data by `bands` through the exchange).
      // Materialized once (eager checkpoint): four downstream plan
      // references (giant-key agg, anti-join, self-join sides, hub
      // join) would otherwise each recompute the minhash signatures —
      // broadcast joins leave no exchange for subplan reuse to share.
      val banded = bandedFromToks(withTok, numHashes, bands)
        .localCheckpoint(true)
      // giant-bucket keys + hub (min id): one slim agg, then ONLY the
      // oversized buckets survive the filter — provably ≤ n·bands /
      // threshold rows, so they broadcast. The common path is then a
      // broadcast anti-join (no wide sizes-to-banded shuffle, and the
      // banded set is consumed without a triple-referenced join plan).
      val giantKeys = banded.groupBy("band", "band_hash")
        .agg(count(lit(1)).as("_bsz"), min(col("id")).as("_hub"))
        .filter(col("_bsz") > giantBucketThreshold)
        .select(col("band"), col("band_hash"), col("_hub"))
      val small = banded.join(
        broadcast(giantKeys.select("band", "band_hash")),
        Seq("band", "band_hash"), "left_anti")
      val hubPairs = banded.join(broadcast(giantKeys), Seq("band", "band_hash"))
        .filter(col("id") =!= col("_hub")) // hub = bucket min, so a_id < b_id holds
        .select(col("_hub").as("a_id"), col("id").as("b_id"))
      val candidates = selfJoinCandidates(small).union(hubPairs)
        .dropDuplicates("a_id", "b_id") // candidates may collide in >1 band
      verifyAndRelease(candidates, withTok, banded, verifyThreshold)
    } finally withTok.unpersist()
  }

  /** [[minHashLshPairs]] with a PORTABLE hash family: every hash is
    * `md5(seed || token)` and minhashes/band keys compare as hex
    * STRINGS (lexicographic min over fixed-width lowercase hex ≡
    * numeric min of the 128-bit value) — signatures, banding, the
    * candidate self-join, and the exact-Jaccard verification are all
    * reproducible verbatim in any engine with md5, no custom kernels
    * anywhere. This is what lets the dd_minhash_lsh gate hash-match a
    * full DuckDB REPLAY of the pipeline (the vq_randproj
    * derived-literal pattern, applied to the whole LSH stack).
    *
    * The production path stays [[minHashLshPairs]]: one fused codegen
    * pass per token against `numHashes` md5 evaluations here, plus the
    * giant-bucket backstop this plain variant omits. Same S-curve
    * semantics, different (equally valid) hash family — the two
    * produce the same VERIFIED pair set whenever recall holds, but
    * candidate sets differ, so treat this as the cross-engine witness,
    * not a drop-in.
    */
  def minHashLshPairsPortable(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8,
      verifyThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    val withTok = tokFrame(df, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sig = (0 until numHashes).map { i =>
        array_min(transform(col("toks"), t => md5(concat(lit(s"mh$i|"), t))))
      }
      val banded = withTok.select(
        col("id"),
        posexplode(array((0 until bands).map { b =>
          concat_ws("-", sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand): _*)
        }: _*)).as(Seq("band", "band_hash")))
        .localCheckpoint(true)
      val candidates = selfJoinCandidates(banded).dropDuplicates("a_id", "b_id")
      verifyAndRelease(candidates, withTok, banded, verifyThreshold)
    } finally withTok.unpersist()
  }

  /** Near-dup pairs over ANY 64-bit sketch column (SimHash, image
    * dHash/pHash, sign sketches): quarter-block LSH — two hashes within
    * Hamming distance `maxHamming ≤ 3` agree on at least one of their
    * four 16-bit blocks (pigeonhole), so candidates come from an
    * equi-join on (block index, block value) and only candidates pay
    * the exact XOR-popcount verify. Emits `(a_id, b_id, hamming)` with
    * `a_id < b_id`.
    *
    * This is the image-dedup pairing path: hash payloads with
    * [[graft.functions.image_dhash64]] (or `image_phash64`) in the scan
    * projection, pair here, then feed [[connectedComponents]] exactly
    * like the text LSH pipeline — no all-pairs stage anywhere.
    */
  /** @param giantBucketThreshold same skew backstop as
    *   [[minHashLshPairs]]: a (block, value) bucket of size m emits
    *   O(m²) pairs through the self-join, and 16-bit sketch blocks
    *   have LOW entropy on templated media (every smooth image's top
    *   rows produce the same block) — the measured pathology was a
    *   100k-image corpus with one shared gradient family grinding
    *   ~1.6×10⁸ pairs. Oversized buckets emit hub-star candidates
    *   (each member vs the bucket's min id, O(m)) — clusters still
    *   merge in connected components; only hub-fails-but-member-
    *   matches recall is traded, marginal at the similarity levels
    *   that produce giant buckets.
    */
  def hash64NearDupPairs(
      df: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int = 3, giantBucketThreshold: Int = 4096): DataFrame = {
    require(maxHamming <= 3, "quarter-block LSH guarantees recall only for maxHamming <= 3")
    require(giantBucketThreshold >= 2, "giantBucketThreshold must be >= 2")
    val withBlocks = df.select(
      col(idCol).as("id") +: col(hashCol).as("h") +:
        (0 until 4).map(b =>
          shiftrightunsigned(col(hashCol), b * 16).bitwiseAND(lit(0xffffL))
            .cast("int").as(s"b$b")): _*)
      .localCheckpoint(true)
    try {
      val blocked = withBlocks.select(
        col("id"), col("h"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("block", "block_val")))
      val giantKeys = blocked.groupBy("block", "block_val")
        .agg(count(lit(1)).as("_bsz"), min(col("id")).as("_hub"),
          min_by(col("h"), col("id")).as("_hubh"))
        .filter(col("_bsz") > giantBucketThreshold)
        .select(col("block"), col("block_val"), col("_hub"), col("_hubh"))
      val small = blocked.join(
        broadcast(giantKeys.select("block", "block_val")),
        Seq("block", "block_val"), "left_anti")
      val hubPairs = blocked.join(broadcast(giantKeys), Seq("block", "block_val"))
        .filter(col("id") =!= col("_hub")) // hub = bucket min ⇒ a_id < b_id
        .select(col("_hub").as("a_id"), col("id").as("b_id"),
          col("_hubh").as("ha"), col("h").as("hb"))
      val a = small.select(col("block"), col("block_val"),
        col("id").as("a_id"), col("h").as("ha"))
      val b = small.select(col("block"), col("block_val"),
        col("id").as("b_id"), col("h").as("hb"))
      a.join(b, Seq("block", "block_val"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"), col("ha"), col("hb"))
        .union(hubPairs)
        .dropDuplicates("a_id", "b_id")
        .withColumn("hamming",
          bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
        .filter(col("hamming") <= maxHamming)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .localCheckpoint(true)
    } finally GraftShim.unpersistLocalCheckpoint(withBlocks)
  }

  /** [[simHashPairs]] with a PORTABLE hash family: each token's 64-bit
    * hash is the first 16 hex chars of `md5(token)`, a signature bit is
    * the strict majority vote over the doc's DISTINCT tokens, and the
    * signature is carried as four 16-bit blocks (ints — no sign games
    * at bit 63). Every step — nibble decode, majority, block packing,
    * XOR popcount — is reproducible verbatim in any engine with md5 and
    * bit_count, so the dd_simhash gate can hash-match a full DuckDB
    * replay (brute-force all-pairs there; quarter-block LSH + verify
    * here — identical output by the pigeonhole bound for maxHamming<=3,
    * the invariant dd_simhash_containment already gates for the
    * production [[simHashPairs]] family).
    *
    * The production path stays [[simHashPairs]] (one fused codegen
    * kernel per doc vs 64 majority filters here); this variant is the
    * cross-engine witness.
    */
  def simHashPairsPortable(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "quarter-block LSH guarantees recall only for maxHamming <= 3")
    // bit i of a token hash: nibble = hex char i/4 (md5 is lowercase
    // hex), bit = (nibble >> (i%4)) & 1. Signature bit i = 1 iff set on
    // a strict majority of tokens (sum of +-1 votes > 0). The 16
    // nibbles are decoded ONCE per token row; the 64 majority sums then
    // run on int columns (4x fewer string ops than a per-bit decode —
    // this is the gate's hot loop at corpus scale).
    def sigBit(i: Int): Column =
      shiftright(col(s"nib${i / 4}"), i % 4).bitwiseAND(lit(1))
    val hashed = tokFrame(df, idCol, textCol)
      .select(col("id"), explode(col("toks")).as("t"))
      .select(col("id"), substring(md5(col("t")), 1, 16).as("h"))
      .select(col("id") +: (0 until 16).map(k =>
        conv(substring(col("h"), k + 1, 1), 16, 10).cast("int").as(s"nib$k")): _*)
    val sig = hashed
      .groupBy("id")
      .agg(
        count(lit(1)).as("n"),
        (0 until 64).map(i => sum(sigBit(i)).as(s"c$i")): _*)
    val blocks = (0 until 4).map { b =>
      (0 until 16).map { j =>
        val i = b * 16 + j
        when(col(s"c$i") * 2 > col("n"), lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _).as(s"b$b")
    }
    val withBlocks = sig.select(col("id") +: blocks: _*)
      .localCheckpoint(true)
    try {
      val blocked = withBlocks.select(
        col("id"), col("b0"), col("b1"), col("b2"), col("b3"),
        posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
          .as(Seq("block", "block_val")))
      val a = blocked.select(col("block"), col("block_val"), col("id").as("a_id"),
        col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
      val b = blocked.select(col("block"), col("block_val"), col("id").as("b_id"),
        col("b0").as("c0"), col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
      val hammingExpr = (0 until 4)
        .map(q => bit_count(col(s"a$q").bitwiseXOR(col(s"c$q"))))
        .reduce(_ + _)
      a.join(b, Seq("block", "block_val"))
        .filter(col("a_id") < col("b_id"))
        .dropDuplicates("a_id", "b_id")
        .withColumn("hamming", hammingExpr.cast("long"))
        .filter(col("hamming") <= maxHamming)
        .select(col("a_id"), col("b_id"), col("hamming"))
        .localCheckpoint(true)
    } finally GraftShim.unpersistLocalCheckpoint(withBlocks)
  }

  /** The persisted-state half of incremental NEAR-dup detection: the
    * corpus's slim LSH band relation (id, band, band_hash) — ~`bands`
    * small rows per document, no text. Write it out once; each new
    * batch then joins against it via
    * [[incrementalNearDupPairsByBands]] without recomputing a single
    * corpus minhash (the expensive part — the corpus text is touched
    * again only for verification, and only on candidate rows). The
    * [[incrementalExactDedup]] / `corpusContentHashes` pattern, for
    * fuzzy matches.
    */
  def corpusBandSignatures(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    bandedFromToks(tokFrame(df, idCol, textCol), numHashes, bands)
  }

  /** Near-duplicate pairs between a new `batch` and a standing corpus,
    * using the corpus's PERSISTED band signatures: candidates are a
    * hash-partitioned equi-join of batch bands against `corpusBands`
    * on (band, band_hash); each candidate is then exact-verified with
    * distinct-token Jaccard, reading corpus text ONLY for candidate
    * ids (semi-join first). Returns `(a_id [batch], b_id [corpus],
    * jaccard ≥ verifyThreshold)`. Ids must be disjoint across frames,
    * as in [[incrementalExactDedup]]. `numHashes`/`bands` must match
    * the values `corpusBands` was built with.
    *
    * Skew note: a template band-bucket costs |batch∩bucket| ×
    * |corpus∩bucket| candidate rows here — same hazard as the
    * self-join path. The verify stage bounds the damage (slim rows,
    * exact filter); if a corpus has known mega-templates, pre-split
    * them or dedup the corpus first.
    */
  def incrementalNearDupPairsByBands(
      corpusBands: DataFrame, corpus: DataFrame, batch: DataFrame,
      idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8,
      verifyThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val batchTok = tokFrame(batch, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val candidates = bandedFromToks(batchTok, numHashes, bands)
        .select(col("band"), col("band_hash"), col("id").as("a_id"))
        .join(corpusBands
          .select(col("band"), col("band_hash"), col("id").as("b_id")),
          Seq("band", "band_hash"))
        .select(col("a_id"), col("b_id"))
        .dropDuplicates("a_id", "b_id")
        .localCheckpoint(true)
      // corpus text only for candidate ids: semi-join BEFORE tokenizing
      val corpusToks = tokFrame(
        corpus.join(
          candidates.select(col("b_id").as(idCol)).distinct(),
          Seq(idCol), "left_semi"),
        idCol, textCol)
      val verified = verifiedJaccard(
        candidates
          .join(batchTok.select(col("id").as("a_id"), col("toks").as("a_toks")), Seq("a_id"))
          .join(corpusToks.select(col("id").as("b_id"), col("toks").as("b_toks")), Seq("b_id")),
        verifyThreshold)
      val result = verified.localCheckpoint(eager = true)
      GraftShim.unpersistLocalCheckpoint(candidates)
      result
    } finally batchTok.unpersist()
  }

  /** One-shot form of [[incrementalNearDupPairsByBands]], building the
    * corpus bands inline (use the ByBands variant with persisted bands
    * for repeated ingests).
    */
  def incrementalNearDupPairs(
      corpus: DataFrame, batch: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, bands: Int = 8,
      verifyThreshold: Double = 0.5): DataFrame =
    incrementalNearDupPairsByBands(
      corpusBandSignatures(corpus, idCol, textCol, numHashes, bands),
      corpus, batch, idCol, textCol, numHashes, bands, verifyThreshold)

  /** All cross-frame pairs with distinct-token Jaccard ≥ threshold —
    * O(|left|·|right|) verification oracle for the incremental LSH
    * path, exactly as [[jaccardPairs]] is for the self-join path.
    * Returns `(a_id [left], b_id [right], jaccard)`.
    */
  def jaccardPairsAcross(
      left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      threshold: Double): DataFrame = {
    val parts = left.sparkSession.sessionState.conf.numShufflePartitions
    val a = tokFrame(left, leftId, leftText)
      .select(col("id").as("a_id"), col("toks").as("a_toks"))
      .repartition(parts)
    val b = tokFrame(right, rightId, rightText)
      .select(col("id").as("b_id"), col("toks").as("b_toks"))
    verifiedJaccard(a.crossJoin(b), threshold)
  }

  /** Connected components over a near-duplicate pair list — the step
    * that turns pairwise matches into dedup groups (pairs alone cannot
    * say which docs form one cluster when matches chain a–b, b–c).
    *
    * Alternating large-star/small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14), DataFrame-only.
    * Each round rewires edges toward the component minimum:
    * large-star points every above-parent neighbor at the local min,
    * small-star contracts the below-parent neighborhood. The edge set
    * converges to stars centered at each component's minimum id in
    * O(log n) rounds — unlike min-label propagation's O(diameter),
    * which made chain-shaped graphs (and the per-round job overhead)
    * the slowest execution shape in the repo. Every shuffle carries
    * (long, long) edges only, never payload columns, and the iterative
    * frames are repartitioned to match their actual size (a handful of
    * partitions locally; `spark.sql.shuffle.partitions` once the edge
    * set is large) so tiny rounds are not 32-partition scheduling
    * storms. `maxIter` is a runaway bound; hitting it throws rather
    * than returning unconverged labels.
    *
    * Returns (id, comp) where comp = the cluster's minimum node id;
    * `nodes` rows absent from any pair keep themselves (singletons).
    */
  def connectedComponents(
      nodes: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(nodes, idCol, pairs, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus the number of star rounds executed —
    * exposed so tests can assert the O(log n) convergence bound.
    */
  private[graft] def connectedComponentsWithRounds(
      nodes: DataFrame, idCol: String,
      pairs: DataFrame, aCol: String = "a_id", bCol: String = "b_id",
      maxIter: Int = 50): (DataFrame, Int) = {
    val spark = nodes.sparkSession
    val disk = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val shuffleParts = spark.sessionState.conf.numShufflePartitions
    // iterative frames sized to the data: ~100k edges per partition,
    // capped at the session's shuffle parallelism
    def parts(n: Long): Int =
      math.max(1L, math.min(shuffleParts.toLong, n / 100000L + 1L)).toInt

    val nodeIds = nodes.select(col(idCol).cast("long").as("id")).distinct()
    // canonical undirected edges, larger endpoint first, restricted to
    // endpoints present in `nodes` (contract: components and labels are
    // over the node set — an edge mentioning a foreign id must neither
    // bridge two components nor donate its id as a label). Each round's
    // frame is localCheckpoint-ed (eager): the star operations reference
    // their input many times, so carrying raw lineage across rounds
    // grows the logical plan exponentially (explain/event strings alone
    // OOM'd the driver) — the checkpoint both caches the data and cuts
    // the plan back to a leaf.
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .join(nodeIds.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
      .join(nodeIds.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)
    var edgeCount = edges.count()
    // Terminal-state test, checked BEFORE each round: the edge set is a
    // disjoint union of min-rooted stars iff every member id `u` appears
    // exactly once AND no id is both a member and a root (u>v
    // orientation already forces root < members, and a component that IS
    // a star is necessarily rooted at its minimum). Large-star and
    // small-star both map stars to themselves, so this is exactly the
    // fixpoint — detecting it structurally saves the redundant
    // confirm-nothing-changed round a before/after set compare needs.
    def isStarFixpoint(): Boolean = {
      if (edgeCount == 0) return true
      // ONE aggregation job for both conditions (was an agg + a
      // semi-join isEmpty — two serial jobs per round): per-id member/
      // root flags from a two-branch union, then n (Σ member rows),
      // nu (ids appearing as a member), and the member∩root count
      val r = edges.select(col("u").as("id"), lit(1L).as("m"), lit(0L).as("r"))
        .unionAll(edges.select(col("v").as("id"), lit(0L).as("m"), lit(1L).as("r")))
        .groupBy("id").agg(sum(col("m")).as("mu"), sum(col("r")).as("rv"))
        .agg(sum(col("mu")).as("n"),
          count(when(col("mu") > 0, 1)).as("nu"),
          count(when(col("mu") > 0 && col("rv") > 0, 1)).as("both"))
        .head()
      r.getLong(0) == r.getLong(1) && r.getLong(2) == 0L
    }
    var converged = isStarFixpoint()
    var rounds = 0
    while (!converged) {
      if (rounds >= maxIter) {
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds")
      }
      val p = parts(edgeCount)
      // large-star: for each node u (seen from both endpoints), let
      // m = min(neighbors(u) ∪ {u}); every neighbor v > u re-attaches
      // to m. Output keeps the first-endpoint-larger orientation
      // (v > u >= m).
      val bidir = edges
        .union(edges.select(col("v").as("u"), col("u").as("v")))
        .repartition(p, col("u"))
        .persist(disk)
      val lsMin = bidir.groupBy("u").agg(min(col("v")).as("mv"))
      val ls = bidir.join(lsMin, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), least(col("mv"), col("u")).as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
      // small-star: group by the larger endpoint u (all its listed
      // neighbors are smaller); m = min neighborhood; every neighbor
      // except m, plus u itself, attaches to m.
      val ssNbr = ls.repartition(p, col("u")).persist(disk)
      val ssMin = ssNbr.groupBy("u").agg(min(col("v")).as("m"))
      val next = ssNbr.join(ssMin, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(true)
      val nextCount = next.count()
      bidir.unpersist(); ssNbr.unpersist()
      // the previous round's checkpoint blocks have no remaining
      // consumer (`next` is already materialized) — release them now
      // rather than waiting for GC
      GraftShim.unpersistLocalCheckpoint(edges)
      edges = next
      edgeCount = nextCount
      rounds += 1
      converged = isStarFixpoint()
    }
    // at the fixpoint every component is a star: edges = (member, root)
    // for each non-root member, root = component minimum
    val labels = nodeIds
      .join(edges.select(col("u").as("id"), col("v").as("comp")), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
    // the eager checkpoint makes the result self-contained, after which
    // the final edge frame's blocks can go too
    val result = labels.localCheckpoint(true)
    GraftShim.unpersistLocalCheckpoint(edges)
    (result, rounds)
  }

  /** Near-duplicate dedup end to end: exact-Jaccard pairs → connected
    * components → keep the minimum id per cluster. The grouping, not
    * just the pairing, is what a dedup pipeline actually applies.
    */
  def nearDupClusters(
      df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, threshold)
    connectedComponents(df, idCol, pairs)
  }

  /** Benchmark decontamination: for each (corpus doc, benchmark doc)
    * pair, the count and fraction of the benchmark's distinct word
    * n-gram shingles that the corpus doc contains — the standard
    * n-gram-overlap test for evaluation-set leakage in training data.
    * Returns rows `(corpus_id, bench_id, n_overlap, frac)` with
    * `frac ≥ minOverlapFraction`.
    *
    * Shape: shingle-explode both sides, hash-partitioned equi-join on
    * the shingle key, count per pair — no cross join; the shuffle
    * carries (id, shingle-key) rows only. With `hashKeys = true`
    * (default) the join key is a 64-bit fingerprint instead of the
    * shingle string, shrinking shuffle bytes several-fold at a
    * collision risk of ~n²/2⁶⁴ (gate parity uses string keys, and
    * DedupSpec asserts both keyings agree on the fixture).
    */
  def ngramContamination(
      corpus: DataFrame, corpusId: String, corpusText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 3, minOverlapFraction: Double = 0.5,
      hashKeys: Boolean = true): DataFrame = {
    def shingled(df: DataFrame, idCol: String, textCol: String, outId: String) = {
      val base = df.select(
        col(idCol).cast("long").as(outId),
        array_distinct(TextAnalysis.wordShingles(col(textCol), n)).as("shs"))
        // materialize the shingle arrays behind an exchange before
        // exploding (same pattern as jaccardPairs): the downstream
        // join/agg stages then consume pre-built arrays instead of
        // re-deriving them through the collapsed projection
        .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      val key =
        if (hashKeys) graft.functions.fingerprint64(col("sh"))
        else col("sh")
      base.select(col(outId), size(col("shs")).as(s"${outId}_size"),
          explode(col("shs")).as("sh"))
        .select(col(outId), col(s"${outId}_size"), key.as("shk"))
    }
    val c = shingled(corpus, corpusId, corpusText, "corpus_id")
      .select(col("corpus_id"), col("shk"))
    val b = shingled(bench, benchId, benchText, "bench_id")
    c.join(b, Seq("shk"))
      .groupBy(col("corpus_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_overlap"),
        first(col("bench_id_size")).as("_bsize"))
      .withColumn("frac",
        graft.functions.hround(col("n_overlap").cast("double") / col("_bsize"), 4))
      .filter(col("frac") >= minOverlapFraction)
      .select(col("corpus_id"), col("bench_id"), col("n_overlap"), col("frac"))
  }

  /** Per-document n-gram novelty against a reference corpus — the
    * graded companion to [[ngramContamination]]'s hard flag: what
    * fraction of a document's distinct word n-grams does the
    * reference NOT already contain? Low novelty ⇒ the doc is mostly
    * re-hashed reference content (scraped mirrors, quote farms);
    * high novelty ⇒ genuinely new text worth keeping.
    *
    * Shape: both sides explode to distinct n-grams (64-bit
    * fingerprint keys by default, so the anti-join shuffles 8-byte
    * longs, not strings), the reference side collapses to its n-gram
    * vocabulary, one LEFT ANTI join + two doc-keyed aggregates.
    * Output is representation-independent (counts), so a SQL oracle
    * replays it with plain string n-grams.
    *
    * Documents with fewer than `n` tokens have no n-grams and are
    * absent from the output. Returns (id, n_ngrams, n_novel, novelty).
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
      ref: DataFrame, refTextCol: String, n: Int = 3,
      hashKeys: Boolean = true): DataFrame = {
    val key = (c: Column) =>
      if (hashKeys) graft.functions.fingerprint64(c) else c
    val docNg = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        explode(array_distinct(TextAnalysis.wordShingles(col(textCol), n))).as("_ng"))
      .select(col(idCol), key(col("_ng")).as("_ngk"))
    val refNg = ref.filter(col(refTextCol).isNotNull)
      .select(explode(array_distinct(TextAnalysis.wordShingles(col(refTextCol), n))).as("_ng"))
      .select(key(col("_ng")).as("_ngk")).distinct()
    val totals = docNg.groupBy(col(idCol)).agg(count(lit(1)).as("n_ngrams"))
    val novel = docNg.join(refNg, Seq("_ngk"), "left_anti")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_novel"))
    totals.join(novel, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_ngrams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_ngrams").cast("double"))
  }

  /** Duplicated token-span detection (the substring-dedup signal of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"): every `windowTokens`-token sliding window whose exact
    * token sequence occurs more than once ANYWHERE in the corpus
    * (another document or a repeat within the same one). Returns one
    * row per duplicated window occurrence:
    * `(doc_id, pos, n_occ)` — pos is the 0-based token offset, n_occ
    * the corpus-wide occurrence count of that window's content.
    *
    * Scale shape: shingle rows shuffle once for the count aggregate and
    * once for the count join — both hash-partitioned equi-ops on the
    * window key, no cross join. With `hashKeys = true` the shuffled key
    * is a 64-bit fingerprint instead of the W-token string (several-fold
    * fewer shuffle bytes; collisions ~n²/2^64 — flag, don't delete, on
    * that basis). Window arrays materialize behind a repartition so the
    * explode consumes pre-built arrays (HOF-embedding hazard).
    */
  def duplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 8, hashKeys: Boolean = true): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    val base = df.select(
      col(idCol).cast("long").as("doc_id"),
      TextAnalysis.wordShingles(col(textCol), windowTokens).as("shs"))
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
      .select(col("doc_id"), posexplode(col("shs")).as(Seq("pos", "sh")))
    val keyed = base.select(col("doc_id"), col("pos"),
      (if (hashKeys) graft.functions.fingerprint64(col("sh")) else md5(col("sh"))).as("shk"))
    val dupCounts = keyed.groupBy("shk").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= 2)
    keyed.join(dupCounts, Seq("shk"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("n_occ"))
  }

  /** Per-document roll-up of [[duplicatedSpans]]:
    * `(doc_id, n_spans, dup_spans, dup_frac)` — the filter signal
    * pipelines threshold on (docs made mostly of boilerplate windows).
    * Documents too short to have a window (or with NULL text) keep a
    * row with zero counts, so the output covers every input id.
    */
  def duplicatedSpanStats(
      df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 8, hashKeys: Boolean = true): DataFrame = {
    val spans = duplicatedSpans(df, idCol, textCol, windowTokens, hashKeys)
      .groupBy("doc_id").agg(count(lit(1)).as("dup_spans"))
    val totals = df.select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(size(TextAnalysis.wordShingles(col(textCol), windowTokens)), lit(0))
        .cast("long").as("n_spans"))
    totals.join(spans, Seq("doc_id"), "left_outer")
      .select(
        col("doc_id"),
        col("n_spans"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        when(col("n_spans") === 0, lit(0.0))
          .otherwise(graft.functions.hround(coalesce(col("dup_spans"), lit(0L))
            .cast("double") / col("n_spans"), 4)).as("dup_frac"))
  }

  /** SimHash near-duplicate pairs: 64-bit signatures compared within
    * buckets keyed by 16-bit signature quarters (any pair within Hamming
    * distance ≤ 3 of the full hash shares at least one identical quarter
    * — pigeonhole over 4 blocks).
    */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "quarter-block LSH guarantees recall only for maxHamming <= 3")
    val withSig = df.select(
      col(idCol).cast("long").as("id"),
      simhash64(TextAnalysis.tokens(col(textCol))).as("sig"))
    val blocked = withSig.select(
      col("id"), col("sig"),
      posexplode(array(
        (0 until 4).map(q =>
          shiftrightunsigned(col("sig"), q * 16).bitwiseAND(lit(0xffffL))): _*
      )).as(Seq("block", "block_val")))
    val a = blocked.select(col("block"), col("block_val"),
      col("id").as("a_id"), col("sig").as("a_sig"))
    val b = blocked.select(col("block"), col("block_val"),
      col("id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("block", "block_val"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", hamming64(col("a_sig"), col("b_sig")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** INTRA-document paragraph dedup: keep the first occurrence of each
    * normalized paragraph within a doc, drop later repeats, reassemble
    * in original order — the fix for template spam (a disclaimer or nav
    * fragment repeated through one page) that document-level dedup
    * can't touch and [[stripBoilerplate]]'s cross-doc df rule won't
    * catch when the repeat is doc-local. Returns (doc_id, cleaned,
    * n_paras, n_unique).
    *
    * Shape: posexplode (flat map) → TWO hash aggregations — first-
    * occurrence per (doc, para_key) via min/min_by, then the per-doc
    * rebuild with an order-pinning sort_array. No window, no join; both
    * shuffles key on doc id so a 100 TB corpus moves each paragraph
    * twice at most.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String,
      textCol: String, sep: String = "\n"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "para")))
      .groupBy(col("doc_id"), TextAnalysis.lineKey(col("para")).as("pk"))
      .agg(min(col("pos")).as("pos"),
        min_by(col("para"), col("pos")).as("para"),
        count(lit(1)).as("copies"))
      .groupBy("doc_id")
      .agg(
        concat_ws(sep,
          transform(sort_array(collect_list(struct(col("pos"), col("para")))),
            s => s.getField("para"))).as("cleaned"),
        sum(col("copies")).as("n_paras"),
        count(lit(1)).as("n_unique"))

  /** Snapshot diff between two corpus versions: per id, whether it was
    * `added`, `removed`, `changed` (content hash differs), or
    * `unchanged` — the release-to-release audit a managed training
    * corpus runs before retraining (what moved, and how much of it).
    *
    * Scale shape: each side reduces to a slim (id, md5) projection
    * before ONE full-outer equi-join on id — co-partitionable, no
    * wide rows through the exchange; status is a pure projection.
    * Presence flags (not hash nullability) decide added/removed, and
    * the hash compare is null-safe, so NULL text diffs correctly
    * (NULL → NULL is unchanged, NULL → text is changed).
    */
  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD 2003 — the MOSS algorithm): normalize to `[a-z0-9]`,
    * hash every `k`-char gram (60-bit md5 prefix, the cross-engine
    * hash family), then in every window of `w` consecutive gram
    * hashes select the minimum, rightmost on ties. The selected
    * (hash, position) set is the fingerprint — guaranteed to catch
    * any shared substring of length ≥ k + w − 1, at an expected
    * density of 2/(w+1) of the grams.
    *
    * Documents with fewer than `w` grams contribute one window (the
    * whole doc); documents shorter than `k` chars after normalization
    * contribute nothing. Pure projection + ONE doc-partitioned
    * window — each document's grams rank inside their own task.
    *
    * Returns distinct (id, fp_hash, fp_pos), 1-based positions over
    * the normalized text.
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 7, w: Int = 5): DataFrame = {
    require(k >= 1, s"gram size k must be >= 1, got $k")
    require(w >= 1, s"window size w must be >= 1, got $w")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos")).rowsBetween(0, w - 1)
    val norm = regexp_replace(lower(col(textCol)), "[^a-z0-9]", "")
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), norm.as("_norm"))
      .filter(length(col("_norm")) >= k)
      .withColumn("_n", (length(col("_norm")) - k + 1).cast("int"))
      .select(col(idCol), col("_n"),
        posexplode(transform(sequence(lit(1), col("_n")),
          i => col("_norm").substr(i, lit(k)))).as(Seq("_p0", "_gram")))
      .select(col(idCol), col("_n"), (col("_p0") + 1).as("pos"),
        conv(substring(md5(col("_gram")), 1, 15), 16, 10).cast("long").as("h"))
      // min(struct(h, -pos)) = smallest hash, rightmost position on tie
      .withColumn("_sel", min(struct(col("h"), (-col("pos")).as("np"))).over(win))
      // full windows only: starts 1 .. n-w+1 (short docs: the one
      // window at pos 1, which the frame clips to the doc)
      .filter(col("pos") <= greatest(col("_n") - w + 1, lit(1)))
      .select(col(idCol), col("_sel.h").as("fp_hash"),
        (-col("_sel.np")).as("fp_pos"))
      .distinct()
  }

  /** Near-dup / containment pairs from shared winnowing fingerprints:
    * docs sharing ≥ `minShared` distinct selected hashes. The
    * candidate join is an equi-join on fp_hash; hashes selected in
    * more than `maxDocsPerFp` documents are dropped first (they are
    * boilerplate by definition, and they are the quadratic hub risk —
    * the [[minHashLshPairs]] giant-bucket backstop, applied to
    * fingerprint postings).
    */
  def winnowingPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 7, w: Int = 5, minShared: Int = 2,
      maxDocsPerFp: Int = 100): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val fp = winnowingFingerprints(df, idCol, textCol, k, w)
      .select(col("fp_hash"), col(idCol)).distinct()
    val rare = fp.groupBy("fp_hash")
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDocsPerFp)
      .select("fp_hash")
    val kept = fp.join(rare, Seq("fp_hash"))
    kept.toDF("fp_hash", "id_a").join(kept.toDF("fp_hash", "id_b"), Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  def corpusDiff(oldDf: DataFrame, newDf: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def slim(df: DataFrame, h: String, p: String) = df.select(
      col(idCol).cast("long").as("id"),
      md5(col(textCol)).as(h), lit(true).as(p))
    slim(oldDf, "_oh", "_op").join(slim(newDf, "_nh", "_np"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("_op").isNull, "added")
          .when(col("_np").isNull, "removed")
          .when(col("_oh") <=> col("_nh"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Split-leakage audit: a near-duplicate pair that CROSSES a
    * train/eval boundary is label leakage — the eval split then
    * scores memorization of an effectively-seen document, and every
    * benchmark number downstream is inflated. Given per-id split
    * labels (e.g. [[graft.operators.Sampling.hashSplitLabeled]]) and
    * near-dup pairs (any of the pair generators here), counts pairs
    * per unordered label pair — the off-diagonal rows are the leaks,
    * and the fix is group-aware splitting (split by near-dup CLUSTER
    * id via [[connectedComponents]], not by document id).
    *
    * Shape: two slim equi-joins of the pair frame against the (id,
    * split) projection, one map-side-combined count — |labels|²-row
    * output. Pairs referencing unlabeled ids drop out (inner joins).
    *
    * Returns (split_a, split_b, n_pairs) with split_a <= split_b.
    */
  def splitLeakage(labeled: DataFrame, idCol: String, splitCol: String,
      pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    // ids join in their NATURAL type — a long cast would null string
    // document ids and silently report zero leakage
    val la = labeled.select(col(idCol).as(aCol), col(splitCol).as("_sa"))
    val lb = labeled.select(col(idCol).as(bCol), col(splitCol).as("_sb"))
    pairs.select(col(aCol), col(bCol))
      .join(la, Seq(aCol)).join(lb, Seq(bCol))
      .select(least(col("_sa"), col("_sb")).as("split_a"),
        greatest(col("_sa"), col("_sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
  }
}
