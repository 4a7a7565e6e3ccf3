package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (GPT-style concat-and-chunk): lay every document's
  * tokens end-to-end in id order and cut the stream into fixed-length
  * training sequences; each document gets its global token span and its
  * first/last sequence coordinates.
  *
  * The core is a corpus-wide prefix sum. A bare
  * `sum() over (order by id)` window has NO partition key, so Spark
  * plans the whole corpus into ONE window task — the classic
  * single-reducer bottleneck. This implementation is the standard
  * two-level scalable prefix sum instead:
  *   1. bucket docs by `id div bucketSize` — per-bucket local cumsum
  *      runs as a parallel window over bounded partitions;
  *   2. per-bucket totals (n/bucketSize rows — tiny) take the global
  *      cumsum on a single task over TINY data;
  *   3. bucket base offsets broadcast-join back (no shuffle of docs).
  * Only presentation ORDER BY touches the full corpus order.
  */
object Packing {

  /** Per-document span + sequence coordinates. Output columns:
    * (doc_id, n_tokens, start_tok, first_seq, last_seq, seq_offset).
    * Ids must be unique — duplicate ids have no well-defined packing
    * order (and would silently corrupt the cumsum via the window's
    * RANGE frame), so the job FAILS on the first duplicate, checked for
    * free inside the tiny bucket-totals aggregate. Order is ascending
    * id, like the reference store's insertion order.
    */
  def tokenSpans(
      docs: DataFrame, idCol: String, textCol: String,
      seqLen: Long, bucketSize: Long = 1 << 20): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    val nTok = size(TextAnalysis.tokens(col(textCol))).cast("long")
    // base is consumed TWICE below (the per-bucket window and the
    // bucket-totals aggregate) — without a checkpoint each consumer
    // re-runs the upstream tokenize (and whatever the caller stacked
    // before it, e.g. pp_redact_pack's PII regex pass) over the full
    // corpus. The checkpointed frame is three longs per row, so the
    // materialization is tiny next to the text pass it halves.
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      nTok.as("n_tokens"),
      intDiv(col(idCol).cast("long"), bucketSize).as("_bkt"))
      .localCheckpoint(true)

    val local = base.withColumn("_local_end",
      sum(col("n_tokens")).over(Window.partitionBy("_bkt").orderBy("doc_id")))

    // bucket totals: n/bucketSize rows — driver-scale, single-task
    // window over tiny data is intentional here. Equal ids land in the
    // same bucket, so the per-bucket distinct count detects ANY global
    // duplicate; the check rides on _base (a column the output consumes)
    // so column pruning cannot elide it.
    val dupCheck = when(col("_n") === col("_nd"), lit(0L))
      .otherwise(raise_error(concat(
        lit(s"tokenSpans: duplicate $idCol values in bucket "),
        col("_bkt"))).cast("long"))
    val bases = base.groupBy("_bkt").agg(
      sum(col("n_tokens")).as("_tot"),
      count(lit(1)).as("_n"),
      count_distinct(col("doc_id")).as("_nd"))
      .withColumn("_base",
        sum(col("_tot")).over(Window.orderBy("_bkt")) - col("_tot") + dupCheck)
      .select("_bkt", "_base")

    val start = col("_base") + col("_local_end") - col("n_tokens")
    local.join(broadcast(bases), Seq("_bkt"))
      .withColumn("start_tok", start)
      .withColumn("first_seq", intDiv(col("start_tok"), seqLen))
      // empty docs degenerate to last_seq == first_seq
      .withColumn("last_seq",
        intDiv(col("start_tok") + greatest(col("n_tokens") - 1, lit(0L)), seqLen))
      .withColumn("seq_offset", pmod(col("start_tok"), lit(seqLen)))
      .select("doc_id", "n_tokens", "start_tok", "first_seq", "last_seq", "seq_offset")
  }

  /** Sliding-window chunk coordinates per document (RAG-style):
    * windows of `chunkLen` tokens advancing by `stride`
    * (overlap = chunkLen − stride), the last window clipped back so it
    * is full-length and ends exactly at the document's last token
    * (documents shorter than `chunkLen` yield one short chunk).
    * Emits (doc_id, chunk_id, tok_start, tok_len) — a pure
    * explode-generator projection whose fan-out per row is bounded by
    * n_tokens/stride. NULL documents yield no chunks; an empty-string
    * document tokenizes to [""] (split("") convention, matching
    * engines like DuckDB) and so yields one 1-token chunk like any
    * other single-token document.
    */
  def chunkSpans(
      docs: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen >= 1, s"chunkLen must be >= 1, got $chunkLen")
    require(stride >= 1 && stride <= chunkLen,
      s"stride must be in [1, chunkLen], got $stride")
    val n = coalesce(size(TextAnalysis.tokens(col(textCol))), lit(0)).cast("long")
    val lastK = when(n <= chunkLen, lit(0L))
      .otherwise(intDiv(n - chunkLen + (stride - 1), stride))
    val start = least(col("k") * stride, greatest(col("n") - chunkLen, lit(0L)))
    docs.select(col(idCol).as("doc_id"), n.as("n"), lastK.as("last_k"))
      .filter(col("n") > 0)
      .withColumn("k", explode(sequence(lit(0L), col("last_k"))))
      .select(
        col("doc_id"),
        col("k").as("chunk_id"),
        start.as("tok_start"),
        least(lit(chunkLen.toLong), col("n") - start).as("tok_len"))
  }

  /** Length-bucketed inference batching: group documents of similar
    * token count (bucket = n_tokens div `bucketWidth`) and number
    * deterministic batches of `batchSize` inside each bucket (by
    * ascending id) — the dynamic-batching layout that keeps padding
    * waste bounded by `bucketWidth` tokens per sequence.
    *
    * Emits (doc_id, n_tokens, bucket, batch_id, slot). The per-bucket
    * row_number is a sort within the bucket's partitions — buckets are
    * the parallelism unit, like `_bkt` in [[tokenSpans]]; at open-web
    * scale add a salt column to the bucket key if one length class
    * dominates.
    */
  def lengthBatches(
      docs: DataFrame, idCol: String, textCol: String,
      bucketWidth: Long, batchSize: Long): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val n = coalesce(size(TextAnalysis.tokens(col(textCol))), lit(0)).cast("long")
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    docs.select(col(idCol).cast("long").as("doc_id"), n.as("n_tokens"))
      .withColumn("bucket", intDiv(col("n_tokens"), bucketWidth))
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", intDiv(col("_rn") - 1, batchSize))
      .withColumn("slot", pmod(col("_rn") - 1, lit(batchSize)))
      .drop("_rn")
  }

  /** Curriculum batching: documents are staged into quality tiers by
    * fixed score thresholds (tier 0 = best), then batched WITHIN each
    * tier by descending score (ties ascending id) — the
    * easy/clean-examples-first training order, emitted as
    * (doc_id, score, tier, batch_id, slot). A trainer consumes tiers
    * in order and batches within a tier in batch_id order.
    *
    * Fixed thresholds (not percentiles) are deliberate: the tier of a
    * row is a pure per-row function, so the layout is stable under
    * re-sharding and incremental appends, and any engine can replay it
    * — percentile staging would re-tier the whole corpus every ingest.
    * The window partitions by tier; like [[lengthBatches]]'s buckets,
    * tiers are the parallelism unit (salt the tier key if one tier
    * dominates at open-web scale).
    */
  def curriculumBatches(
      docs: DataFrame, idCol: String, scoreCol: String,
      thresholds: Seq[Long], batchSize: Long): DataFrame = {
    require(thresholds.nonEmpty, "curriculumBatches needs at least one threshold")
    require(thresholds == thresholds.sorted.reverse && thresholds.distinct == thresholds,
      s"thresholds must be strictly descending, got $thresholds")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    // tier = index of the first threshold the score reaches; below all
    // thresholds => last tier (evaluated on the renamed "score" column)
    val tier = thresholds.zipWithIndex
      .foldRight(lit(thresholds.size).cast("long")) { case ((t, i), acc) =>
        when(col("score") >= t, i.toLong).otherwise(acc)
      }
    val w = Window.partitionBy("tier").orderBy(col("score").desc, col("doc_id"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(scoreCol).cast("long").as("score"))
      .withColumn("tier", tier)
      .withColumn("_rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", intDiv(col("_rn") - 1, batchSize))
      .withColumn("slot", pmod(col("_rn") - 1, lit(batchSize)))
      .drop("_rn")
  }

  /** Total number of fixed-length sequences the packed corpus yields
    * (ceil(total_tokens / seqLen)) — one partially-aggregated reduce.
    */
  def sequenceCount(docs: DataFrame, textCol: String, seqLen: Long): Long = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val total = docs
      .agg(sum(size(TextAnalysis.tokens(col(textCol))).cast("long")))
      .head().get(0)
    if (total == null) 0L
    else Math.addExact(total.asInstanceOf[Long], seqLen - 1) / seqLen
  }

  // Exact long integer division (IntegralDivide); operands here are
  // nonnegative so truncation == floor. A double round-trip would lose
  // exactness past 2^53.
  private def intDiv(c: Column, w: Long): Column = {
    import org.apache.spark.sql.graftshim.GraftShim.{column, expression}
    column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      expression(c), expression(lit(w))))
  }
}
