package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, LangModel, Packing, Pii, Sampling, TextAnalysis}

/** End-to-end corpus preparation: the standard LLM training-data
  * sequence composed from the verified operators, each stage a
  * DataFrame → DataFrame function so any prefix runs at any scale.
  *
  * Stage order matters and mirrors production pipelines: cheap per-row
  * filters first (pure projections — shrink before any shuffle), exact
  * dedup before fuzzy (the md5 groupBy removes byte-identical copies at
  * one shuffle), near-dup clustering on the survivors, decontamination
  * against the benchmark corpus, then deterministic sampling/splitting
  * last (membership stays stable as upstream stages evolve only if the
  * key, not the row set, decides it).
  */
object TrainingDataPipeline {

  /** How the near-duplicate pair stage generates candidates. */
  sealed trait DedupMode
  object DedupMode {
    /** MinHash-LSH banded candidates → exact Jaccard verify → connected
      * components. Linear-ish in corpus size (slim equi-join on band
      * keys, giant-bucket backstop) — the only mode that survives 100 TB,
      * and therefore the default.
      */
    case object Lsh extends DedupMode
    /** All-pairs exact Jaccard — O(n²) candidate join. Complete recall;
      * only viable at oracle/verification scale. Opt in for tests and
      * cross-engine gates, never for production corpora.
      */
    case object Exact extends DedupMode
  }

  /** Tunables; defaults are the standard-ish pretraining knobs. */
  case class Config(
      minQuality: Double = 0.3,
      maxRepetition: Double = 0.5,
      minTokens: Int = 5,
      nearDupJaccard: Double = 0.8,
      dedupMode: DedupMode = DedupMode.Lsh,
      lshNumHashes: Int = 32,
      lshBands: Int = 8,
      contaminationNgram: Int = 3,
      maxContamination: Double = 0.5,
      sampleFraction: Double = 1.0,
      testFraction: Double = 0.05,
      salt: String = "graft")

  /** Per-row quality gate: pure codegen projections, zero shuffle. */
  def qualityFilter(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame =
    docs.filter(
      TextAnalysis.qualityScore(col(textCol)) >= cfg.minQuality &&
        TextAnalysis.repetitionRatio(col(textCol)) <= cfg.maxRepetition &&
        size(TextAnalysis.tokens(col(textCol))) >= cfg.minTokens)

  /** Exact then fuzzy dedup: md5 keep-min, then one survivor per
    * near-duplicate cluster (minimum id, like the exact stage). The
    * near-dup candidate stage is chosen by `cfg.dedupMode` — LSH by
    * default (the 100 TB path; `dd_lsh_clusters` proves the composition
    * against the exact clustering), all-pairs exact as the opt-in
    * oracle mode.
    */
  def dedup(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val exact = Dedup.exactDedup(docs, idCol, textCol)
    val pairs = cfg.dedupMode match {
      case DedupMode.Lsh =>
        Dedup.minHashLshPairs(exact, idCol, textCol,
          numHashes = cfg.lshNumHashes, bands = cfg.lshBands,
          verifyThreshold = cfg.nearDupJaccard)
      case DedupMode.Exact =>
        Dedup.jaccardPairs(exact, idCol, textCol, cfg.nearDupJaccard)
    }
    val comps = Dedup.connectedComponents(exact, idCol, pairs)
    // the component label IS the cluster's minimum id — survivors are
    // exactly the distinct labels
    exact.join(
      comps.select(col("comp").as(idCol)).distinct(),
      Seq(idCol), "left_semi")
  }

  /** Drop docs overlapping the benchmark corpus above the threshold. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      cfg: Config = Config()): DataFrame = {
    val contaminated = Dedup.ngramContamination(
        docs, idCol, textCol, bench, benchIdCol, benchTextCol,
        n = cfg.contaminationNgram, minOverlapFraction = cfg.maxContamination)
      .select(col("corpus_id").as(idCol)).distinct()
    docs.join(contaminated, Seq(idCol), "left_anti")
  }

  /** PII redaction stage: pure regex projection (see [[Pii]]); run it
    * FIRST so no later stage (or sink) ever sees raw identifiers, at
    * the cost of hashing redacted text in the dedup stages — the
    * standard compliance ordering.
    */
  def redact(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn(textCol, Pii.redact(col(textCol)))

  /** Stricter rule-based gate than [[qualityFilter]]: the Gopher rule
    * conjunction (word count, word length, symbol/alpha ratios,
    * stopword presence). Still a pure projection.
    */
  def gopherFilter(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(TextAnalysis.gopherPass(col(textCol)))

  /** Model-based quality gate: drop documents whose unigram perplexity
    * under a reference model exceeds `maxPerplexity` (CCNet-style).
    * The model is fitted once (ideally on a trusted reference corpus)
    * and scores as a shuffle-free projection.
    */
  def perplexityFilter(docs: DataFrame, textCol: String,
      lm: LangModel.UnigramLM, maxPerplexity: Double): DataFrame =
    docs.filter(
      LangModel.perplexityCol(lm, TextAnalysis.tokens(col(textCol))) <= maxPerplexity)

  /** Terminal packing stage: fixed-length training-sequence coordinates
    * for the surviving corpus (see [[Packing.tokenSpans]]).
    */
  def pack(docs: DataFrame, idCol: String, textCol: String, seqLen: Long): DataFrame =
    Packing.tokenSpans(docs, idCol, textCol, seqLen)

  /** Full sequence → (train, test). */
  def prepare(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val cleaned = decontaminate(
      dedup(qualityFilter(docs, idCol, textCol, cfg), idCol, textCol, cfg),
      idCol, textCol, bench, benchIdCol, benchTextCol, cfg)
    // distinct derived salts: sampling and splitting from the SAME hash
    // would correlate membership (testFraction of the sample would be
    // testFraction/sampleFraction, up to an empty train side)
    val sampled =
      if (cfg.sampleFraction >= 1.0) cleaned
      else Sampling.hashSample(cleaned, idCol, cfg.sampleFraction, cfg.salt + "|sample")
    // hashSplit returns two filters over the SAME frame; without a
    // persist each side re-executes the whole pipeline above (quality
    // scan → dedup → clustering → decontamination) — the classic
    // recompute-vs-persist call (guide §5): the survivors are reused
    // twice and recomputing them costs the full pipeline, so cache the
    // one materialization both splits read. MEMORY_AND_DISK (not a
    // lineage-truncating localCheckpoint): spills instead of OOMing on
    // a real corpus and keeps fault tolerance.
    val materialized = sampled.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Sampling.hashSplit(materialized, idCol, cfg.testFraction, cfg.salt + "|split")
  }
}
