package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-evaluation metrics — the measurement half of a search
  * engine: given a ranked run and a relevant set per query, score
  * recall@k, MRR@k, and binary NDCG@k. An ANN configuration is only
  * "done" when these numbers are on the table (the ann_* gates check
  * exactness contracts; these ops measure graded degradation).
  *
  * Shape: one equi-join of run against truth on (query, id) and one
  * per-query aggregation — metrics at any corpus size cost two
  * map-side-combined shuffles on the run, never a scan of the corpus.
  */
object Evaluation {

  /** Per-query metrics for a ranked `run` (qidCol, idCol, rankCol;
    * rank 1 = best) against binary `truth` (qidCol, idCol):
    * (qid, n_relevant, hits, recall, mrr, ndcg) — all @k.
    *
    * NDCG uses binary gains: DCG = Σ_hits 1/log2(rank+1), normalized
    * by the ideal DCG of min(k, n_relevant) hits. Queries present in
    * `truth` but absent from the run score zero; queries only in the
    * run are dropped (no truth, nothing to measure).
    */
  def rankedMetrics(
      run: DataFrame, truth: DataFrame,
      qidCol: String, idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // dedupe defensively: a duplicated (qid, id) truth row would
    // double-count through the left join and inflate recall/dcg past 1
    val t = truth.select(col(qidCol), col(idCol)).dropDuplicates(qidCol, idCol)
    val nRel = t.groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_relevant"))
    val joined = run.filter(col(rankCol) <= k)
      .join(t.withColumn("_rel", lit(1)),
        Seq(qidCol, idCol), "left_outer")
    val perQ = joined.groupBy(col(qidCol)).agg(
      sum(coalesce(col("_rel"), lit(0))).cast("long").as("hits"),
      min(when(col("_rel") === 1, col(rankCol))).as("_first_hit"),
      sum(when(col("_rel") === 1,
        lit(1.0) / log2(col(rankCol).cast("double") + 1.0))
        .otherwise(0.0)).as("_dcg"))
    val idealDcg = {
      // Σ_{r=1..m} 1/log2(r+1) for m = min(k, n_relevant), as a
      // literal-array lookup (k is a small constant)
      val prefix = (1 to k).scanLeft(0.0)((acc, r) => acc + 1.0 / (math.log(r + 1.0) / math.log(2.0))).tail
      element_at(lit(prefix.toArray), least(col("n_relevant"), lit(k)).cast("int"))
    }
    nRel.join(perQ, Seq(qidCol), "left_outer")
      .select(
        col(qidCol),
        col("n_relevant"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)).cast("double")
          / least(col("n_relevant"), lit(k.toLong))).as("recall"),
        coalesce(lit(1.0) / col("_first_hit"), lit(0.0)).as("mrr"),
        (coalesce(col("_dcg"), lit(0.0)) / idealDcg).as("ndcg"))
  }

  /** Per-query average precision @k — the order-sensitive companion to
    * [[rankedMetrics]]: AP = Σ_{relevant hit at rank r} P@r / min(k,
    * n_relevant), where P@r counts hits among the top r. Rewards
    * putting relevant results EARLY, not merely inside the cutoff
    * (recall@k cannot tell rank 1 from rank k). Averaging `ap` over
    * queries is MAP.
    *
    * Shape: the same run⋈truth equi-join as rankedMetrics plus one
    * window partitioned BY QUERY (≤ k rows per partition — bounded
    * state, never a global sort). `rankCol` must be distinct within a
    * query (1..k from row_number, as every graft retrieval op emits);
    * duplicated truth rows are deduped defensively. Queries in truth
    * but absent from the run score ap = 0.
    */
  def averagePrecision(
      run: DataFrame, truth: DataFrame,
      qidCol: String, idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val t = truth.select(col(qidCol), col(idCol)).dropDuplicates(qidCol, idCol)
    val nRel = t.groupBy(col(qidCol)).agg(count(lit(1)).as("n_relevant"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col(rankCol))
    val perQ = run.filter(col(rankCol) <= k)
      .join(t.withColumn("_rel", lit(1)), Seq(qidCol, idCol), "left_outer")
      .withColumn("_hits_at", sum(coalesce(col("_rel"), lit(0))).over(w))
      .withColumn("_p_at", when(col("_rel") === 1,
        col("_hits_at").cast("double") / col(rankCol).cast("double")))
      .groupBy(col(qidCol)).agg(sum(col("_p_at")).as("_sum_p"))
    nRel.join(perQ, Seq(qidCol), "left_outer")
      .select(
        col(qidCol),
        col("n_relevant"),
        (coalesce(col("_sum_p"), lit(0.0))
          / least(col("n_relevant"), lit(k.toLong)).cast("double")).as("ap"))
  }

  /** EXACT binary AUC — the Mann-Whitney statistic with midrank tie
    * handling — for a classifier score (e.g. the quality model's
    * probability) against a boolean label, with NO global window:
    *   1. aggregate to one row per DISTINCT score (pos_at, neg_at) —
    *      one map-side-combined shuffle;
    *   2. range-bucket the distinct scores (min/max are two tiny
    *      jobs); cumulative negatives run as a BUCKET-partitioned
    *      window;
    *   3. bucket totals take the global cumsum on driver-scale data
    *      and broadcast back as base offsets — the
    *      [[Packing.tokenSpans]] two-level prefix-sum shape.
    * AUC = Σ_s pos_at(s) · (neg_below(s) + neg_at(s)/2) / (nPos·nNeg).
    * Returns ONE row (n_pos, n_neg, auc); `auc` is NULL when either
    * class is empty. Rows with NULL score or label are ignored.
    */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val d = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
    val per = d.groupBy("s").agg(
      sum(col("y")).as("pos_at"),
      (count(lit(1)) - sum(col("y"))).as("neg_at"))
    val mm = per.agg(min(col("s")), max(col("s"))).head()
    val spark = df.sparkSession
    if (mm.isNullAt(0)) {
      import spark.implicits._
      return Seq((0L, 0L, Option.empty[Double])).toDF("n_pos", "n_neg", "auc")
    }
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val width = if (hi > lo) hi - lo else 1.0
    val bkt = least(
      floor((col("s") - lit(lo)) / lit(width) * nBuckets).cast("long"),
      lit(nBuckets - 1L))
    val local = per.withColumn("_bkt", bkt)
      .withColumn("_cum_in",
        sum(col("neg_at")).over(Window.partitionBy("_bkt").orderBy("s")))
    val bases = local.groupBy("_bkt").agg(sum(col("neg_at")).as("_tot"))
      .withColumn("_base",
        sum(col("_tot")).over(Window.orderBy("_bkt")) - col("_tot"))
      .select("_bkt", "_base")
    local.join(broadcast(bases), Seq("_bkt"))
      .select(col("pos_at"), col("neg_at"),
        (col("pos_at") * (col("_base") + col("_cum_in") - col("neg_at")
          + col("neg_at") / 2.0)).as("_u"))
      .agg(sum(col("pos_at")).as("n_pos"), sum(col("neg_at")).as("n_neg"),
        sum(col("_u")).as("_usum"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("_usum") / (col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of several ranked
    * runs — THE standard way to combine lexical (BM25) and dense (ANN)
    * retrieval without score calibration: each run contributes
    * 1/(k0 + rank) per (query, id) and the fused list re-ranks by the
    * summed score. Rank-only, so incomparable score scales fuse safely.
    *
    * Shape: union of the runs (already top-k-bounded), one
    * map-side-combined sum by (query, id), one per-query window over
    * ≤ runs·k rows. Returns (qid, id, rrf, rank) for the fused top
    * `topK`; ties break on id.
    */
  def reciprocalRankFusion(runs: Seq[DataFrame],
      qidCol: String, idCol: String, rankCol: String,
      topK: Int, k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "need at least one run")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    import org.apache.spark.sql.expressions.Window
    val contrib = runs.map(_.select(
      col(qidCol), col(idCol),
      (lit(1.0) / (lit(k0.toDouble) + col(rankCol).cast("double"))).as("_c")))
      .reduce(_ unionAll _)
    val fused = contrib.groupBy(col(qidCol), col(idCol))
      .agg(sum(col("_c")).as("rrf"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("rrf").desc, col(idCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** Chunk→parent-document retrieval rollup — the late-chunking step a
    * RAG pipeline needs the day it adopts [[Packing.chunkSpans]]:
    * chunk-level hits pool per parent document (max-pool — best chunk
    * wins — AND sum-pool, both emitted; `pool` picks which one ranks),
    * then the top `k` documents per query by pooled score descending,
    * document id ascending. `scoreCol` is larger-is-better — negate
    * distances before calling.
    *
    * Scale shape: one map-side-combined (qid, doc) aggregate over the
    * chunk hits, then the aggregator top-k (per-partition heaps — the
    * shuffle carries ≤ k docs per query, not the chunk fan-in), then
    * one hash join of the k·|queries| winners back to their pooled
    * stats. Nothing is ever per-chunk past the first aggregate.
    *
    * Returns (qidCol, docCol, max_score, sum_score, n_chunks, rank).
    */
  def docTopKFromChunks(hits: DataFrame, qidCol: String, docCol: String,
      scoreCol: String, k: Int, pool: String = "max"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(pool == "max" || pool == "sum",
      s"pool must be 'max' or 'sum', got '$pool'")
    val pooled = hits.groupBy(col(qidCol), col(docCol))
      .agg(
        max(col(scoreCol).cast("double")).as("max_score"),
        sum(col(scoreCol).cast("double")).as("sum_score"),
        count(lit(1)).as("n_chunks"))
    val rankOn = if (pool == "max") "max_score" else "sum_score"
    val top = TopKAggregator.topKRows(
        pooled.withColumn("_neg", -col(rankOn)), qidCol, docCol, "_neg", k)
      .select(col(qidCol), col(docCol), col("rn").cast("int").as("rank"))
    top.join(pooled, Seq(qidCol, docCol))
      .select(col(qidCol), col(docCol), col("max_score"),
        col("sum_score"), col("n_chunks"), col("rank"))
  }

  /** Reliability table for probability scores in [0, 1]: per bin of
    * width 1/nBins, (n, avg_score, frac_pos) — is the model saying
    * 0.8 right 80% of the time? One map-side-combined aggregation,
    * bin count bounded. Out-of-range scores clamp into the edge bins;
    * NULL score/label rows are ignored.
    */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be >= 1, got $nBins")
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("s"),
        when(col(labelCol).cast("boolean"), 1.0).otherwise(0.0).as("y"))
      .withColumn("bin", greatest(least(
        floor(col("s") * nBins).cast("long"), lit(nBins - 1L)), lit(0L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), avg(col("s")).as("avg_score"),
        avg(col("y")).as("frac_pos"))
  }

  /** Precision-recall curve of a binary scorer: one row per DISTINCT
    * score threshold t (classify positive when score ≥ t) with the
    * integer confusion counts and derived precision/recall —
    * [[binaryAuc]]'s companion for the class-imbalanced regimes
    * (quality filtering, contamination flags) where ROC-AUC flatters.
    *
    * Same scale shape as [[binaryAuc]]: per-distinct-score aggregate,
    * bucket-partitioned cumulative window, broadcast bucket bases —
    * NO global window. TP/FP at threshold s are recovered from the
    * ASCENDING inclusive prefix sums as `total − cum_incl + at(s)`,
    * so all counts stay integer-exact (a SQL engine replays them
    * bit-for-bit; only the final divisions are floating).
    *
    * Output: (score, pos_at, tp, fp, precision, recall), ordered by
    * nothing — callers sort. Rows with NULL score/label are ignored;
    * empty input yields an empty frame.
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val d = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(scoreCol).cast("double").as("s"),
        when(col(labelCol).cast("boolean"), 1L).otherwise(0L).as("y"))
    val per = d.groupBy("s").agg(
      sum(col("y")).as("pos_at"),
      (count(lit(1)) - sum(col("y"))).as("neg_at"))
    val tot = per.agg(coalesce(sum(col("pos_at")), lit(0L)),
      coalesce(sum(col("neg_at")), lit(0L)),
      min(col("s")), max(col("s"))).head()
    val (nPos, nNeg) = (tot.getLong(0), tot.getLong(1))
    val spark = df.sparkSession
    if (tot.isNullAt(2)) {
      import spark.implicits._
      return Seq.empty[(Double, Long, Long, Long, Option[Double], Option[Double])]
        .toDF("score", "pos_at", "tp", "fp", "precision", "recall")
    }
    val (lo, hi) = (tot.getDouble(2), tot.getDouble(3))
    val width = if (hi > lo) hi - lo else 1.0
    val bkt = least(
      floor((col("s") - lit(lo)) / lit(width) * nBuckets).cast("long"),
      lit(nBuckets - 1L))
    val local = per.withColumn("_bkt", bkt)
      .withColumn("_cp_in",
        sum(col("pos_at")).over(Window.partitionBy("_bkt").orderBy("s")))
      .withColumn("_cn_in",
        sum(col("neg_at")).over(Window.partitionBy("_bkt").orderBy("s")))
    val bases = local.groupBy("_bkt")
      .agg(sum(col("pos_at")).as("_tp"), sum(col("neg_at")).as("_tn"))
      .withColumn("_pbase", sum(col("_tp")).over(Window.orderBy("_bkt")) - col("_tp"))
      .withColumn("_nbase", sum(col("_tn")).over(Window.orderBy("_bkt")) - col("_tn"))
      .select("_bkt", "_pbase", "_nbase")
    local.join(broadcast(bases), Seq("_bkt"))
      .select(col("s").as("score"), col("pos_at"),
        (lit(nPos) - (col("_pbase") + col("_cp_in")) + col("pos_at")).as("tp"),
        (lit(nNeg) - (col("_nbase") + col("_cn_in")) + col("neg_at")).as("fp"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double")))
      .withColumn("recall",
        when(lit(nPos) > 0, col("tp").cast("double") / lit(nPos.toDouble)))
  }

  /** Area under the PR curve by right-step interpolation — the
    * classifier form of average precision:
    * AP = Σ_t (pos_at(t) / nPos) · precision(t). One row
    * (n_pos, n_neg, ap); NULL ap when a class is empty. The recall
    * increment at each threshold is pos_at/nPos, so no lag window is
    * needed — AP is a plain aggregate over the [[prCurve]] rows.
    */
  def prAuc(df: DataFrame, scoreCol: String, labelCol: String,
      nBuckets: Int = 1024): DataFrame = {
    val curve = prCurve(df, scoreCol, labelCol, nBuckets)
    // at the lowest threshold everything is classified positive, so
    // max(tp+fp) recovers the total row count without another scan
    curve.agg(
      coalesce(sum(col("pos_at")), lit(0L)).as("n_pos"),
      coalesce(max(col("tp") + col("fp")), lit(0L)).as("_n"),
      sum(col("pos_at").cast("double") * col("precision")).as("_ap_num"))
      .select(col("n_pos"), (col("_n") - col("n_pos")).as("n_neg"),
        when(col("n_pos") > 0, col("_ap_num") / col("n_pos").cast("double"))
          .as("ap"))
  }

  /** Cohen's kappa: chance-corrected agreement between two categorical
    * labelings of the same rows (two annotators, two models, a model
    * vs gold) - the labeled-data QA gate that raw percent-agreement
    * overstates whenever one class dominates.
    *
    *   kappa = (p_o - p_e) / (1 - p_e),  p_e = sum_k pA(k) * pB(k)
    *
    * Returns ONE row (n, po, pe, kappa); rows with a NULL on either
    * side drop; kappa is NULL when p_e = 1 (both sides constant and
    * equal - agreement is vacuous, not perfect). One map-side-combined
    * count over the data; marginals and the p_e sum run on the
    * category-bounded cell frame - the [[Outliers.chiSquared]] shape.
    */
  /** Per-pair BLEU (Papineni et al. 2002) between a candidate and a
    * reference text — the n-gram-overlap score a generation-eval or
    * paraphrase-mining pass runs over (candidate, reference) columns.
    * For each n ≤ `maxN`: clipped matches = Σ_g min(cand_count(g),
    * ref_count(g)) over the candidate's distinct n-grams, total =
    * candidate n-gram count, p_n = clipped/total.
    *
    * Two deliberate determinism choices (the tx_distinctive lesson —
    * a hash gate on a transcendental cannot survive cross-build libm
    * ULP drift):
    *   - `maxN` ∈ {1, 2, 4} so the geometric mean is a NESTED SQRT
    *     of products — IEEE-exact (±·/·sqrt are correctly rounded in
    *     every conforming engine), no exp/ln;
    *   - the brevity penalty exp(1 − r/c) is the ONE transcendental,
    *     isolated in the final `bleu` column — hash-gate the integer
    *     counts and `geo`, assert `bleu` in a spec with tolerance.
    *
    * Shape: per n, one explode + (pair, gram) count per side, one
    * equi-join on (pair, gram), one per-pair aggregate — all
    * key-partitioned map-side-combined shuffles; nothing global, no
    * windows. Smoothing: p_n = 0 when the candidate has no n-grams
    * (and geo then 0) — standard unsmoothed BLEU.
    *
    * Output: (pairId, c_len, r_len, clip_1..maxN, tot_1..maxN, geo,
    * bleu), one row per input pair (empty/NULL texts give 0-length
    * sides).
    */
  // shared n-gram machinery for the pairwise overlap scorers
  // ([[bleuPairs]] precision side, [[rougePairs]] recall side): fixing
  // tokenization or the zip_with shingle shape must fix both metrics.
  private def overlapToks(c: Column): Column =
    filter(split(lower(coalesce(c, lit(""))), "\\s+"), x => x =!= "")

  private def overlapGrams(ts: Column, n: Int): Column =
    if (n == 1) ts
    else filter(
      (1 until n).foldLeft(ts) { (acc, k) =>
        zip_with(acc, slice(ts, lit(k + 1), size(ts)),
          (a, b) => concat(a, lit(" "), b))
      }, x => x.isNotNull)

  def bleuPairs(pairs: DataFrame, pairIdCol: String,
      candCol: String, refCol: String, maxN: Int = 2): DataFrame = {
    require(Set(1, 2, 4).contains(maxN),
      s"maxN must be 1, 2 or 4 (sqrt-exact geometric mean), got $maxN")
    val base = pairs.select(col(pairIdCol).as("_pid"),
      overlapToks(col(candCol)).as("_ct"), overlapToks(col(refCol)).as("_rt"))
      .withColumn("c_len", size(col("_ct")).cast("long"))
      .withColumn("r_len", size(col("_rt")).cast("long"))
    def counts(tokCol: String, n: Int): DataFrame = base
      .select(col("_pid"), explode(overlapGrams(col(tokCol), n)).as("_g"))
      .groupBy("_pid", "_g").agg(count(lit(1)).as("_c"))
    val perN = (1 to maxN).map { n =>
      counts("_ct", n)
        .join(counts("_rt", n).withColumnRenamed("_c", "_rc"),
          Seq("_pid", "_g"), "left_outer")
        .groupBy("_pid").agg(
          sum(least(col("_c"), coalesce(col("_rc"), lit(0L))))
            .as(s"clip_$n"),
          sum(col("_c")).as(s"tot_$n"))
    }
    val joined = perN.foldLeft(base.select(col("_pid"), col("c_len"),
      col("r_len"))) { (acc, d) => acc.join(d, Seq("_pid"), "left_outer") }
    val filled = (1 to maxN).foldLeft(joined) { (acc, n) =>
      acc.withColumn(s"clip_$n", coalesce(col(s"clip_$n"), lit(0L)))
        .withColumn(s"tot_$n", coalesce(col(s"tot_$n"), lit(0L)))
    }
    val ps = (1 to maxN).map(n =>
      when(col(s"tot_$n") > 0,
        col(s"clip_$n").cast("double") / col(s"tot_$n").cast("double"))
        .otherwise(lit(0.0)))
    val prod = ps.reduce(_ * _)
    val geo = maxN match {
      case 1 => prod
      case 2 => sqrt(prod)
      case 4 => sqrt(sqrt(prod))
    }
    filled
      .withColumn("geo", geo)
      .withColumn("bleu",
        when(col("c_len") >= col("r_len") || col("c_len") === 0, col("geo"))
          .otherwise(col("geo") * exp(lit(1.0)
            - col("r_len").cast("double") / col("c_len").cast("double"))))
      .withColumnRenamed("_pid", pairIdCol)
  }

  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("_a"), col(bCol).cast("string").as("_b"))
    val cells = d.groupBy("_a", "_b").agg(count(lit(1)).as("_n"))
    val totals = cells.agg(
      coalesce(sum(col("_n")), lit(0L)).as("_tot"),
      coalesce(sum(when(col("_a") === col("_b"), col("_n"))
        .otherwise(lit(0L))), lit(0L)).as("_agree"))
    val pa = cells.groupBy("_a").agg(sum(col("_n")).as("_na"))
    val pb = cells.groupBy("_b").agg(sum(col("_n")).as("_nb"))
    val pe = pa.join(pb, pa("_a") === pb("_b"))
      .crossJoin(broadcast(totals))
      .agg(coalesce(sum(col("_na").cast("double") * col("_nb").cast("double")),
        lit(0.0)).as("_peNum"))
    totals.crossJoin(broadcast(pe))
      .select(col("_tot").as("n"),
        (col("_agree").cast("double") / col("_tot").cast("double")).as("po"),
        (col("_peNum") / (col("_tot").cast("double") * col("_tot").cast("double")))
          .as("pe"))
      .select(col("n"), col("po"), col("pe"),
        when(col("pe") < 1.0, (col("po") - col("pe")) / (lit(1.0) - col("pe")))
          .as("kappa"))
  }

  /** Per-pair ROUGE-N (Lin 2004) between a candidate and a reference
    * text — the summarization/compression counterpart of [[bleuPairs]]:
    * where BLEU is precision-oriented (clipped matches over the
    * CANDIDATE total), ROUGE-N is recall-oriented (the same clipped
    * matches over the REFERENCE total). Emits both sides plus F1.
    *
    * For each n ≤ `maxN`: clip_n = Σ_g min(cand_count(g),
    * ref_count(g)); ctot_n / rtot_n = candidate / reference n-gram
    * totals; prec = clip/ctot, rec = clip/rtot, f1 = 2·p·r/(p+r)
    * (0 when a denominator is 0). Every emitted number is either a
    * 64-bit integer or a ±·/ combination of integers — IEEE-exact in
    * any conforming engine, so the whole row hash-gates (no BLEU-style
    * transcendental split needed; the brevity penalty is the only exp
    * in this family and ROUGE has none).
    *
    * Shape: per n, one explode + (pair, gram) count per side, one
    * FULL outer equi-join on (pair, gram) — full, not left, because
    * reference-only grams still count in rtot_n — then one per-pair
    * aggregate. All key-partitioned map-side-combined shuffles;
    * nothing global, no windows; scales linearly in total token count.
    *
    * Output: (pairId, clip_n, ctot_n, rtot_n, prec_n, rec_n, f1_n)
    * for each n, one row per input pair; empty/NULL texts give zero
    * totals and zero scores.
    */
  def rougePairs(pairs: DataFrame, pairIdCol: String,
      candCol: String, refCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 4, s"maxN must be in [1,4], got $maxN")
    val base = pairs.select(col(pairIdCol).as("_pid"),
      overlapToks(col(candCol)).as("_ct"), overlapToks(col(refCol)).as("_rt"))
    def counts(tokCol: String, n: Int, out: String): DataFrame = base
      .select(col("_pid"), explode(overlapGrams(col(tokCol), n)).as("_g"))
      .groupBy("_pid", "_g").agg(count(lit(1)).as(out))
    val perN = (1 to maxN).map { n =>
      counts("_ct", n, "_cc")
        .join(counts("_rt", n, "_rc"), Seq("_pid", "_g"), "full_outer")
        .groupBy("_pid").agg(
          sum(least(coalesce(col("_cc"), lit(0L)),
            coalesce(col("_rc"), lit(0L)))).as(s"clip_$n"),
          sum(coalesce(col("_cc"), lit(0L))).as(s"ctot_$n"),
          sum(coalesce(col("_rc"), lit(0L))).as(s"rtot_$n"))
    }
    val joined = perN.foldLeft(base.select(col("_pid"))) { (acc, d) =>
      acc.join(d, Seq("_pid"), "left_outer")
    }
    (1 to maxN).foldLeft(joined) { (acc, n) =>
      val clip = coalesce(col(s"clip_$n"), lit(0L))
      val ct = coalesce(col(s"ctot_$n"), lit(0L))
      val rt = coalesce(col(s"rtot_$n"), lit(0L))
      val p = when(ct > 0, clip.cast("double") / ct.cast("double"))
        .otherwise(lit(0.0))
      val r = when(rt > 0, clip.cast("double") / rt.cast("double"))
        .otherwise(lit(0.0))
      acc.withColumn(s"clip_$n", clip)
        .withColumn(s"ctot_$n", ct)
        .withColumn(s"rtot_$n", rt)
        .withColumn(s"prec_$n", p)
        .withColumn(s"rec_$n", r)
        .withColumn(s"f1_$n",
          when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(lit(0.0)))
    }.withColumnRenamed("_pid", pairIdCol)
  }

  /** Per-query Kendall τ-a between two rankings of the same items —
    * the rank-agreement number for "do my lexical and dense retrievers
    * order results the same way?" (Spearman answers with squared rank
    * gaps; τ counts pairwise inversions, the metric rank-fusion
    * papers report). Computed over the items PRESENT IN BOTH runs
    * (ranks are each run's original positions, so dropping
    * one-sided items does not re-rank the rest). Ranks are expected
    * distinct per query (row_number output, as every graft retrieval
    * op emits); if a caller passes rank()-style TIED ranks anyway,
    * tied pairs count as NEITHER concordant nor discordant (and
    * runA-tied pairs are not enumerated at all) — they are never
    * silently misclassified as disagreement.
    *
    * τ = (concordant − discordant) / (n(n−1)/2). Counts are integers;
    * τ is one integer ratio — hash-exact.
    *
    * Shape: one (qid, id) equi-join to align the runs, then a per-query
    * pair self-join — O(k²) per query by contract (top-k lists),
    * distributed across queries. Returns (qid, n_common, concordant,
    * discordant, tau); tau NULL when n_common < 2.
    */
  def kendallTau(runA: DataFrame, runB: DataFrame,
      qidCol: String, idCol: String,
      rankACol: String, rankBCol: String): DataFrame = {
    val aligned = runA.select(col(qidCol).as("_q"), col(idCol).as("_id"),
        col(rankACol).cast("long").as("_ra"))
      .join(runB.select(col(qidCol).as("_q"), col(idCol).as("_id"),
        col(rankBCol).cast("long").as("_rb")), Seq("_q", "_id"))
    val l = aligned.select(col("_q"), col("_id").as("_ida"),
      col("_ra").as("_ra1"), col("_rb").as("_rb1"))
    val r = aligned.select(col("_q"), col("_id").as("_idb"),
      col("_ra").as("_ra2"), col("_rb").as("_rb2"))
    val pairs = l.join(r, Seq("_q")).filter(col("_ra1") < col("_ra2"))
    val n = aligned.groupBy("_q").agg(count(lit(1)).as("n_common"))
    // explicit both-direction sums: a runB tie (_rb1 = _rb2) lands in
    // neither bucket — `count − concordant` would misread it as
    // discordant
    val cd = pairs.groupBy("_q").agg(
      sum((col("_rb1") < col("_rb2")).cast("long")).as("concordant"),
      sum((col("_rb1") > col("_rb2")).cast("long")).as("discordant"))
    n.join(cd, Seq("_q"), "left_outer")
      .select(col("_q").as(qidCol), col("n_common"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"),
        when(col("n_common") >= 2,
          (coalesce(col("concordant"), lit(0L))
            - coalesce(col("discordant"), lit(0L))).cast("double")
            / (col("n_common") * (col("n_common") - 1L) / lit(2L))
              .cast("double")).as("tau"))
  }
}
