package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction (Sennrich et al. 2016) — the
  * tokenizer-training operator of an LLM data pipeline, distributed
  * the way industrial trainers actually run it: ONE full-corpus pass
  * builds the word-frequency table (map-side-combined aggregate), and
  * every merge iteration after that runs on the frequency-capped
  * vocabulary frame, never the corpus again.
  *
  * Per iteration: adjacent-symbol pairs explode off the (≤ `maxWords`)
  * vocab rows weighted by word count, one map-side-combined sum picks
  * the global argmax pair (ties: count desc, then left asc, right asc
  * — the deterministic stand-in for the reference implementations'
  * dict-order coin), and the merge applies as a left-to-right greedy
  * fold (`aggregate` HOF) over each word's symbol array — the same
  * leftmost-first application HuggingFace tokenizers use. Frames are
  * eagerly checkpointed per iteration so lineage stays O(1).
  *
  * Driver state is the merge table itself (`nMerges` rows) plus one
  * argmax row per iteration — bounded regardless of corpus size.
  * Words are restricted to `^[a-z]+$` after lowercasing (keeps the
  * symbol alphabet closed and the cross-engine replay dependency-free;
  * real byte-level BPE differs only in the base alphabet).
  *
  * Returns the learned merge table (rank, left_sym, right_sym,
  * pair_count) — every column integer/string-exact, so a SQL engine
  * replays the whole training loop bit-for-bit.
  */
object Bpe {

  private[operators] def wordCounts(docs: DataFrame, textCol: String,
      maxWords: Int): DataFrame =
    docs.select(explode(filter(split(lower(col(textCol)), "\\s+"),
        x => x.rlike("^[a-z]+$"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("word")).limit(maxWords)

  /** One greedy left-to-right merge application: every adjacent
    * (l, r) symbol pair collapses to l+r, leftmost first — after a
    * collapse the new symbol (not its right half) is what the next
    * position sees, so "aaa" under (a,a) becomes [aa, a].
    */
  private def applyMerge(syms: org.apache.spark.sql.Column,
      l: String, r: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0
          && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learn `nMerges` merges from `docs(textCol)`. Stops early if the
    * vocabulary runs out of adjacent pairs (fully merged). */
  def learnMerges(docs: DataFrame, textCol: String,
      nMerges: Int, maxWords: Int = 10000): DataFrame = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val spark = docs.sparkSession
    import spark.implicits._
    var syms = wordCounts(docs, textCol, maxWords)
      .select(col("word"), col("c"), split(col("word"), "").as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val best = syms
        .select(col("c"), explode(zip_with(col("s"),
          slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .filter(col("p.r").isNotNull) // trailing zip pad
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((i + 1, l, r, cnt))
        syms = syms.withColumn("s", applyMerge(col("s"), l, r))
          .localCheckpoint(true)
      }
      i += 1
    }
    merges.toSeq.toDF("rank", "left_sym", "right_sym", "pair_count")
      .withColumn("rank", col("rank").cast("long"))
  }

  /** Segment a word column with a learned merge table (rank order):
    * the ENCODER side — `nMerges` chained greedy folds, a pure
    * projection chain over the data. Adds `symsCol` (array of
    * subword symbols); non-`[a-z]+` words pass through as single
    * whole-word symbols untouched by the a-z merge alphabet.
    */
  def segment(words: DataFrame, wordCol: String, symsCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val base = words.withColumn(symsCol,
      when(lower(col(wordCol)).rlike("^[a-z]+$"),
        split(lower(col(wordCol)), ""))
        .otherwise(array(lower(col(wordCol)))))
    merges.foldLeft(base) { case (df, (l, r)) =>
      df.withColumn(symsCol, applyMerge(col(symsCol), l, r))
    }
  }
}
