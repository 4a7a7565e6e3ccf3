package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-vector retrieval over an inverted posting relation — the
  * serving pattern of learned sparse models (SPLADE, Formal et al.
  * SIGIR 2021; uniCOIL, Lin & Ma 2021) and of classic impact-ordered
  * lexical indexes (Anh & Moffat, SIGIR 2006). Documents and queries
  * are sparse vectors `(term, weight)`; relevance is the sparse dot
  * product `score(q, d) = Σ_{t ∈ q ∩ d} w_q(t) · w_d(t)`.
  *
  * Relational shape: both sides melt to a posting relation and meet in
  * ONE equi-join on the term key — the inverted-index probe. No cross
  * join anywhere: a (query, doc) pair is enumerated only if it shares
  * at least one term, so the scored-pair count is the MATCHED pair
  * count (sum over query terms of posting-list length), not |Q|·|D|.
  * This is the same melt that un-stalled batched BM25 ([[Bm25]],
  * `tx_bm25_batch`) — the plan is O(1) in both query count and
  * vocabulary.
  *
  * Scale shape (100 TB): the posting relation shuffles by term
  * (dictionary-encoded strings or int term ids — parquet does the
  * dictionary either way); skew lives exactly where inverted indexes
  * always put it, in stop-term posting lists, and the standard fix is
  * [[prunePostings]] — impact-ordered static pruning that caps every
  * posting list at its top-p weights, bounding the worst-case join
  * fan-out at `p × |q terms|` candidates per query. Learned-sparse
  * weights make the cap principled: SPLADE training concentrates mass
  * in few terms, so small p loses little recall (the gate pins the
  * pruned path's semantics exactly; the recall trade is the caller's
  * dial). Aggregation is map-side combinable (a sum), and the final
  * top-k rides the same (score, id) tie-break as every other
  * retrieval operator here.
  */
object SparseRetrieval {

  /** Term-frequency postings from raw text: one row per (id, term)
    * with `weight` = tf as DOUBLE. Whitespace tokenizer, lowercased —
    * parity with [[Bm25]]'s tokenization (and the DuckDB
    * `string_split_regex(lower(text), '\s+')` oracle form). NULL text
    * ⇒ no postings (a doc with no terms can never match — correct
    * sparse semantics, not a NULL-poisoned score).
    *
    * tf weights are integer-valued doubles, so downstream dot products
    * and sums stay exact under any addition order (< 2^53) — the gate
    * can hash-compare against a DuckDB replay without rounding.
    */
  def tfPostings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).cast("double").as("weight"))

  /** Postings from parallel sparse arrays (the learned-sparse model
    * output shape): `idxCol: Array[Int]` term ids and `wCol:
    * Array[Float]` weights, positionally aligned. Rows with mismatched
    * lengths fail fast (a corrupt sparse vector should not silently
    * truncate). Zero weights are dropped — they cannot contribute to
    * any dot product but would inflate posting lists.
    */
  def postingsFromArrays(
      df: DataFrame, idCol: String, idxCol: String, wCol: String): DataFrame = {
    val checked = df.withColumn("_len_ok",
      when(size(col(idxCol)) === size(col(wCol)), lit(true))
        .otherwise(raise_error(concat(
          lit(s"sparse vector arity mismatch: $idxCol has "), size(col(idxCol)),
          lit(s" entries but $wCol has "), size(col(wCol))))))
    checked
      .select(col(idCol).as("id"),
        explode(arrays_zip(col(idxCol), col(wCol))).as("p"))
      .select(col("id"), col("p")(idxCol).cast("int").as("term"),
        col("p")(wCol).cast("double").as("weight"))
      .filter(col("weight") =!= 0.0)
  }

  /** Impact-ordered static pruning: keep each term's top-p postings by
    * (weight desc, id asc). Bounds every posting list — and therefore
    * the equi-join fan-out per query term — at p rows, the inverted-
    * index analogue of the LSH giant-bucket cap ([[Dedup]]). The
    * deterministic id tie-break keeps the pruned relation replayable.
    */
  def prunePostings(postings: DataFrame, p: Int): DataFrame = {
    require(p > 0, s"prune depth must be positive, got $p")
    val w = Window.partitionBy(col("term"))
      .orderBy(col("weight").desc, col("id").asc)
    postings
      .withColumn("_pr", row_number().over(w))
      .filter(col("_pr") <= p)
      .drop("_pr")
  }

  /** Sparse dot-product top-k: equi-join doc and query postings on the
    * term key, sum the per-term products per (qid, doc), rank by
    * (score desc, doc id asc). Returns (qid, id, rank, score); only
    * docs sharing ≥ 1 term with the query appear (inner-join
    * semantics — a zero-overlap doc has score 0 by definition and is
    * never enumerated).
    */
  def topKDot(
      docPostings: DataFrame, queryPostings: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val d = docPostings.select(
      col("id"), col("term"), col("weight").as("_dw"))
    val q = queryPostings.select(
      col("id").as("qid"), col("term"), col("weight").as("_qw"))
    val scored = d.join(q, "term")
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("_dw") * col("_qw")).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"), col("rank"), col("score"))
  }
}
