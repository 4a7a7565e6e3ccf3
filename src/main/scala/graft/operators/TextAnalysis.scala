package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: token
  * statistics, quality scoring, and n-gram-heuristic language ID.
  * All pure `functions._` compositions — codegen'd, no UDFs.
  */
object TextAnalysis {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct-word shingle set for Jaccard-style comparisons. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles (n consecutive tokens joined by a space).
    *
    * Built by zipping the token array with its own 1..n-1 shifts:
    * `zip_with` evaluates each ARGUMENT once and only the tiny lambda
    * per element. The previous `transform(ts, i => slice(ts, ...))`
    * form embedded the token-split inside the lambda, so the
    * interpreted HOF re-ran the regex split per element — O(tokens²)
    * splits per row, and worse under explode(), whose implicit
    * `size(...) > 0` filter duplicates the whole chain into the scan.
    * Trailing zip pads are nulls (concat null-propagates) and are
    * filtered, giving exactly max(size - n + 1, 0) shingles.
    */
  def wordShingles(text: Column, n: Int): Column = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    val ts = tokens(text)
    if (n == 1) ts
    else {
      val joined = (1 until n).foldLeft(ts) { (acc, k) =>
        zip_with(acc, slice(ts, lit(k + 1), size(ts)), (a, b) => concat(a, lit(" "), b))
      }
      filter(joined, x => x.isNotNull)
    }
  }

  private val enStop = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Stopword ratio: fraction of tokens that are common English stopwords
    * — a standard cheap quality signal for corpus filtering.
    */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0).otherwise(
      size(filter(ts, t => t.isInCollection(enStop))).cast("double") / size(ts))
  }

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double")
        / length(text))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0).otherwise(
      aggregate(ts, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(ts))
  }

  /** Token repetition ratio in [0,1): fraction of tokens that are
    * repeats of an earlier token — high values flag boilerplate/spam
    * (a standard pretraining corpus filter).
    */
  def repetitionRatio(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(ts)).cast("double") / size(ts))
  }

  /** Readability counts and scores (Flesch 1948 / Kincaid 1975): the
    * reading-ease and grade-level signals a curriculum or audience
    * filter keys on. Words = whitespace tokens, sentences =
    * `[.!?]+` runs (min 1 so fragments still score), syllables = the
    * standard vowel-group heuristic `[aeiouy]+` (whitespace AND
    * punctuation break groups, so counting over the whole lowered text
    * equals the per-word sum). Every output is an integer or a ±·/ of
    * integers with fixed decimal literals — no transcendental, so the
    * scores hash-gate exactly cross-engine.
    *
    * Returns (words, sentences, syllables, flesch, fk_grade) columns;
    * empty text scores NULL (no words — a ratio would divide by zero).
    */
  def readability(text: Column): Seq[(String, Column)] = {
    val w = size(filter(tokens(text), t => t =!= "")).cast("long")
    val s = greatest(regexp_count(text, lit("[.!?]+")), lit(1)).cast("long")
    val syl = regexp_count(lower(text), lit("[aeiouy]+")).cast("long")
    val wps = w.cast("double") / s.cast("double")
    val spw = syl.cast("double") / w.cast("double")
    Seq(
      "words" -> w,
      "sentences" -> s,
      "syllables" -> syl,
      "flesch" -> when(w > 0,
        lit(206.835) - lit(1.015) * wps - lit(84.6) * spw),
      "fk_grade" -> when(w > 0,
        lit(0.39) * wps + lit(11.8) * spw - lit(15.59)))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * moderate token length, penalizes punctuation noise.
    */
  def qualityScore(text: Column): Column = {
    val sw = stopwordRatio(text)
    val pr = punctRatio(text)
    val ml = meanTokenLen(text)
    val lenOk = when(ml >= 3.0 && ml <= 10.0, 1.0).otherwise(0.5)
    least(lit(1.0), greatest(lit(0.0), (sw * 2.0 + (lit(1.0) - pr) + lenOk) / 3.0))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, table A1
    * subset): per-rule booleans a pipeline can threshold or ablate.
    * All pure projections — no shuffle, scan-speed at any corpus size.
    */
  def gopherRules(text: Column): Seq[(String, Column)] = {
    val ts = tokens(text)
    val wc = size(ts)
    val mwl = meanTokenLen(text)
    // '#' and '...' occurrences per word (symbol-to-word ratio)
    val nHash = length(text) - length(replace(text, lit("#"), lit("")))
    val nEllipsis = (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    val symFrac = when(wc === 0, 1.0)
      .otherwise((nHash + nEllipsis).cast("double") / wc)
    val alphaFrac = when(wc === 0, 0.0)
      .otherwise(size(filter(ts, t => t.rlike("[a-z]"))).cast("double") / wc)
    val stopHits = size(filter(ts, t => t.isInCollection(enStop)))
    Seq(
      "wc_ok" -> (wc >= 50 && wc <= 100000),
      "mwl_ok" -> (mwl >= 3.0 && mwl <= 10.0),
      "symbol_ok" -> (symFrac < 0.1),
      "alpha_ok" -> (alphaFrac > 0.8),
      "stop_ok" -> (stopHits >= 2))
  }

  /** Conjunction of all [[gopherRules]] — the keep/drop filter. */
  def gopherPass(text: Column): Column =
    gopherRules(text).map(_._2).reduce(_ && _)

  private val langLexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "est"),
    "es" -> Seq("el", "la", "los", "y", "de", "un", "es"))

  /** Per-language stopword-hit ratio columns, e.g. `en_ratio`. */
  def langRatios(text: Column): Seq[(String, Column)] = {
    val ts = tokens(text)
    langLexicons.toSeq.sortBy(_._1).map { case (lang, lex) =>
      val ratio = when(size(ts) === 0, 0.0).otherwise(
        size(filter(ts, t => t.isInCollection(lex))).cast("double") / size(ts))
      s"${lang}_ratio" -> ratio
    }
  }

  /** One-pass corpus report (a single partially-aggregated reduce to
    * one row — no shuffle of document data): doc/token totals, mean
    * quality and repetition, and the language mix. The summary a
    * pipeline run ends with, at any corpus size.
    */
  def corpusStats(docs: org.apache.spark.sql.DataFrame, textCol: String)
      : org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val lang = langId(t)
    def nLang(l: String) =
      sum(when(lang === l, 1).otherwise(0)).cast("long").as(s"n_$l")
    docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(t))).cast("long").as("total_tokens"),
      graft.functions.hround(avg(qualityScore(t)), 4).as("mean_quality"),
      graft.functions.hround(avg(repetitionRatio(t)), 4).as("mean_repetition"),
      nLang("en"), nLang("de"), nLang("es"), nLang("fr"), nLang("und"))
  }

  /** Per-group corpus report — [[corpusStats]] stratified by a grouping
    * column (source, language, shard): doc/token volume plus mean
    * quality and repetition per stratum, one map-side-combined
    * aggregation. The mixture-diagnostics view a pipeline watches while
    * rebalancing sources.
    */
  def groupedStats(docs: org.apache.spark.sql.DataFrame,
      groupCol: String): org.apache.spark.sql.DataFrame = {
    val t = col("text")
    docs.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(t))).cast("long").as("total_tokens"),
      graft.functions.hround(avg(qualityScore(t)), 4).as("mean_quality"),
      graft.functions.hround(avg(repetitionRatio(t)), 4).as("mean_repetition"))
  }

  /** Pairwise vocabulary Jaccard between groups (sources, languages,
    * snapshots) — the cheap corpus-overlap diagnostic that flags
    * near-duplicate sources before any document-level dedup runs.
    *
    * Shape: one distinct (group, token) frame (shuffle bounded by
    * group-vocabulary size, not corpus size), self-equi-joined on
    * token for intersections — the same slim-key join as the LSH band
    * bucket join; group sizes re-join as a tiny frame.
    */
  def vocabularyOverlap(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val vocab = docs
      .select(col(groupCol).as("_g"), explode(tokenSet(col(textCol))).as("token"))
      .distinct()
    val sizes = vocab.groupBy("_g").agg(count(lit(1)).as("_n"))
    val inter = vocab
      .join(vocab.select(col("_g").as("_g2"), col("token")), "token")
      .filter(col("_g") < col("_g2"))
      .groupBy("_g", "_g2").agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes, "_g")
      .join(sizes.select(col("_g").as("_g2"), col("_n").as("_n2")), "_g2")
      .select(
        col("_g").as("group_a"), col("_g2").as("group_b"), col("n_common"),
        (col("n_common").cast("double")
          / (col("_n") + col("_n2") - col("n_common"))).as("jaccard"))
  }

  /** Top-k corpus vocabulary by frequency (ties by token asc) — the
    * deterministic "what does the tokenizer know" frame an OOV audit
    * runs against when no trained vocab is at hand. One tokenize pass,
    * one map-side-combined count, then a distributed top-k
    * (`orderBy.limit` ⇒ TakeOrderedAndProject — per-partition heaps,
    * never a global sort). Returns (token, freq).
    */
  def topVocab(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs.select(
        explode(filter(tokens(col(textCol)), t => t =!= "")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token"))
      .limit(k)
  }

  /** Out-of-vocabulary audit per group — the tokenizer-drift signal a
    * training pipeline watches per source/snapshot: rising OOV mass
    * means the corpus moved under the tokenizer (new language, new
    * domain, a markup regression) and per-document token costs are
    * about to change. `vocab` is any frame with a `token` column
    * ([[topVocab]], a BPE merge vocab, a model's tokenizer dump);
    * it is distinct-ed and broadcast, the corpus side is ONE tokenize
    * pass + one map-side-combined aggregate — |vocab| bounded driver
    * state, corpus never reshuffled by token.
    *
    * Returns (groupCol, n_tokens, n_oov, n_distinct_oov) — all
    * integers (rates are derivable and would only add a rounding
    * surface).
    */
  def oovStats(docs: DataFrame, groupCol: String, textCol: String,
      vocab: DataFrame): DataFrame = {
    val v = vocab.select(col("token")).distinct()
      .withColumn("_inv", lit(1))
    docs.select(col(groupCol),
        explode(filter(tokens(col(textCol)), t => t =!= "")).as("token"))
      .join(broadcast(v), Seq("token"), "left")
      .groupBy(col(groupCol)).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"),
        count_distinct(when(col("_inv").isNull, col("token")))
          .as("n_distinct_oov"))
  }

  /** Relation-form inverted index: one `(token, doc_id)` row per
    * distinct pair, sorted within partitions after a shuffle on token.
    * This is the 100 TB shape — no per-token aggregation buffer, so a
    * stop-like token whose postings are O(corpus) spreads across rows
    * (and spills) instead of materializing one unbounded array cell.
    * Derive array-form postings from this only for bounded vocabularies
    * (see [[invertedIndex]]).
    */
  def invertedPostings(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(tokenSet(col(textCol))).as("token"))
      .repartition(col("token"))
      .sortWithinPartitions("token", "doc_id")

  /** Inverted index: token → sorted posting list of containing doc ids
    * plus document frequency. One explode shuffle bounded by distinct
    * (token, doc) pairs; lists are sorted so the index is byte-stable.
    *
    * `maxPostings` caps each token's materialized posting list (keeping
    * the `maxPostings` smallest doc ids — a documented truncation; `df`
    * still counts ALL containing docs). The cap bounds the aggregation
    * buffer BEFORE collect_list via a per-token row_number, so a
    * stopword's row costs O(maxPostings), not O(corpus). The default
    * (unbounded) is only safe for bounded vocabularies; at open-web
    * scale pass a cap or use [[invertedPostings]].
    */
  def invertedIndex(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, maxPostings: Int = Int.MaxValue): org.apache.spark.sql.DataFrame = {
    val pairs =
      docs.select(col(idCol).as("doc_id"), explode(tokenSet(col(textCol))).as("token"))
    if (maxPostings == Int.MaxValue)
      pairs.groupBy("token")
        .agg(
          sort_array(collect_list(col("doc_id"))).as("postings"),
          count(lit(1)).as("df"))
    else {
      require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
      // df must count every containing doc, so count on the full pair
      // set (map-side partials), and cap only the rows feeding
      // collect_list. Spark 4 plans the row_number filter as a
      // WindowGroupLimit, so the per-token sort is top-k bounded too.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("token").orderBy("doc_id")
      val dfCounts = pairs.groupBy("token").agg(count(lit(1)).as("df"))
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= maxPostings)
        .groupBy("token")
        .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
        .join(dfCounts, "token")
        .select(col("token"), col("postings"), col("df"))
    }
  }

  /** Web-corpus text cleanup: strip HTML/XML tags, decode the common
    * HTML entities, collapse runs of whitespace, trim. Pure
    * regexp/replace projection — codegen'd, scan-speed at any corpus
    * size. `&amp;` decodes LAST so entity-encoded entities
    * (`&amp;lt;`) don't double-decode.
    */
  def cleanText(text: Column): Column = {
    val untagged = regexp_replace(text, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(untagged) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Shannon character entropy (nats) — the classic gibberish /
    * compression-junk signal: natural text sits near the language's
    * character entropy, while repeated padding (low) and random bytes
    * (high) fall outside it.
    *
    * One explode + ONE map-side-combined hash aggregate per doc using
    * the algebraic form `H = ln n − (Σ c·ln c)/n` — no second pass for
    * the total, no per-row nested HOF (an earlier O(distinct×length)
    * interpreted-lambda form cost 100+ s on the 100k smoke corpus;
    * this shape does it at hash-agg speed). Docs with zero characters
    * produce no row (matching the oracle's unnest semantics).
    */
  def charEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(filter(split(col(textCol), ""), c => c =!= "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg((log(sum(col("c")).cast("double"))
        - sum(col("c").cast("double") * log(col("c").cast("double")))
          / sum(col("c")).cast("double")).as("entropy"))

  /** Normalized line key shared by the boilerplate operators: casefold,
    * collapse whitespace, trim, md5 — the [[Dedup.normalizedContentHash]]
    * rule applied per line, so re-indented/re-cased copies of a nav bar
    * count as the same line.
    */
  def lineKey(lineCol: Column): Column =
    md5(trim(regexp_replace(lower(lineCol), "\\s+", " ")))

  /** Per-line document frequency over the corpus: (line_key, df) for
    * every distinct normalized line, df = number of DISTINCT documents
    * containing it (a doc repeating its own footer counts once — the
    * CCNet rule, Wenzek et al. 2020, which removes boilerplate by
    * paragraph-level df over shards).
    *
    * Shape: explode is a flat map (no shuffle); the per-(doc, line)
    * dedup and the df count are ONE aggregation pair on the line key
    * with map-side partial combine. The output is corpus-bounded by
    * distinct lines — at 100 TB the df >= threshold slice fed to
    * [[stripBoilerplate]] is tiny (boilerplate is frequent by
    * definition), and rare lines never leave the aggregation.
    */
  def lineDocFreq(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("_doc"), explode(split(col(textCol), "\n")).as("line"))
      .select(col("_doc"), lineKey(col("line")).as("line_key"))
      .distinct()
      .groupBy("line_key")
      .agg(count(lit(1)).as("df"))

  /** Remove lines whose document frequency is >= `minDf` — CCNet-style
    * boilerplate stripping (nav bars, cookie banners, footers repeat
    * across a crawl; body text doesn't). Returns one row per input doc:
    * (doc_id, cleaned, n_kept, n_removed), `cleaned` the kept lines
    * re-joined in original order ('' when everything was boilerplate).
    *
    * Shape: two jobs. (1) [[lineDocFreq]] filtered to the frequent
    * slice — slim (line_key only), broadcast. (2) one posexplode →
    * broadcast left join (frequent ⇒ flagged) → ONE groupBy(doc)
    * rebuilding the text with an order-pinning sort_array(struct(pos,
    * line)) — no window, no second scan of the corpus. Both shuffles
    * key on doc id; the frequent-line set rides the broadcast.
    */
  def stripBoilerplate(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minDf: Long): org.apache.spark.sql.DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val frequent = broadcast(
      lineDocFreq(docs, idCol, textCol).filter(col("df") >= minDf)
        .select(col("line_key")).withColumn("_bp", lit(1)))
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("line_key", lineKey(col("line")))
      .join(frequent, Seq("line_key"), "left")
      .groupBy("doc_id")
      .agg(
        concat_ws("\n",
          transform(
            filter(
              sort_array(collect_list(struct(col("pos"),
                when(col("_bp").isNull, col("line")).as("line")))),
              s => s.getField("line").isNotNull),
            s => s.getField("line"))).as("cleaned"),
        sum(when(col("_bp").isNull, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("_bp").isNotNull, 1L).otherwise(0L)).as("n_removed"))
  }

  /** Terms most distinctive of each group vs the rest of the corpus:
    * log-odds-ratio with an (uniform) informative Dirichlet prior and a
    * z-score normalization (Monroe, Colaresi & Quinn 2008, "Fightin'
    * Words" §3.5) — the standard corpus-comparison diagnostic ("what
    * does source X over-produce?"). For term w in group i vs rest j:
    * `delta = ln((y_iw+a)/(n_i+a0-y_iw-a)) - ln((y_jw+a)/(n_j+a0-y_jw-a))`,
    * `z = delta / sqrt(1/(y_iw+a) + 1/(y_jw+a))`; top-`k` per group by
    * z (ties → token asc).
    *
    * Shape: one explode→count aggregation on (group, token) with
    * map-side combine (the only corpus-sized shuffle); global token
    * counts re-aggregate that frame (vocab-bounded); per-group totals
    * and the vocab-size row are broadcast. The scoring is a pure
    * projection and the top-k window runs over the vocab×groups count
    * frame, never the corpus.
    */
  def distinctiveTerms(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String, k: Int,
      priorPerTerm: Double = 0.01,
      rankRoundDigits: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(priorPerTerm > 0.0, s"priorPerTerm must be > 0, got $priorPerTerm")
    require(rankRoundDigits.forall(_ >= 0),
      s"rankRoundDigits must be >= 0, got $rankRoundDigits")
    val counts = docs
      .select(col(groupCol).as("grp"),
        explode(filter(split(lower(col(textCol)), "\\s+"), t => t =!= ""))
          .as("token"))
      .groupBy("grp", "token").agg(count(lit(1)).as("y"))
    val globalTok = counts.groupBy("token").agg(sum(col("y")).as("g"))
    val grpTotals = counts.groupBy("grp").agg(sum(col("y")).as("n"))
    val corpus = globalTok.agg(
      count(lit(1)).cast("double").as("v"), sum(col("g")).as("total"))
    val a = lit(priorPerTerm)
    val a0 = col("v") * priorPerTerm
    val yi = col("y").cast("double") + a
    val yj = (col("g") - col("y")).cast("double") + a
    val di = col("n").cast("double") + a0 - yi
    val dj = (col("total") - col("n")).cast("double") + a0 - yj
    val delta = log(yi / di) - log(yj / dj)
    val z = delta / sqrt(lit(1.0) / yi + lit(1.0) / yj)
    val scored = counts
      .join(globalTok, "token")
      .join(broadcast(grpTotals), "grp")
      .crossJoin(broadcast(corpus))
      .select(col("grp"), col("token"), col("y"), col("g"), z.as("z"))
    // Ranking on a pre-rounded z (when requested) makes the top-k cut
    // robust to sub-ULP ln() differences across engines/builds: two
    // tokens with identical (y, g) get bit-identical z either way, but
    // near-ties within half an ULP of a rounding boundary can reorder
    // without the absorb-then-rank. The emitted z column is always the
    // full-precision value; only the rank key is rounded.
    val rankKey = rankRoundDigits match {
      case Some(d) => round(col("z"), d)
      case None    => col("z")
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(rankKey.desc, col("token"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Pointwise-mutual-information collocations over adjacent-token
    * bigrams: scores how much more often `w1 w2` co-occurs than chance,
    * PMI = ln(n_ab·N / (n_a·n_b)) with marginals n_a (bigram-first) and
    * n_b (bigram-second) and N = total bigrams — the classic
    * collocation detector (Church & Hanks 1990) used to find multiword
    * units worth keeping intact during tokenizer/vocab construction.
    *
    * Shape: ONE shuffle of document data (the bigram count); marginals
    * and the total derive from the counted frame (vocab-bounded), so
    * corpus size only enters the first aggregation. `minCount` prunes
    * the hapax tail BEFORE the marginal joins. All factors are cast to
    * double before multiplying (same IEEE order cross-engine; avoids
    * int64 overflow of n_ab·N at corpus scale).
    *
    * Returns (w1, w2, n_ab, n_a, n_b, pmi), one row per surviving
    * bigram. NULL texts contribute nothing.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val bg = docs
      .filter(col(textCol).isNotNull)
      .select(explode(wordShingles(col(textCol), 2)).as("bigram"))
      .select(split(col("bigram"), " ", 2).as("_p"))
      .select(col("_p").getItem(0).as("w1"), col("_p").getItem(1).as("w2"))
    val cab = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
    // one pass over doc data above; everything below is vocab-scale
    val ca = cab.groupBy("w1").agg(sum(col("n_ab")).as("n_a"))
    val cb = cab.groupBy("w2").agg(sum(col("n_ab")).as("n_b"))
    val n = cab.agg(sum(col("n_ab"))).head().getLong(0)
    cab.filter(col("n_ab") >= minCount)
      .join(ca, "w1").join(cb, "w2")
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        log((col("n_ab").cast("double") * lit(n.toDouble))
          / (col("n_a").cast("double") * col("n_b").cast("double"))).as("pmi"))
  }

  /** Zipf-law fit over the token frequency spectrum: OLS of ln(count)
    * against ln(rank) for the top-`topN` tokens. Natural language sits
    * near slope −1; a corpus that drifts far off (template spam:
    * flat head; OCR noise: heavy tail) fails the cheapest health check
    * there is. One token-count shuffle; the ranked fit frame is
    * `topN` rows (TakeOrderedAndProject, then a window over topN only).
    * Returns ONE row (n_fit, slope, r2).
    */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    import org.apache.spark.sql.expressions.Window
    val counts = docs.filter(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(topN)
    counts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("token"))))
      .select(log(col("rank").cast("double")).as("x"),
        log(col("n").cast("double")).as("y"))
      .agg(count(lit(1)).as("n_fit"),
        regr_slope(col("y"), col("x")).as("slope"),
        regr_r2(col("y"), col("x")).as("r2"))
  }

  /** Argmax language guess over the lexicon ratios ("und" if all zero). */
  def langId(text: Column): Column = {
    val ratios = langRatios(text)
    val best = greatest(ratios.map(_._2): _*)
    ratios.foldLeft(when(best === 0.0, "und")) { case (acc, (name, r)) =>
      acc.when(r === best, name.stripSuffix("_ratio"))
    }.otherwise("und")
  }
}
