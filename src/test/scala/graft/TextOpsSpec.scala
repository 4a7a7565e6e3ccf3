package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bm25, Pii, SemDedup, SimilarityJoin, TextAnalysis}

/** BM25 retrieval, PII redaction, Gopher quality rules, and semantic
  * (cluster-bounded) dedup.
  */
class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------- BM25 -------------------------------- //

  test("bm25: hand-computed scores on a tiny corpus") {
    val docs = Seq(
      (0L, "spark is fast"),
      (1L, "spark spark joins"),
      (2L, "rows only here")).toDF("id", "text")
    val out = Bm25.score(docs, "id", "text", Seq("spark"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    // N=3, df=2, idf=ln(1+(3-2+0.5)/2.5)=ln(1.6); dl=3=avgdl so the
    // length norm is exactly k1: score = idf * tf*(k1+1)/(tf+k1)
    val idf = math.log(1.6)
    assert(math.abs(out(0L) - idf * 1 * 2.2 / (1 + 1.2)) < 1e-12)
    assert(math.abs(out(1L) - idf * 2 * 2.2 / (2 + 1.2)) < 1e-12)
    assert(out(2L) == 0.0)
  }

  test("bm25: multi-term scores add and absent terms contribute zero") {
    val docs = Seq((0L, "spark window"), (1L, "spark")).toDF("id", "text")
    val both = Bm25.score(docs, "id", "text", Seq("spark", "window"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    val sOnly = Bm25.score(docs, "id", "text", Seq("spark"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    val wOnly = Bm25.score(docs, "id", "text", Seq("window"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(math.abs(both(0L) - (sOnly(0L) + wOnly(0L))) < 1e-12)
    assert(math.abs(both(1L) - sOnly(1L)) < 1e-12) // no 'window' in doc 1
  }

  test("bm25: topK orders by rounded score desc with id tie-break") {
    val docs = Seq(
      (3L, "spark spark"), (1L, "spark other"), (2L, "spark other"),
      (4L, "nothing")).toDF("id", "text")
    val top = Bm25.topK(docs, "id", "text", Seq("spark"), k = 3)
      .as[(Long, Double)].collect()
    assert(top.map(_._1).toSeq == Seq(3L, 1L, 2L)) // 1 before 2 on tie
    assert(top(1)._2 == top(2)._2)
    assert(top.forall(_._2 > 0.0)) // doc 4 never appears
  }

  test("bm25: empty corpus returns empty frame, not NPE") {
    val docs = Seq.empty[(Long, String)].toDF("id", "text")
    assert(Bm25.score(docs, "id", "text", Seq("spark")).count() == 0L)
  }

  test("bm25: uppercase query terms match the lowercased tokens") {
    val docs = Seq((0L, "Spark is fast"), (1L, "no match")).toDF("id", "text")
    val upper = Bm25.score(docs, "id", "text", Seq("SPARK"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    val lower = Bm25.score(docs, "id", "text", Seq("spark"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(upper == lower && upper(0L) > 0.0)
  }

  test("bm25: NULL text rows score 0 and do not poison the corpus stats") {
    val docs = Seq((0L, "spark rows"), (1L, null)).toDF("id", "text")
    val out = Bm25.score(docs, "id", "text", Seq("spark"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(out(1L) == 0.0 && out(0L) > 0.0)
  }

  // ------------------------------- PII --------------------------------- //

  test("pii: counts and redaction over all four categories") {
    val txt = "mail a@b.io and c.d+e@corp.example.com ip 10.0.0.1 " +
      "call 555-123-4567 ssn 078-05-1120 done"
    val df = Seq((1L, txt)).toDF("id", "text")
      .select(Pii.counts(col("text")).map { case (n, c) => c.as(n) } :+
        Pii.redact(col("text")).as("red"): _*)
    val r = df.collect()(0)
    assert(r.getInt(0) == 2 && r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(r.getString(4) ==
      "mail [EMAIL] and [EMAIL] ip [IP] call [PHONE] ssn [SSN] done")
  }

  test("pii: ssn shape is not claimed by phone and vice versa") {
    val df = Seq((1L, "p 555-123-4567 s 078-05-1120")).toDF("id", "text")
    val r = df.select(Pii.redact(col("text"))).as[String].collect()(0)
    assert(r == "p [PHONE] s [SSN]")
  }

  test("pii: clean text is untouched and hasPii is false") {
    val df = Seq((1L, "plain words with no identifiers at all")).toDF("id", "text")
    val r = df.select(Pii.redact(col("text")).as("red"), Pii.hasPii(col("text")).as("has"))
      .as[(String, Boolean)].collect()(0)
    assert(r._1 == "plain words with no identifiers at all" && !r._2)
  }

  // --------------------------- Gopher rules ---------------------------- //

  test("gopher rules: each rule fires on its crafted violation") {
    val good = (Seq.fill(30)("the quick fox") :+ "ran").mkString(" ") // 91 words
    val docs = Seq(
      (0L, good),
      (1L, "too short the a"),                               // wc_ok=false
      (2L, (Seq.fill(60)("a b# ## #x the is") :+ "").mkString(" ")), // symbols
      (3L, (Seq.fill(60)("77 88 99 11 22 the is") :+ "").mkString(" ")) // non-alpha
    ).toDF("id", "text")
    val out = docs.select(col("id") +:
        TextAnalysis.gopherRules(col("text")).map { case (n, c) => c.as(n) } :+
        TextAnalysis.gopherPass(col("text")).as("pass"): _*)
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(t => t._1 -> t).toMap
    assert(out(0L)._7, "good doc passes all rules")
    assert(!out(1L)._2 && !out(1L)._7, "short doc fails wc_ok")
    assert(!out(2L)._4 && !out(2L)._7, "symbol-heavy doc fails symbol_ok")
    assert(!out(3L)._5 && !out(3L)._7, "digit-word doc fails alpha_ok")
  }

  // --------------------------- unigram LM ------------------------------ //

  test("langmodel: hand-computed smoothed probs and perplexity") {
    import graft.operators.LangModel
    // corpus tokens: a a a b  →  total=4
    val docs = Seq((0L, "a a a b")).toDF("id", "text")
    val lm = LangModel.fitUnigram(docs, "text", vocabSize = 2, alpha = 1.0)
    // denom = 4 + 1*(2+1) = 7; p(a)=4/7, p(b)=2/7, oov=1/7
    assert(math.abs(lm.logProbs("a") - math.log(4.0 / 7)) < 1e-12)
    assert(math.abs(lm.logProbs("b") - math.log(2.0 / 7)) < 1e-12)
    assert(math.abs(lm.oovLogProb - math.log(1.0 / 7)) < 1e-12)
    // doc "a b": ppl = exp(-(ln(4/7)+ln(2/7))/2) = 1/sqrt(8/49)
    val ppl = LangModel.perplexity(Seq((1L, "a b")).toDF("id", "text"), "id", "text", lm)
      .select("perplexity").as[Double].collect()(0)
    assert(math.abs(ppl - 1.0 / math.sqrt(8.0 / 49)) < 1e-12)
  }

  test("langmodel: OOV floor applies, in-vocab text scores lower ppl than noise") {
    import graft.operators.LangModel
    val corpus = Seq((0L, "the cat sat on the mat"), (1L, "the dog sat")).toDF("id", "text")
    val lm = LangModel.fitUnigram(corpus, "text", vocabSize = 4)
    val scored = LangModel.perplexity(
      Seq((0L, "the cat sat"), (1L, "zz qq ww")).toDF("id", "text"), "id", "text", lm)
      .select("id", "perplexity").as[(Long, Double)].collect().toMap
    assert(scored(0L) < scored(1L), s"in-vocab should be lower: $scored")
  }

  test("langmodel: vocab selection is deterministic under count ties") {
    import graft.operators.LangModel
    val docs = Seq((0L, "b a d c")).toDF("id", "text") // all counts tie at 1
    val lm = LangModel.fitUnigram(docs, "text", vocabSize = 2)
    assert(lm.logProbs.keySet == Set("a", "b"), "tie-break by token asc")
  }

  test("langmodel: NULL text scores NULL; empty string is one empty token (OOV)") {
    import graft.operators.LangModel
    val lm = LangModel.fitUnigram(Seq((0L, "a b")).toDF("id", "text"), "text", 2)
    val rows = LangModel.perplexity(
      Seq((1L, null), (2L, "")).toDF("id", "text"), "id", "text", lm)
      .orderBy("id").select("perplexity").collect()
    assert(rows(0).isNullAt(0))
    // split("") == [""] (matches DuckDB string_split_regex): one OOV token
    assert(math.abs(rows(1).getDouble(0) - math.exp(-lm.oovLogProb)) < 1e-12)
  }

  test("bigram lm: hand-computed interpolated perplexity on a tiny corpus") {
    import graft.operators.LangModel
    // corpus: "a b a b" + "a c" — pairs: (a,b)x2, (b,a)x1, (a,c)x1
    val corpus = Seq((0L, "a b a b"), (1L, "a c")).toDF("id", "text")
    val lm = LangModel.fitBigram(corpus, "text",
      vocabSize = 10, maxPairs = 10, alpha = 1.0, lambda = 0.5)
    // unigram: total=6, V=3, denom=6+4=10; p(a)=4/10? counts a=3,b=2,c=1
    assert(lm.pUni == Map("a" -> 0.4, "b" -> 0.3, "c" -> 0.2))
    assert(lm.pOov == 0.1)
    // left totals: a->3 (ab,ab,ac), b->1 (ba)
    val sep = LangModel.PairSep
    assert(lm.ratios == Map(
      s"a${sep}b" -> 2.0 / 3, s"b${sep}a" -> 1.0, s"a${sep}c" -> 1.0 / 3))
    val ppl = LangModel.bigramPerplexity(
        Seq((0L, "a b")).toDF("id", "text"), "id", "text", lm)
      .select("perplexity").as[Double].collect()(0)
    // p(a)=0.4; p(b|a)=0.5*(2/3)+0.5*0.3
    val expected = math.exp(-(math.log(0.4) + math.log(0.5 * (2.0 / 3) + 0.5 * 0.3)) / 2)
    assert(math.abs(ppl - expected) < 1e-12)
  }

  test("bigram lm: maxPairs cap keeps top pairs, dropped pairs fall back to unigram") {
    import graft.operators.LangModel
    val corpus = Seq((0L, "a b a b a c")).toDF("id", "text")
    val lm = LangModel.fitBigram(corpus, "text",
      vocabSize = 10, maxPairs = 1, alpha = 1.0, lambda = 0.5)
    val sep = LangModel.PairSep
    assert(lm.ratios.keySet == Set(s"a${sep}b")) // (a,b) count 2 beats the 1s
    // ratio uses the FULL left total: c(a,*) = 3, so p_ML(b|a) = 2/3
    assert(lm.ratios(s"a${sep}b") == 2.0 / 3)
  }

  test("bigram lm: join-form scoring matches the literal-map form") {
    import graft.operators.LangModel
    val corpus = Seq((0L, "a b a b c d"), (1L, "a c e"), (2L, "b b b a")).toDF("id", "text")
    val lm = LangModel.fitBigram(corpus, "text", vocabSize = 4, maxPairs = 3, 1.0, 0.6)
    val viaMap = LangModel.bigramPerplexity(corpus, "id", "text", lm)
      .as[(Long, Double)].collect().toMap
    val viaJoin = LangModel.bigramPerplexityJoin(corpus, "id", "text", lm)
      .as[(Long, Double)].collect().toMap
    assert(viaMap.keySet == viaJoin.keySet)
    viaMap.foreach { case (id, p) =>
      assert(math.abs(p - viaJoin(id)) < 1e-9, s"doc $id: $p vs ${viaJoin(id)}")
    }
  }

  test("bigram lm: single-token and empty docs score unigram-only / NULL") {
    import graft.operators.LangModel
    val lm = LangModel.fitBigram(
      Seq((0L, "a b")).toDF("id", "text"), "text", 5, 5, 1.0, 0.5)
    val rows = LangModel.bigramPerplexity(
        Seq((1L, "a"), (2L, null)).toDF("id", "text"), "id", "text", lm)
      .orderBy("id").select("perplexity").collect()
    // one token: pure unigram p(a) = (1+1)/(2+3) = 0.4
    assert(math.abs(rows(0).getDouble(0) - 1.0 / 0.4) < 1e-12)
    assert(rows(1).isNullAt(0))
  }

  // ------------------------- inverted index ----------------------------- //

  test("inverted index: sorted postings of distinct containment, df counts") {
    val docs = Seq((2L, "b a b"), (0L, "a c"), (1L, "a")).toDF("id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "id", "text")
      .orderBy("token")
      .as[(String, Seq[Long], Long)].collect().toSeq
    assert(idx == Seq(
      ("a", Seq(0L, 1L, 2L), 3L),  // distinct containment, sorted ids
      ("b", Seq(2L), 1L),          // in-doc repeat counted once
      ("c", Seq(0L), 1L)))
  }

  test("inverted index: maxPostings caps lists to smallest ids, df stays full") {
    val docs = Seq((0L, "a b"), (1L, "a"), (2L, "a c"), (3L, "a")).toDF("id", "text")
    val idx = TextAnalysis.invertedIndex(docs, "id", "text", maxPostings = 2)
      .orderBy("token")
      .as[(String, Seq[Long], Long)].collect().toSeq
    assert(idx == Seq(
      ("a", Seq(0L, 1L), 4L), // postings truncated to 2 smallest; df counts all 4
      ("b", Seq(0L), 1L),
      ("c", Seq(2L), 1L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.invertedIndex(docs, "id", "text", maxPostings = 0)
    }
  }

  test("invertedPostings: relation form matches the array form exploded") {
    val docs = Seq((2L, "b a b"), (0L, "a c"), (1L, "a")).toDF("id", "text")
    val rel = TextAnalysis.invertedPostings(docs, "id", "text")
      .as[(Long, String)].collect().toSet
    val viaArray = TextAnalysis.invertedIndex(docs, "id", "text")
      .select(col("token"), explode(col("postings")).as("doc_id"))
      .as[(String, Long)].collect().map { case (t, d) => (d, t) }.toSet
    assert(rel == viaArray)
    assert(rel == Set((0L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (0L, "c")))
  }

  // ---------------------------- text cleanup ---------------------------- //

  test("cleanText: strips tags, decodes entities once, collapses whitespace") {
    val rows = Seq(
      (0L, "<p>hello <b>world</b></p>"),
      (1L, "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y"),
      (2L, "&amp;lt; stays encoded-once"), // no double decode
      (3L, "  spaced\t\tout \n lines  "),
      (4L, "<div class=\"x\" data-k='v'>attr soup</div>"))
      .toDF("id", "text")
    val out = rows.select($"id", TextAnalysis.cleanText($"text").as("c"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "hello world")
    assert(out(1L) == "a & b <tag> \"q\" 's' x y")
    assert(out(2L) == "&lt; stays encoded-once")
    assert(out(3L) == "spaced out lines")
    assert(out(4L) == "attr soup")
  }

  // ------------------------------ entropy ------------------------------- //

  test("charEntropy: hand-computed nats; uniform > skewed > constant") {
    val docs = Seq(
      (0L, "aaaa"),         // one symbol: entropy 0
      (1L, "abab"),         // two equiprobable: ln 2
      (2L, "aab"),          // 2/3, 1/3
      (3L, "")).toDF("id", "text")
    val out = TextAnalysis.charEntropy(docs, "id", "text")
      .as[(Long, Double)].collect().toMap
    assert(out(0L) == 0.0)
    assert(math.abs(out(1L) - math.log(2)) < 1e-12)
    val p = Seq(2.0 / 3, 1.0 / 3)
    assert(math.abs(out(2L) - -p.map(x => x * math.log(x)).sum) < 1e-12)
    assert(!out.contains(3L)) // zero characters -> no row (unnest semantics)
  }

  // ---------------------------- url canonicalization -------------------- //

  test("urls: normalize handles case, ports, slashes, tracking params, fragments") {
    import graft.operators.Urls
    val cases = Seq(
      (0L, "HTTP://Example.COM:80/a/"),
      (1L, "https://www.example.com:443/a?utm_source=x&q=1&gclid=z#top"),
      (2L, "https://example.com:8443/A/B?b=2&a=1"),
      (3L, "http://example.com/"),
      (4L, "not a url"),
      (5L, "ftp://Files.Example.com:21/x"))
      .toDF("id", "url")
    val out = cases.select($"id", Urls.normalize($"url").as("n"), Urls.domain($"url").as("d"))
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(0L) == (("http://example.com/a", "example.com")))
    assert(out(1L) == (("https://www.example.com/a?q=1", "example.com")))
    assert(out(2L) == (("https://example.com:8443/A/B?b=2&a=1", "example.com"))) // order kept
    assert(out(3L) == (("http://example.com/", "example.com"))) // root slash survives
    assert(out(4L)._1 == "")
    assert(out(5L) == (("ftp://files.example.com:21/x", "files.example.com")))
  }

  test("urls: normalize is idempotent across a combinatorial URL space") {
    import graft.operators.Urls
    val variants = for {
      scheme <- Seq("http", "HTTPS", "ftp")
      host <- Seq("Example.com", "WWW.a-b.ORG", "x.io")
      port <- Seq("", ":80", ":443", ":8080")
      path <- Seq("", "/", "/A/b", "/A/b/")
      query <- Seq("", "?utm_source=x", "?a=1&utm_medium=m&b=2", "?gclid=g")
      frag <- Seq("", "#f")
    } yield s"$scheme://$host$port$path$query$frag"
    val df = variants.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val bad = df
      .select(Urls.normalize($"url").as("once"))
      .select($"once", Urls.normalize($"once").as("twice"))
      .filter($"once" =!= $"twice")
      .count()
    assert(bad == 0, s"$bad of ${variants.size} URLs changed on re-normalization")
  }

  test("charEntropy bounds: 0 <= H <= ln(distinct chars) on real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ent = TextAnalysis.charEntropy(docs, "doc_id", "text")
    val withBound = docs
      .select($"doc_id",
        size(array_distinct(filter(split($"text", ""), c => c =!= ""))).as("d"))
      .join(ent, "doc_id")
    val viol = withBound
      .filter($"entropy" < -1e-12 || $"entropy" > log($"d".cast("double")) + 1e-12)
      .count()
    assert(viol == 0)
  }

  // ------------------------------ tf-idf -------------------------------- //

  test("tfidf: hand-computed weights (sklearn smooth idf) on a tiny corpus") {
    val docs = Seq(
      (0L, "a a b"),
      (1L, "a c"),
      (2L, "c c c")).toDF("id", "text")
    val out = operators.Tfidf.tfidf(docs, "id", "text")
      .as[(Long, String, Long, Long, Double)].collect()
      .map { case (d, t, tf, df, w) => (d, t) -> ((tf, df, w)) }.toMap
    def idf(df: Long) = math.log(4.0 / (df + 1.0)) + 1.0 // N=3
    assert(out((0L, "a")) == ((2L, 2L, 2 * idf(2))))
    assert(out((0L, "b")) == ((1L, 1L, 1 * idf(1))))
    assert(out((1L, "a")) == ((1L, 2L, 1 * idf(2))))
    assert(out((2L, "c")) == ((3L, 2L, 3 * idf(2))))
    assert(out.size == 5)
  }

  test("tfidf topTerms: per-doc cap, tfidf-desc token-asc order") {
    val docs = Seq((0L, "a a b b c"), (1L, "x")).toDF("id", "text")
    val top = operators.Tfidf.topTerms(docs, "id", "text", k = 2)
      .select("doc_id", "token", "rank")
      .as[(Long, String, Int)].collect().toSet
    // doc 0: a and b tie on tf=2/df=1 -> token asc breaks the tie
    assert(top == Set((0L, "a", 1), (0L, "b", 2), (1L, "x", 1)))
    intercept[IllegalArgumentException] {
      operators.Tfidf.topTerms(docs, "id", "text", k = 0)
    }
  }

  test("bm25: fit once / scoreWith is a pure projection using fitted stats") {
    val corpus = Seq(
      (0L, "spark is fast"),
      (1L, "spark spark joins"),
      (2L, "rows only here")).toDF("id", "text")
    val stats = Bm25.fit(corpus, "id", "text", Seq("spark"))
    assert(stats.n == 3L && stats.df == Seq(2L) && math.abs(stats.avgdl - 3.0) < 1e-12)

    // scoring the fitted corpus reproduces the one-shot score() exactly
    val oneShot = Bm25.score(corpus, "id", "text", Seq("spark"))
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    val reused = Bm25.scoreWith(corpus, "id", "text", stats)
      .select("id", "bm25").as[(Long, Double)].collect().toMap
    assert(oneShot == reused)

    // scoring a NEW batch uses the FITTED stats (idf from corpus df=2,
    // n=3), not statistics of the batch — the no-re-scan semantics
    val batch = Seq((10L, "spark spark spark")).toDF("id", "text")
    val b = Bm25.scoreWith(batch, "id", "text", stats)
      .select("bm25").as[Double].head()
    val idf = math.log(1.6) // ln(1+(3-2+0.5)/2.5) from the corpus fit
    assert(math.abs(b - idf * 3 * 2.2 / (3 + 1.2 * (0.25 + 0.75 * 3.0 / 3.0))) < 1e-12)

    // and the scoring plan is a single scan-projection: no aggregate
    // (stats are literals) and no exchange — the corpus is NOT re-read
    val plan = Bm25.scoreWith(batch, "id", "text", stats)
      .queryExecution.executedPlan.toString.toLowerCase(java.util.Locale.ROOT)
    assert(!plan.contains("aggregate"), s"stats recomputed in:\n$plan")
    assert(!plan.contains("exchange"), s"unexpected shuffle in:\n$plan")

    // topKWith ranks with the same fitted stats
    val top = Bm25.topKWith(corpus, "id", "text", stats, 2)
      .select("id").as[Long].collect().toSeq
    assert(top == Seq(1L, 0L))
  }

  test("bm25: all-NULL-text corpus scores 0, not NaN (avgdl=0 guard)") {
    val docs = Seq((0L, null: String), (1L, null: String)).toDF("id", "text")
    val out = Bm25.score(docs, "id", "text", Seq("spark"))
      .select("bm25").as[Double].collect()
    assert(out.length == 2 && out.forall(_ == 0.0))
    val stats = Bm25.fit(docs, "id", "text", Seq("spark"))
    assert(stats.avgdl == 0.0)
    val re = Bm25.scoreWith(docs, "id", "text", stats)
      .select("bm25").as[Double].collect()
    assert(re.length == 2 && re.forall(_ == 0.0))
  }

  // ----------------------- incremental dedup --------------------------- //

  test("incrementalExactDedup: drops corpus collisions and in-batch dups") {
    import graft.operators.Dedup
    val corpus = Seq((0L, "alpha"), (1L, "beta")).toDF("id", "text")
    val batch = Seq(
      (10L, "alpha"),  // collides with corpus → dropped
      (11L, "gamma"),  // fresh → kept
      (12L, "gamma"),  // in-batch dup of 11 → dropped (keep-min)
      (13L, "delta")   // fresh → kept
    ).toDF("id", "text")
    val kept = Dedup.incrementalExactDedup(corpus, batch, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(11L, 13L))
  }

  test("langmodel: empty corpus fits the degenerate all-OOV model, not NPE") {
    import graft.operators.LangModel
    val lm = LangModel.fitUnigram(
      Seq.empty[(Long, String)].toDF("id", "text"), "text", 5)
    assert(lm.logProbs.isEmpty)
    assert(lm.oovLogProb == 0.0) // p_oov = alpha/(0 + alpha*1) = 1
  }

  test("incrementalExactDedupByHashes: persisted hash frame gives the same result") {
    import graft.operators.Dedup
    val corpus = Seq((0L, "alpha"), (1L, "beta")).toDF("id", "text")
    val batch = Seq((10L, "alpha"), (11L, "gamma")).toDF("id", "text")
    val hashes = Dedup.corpusContentHashes(corpus, "text")
    val viaHashes = Dedup.incrementalExactDedupByHashes(hashes, batch, "id", "text")
      .select("id").as[Long].collect().toSet
    val viaText = Dedup.incrementalExactDedup(corpus, batch, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(viaHashes == viaText && viaHashes == Set(11L))
  }

  test("incrementalExactDedup: empty corpus degenerates to exactDedup") {
    import graft.operators.Dedup
    val corpus = Seq.empty[(Long, String)].toDF("id", "text")
    val batch = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "text")
    val kept = Dedup.incrementalExactDedup(corpus, batch, "id", "text")
      .select("id").as[Long].collect().toSet
    val plain = Dedup.exactDedup(batch, "id", "text")
      .select("id").as[Long].collect().toSet
    assert(kept == plain && kept == Set(1L, 3L))
  }

  // ---------------------------- SemDedup ------------------------------- //

  private def embFixture = {
    val rnd = new scala.util.Random(7)
    // two tight point clouds + uniform noise so near-dup pairs exist
    (0 until 60).map { i =>
      val base = if (i % 3 == 0) Array.fill(8)(1.0f)
        else if (i % 3 == 1) Array.fill(8)(-1.0f)
        else Array.fill(8)(rnd.nextFloat() * 2 - 1)
      (i.toLong, base.map(x => x + rnd.nextFloat() * 0.05f))
    }.toDF("id", "vec")
  }

  test("semdedup: nClusters=1 degenerates to the exact pair set") {
    val emb = embFixture
    val sem = SemDedup.semanticNearDupPairs(emb, "id", "vec", 0.9, nClusters = 1)
      .select($"a_id", $"b_id", round($"sim".cast("double"), 5).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    val exact = SimilarityJoin.cosineNearDupPairs(emb, "id", "vec", 0.9)
      .select($"a_id", $"b_id", round($"sim".cast("double"), 5).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    assert(sem == exact && exact.nonEmpty)
  }

  test("semdedup: clustered pairs are a subset of exact pairs, same sims") {
    val emb = embFixture
    val sem = SemDedup.semanticNearDupPairs(emb, "id", "vec", 0.9, nClusters = 4)
      .select($"a_id", $"b_id", round($"sim".cast("double"), 5).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    val exact = SimilarityJoin.cosineNearDupPairs(emb, "id", "vec", 0.9)
      .select($"a_id", $"b_id", round($"sim".cast("double"), 5).as("s"))
      .as[(Long, Long, Double)].collect().toSet
    assert(sem.nonEmpty && sem.subsetOf(exact))
  }

  test("semdedup: keep drops exactly the higher id of each surviving pair") {
    val emb = embFixture
    val kept = SemDedup.semanticDedupKeep(emb, "id", "vec", 0.9, nClusters = 4)
      .select("id").as[Long].collect().toSet
    val pairs = SemDedup.semanticNearDupPairs(emb, "id", "vec", 0.9, nClusters = 4)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val dropped = pairs.map(_._2).toSet
    assert(kept == (0L until 60L).toSet -- dropped)
    assert(pairs.map(_._1).exists(kept), "at least one pair's keeper survives")
  }

  // --------------------- boilerplate stripping ------------------------- //

  test("boilerplate: frequent lines removed, order kept, counts right") {
    val docs = (0L until 12L).map { i =>
      (i, s"NAV BAR\nbody text $i\n  nav   bar  \nunique-$i\nFooter ${i % 2}")
    }.toDF("id", "text")
    // 'nav bar' appears in all 12 docs twice (df=12, counted once per
    // doc, case/space-folded); 'footer 0'/'footer 1' df=6 each.
    val out = TextAnalysis.stripBoilerplate(docs, "id", "text", minDf = 5)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 12)
    out.foreach { case (id, cleaned, nKept, nRemoved) =>
      assert(cleaned == s"body text $id\nunique-$id")
      assert(nKept == 2 && nRemoved == 3)
    }
  }

  test("boilerplate: df counts distinct docs; all-boilerplate doc yields ''") {
    val docs = Seq(
      (0L, "same\nsame\nsame"), (1L, "same"), (2L, "same\nother")
    ).toDF("id", "text")
    // 'same' df = 3 docs (repeats inside doc 0 count once)
    val df3 = TextAnalysis.lineDocFreq(docs, "id", "text")
      .as[(String, Long)].collect().toMap
    assert(df3.values.toSet == Set(3L, 1L))
    val out = TextAnalysis.stripBoilerplate(docs, "id", "text", minDf = 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((0L, "", 0L, 3L)))
    assert(out(1) == ((1L, "", 0L, 1L)))
    assert(out(2) == ((2L, "other", 1L, 1L)))
  }

  // ----------------------- distinctive terms --------------------------- //

  test("distinctive terms: z matches a scalar reimplementation") {
    val docs = Seq(
      (0L, "a", "x x y common"), (1L, "a", "x common"),
      (2L, "b", "z z common"), (3L, "b", "y z common")
    ).toDF("id", "src", "text")
    val out = TextAnalysis.distinctiveTerms(docs, "src", "text", k = 10)
      .select("grp", "token", "y", "g", "z")
      .as[(String, String, Long, Long, Double)].collect()
    // scalar reference: same formula, independent arithmetic path
    val counts = Map(("a","x")->3L, ("a","y")->1L, ("a","common")->2L,
      ("b","z")->3L, ("b","y")->1L, ("b","common")->2L)
    val g = counts.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val n = counts.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val v = g.size.toDouble; val total = g.values.sum; val a = 0.01; val a0 = v * a
    out.foreach { case (grp, token, y, gg, z) =>
      assert(y == counts((grp, token)) && gg == g(token))
      val yi = y.toDouble + a
      val yj = (gg - y).toDouble + a
      val di = n(grp).toDouble + a0 - yi
      val dj = (total - n(grp)).toDouble + a0 - yj
      val want = (math.log(yi / di) - math.log(yj / dj)) /
        math.sqrt(1.0 / yi + 1.0 / yj)
      assert(math.abs(z - want) < 1e-12, s"($grp,$token): $z vs $want")
    }
    // 'x' is the most a-distinctive, 'z' the most b-distinctive
    val top = out.groupBy(_._1).map { case (s, rs) => s -> rs.maxBy(_._5)._2 }
    assert(top == Map("a" -> "x", "b" -> "z"))
  }

  test("distinctive terms: ranks capped at k, ties break on token") {
    val docs = Seq((0L, "a", "p q"), (1L, "b", "p q")).toDF("id", "src", "text")
    // p and q are symmetric within each group -> identical z, token order
    val out = TextAnalysis.distinctiveTerms(docs, "src", "text", k = 2)
      .select("grp", "token", "rank").as[(String, String, Int)].collect()
      .groupBy(_._1).map { case (s, rs) =>
        s -> rs.sortBy(_._3).map(_._2).toList }
    assert(out == Map("a" -> List("p", "q"), "b" -> List("p", "q")))
  }

  // ---------------------- quality classifier --------------------------- //

  test("quality model: separable weak labels are learned, loss decreases") {
    import graft.operators.QualityModel
    val docs = (0 until 80).map { i =>
      if (i % 2 == 0) (i.toLong, "clear helpful prose with structure and depth", 1)
      else (i.toLong, "spam spam buy now click here", 0)
    }.toDF("id", "text", "y")
    val (model, losses) = QualityModel.fit(docs, "text", "y", iters = 8, lr = 1.0)
    assert(losses.size == 8)
    assert(losses.sliding(2).forall(p => p(1) < p(0) + 1e-12),
      s"loss not decreasing: $losses")
    val scored = QualityModel.score(docs, "text", model)
      .select($"y", $"quality_prob").as[(Int, Double)].collect()
    scored.foreach { case (y, p) =>
      assert(p > 0.0 && p < 1.0)
      assert(if (y == 1) p > 0.5 else p < 0.5, s"label $y scored $p")
    }
  }

  test("quality model: score is deterministic and feature-order pinned") {
    import graft.operators.QualityModel
    val docs = Seq((0L, "u v w v u"), (1L, "x y")).toDF("id", "text")
    val feats = docs.select(QualityModel.featureIds($"text").as("f"))
      .as[Seq[Int]].collect()
    feats.foreach { fs =>
      assert(fs == fs.sorted && fs == fs.distinct, "sorted distinct ids")
      assert(fs.forall(f => f >= 0 && f < 4096))
    }
    // repeated tokens/bigrams collapse: 'u v w v u' has unigrams {u,v,w}
    // and bigrams {u v, v w, w v, v u} -> 7 distinct collision-free ids
    assert(feats(0).size == 7)
    assert(feats(1).size == 3)
  }

  test("domain rollup and quality filter: site-level keep/drop") {
    import graft.operators.Urls
    val docs = Seq(
      (0L, "https://www.good.com/a", 100L), (1L, "https://good.com/b", 200L),
      (2L, "http://bad.org/x", 10L), (3L, "https://BAD.org:443/y", 20L)
    ).toDF("id", "url", "score")
    val roll = Urls.domainRollup(docs, "url", "score")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(roll == Map("good.com" -> ((2L, 150.0)), "bad.org" -> ((2L, 15.0))))
    val kept = Urls.filterByDomainQuality(docs, "url", "score", minAvg = 100.0)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L))
  }

  test("boilerplate: below-threshold lines all survive verbatim") {
    val docs = Seq((0L, "a\nb"), (1L, "c\nd")).toDF("id", "text")
    val out = TextAnalysis.stripBoilerplate(docs, "id", "text", minDf = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((0L, "a\nb", 2L, 0L)))
    assert(out(1) == ((1L, "c\nd", 2L, 0L)))
  }

  test("zipfFit: OLS slope/r2 match a scalar fit; exact power law gives -1, r2=1") {
    // counts 8,4,2,1 over ranks 1..4
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c")
      ++ Seq("d")).mkString(" ")
    val docs = Seq((0L, text)).toDF("id", "text")
    val Seq((n, slope, r2)) = TextAnalysis.zipfFit(docs, "text", topN = 4)
      .as[(Long, Double, Double)].collect().toSeq
    assert(n == 4L)
    val xs = (1 to 4).map(i => math.log(i.toDouble))
    val ys = Seq(8, 4, 2, 1).map(c => math.log(c.toDouble))
    val (mx, my) = (xs.sum / 4, ys.sum / 4)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val vx = xs.map(x => (x - mx) * (x - mx)).sum
    val vy = ys.map(y => (y - my) * (y - my)).sum
    assert(math.abs(slope - cov / vx) < 1e-9)
    assert(math.abs(r2 - cov * cov / (vx * vy)) < 1e-9)
    // counts proportional to 1/rank -> slope exactly -1, perfect fit
    val zipfy = (1 to 6).flatMap(r => Seq.fill(60 / r)(s"w$r")).mkString(" ")
    val Seq((_, s1, q1)) = TextAnalysis.zipfFit(
        Seq((0L, zipfy)).toDF("id", "text"), "text", topN = 6)
      .as[(Long, Double, Double)].collect().toSeq
    assert(math.abs(s1 + 1.0) < 1e-9 && math.abs(q1 - 1.0) < 1e-9)
  }

  test("pmi collocations: hand-computed scores, marginals, minCount floor") {
    // bigrams: (a,b)x2, (b,a), (a,c); N=4; n_a: a->3 b->1; n_b: b->2 a->1 c->1
    val docs = Seq((0L, "a b a b"), (1L, "a c"), (2L, null: String))
      .toDF("id", "text")
    val out = TextAnalysis.pmiCollocations(docs, "text", minCount = 1)
      .select("w1", "w2", "n_ab", "n_a", "n_b", "pmi")
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.size == 3)
    val (_, _, nab, na, nb, pmiAb) = out(("a", "b"))
    assert(nab == 2L && na == 3L && nb == 2L)
    assert(math.abs(pmiAb - math.log(2.0 * 4.0 / (3.0 * 2.0))) < 1e-12)
    assert(math.abs(out(("b", "a"))._6 - math.log(4.0)) < 1e-12)
    assert(math.abs(out(("a", "c"))._6 - math.log(4.0 / 3.0)) < 1e-12)
    // minCount floor prunes singletons but keeps their mass in marginals
    val floored = TextAnalysis.pmiCollocations(docs, "text", minCount = 2)
      .select("w1", "w2", "n_a").as[(String, String, Long)].collect()
    assert(floored.toSeq == Seq(("a", "b", 3L)))
  }

  test("topVocab / oovStats: frequency-ranked vocab, per-group OOV mass") {
    val docs = Seq(
      ("s1", "the cat sat on the mat"),
      ("s1", "the dog sat"),
      ("s2", "a rare QUOKKA leaps")).toDF("source", "text")
    // freqs: the=3 sat=2 a=1 cat=1 dog=1 leaps=1 mat=1 on=1 quokka=1 rare=1
    val v = TextAnalysis.topVocab(docs, "text", 2)
      .as[(String, Long)].collect().toSeq
    assert(v == Seq(("the", 3L), ("sat", 2L)))
    // tie at freq 1 breaks on token asc
    val v4 = TextAnalysis.topVocab(docs, "text", 4)
      .as[(String, Long)].collect().toSeq
    assert(v4 == Seq(("the", 3L), ("sat", 2L), ("a", 1L), ("cat", 1L)))
    val o = TextAnalysis.oovStats(docs, "source", "text",
        TextAnalysis.topVocab(docs, "text", 2))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // s1: 9 tokens, in-vocab the(3)+sat(2)=5 -> 4 OOV over {cat,on,mat,dog}
    assert(o("s1") == ("s1", 9L, 4L, 4L))
    // s2: 4 tokens all OOV (lowercased quokka distinct)
    assert(o("s2") == ("s2", 4L, 4L, 4L))
  }
  test("bm25 topKBatch: each query equals its solo topK run") {
    import graft.operators.Bm25
    val docs = Seq(
      (1L, "spark window merge"), (2L, "spark spark vector"),
      (3L, "window window window"), (4L, "plain filler text"),
      (5L, "vector spark")).toDF("id", "text")
    val batch = Bm25.topKBatch(docs, "id", "text",
        Seq(7L -> Seq("spark"), 8L -> Seq("window", "vector")), k = 3)
      .select($"qid", $"id", $"bm25", $"rank")
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._4).map(r => (r._2, r._3)).toSeq }
    def solo(terms: Seq[String]) = Bm25.topK(docs, "id", "text", terms, 3)
      .as[(Long, Double)].collect().toSeq
    assert(batch(7L) == solo(Seq("spark")))
    assert(batch(8L) == solo(Seq("window", "vector")))
    intercept[IllegalArgumentException](
      Bm25.topKBatch(docs, "id", "text", Seq(1L -> Seq("a"), 1L -> Seq("b")), 3))
  }

  test("bm25 scores are bit-equal across repartitionings (order-pinned fold)") {
    import graft.operators.Bm25
    // many multi-term matches so an unpinned shuffle sum WOULD have
    // partition-dependent addition order
    val base = (1L to 60L).map(i =>
      (i, s"w${i % 7} w${i % 5} common w${i % 3} pad${i % 11} common"))
      .toDF("id", "text")
    val queries = Seq(0L -> Seq("common", "w1", "w2", "w4", "pad3"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Bm25.topKBatch(df, "id", "text", queries, k = 60)
        .select($"qid", $"id", $"bm25", $"rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(_._2).toSeq
    val a = run(base.coalesce(1))
    val b = run(base.repartition(13))
    val c = run(base.repartition(3, col("id")))
    // raw double bit patterns, not just rounded display equality
    def bits(rs: Seq[(Long, Long, Double, Int)]) =
      rs.map(r => (r._1, r._2, java.lang.Double.doubleToLongBits(r._3), r._4))
    assert(bits(a) == bits(b), "13-way repartition changed a score bit")
    assert(bits(a) == bits(c), "hash repartition changed a score bit")
  }

  // ------------------------ sparse retrieval --------------------------- //

  test("sparse retrieval: hand-computed dot products, inner-join semantics") {
    import graft.operators.SparseRetrieval
    val docs = Seq(
      (0L, "spark spark window"), // spark:2 window:1
      (1L, "window merge"),       // window:1 merge:1
      (2L, "plain filler"),       // no overlap with the query
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val dp = SparseRetrieval.tfPostings(docs, "id", "text")
    // query: spark:1 window:2 → score(0)=2·1+1·2=4, score(1)=1·2=2
    val qp = Seq((9L, "spark", 1.0), (9L, "window", 2.0))
      .toDF("id", "term", "weight")
    val out = SparseRetrieval.topKDot(dp, qp, k = 10)
      .select($"qid", $"id", $"rank", $"score")
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(out.toSeq == Seq((9L, 0L, 1, 4.0), (9L, 1L, 2, 2.0)))
    // doc 2 (zero overlap) and doc 3 (NULL text) never appear
    intercept[IllegalArgumentException](SparseRetrieval.topKDot(dp, qp, k = 0))
  }

  test("sparse retrieval: impact pruning caps posting lists, deterministic ties") {
    import graft.operators.SparseRetrieval
    val postings = Seq(
      (0L, "t", 3.0), (1L, "t", 2.0), (2L, "t", 2.0), (3L, "t", 1.0),
      (0L, "u", 5.0)).toDF("id", "term", "weight")
    val pruned = SparseRetrieval.prunePostings(postings, p = 2)
      .as[(Long, String, Double)].collect().toSet
    // 't' keeps weight-3 id 0 and the tie at weight 2 broken by id → id 1;
    // 'u' is shorter than p and survives whole
    assert(pruned == Set((0L, "t", 3.0), (1L, "t", 2.0), (0L, "u", 5.0)))
    intercept[IllegalArgumentException](SparseRetrieval.prunePostings(postings, 0))
  }

  test("sparse retrieval: array-form postings validate arity and drop zeros") {
    import graft.operators.SparseRetrieval
    val ok = Seq((0L, Seq(3, 7), Seq(1.5f, 0.0f))).toDF("id", "idx", "w")
    val rows = SparseRetrieval.postingsFromArrays(ok, "id", "idx", "w")
      .as[(Long, Int, Double)].collect().toSeq
    assert(rows == Seq((0L, 3, 1.5))) // the 0-weight posting is dropped
    val bad = Seq((0L, Seq(3, 7), Seq(1.5f))).toDF("id", "idx", "w")
    intercept[Exception](
      SparseRetrieval.postingsFromArrays(bad, "id", "idx", "w").collect())
  }
}
