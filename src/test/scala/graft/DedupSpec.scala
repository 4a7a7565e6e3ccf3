package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Recall/containment checks for the approximate dedup operators against
  * their exact counterparts on real document data.
  */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .filter($"doc_id" < 200).cache()

  test("portable minhash-LSH: precision 1.0, strong-pair recall, values exact") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .select($"a_id", $"b_id", round($"jaccard", 6).as("j"))
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val port = Dedup.minHashLshPairsPortable(docs, "doc_id", "text",
        numHashes = 32, bands = 8, verifyThreshold = 0.5)
      .select($"a_id", $"b_id", round($"jaccard", 6).as("j"))
      .as[(Long, Long, Double)].collect()
    assert(port.nonEmpty, "portable LSH found no pairs at all")
    // exact-verified: every surviving pair is an exact pair with the
    // identical jaccard value (precision 1.0 by construction)
    port.foreach { case (a, b, j) =>
      assert(exact.get((a, b)).contains(j), s"($a,$b,$j) not in exact pairs")
    }
    // same S-curve knobs as the kernel family: strong pairs must survive
    val strong = exact.filter(_._2 >= 0.8).keySet
    if (strong.nonEmpty) {
      val got = port.map(p => (p._1, p._2)).toSet
      val recall = strong.count(got).toDouble / strong.size
      assert(recall >= 0.8, s"portable recall $recall on ${strong.size} strong pairs")
    }
  }

  test("minhash-LSH pairs are a subset of exact Jaccard pairs (precision 1.0)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshPairs(docs, "doc_id", "text",
        numHashes = 32, bands = 8, verifyThreshold = 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // verification step guarantees precision 1.0
    assert(lsh.subsetOf(exact), s"LSH produced non-pairs: ${lsh.diff(exact).take(5)}")
    // banding at (8 bands × 4 rows) has S-curve threshold ~0.59; at
    // J >= 0.7 candidate recall should be high
    val strong = Dedup.jaccardPairs(docs, "doc_id", "text", 0.7)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    if (strong.nonEmpty) {
      val recall = lsh.intersect(strong).size.toDouble / strong.size
      assert(recall >= 0.8, s"recall $recall on ${strong.size} strong pairs")
    }
  }

  test("simhash pairs all satisfy the hamming bound and are symmetric-free") {
    val pairs = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    assert(pairs.forall(p => p._3 <= 3 && p._1 < p._2))
    // no duplicate pairs from multi-block collisions
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
  }

  test("softDedupWeights: group mass normalizes, alpha tiers, bad alpha rejected") {
    val d = Seq((1L, "same"), (2L, "same"), (3L, "same"), (4L, "same"),
      (5L, "unique")).toDF("id", "t")
    val w = Dedup.softDedupWeights(d, "id", "t")
      .select($"id", $"n_copies", $"weight")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(w(1L)._2 == 4L && w(1L)._3 == 0.25)
    assert(w(5L)._3 == 1.0)
    // alpha = 1: every dup group contributes exactly unit total mass
    assert(math.abs(w.values.map(_._3).sum - 2.0) < 1e-12)
    // alpha = 0.5: 1/sqrt(4) = 0.5 per copy
    val h = Dedup.softDedupWeights(d, "id", "t", alpha = 0.5)
      .filter($"id" === 1L).select($"weight").as[Double].head()
    assert(h == 0.5)
    intercept[IllegalArgumentException] {
      Dedup.softDedupWeights(d, "id", "t", alpha = 0.7)
    }
  }

  test("keepBestNormalized: highest-score row wins its group, ties break to lowest id") {
    // augment the fixture: doc 90000 is a whitespace re-encoding of doc 0
    // with a higher quality score — the case where "first crawled" is the
    // wrong winner and min-id keep policies pick the worse copy
    val base = docs.select($"doc_id", $"text", $"n_chars")
    val variant = base.filter($"doc_id" === 0)
      .select(lit(90000L).as("doc_id"), concat($"text", lit("   ")).as("text"),
        ($"n_chars" + 100).as("n_chars"))
    val aug = base.unionByName(variant)
    val kept = Dedup.keepBestNormalized(aug, "doc_id", "text", "n_chars")
      .select($"content_hash".as[String], $"keep_id".as[Long],
        $"best_score".as[Long], $"n_copies".as[Long]).collect()
    val groups = aug
      .select(Dedup.normalizedContentHash($"text").as("h"), $"doc_id", $"n_chars")
      .as[(String, Long, Long)].collect().groupBy(_._1)
    assert(kept.length == groups.size)
    kept.foreach { case (h, keepId, best, n) =>
      val g = groups(h)
      assert(n == g.length)
      assert(best == g.map(_._3).max)
      // argmax by (score desc, id asc)
      assert(keepId == g.filter(_._3 == best).map(_._2).min)
    }
    // the doctored group proves the policy diverges from min-id
    val minIdWinners = groups.map { case (h, g) => h -> g.map(_._2).min }
    assert(kept.exists { case (h, keepId, _, _) => keepId != minIdWinners(h) },
      "quality policy never diverged from min-id — variant row not grouped?")
  }

  test("portable simhash: identical docs pair at hamming 0, invariants hold") {
    val pairs = Dedup.simHashPairsPortable(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Long)].collect()
    assert(pairs.forall(p => p._3 <= 3 && p._1 < p._2))
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
    // the fixture's exact duplicates (identical text => identical
    // signature) must surface at hamming 0
    val dupPair = docs.select($"doc_id".as[Long], $"text".as[String]).collect()
      .groupBy(_._2).values.filter(_.length > 1)
      .map(g => (g.map(_._1).min, g.map(_._1).sorted.apply(1))).headOption
    dupPair.foreach { case (a, b) =>
      assert(pairs.exists(p => p._1 == a && p._2 == b && p._3 == 0L),
        s"exact duplicate ($a,$b) not found at hamming 0")
    }
  }

  test("ngramContamination: hashed and string shingle keys agree; self-contamination is total") {
    val corpus = docs.filter($"doc_id" >= 20 && $"doc_id" < 100)
    val bench = docs.filter($"doc_id" < 20)
    def rows(hashKeys: Boolean) = Dedup.ngramContamination(
        corpus, "doc_id", "text", bench, "doc_id", "text",
        n = 3, minOverlapFraction = 0.3, hashKeys = hashKeys)
      .as[(Long, Long, Long, Double)].collect().toSet
    val str = rows(hashKeys = false)
    val hsh = rows(hashKeys = true)
    assert(str == hsh, "64-bit shingle fingerprints must not change the result")
    assert(str.nonEmpty, "fixture slices must overlap")
    // a benchmark doc checked against itself overlaps on every shingle
    val self = Dedup.ngramContamination(
        bench, "doc_id", "text", bench, "doc_id", "text",
        n = 3, minOverlapFraction = 0.99)
      .filter($"corpus_id" === $"bench_id")
    assert(self.count() == bench.count())
    assert(self.filter($"frac" =!= 1.0).count() == 0)
  }

  test("giant LSH buckets emit bounded hub-star candidates, cluster intact") {
    // 500 near-identical docs (one varying token) + a distinct tail:
    // the identical group lands in one bucket per band, which above the
    // threshold must produce O(m) hub links instead of O(m^2) pairs
    val giant = spark.range(0, 500)
      .selectExpr("id AS doc_id",
        "concat('alpha beta gamma delta epsilon zeta eta theta iota kappa rep', id % 3) AS text")
    val tail = spark.range(500, 560)
      .selectExpr("id AS doc_id",
        "concat('totally different content number ', id, ' with unique words w', id) AS text")
    val docs = giant.union(tail)
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 8, verifyThreshold = 0.5,
      giantBucketThreshold = 100)
    val n = pairs.count()
    // all-pairs would be ~125k; hub-star bounds it near m per band
    assert(n >= 499, s"hub links must cover the giant group, got $n")
    assert(n < 5000, s"candidates must stay O(m), got $n")
    // the giant group still collapses to ONE component via the hub
    val comps = Dedup.connectedComponents(docs, "doc_id", pairs)
    val giantComps = comps.filter($"id" < 500)
      .select("comp").distinct().count()
    assert(giantComps == 1, "hub links must keep the giant cluster connected")
    // precision 1.0: every emitted pair really clears the threshold
    assert(pairs.filter($"jaccard" < 0.5).count() == 0)
  }

  test("connectedComponents matches an independent union-find") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
    val edges = pairs.select($"a_id", $"b_id").as[(Long, Long)].collect()
    val ids = docs.select($"doc_id").as[Long].collect()
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i).toSeq: _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = ids.map(i => i -> find(i)).toMap // root = component min by construction
    val got = Dedup.connectedComponents(docs, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(got.size == ids.length, "every node labeled, singletons included")
  }

  test("connectedComponents converges in O(log n) rounds on a chain graph") {
    // a 256-node path is the worst case for min-label propagation
    // (rounds = diameter = 255); alternating large-star/small-star must
    // collapse it logarithmically
    val n = 256
    val chain = spark.range(0, n - 1)
      .selectExpr("id AS a_id", "id + 1 AS b_id")
    val nodes = spark.range(0, n).selectExpr("id AS doc_id")
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(nodes, "doc_id", chain)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), "one component rooted at the minimum id")
    assert(rounds <= 2 * (math.log(n) / math.log(2)).ceil.toInt + 2,
      s"expected O(log n) rounds, got $rounds for a $n-node chain")
  }

  test("connectedComponents ignores pair ids absent from the node set") {
    // edges through a foreign id (3) must neither bridge the two nodes
    // nor donate 3 as a label — the contract is over `nodes` only
    val nodes = Seq(5L, 6L).toDF("doc_id")
    val pairs = Seq((5L, 3L), (3L, 6L)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(nodes, "doc_id", pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 6L))
  }

  test("exact dedup is idempotent and loses no distinct content") {
    val once = Dedup.exactDedup(docs, "doc_id", "text").cache()
    val twice = Dedup.exactDedup(once, "doc_id", "text")
    assert(once.count() == twice.count())
    assert(once.select(md5($"text")).distinct().count() ==
      docs.select(md5($"text")).distinct().count())
  }

  test("incrementalNearDupPairs: batch matches corpus near-dups via persisted bands") {
    val corpus = docs.filter($"doc_id" < 200)
    // batch: near-copies of docs 0-19 (one appended token) + 20 docs
    // that are NOT in the corpus slice (no high-jaccard partner)
    val nearCopies = corpus.filter($"doc_id" < 20).select(
      ($"doc_id" + 1000).as("doc_id"),
      concat($"text", lit(" znew"), $"doc_id").as("text"))
    val foreign = docs.filter($"doc_id" >= 400 && $"doc_id" < 420)
      .select(($"doc_id" + 1000).as("doc_id"), $"text")
    val batch = nearCopies.union(foreign)

    val got = Dedup.incrementalNearDupPairs(corpus, batch, "doc_id", "text",
      numHashes = 32, bands = 8, verifyThreshold = 0.8)
    val pairs = got.select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // every near-copy finds its source (jaccard n/(n+1) ~ 0.98: with
    // 32/8 banding a miss needs all 8 bands to differ — the source
    // pair is the non-vacuity anchor)
    (0 until 20).foreach { i =>
      assert(pairs.contains((i + 1000L, i.toLong)), s"missing source pair for $i")
    }
    // a_id is always a batch id, b_id always a corpus id
    assert(pairs.forall { case (a, b) => a >= 1000 && b < 200 })

    // persisted-bands path: write the corpus bands to parquet, reload,
    // and get the identical verified pair set (no corpus minhash rerun)
    val bandsPath = "/tmp/graft_test_corpus_bands"
    Dedup.corpusBandSignatures(corpus, "doc_id", "text").write
      .mode("overwrite").parquet(bandsPath)
    val reloaded = spark.read.parquet(bandsPath)
    val viaPersisted = Dedup.incrementalNearDupPairsByBands(
      reloaded, corpus, batch, "doc_id", "text", 32, 8, 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(viaPersisted == pairs)

    // precision 1.0: every emitted pair is in the exact cross set
    val exact = Dedup.jaccardPairsAcross(batch, "doc_id", "text",
      corpus, "doc_id", "text", 0.8)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(exact))
  }

  test("duplicatedSpans: flags cross-doc and within-doc window repeats") {
    val d = Seq(
      (0L, "a b c d e"),     // "a b c" shared with doc 1 at pos 0
      (1L, "a b c x y"),
      (2L, "p q p q p q p"), // within-doc repeats: "p q p" at 0,2 / "q p q" at 1,3
      (3L, "solo text only")
    ).toDF("id", "text")
    val spans = Dedup.duplicatedSpans(d, "id", "text", windowTokens = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set(
      (0L, 0L, 2L), (1L, 0L, 2L),             // cross-doc pair
      (2L, 0L, 3L), (2L, 2L, 3L), (2L, 4L, 3L), // "p q p" x3
      (2L, 1L, 2L), (2L, 3L, 2L)))             // "q p q" x2
    // hash keys and md5 keys flag the identical occurrence set
    val hashed = Dedup.duplicatedSpans(d, "id", "text", 3, hashKeys = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(hashed == spans)
  }

  test("duplicatedSpanStats: covers every id, zeroes for short/null docs") {
    val d = Seq(
      (0L, "a b c d"),       // 2 windows, both dup'd with doc 1
      (1L, "a b c d"),       // exact copy
      (2L, "x y"),           // too short for a window
      (3L, null: String)     // null text
    ).toDF("id", "text")
    val got = Dedup.duplicatedSpanStats(d, "id", "text", windowTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 1.0),
      (1L, 2L, 2L, 1.0),
      (2L, 0L, 0L, 0.0),
      (3L, 0L, 0L, 0.0)))
  }

  test("paragraph dedup: first occurrence wins, order kept, variants fold") {
    val docs = Seq(
      (0L, "alpha\nDisclaimer.\nalpha\n  disclaimer. \nbeta"),
      (1L, "solo"),
      (2L, "x\nx\nx")
    ).toDF("id", "text")
    val out = Dedup.dedupParagraphs(docs, "id", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    // doc 0: alpha dedups, the two disclaimer case/space variants fold
    // to the FIRST original form, beta survives in place
    assert(out(0) == ((0L, "alpha\nDisclaimer.\nbeta", 5L, 3L)))
    assert(out(1) == ((1L, "solo", 1L, 1L)))
    assert(out(2) == ((2L, "x", 3L, 1L)))
  }

  test("corpusDiff: added/removed/changed/unchanged, null-safe on NULL text") {
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, null: String), (4L, "d"))
      .toDF("id", "text")
    val newV = Seq((2L, "b2"), (3L, null: String), (4L, "d"), (5L, "e"))
      .toDF("id", "text")
    val got = Dedup.corpusDiff(oldV, newV, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "unchanged", 5L -> "added"))
    // NULL -> text and text -> NULL are CHANGED, not unchanged/added
    val flips = Dedup.corpusDiff(
        Seq((9L, null: String), (10L, "x")).toDF("id", "text"),
        Seq((9L, "x"), (10L, null: String)).toDF("id", "text"),
        "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(flips == Map(9L -> "changed", 10L -> "changed"))
  }

  test("winnowing: shared-substring guarantee, density, determinism, pair detection") {
    val k = 5
    val w = 4
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (1L, s"AAAA $shared AAAA unique tail one"),
      (2L, s"BBBB prefix text here $shared BBBB"),
      (3L, "completely different content with nothing matching qqq zzz xxx"),
      (4L, s"AAAA $shared AAAA unique tail one"), // identical to 1
      (5L, "tiny doc")) // 7 norm chars: grams exist but < one full window
      .toDF("id", "text")
    val fp = Dedup.winnowingFingerprints(docs, "id", "text", k, w)
      .select($"id", $"fp_hash", $"fp_pos")
      .as[(Long, Long, Long)].collect()
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    // identical docs -> identical fingerprint sets
    assert(byDoc(1L) == byDoc(4L))
    // winnowing guarantee: any shared substring of length >= k+w-1
    // yields at least one shared selected hash
    assert((byDoc(1L).map(_._1) & byDoc(2L).map(_._1)).nonEmpty)
    // expected density ~ 2/(w+1) of grams; allow a wide band
    val norm1 = ("AAAA " + shared + " AAAA unique tail one")
      .toLowerCase.replaceAll("[^a-z0-9]", "")
    val nGrams = norm1.length - k + 1
    assert(byDoc(1L).size >= nGrams / (w + 2) && byDoc(1L).size <= nGrams,
      s"${byDoc(1L).size} fingerprints from $nGrams grams")
    // short doc still fingerprints (one window over all its grams)
    assert(byDoc(5L).size == 1)
    // positions stay inside the valid 1-based gram range
    fp.foreach { case (_, _, p) => assert(p >= 1) }
    // pair detection: (1,4) identical, (1,2)/(2,4) share the sentence;
    // doc 3 pairs with nobody
    val pairs = Dedup.winnowingPairs(docs, "id", "text", k, w, minShared = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 2L)) && pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // plan: candidate generation is equi-join only
    val plan = Dedup.winnowingPairs(docs, "id", "text", k, w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"winnowing pair join must stay an equi-join:\n$plan")
  }

  test("splitLeakage: unordered label pairs, unlabeled ids drop") {
    val labeled = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "test")).toDF("id", "split")
    val pairs = Seq((1L, 3L), (1L, 2L), (2L, 4L), (3L, 4L), (2L, 3L),
      (1L, 9L)).toDF("a_id", "b_id")  // 9 unlabeled -> dropped
    val r = Dedup.splitLeakage(labeled, "id", "split", pairs, "a_id", "b_id")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r == Map(
      ("train", "train") -> 1L,   // (1,3)
      ("test", "train") -> 3L,    // (1,2), (3,4), (2,3) — unordered
      ("test", "test") -> 1L))    // (2,4)
  }
}
