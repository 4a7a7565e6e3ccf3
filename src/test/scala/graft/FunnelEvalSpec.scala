package graft

import org.apache.spark.sql.functions._
import graft.operators.{Evaluation, Funnel, VectorOps}

/** Round-6 additions: curation-funnel lineage, Cohen's kappa,
  * TwoNN intrinsic dimension.
  */
class FunnelEvalSpec extends SparkSuite {
  import spark.implicits._

  test("funnel: first-fail attribution and sequential-filter report") {
    val d = Seq(
      (1L, 10, true),  // survives all
      (2L, 3, true),   // fails min_len
      (3L, 12, false), // fails flag_ok
      (4L, 2, false),  // fails min_len (sequentially: never reaches flag_ok)
      (5L, 20, true)   // survives all
    ).toDF("id", "len", "ok")
    val stages = Seq(
      "min_len" -> (col("len") >= 5),
      "flag_ok" -> col("ok"))
    val ff = Funnel.withFirstFail(d, stages)
      .select("id", "first_fail").as[(Long, Option[String])].collect().toMap
    assert(ff == Map(1L -> None, 2L -> Some("min_len"), 3L -> Some("flag_ok"),
      4L -> Some("min_len"), 5L -> None))
    val rep = Funnel.report(d, stages)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(rep == Seq(
      ("min_len", 5L, 2L, 3L, 0.4),
      ("flag_ok", 3L, 1L, 2L, 1.0 / 3.0)))
  }

  test("funnel: NULL predicate counts as a failure (filter semantics)") {
    // length(NULL) >= 5 is NULL: filter(pred) drops the row, so the
    // funnel must attribute it to that stage, not report a survivor.
    val d = Seq((1L, Some("long enough text")), (2L, None), (3L, Some("ok too")))
      .toDF("id", "text")
    val stages = Seq("min_len" -> (length(col("text")) >= 5))
    val ff = Funnel.withFirstFail(d, stages)
      .select("id", "first_fail").as[(Long, Option[String])].collect().toMap
    assert(ff == Map(1L -> None, 2L -> Some("min_len"), 3L -> None))
    val rep = Funnel.report(d, stages)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(rep == Seq(("min_len", 3L, 1L, 2L, 1.0 / 3.0)))
  }

  test("funnel: empty input and a stage that drops nothing") {
    val d = Seq((1L, 10)).toDF("id", "len").filter(col("len") < 0)
    val rep = Funnel.report(d, Seq("s" -> (col("len") > 0)))
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(rep == Seq(("s", 0L, 0L, 0L, 0.0)))
  }

  test("cohenKappa: hand contingency, perfect, constant-equal, null drops") {
    // classic 2x2: a=yes/no vs b=yes/no with counts 20,5,10,15
    val d = (Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))).toDF("a", "b")
    val Seq((n, po, pe, Some(k))) = Evaluation.cohenKappa(d, "a", "b")
      .as[(Long, Double, Double, Option[Double])].collect().toSeq
    assert(n == 50L)
    assert(math.abs(po - 0.70) < 1e-12)
    // pe = (25/50)(30/50) + (25/50)(20/50) = 0.5
    assert(math.abs(pe - 0.50) < 1e-12)
    assert(math.abs(k - 0.40) < 1e-12)
    // perfect agreement on a varied labeling -> kappa = 1
    val p = Seq(("x", "x"), ("y", "y"), ("z", "z")).toDF("a", "b")
    assert(Evaluation.cohenKappa(p, "a", "b")
      .select("kappa").as[Option[Double]].head().exists(v => math.abs(v - 1.0) < 1e-12))
    // both sides constant and equal: pe = 1, kappa undefined -> NULL
    val c = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Evaluation.cohenKappa(c, "a", "b")
      .select("kappa").as[Option[Double]].head().isEmpty)
    // NULL rows drop from n
    val withNull = Seq((Some("x"), Some("x")), (None, Some("x"))).toDF("a", "b")
    assert(Evaluation.cohenKappa(withNull, "a", "b")
      .select("n").as[Long].head() == 1L)
  }

  test("mahalanobis: whitening scores off-covariance outliers above on-axis ones") {
    // points spread along the x-axis (high variance) with tiny y noise:
    // at EQUAL Euclidean distance from the mean, a y-direction deviant
    // must out-score an x-direction one — the property Euclidean
    // distance cannot express and the whitening exists for
    val base = (0 until 40).map { i =>
      (i.toLong, Array(((i % 21) - 10).toFloat, ((i % 5) - 2) * 0.05f))
    }
    val df = (base :+ (100L, Array(0f, 6f)) :+ (101L, Array(6f, 0f)))
      .toDF("id", "vec")
    val model = graft.operators.Pca.fit(df, "vec", dim = 2, nComponents = 2)
    val scores = df.select($"id",
        graft.operators.Pca.mahalanobisSqCol($"vec", model).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(scores(100L) > 10.0 * scores(101L),
      s"y-outlier ${scores(100L)} must dwarf x-outlier ${scores(101L)}")
    // flags: with threshold between the two, only the y-outlier trips
    val flagged = graft.operators.Pca.mahalanobisOutliers(
        df, "vec", dim = 2, nComponents = 2,
        threshold = (scores(100L) + scores(101L)) / 2.0)
      .filter($"is_outlier").select($"id").as[Long].collect().toSet
    assert(flagged.contains(100L) && !flagged.contains(101L))
  }

  test("intrinsicDimension: hand MLE on 4 points; exact duplicates drop") {
    // 1-D points embedded in 2-D: 0, 1, 3, 7 -> (r1, r2) per point:
    // 0:(1,3) 1:(1,2) 3:(2,3) 7:(4,6)
    val pts = Seq((0L, 0f), (1L, 1f), (2L, 3f), (3L, 7f))
      .map { case (id, x) => (id, Array(x, 0f)) }.toDF("id", "vec")
    val Seq((n, d)) = VectorOps.intrinsicDimension(pts, "id", "vec")
      .as[(Long, Double)].collect().toSeq
    assert(n == 4L)
    val expect = 4.0 / (math.log(3.0) + math.log(2.0) + math.log(1.5) +
      math.log(1.5))
    assert(math.abs(d - expect) < 1e-9, s"got $d want $expect")
    // a duplicated point has r1 = 0 -> drops from the MLE (and so does
    // its twin), leaving the remaining pair
    val dup = Seq((0L, 0f), (1L, 0f), (2L, 3f), (3L, 7f))
      .map { case (id, x) => (id, Array(x, 0f)) }.toDF("id", "vec")
    val n2 = VectorOps.intrinsicDimension(dup, "id", "vec")
      .select("n").as[Long].head()
    assert(n2 == 2L, s"duplicates must drop, got n=$n2")
  }

  test("intrinsicDimension: injected-NN and full-sample paths match exact") {
    val pts = Seq((0L, 0f), (1L, 1f), (2L, 3f), (3L, 7f))
      .map { case (id, x) => (id, Array(x, 0f)) }.toDF("id", "vec")
    val (nE, dE) = VectorOps.intrinsicDimension(pts, "id", "vec")
      .as[(Long, Double)].head()
    // hand-fed (qid, r1, r2) — the ANN-provider contract
    val wide = Seq((0L, 1.0, 3.0), (1L, 1.0, 2.0), (2L, 2.0, 3.0),
      (3L, 4.0, 6.0)).toDF("qid", "r1", "r2")
    val (nI, dI) = VectorOps.intrinsicDimensionFromNN(wide, "qid", "r1", "r2")
      .as[(Long, Double)].head()
    assert(nI == nE && math.abs(dI - dE) < 1e-12, s"($nI,$dI) vs ($nE,$dE)")
    // sample = 1.0 keeps every query: identical to the exact estimator
    val (nS, dS) = VectorOps.intrinsicDimension(pts, "id", "vec",
      sample = Some(1.0)).as[(Long, Double)].head()
    assert(nS == nE && math.abs(dS - dE) < 1e-12)
    // a 50% deterministic hash-sample still estimates from >=1 point
    // and is reproducible run-to-run
    val s1 = VectorOps.intrinsicDimension(pts, "id", "vec",
      sample = Some(0.5)).as[(Long, Double)].head()
    val s2 = VectorOps.intrinsicDimension(pts, "id", "vec",
      sample = Some(0.5)).as[(Long, Double)].head()
    assert(s1 == s2, "hash-sampled estimate must be deterministic")
  }

  test("bleuPairs: hand-counted clipped n-grams, brevity penalty, edge cases") {
    // cand "the cat the cat sat" vs ref "the cat sat down":
    //   unigrams: the×2→clip 1, cat×2→clip 1, sat×1→clip 1 ⇒ clip 3/5
    //   bigrams: "the cat"×2→clip 1, "cat the"→0, "cat sat"→1 ⇒ clip 2/4
    val d = Seq(
      (1L, "the cat the cat sat", "the cat sat down"),
      (2L, "exact match here", "exact match here"),
      (3L, "one", "totally different words"),
      (4L, "", "nonempty ref")).toDF("id", "cand", "ref")
    val r = Evaluation.bleuPairs(d, "id", "cand", "ref", maxN = 2)
      .as[(Long, Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(t => t._1 -> t).toMap
    // (id, c_len, r_len, clip_1, tot_1, clip_2, tot_2, geo, bleu)
    assert(r(1L)._2 == 5L && r(1L)._3 == 4L)
    assert(r(1L)._4 == 3L && r(1L)._5 == 5L && r(1L)._6 == 2L && r(1L)._7 == 4L)
    assert(math.abs(r(1L)._8 - math.sqrt(0.6 * 0.5)) < 1e-15)
    // cand longer than ref: no brevity penalty, bleu == geo
    assert(r(1L)._9 == r(1L)._8)
    // exact match: geo = 1, equal lengths ⇒ bleu = 1
    assert(r(2L)._8 == 1.0 && r(2L)._9 == 1.0)
    // single token: no bigrams ⇒ p2 = 0 ⇒ geo = 0; short cand gets
    // bp = exp(1 − r/c) which multiplies 0 ⇒ still 0
    assert(r(3L)._6 == 0L && r(3L)._7 == 0L && r(3L)._8 == 0.0 && r(3L)._9 == 0.0)
    // empty candidate: zero lengths/counts and zero score, no NaN
    assert(r(4L)._2 == 0L && r(4L)._5 == 0L && r(4L)._8 == 0.0 && r(4L)._9 == 0.0)
    // brevity penalty applies exp(1 − r/c) when c < r: 2 tokens vs 4
    val short = Seq((9L, "the cat", "the cat sat down")).toDF("id", "cand", "ref")
    val s = Evaluation.bleuPairs(short, "id", "cand", "ref", maxN = 2)
      .select($"geo", $"bleu").as[(Double, Double)].head()
    assert(math.abs(s._2 - s._1 * math.exp(1.0 - 4.0 / 2.0)) < 1e-15)
    // maxN outside the sqrt-exact set is a contract error
    intercept[IllegalArgumentException] {
      Evaluation.bleuPairs(d, "id", "cand", "ref", maxN = 3)
    }
  }

  test("kendallTau: hand inversions, reversal = -1, one-sided items dropped") {
    // q1: A ranks (x,y,z) = 1,2,3; B ranks 1,3,2 -> one inversion of
    // three pairs: tau = (2-1)/3
    val a = Seq((1L, "x", 1L), (1L, "y", 2L), (1L, "z", 3L),
      (2L, "p", 1L), (2L, "q", 2L),
      (3L, "only_a", 1L), (3L, "shared", 2L)).toDF("qid", "id", "rn")
    val b = Seq((1L, "x", 1L), (1L, "y", 3L), (1L, "z", 2L),
      (2L, "p", 2L), (2L, "q", 1L),
      (3L, "shared", 1L), (3L, "only_b", 2L)).toDF("qid", "id", "rn")
    val r = Evaluation.kendallTau(a, b, "qid", "id", "rn", "rn")
      .select($"qid", $"n_common", $"concordant", $"discordant", $"tau")
      .as[(Long, Long, Long, Long, Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 3L && r(1L)._3 == 2L && r(1L)._4 == 1L)
    assert(math.abs(r(1L)._5.get - 1.0 / 3.0) < 1e-15)
    // full reversal: tau = -1
    assert(r(2L)._5.contains(-1.0))
    // items present in only one run are dropped; n_common < 2 -> NULL
    assert(r(3L)._2 == 1L && r(3L)._5.isEmpty)
    // runB ties count as NEITHER concordant nor discordant
    val at = Seq((9L, "x", 1L), (9L, "y", 2L), (9L, "z", 3L))
      .toDF("qid", "id", "rn")
    val bt = Seq((9L, "x", 1L), (9L, "y", 1L), (9L, "z", 2L))
      .toDF("qid", "id", "rn")
    val t = Evaluation.kendallTau(at, bt, "qid", "id", "rn", "rn")
      .select($"concordant", $"discordant").as[(Long, Long)].head()
    // pairs (x,y) tied in B -> neither; (x,z), (y,z) concordant
    assert(t == ((2L, 0L)))
  }

  test("rougePairs: hand-counted overlap, recall vs precision sides, edges") {
    // cand "the cat the cat sat" (5 unigrams) vs ref "the cat sat down"
    // (4 unigrams): clip_1 = 3 ⇒ prec 3/5, rec 3/4; bigrams cand
    // {the cat ×2, cat the, cat sat} (4), ref {the cat, cat sat,
    // sat down} (3): clip_2 = 2 ⇒ prec 2/4, rec 2/3.
    val d = Seq(
      (1L, "the cat the cat sat", "the cat sat down"),
      (2L, "exact match here", "exact match here"),
      (3L, "", "nonempty ref"),
      (4L, "nonempty cand", "")).toDF("id", "cand", "ref")
    val r = Evaluation.rougePairs(d, "id", "cand", "ref", maxN = 2)
      .select($"id", $"clip_1", $"ctot_1", $"rtot_1", $"prec_1", $"rec_1",
        $"f1_1", $"clip_2", $"ctot_2", $"rtot_2", $"prec_2", $"rec_2", $"f1_2")
      .as[(Long, Long, Long, Long, Double, Double, Double,
           Long, Long, Long, Double, Double, Double)]
      .collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == 3L && r(1L)._3 == 5L && r(1L)._4 == 4L)
    assert(r(1L)._5 == 0.6 && r(1L)._6 == 0.75)
    assert(math.abs(r(1L)._7 - 2.0 * 0.6 * 0.75 / 1.35) < 1e-15)
    assert(r(1L)._8 == 2L && r(1L)._9 == 4L && r(1L)._10 == 3L)
    assert(r(1L)._11 == 0.5 && math.abs(r(1L)._12 - 2.0 / 3.0) < 1e-15)
    // exact match: everything 1.0
    assert(r(2L)._5 == 1.0 && r(2L)._6 == 1.0 && r(2L)._7 == 1.0 &&
      r(2L)._13 == 1.0)
    // empty candidate: rtot still counted (recall side exists), all
    // scores 0, no NaN
    assert(r(3L)._3 == 0L && r(3L)._4 == 2L && r(3L)._6 == 0.0 &&
      r(3L)._7 == 0.0)
    // empty reference: ctot counted, rec and f1 = 0
    assert(r(4L)._3 == 2L && r(4L)._4 == 0L && r(4L)._5 == 0.0 &&
      r(4L)._7 == 0.0)
  }

  test("cusum: prefix-sum identity matches the textbook recursion; " +
      "detects an injected level shift at the right step") {
    // series with a shift at position 6: 5,5,5,5,5 then 9,9,9,9,9
    val xs = Seq(5.0, 5.0, 5.0, 5.0, 5.0, 9.0, 9.0, 9.0, 9.0, 9.0)
    val d = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("key", "pos", "x")
    val target = lit(7.0) // mid-level target, slack 0.5
    val got = graft.operators.Resample.cusum(d, "key", "pos", "x",
        target, slack = 0.5, threshold = 2.0)
      .orderBy("pos").select($"cusum", $"alarm")
      .as[(Double, Boolean)].collect()
    // textbook recursion s_i = max(0, s_{i-1} + x − target − slack)
    val want = xs.scanLeft(0.0)((s, x) => math.max(0.0, s + x - 7.0 - 0.5)).tail
    got.map(_._1).zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"got $g want $w")
    }
    // pre-shift (and the first post-shift step, s = 1.5) never alarms;
    // the second post-shift step (s = 3.0) crosses threshold 2.0
    assert(got.take(6).forall(!_._2))
    assert(got(6)._2 && got.drop(6).forall(_._2))
    // independent keys do not bleed state: duplicate the series under
    // a second key and check identical statistics per key
    val two = xs.zipWithIndex.flatMap { case (x, i) =>
      Seq(("a", i.toLong, x), ("b", i.toLong, x)) }.toDF("key", "pos", "x")
    val perKey = graft.operators.Resample.cusum(two, "key", "pos", "x",
        target, slack = 0.5, threshold = 2.0)
      .groupBy("pos").agg(countDistinct($"cusum").as("nd"))
      .select(max($"nd")).as[Long].head()
    assert(perKey == 1L, "same series under different keys must match")
  }
  test("cohortRetention: first-touch cohorts, age counts, dedup within bucket") {
    import graft.operators.Funnel
    val ev = Seq(
      (1L, 0), (1L, 0), (1L, 1), (1L, 3),   // u1: cohort 0, ages 0,1,3
      (2L, 0), (2L, 2),                     // u2: cohort 0, ages 0,2
      (3L, 1), (3L, 3),                     // u3: cohort 1, ages 0,2
      (4L, 3)                               // u4: cohort 3, age 0
    ).toDF("u", "b")
    val r = Funnel.cohortRetention(ev, "u", $"b")
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(r == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L,
      (3L, 0L) -> 1L))
    // age-0 row equals the cohort size for every cohort
    assert(r((0L, 0L)) == 2L && r((1L, 0L)) == 1L && r((3L, 0L)) == 1L)
  }

  test("docTopKFromChunks: max vs sum pooling, tie-break, k cap") {
    // doc 1: chunks score (3, 1) -> max 3, sum 4, n 2
    // doc 2: chunks score (2, 2) -> max 2, sum 4, n 2
    // doc 3: one chunk 3        -> max 3, sum 3, n 1
    val hits = Seq(
      (0L, 1L, 3.0), (0L, 1L, 1.0),
      (0L, 2L, 2.0), (0L, 2L, 2.0),
      (0L, 3L, 3.0),
      (1L, 9L, 5.0)).toDF("qid", "doc", "score")
    val byMax = Evaluation.docTopKFromChunks(hits, "qid", "doc", "score",
        k = 3, pool = "max")
      .filter($"qid" === 0L).orderBy("rank")
      .select($"doc", $"max_score", $"sum_score", $"n_chunks", $"rank")
      .as[(Long, Double, Double, Long, Int)].collect().toSeq
    // max pool: docs 1 and 3 tie at 3 -> doc asc; then doc 2
    assert(byMax == Seq((1L, 3.0, 4.0, 2L, 1), (3L, 3.0, 3.0, 1L, 2),
      (2L, 2.0, 4.0, 2L, 3)))
    val bySum = Evaluation.docTopKFromChunks(hits, "qid", "doc", "score",
        k = 2, pool = "sum")
      .filter($"qid" === 0L).orderBy("rank")
      .select($"doc", $"rank").as[(Long, Int)].collect().toSeq
    // sum pool: docs 1 and 2 tie at 4 -> doc asc; k = 2 cuts doc 3
    assert(bySum == Seq((1L, 1), (2L, 2)))
    // second query pools independently
    val q1 = Evaluation.docTopKFromChunks(hits, "qid", "doc", "score",
        k = 3).filter($"qid" === 1L)
      .select($"doc", $"rank").as[(Long, Int)].collect().toSeq
    assert(q1 == Seq((9L, 1)))
    intercept[IllegalArgumentException](
      Evaluation.docTopKFromChunks(hits, "qid", "doc", "score", k = 0))
    intercept[IllegalArgumentException](
      Evaluation.docTopKFromChunks(hits, "qid", "doc", "score", 1, "avg"))
  }
}
