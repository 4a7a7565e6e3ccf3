package graft

import java.sql.Timestamp

import graft.streaming.{Event, EventStreams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("outliers: hand-computed per-group z, degenerate groups never flag") {
    val df = Seq(
      ("a", 0.0), ("a", 10.0), ("a", 20.0), ("a", 100.0),
      ("b", 5.0), // single row: sd undefined -> NULL z, never flagged
      ("c", 7.0), ("c", 7.0)) // zero variance -> NULL z
      .toDF("g", "value").withColumn("id", monotonically_increasing_id())
    val out = graft.operators.Outliers.zScores(df, Seq("g"), "value", 1.2)
      .select("g", "value", "z", "is_outlier")
      .as[(String, Double, Option[Double], Boolean)].collect()
    val m = 32.5
    val sd = math.sqrt(Seq(0.0, 10, 20, 100).map(v => (v - m) * (v - m)).sum / 3)
    out.foreach {
      case ("a", v, Some(z), fl) =>
        assert(math.abs(z - (v - m) / sd) < 1e-12)
        assert(fl == (math.abs(z) > 1.2))
      case (g, _, z, fl) => assert(z.isEmpty && !fl, s"degenerate group $g")
    }
    assert(out.count { case ("a", _, _, fl) => fl; case _ => false } == 1) // only 100.0
  }

  test("groupZScores: exact population moments per group, zero-variance NULL") {
    val df = Seq(("a", 2.0), ("a", 4.0), ("a", 6.0),
      ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val out = graft.operators.Outliers.groupZScores(df, Seq("g"), "v")
      .select("g", "v", "z").as[(String, Double, Option[Double])].collect()
    // group a: mean 4, var_pop = (4+0+4)/3 = 8/3
    val sd = math.sqrt(8.0 / 3.0)
    out.foreach {
      case ("a", v, Some(z)) => assert(math.abs(z - (v - 4.0) / sd) < 1e-15)
      case ("a", _, None)    => fail("group a must have a z")
      case ("b", _, z)       => assert(z.isEmpty, "zero variance -> NULL")
    }
    // seasonal shape: same value is anomalous in one group, normal in
    // another — grouping by the seasonal key must separate them
    val season = Seq(("q", 1.0), ("q", 1.0), ("q", 1.0), ("q", 10.0),
      ("busy", 10.0), ("busy", 10.0), ("busy", 10.0), ("busy", 10.0))
      .toDF("g", "v")
    val bg = graft.operators.Outliers.groupZScores(season, Seq("g"), "v")
      .filter($"v" === 10.0).select("g", "z")
      .as[(String, Option[Double])].collect().toMap
    assert(bg("q").exists(_ > 1.5) && bg("busy").isEmpty)
  }

  test("spearman: monotone invariance, sign flip, midrank ties, null/NaN drops") {
    import graft.operators.Outliers
    // nonlinear but monotone -> exactly 1; reversed -> exactly -1
    val mono = (1 to 50).map(i => (i.toDouble, math.pow(i.toDouble, 3))).toDF("x", "y")
    val Seq((n1, s1)) = Outliers.spearman(mono, "x", "y")
      .as[(Long, Double)].collect().toSeq
    assert(n1 == 50L && math.abs(s1 - 1.0) < 1e-12)
    val rev = (1 to 50).map(i => (i.toDouble, -math.pow(i.toDouble, 3))).toDF("x", "y")
    assert(math.abs(Outliers.spearman(rev, "x", "y")
      .as[(Long, Double)].collect().head._2 + 1.0) < 1e-12)
    // tied x midranks: rx = [1, 2.5, 2.5, 4] vs ry = [1..4]
    // -> corr = 4.5 / sqrt(4.5 * 5) = 0.9486832980505138
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 40.0)).toDF("x", "y")
    val Seq((n2, s2)) = Outliers.spearman(tied, "x", "y")
      .as[(Long, Double)].collect().toSeq
    assert(n2 == 4L && math.abs(s2 - 4.5 / math.sqrt(22.5)) < 1e-12)
    // null and NaN rows are dropped, not ranked
    val dirty = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0),
      (Double.NaN, 5.0), (4.0, 40.0)).toDF("x", "y")
      .unionAll(Seq((Option.empty[Double], Option(9.0))).toDF("x", "y"))
    val Seq((n3, s3)) = Outliers.spearman(dirty, "x", "y")
      .as[(Long, Double)].collect().toSeq
    assert(n3 == 4L && math.abs(s3 - 1.0) < 1e-12)
  }

  test("exactQuantiles: matches the built-in percentile aggregate, ties, edges") {
    import graft.operators.Outliers
    val rnd = new scala.util.Random(11)
    // duplicates on purpose: tie handling must not shift order statistics
    val vals = Seq.fill(500)(rnd.nextInt(40).toDouble)
    val df = vals.toDF("v")
    val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    val got = Outliers.exactQuantiles(df, "v", ps)
      .select("p", "n", "value").as[(Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want = df.agg(percentile(col("v"),
        lit(ps.toArray)).as("q")).head().getSeq[Double](0)
    ps.zipWithIndex.foreach { case (p, i) =>
      assert(got(p)._1 == 500L)
      assert(math.abs(got(p)._2 - want(i)) < 1e-9, s"p=$p")
    }
    // single row: every quantile is that value; empty: NULL values
    val one = Outliers.exactQuantiles(Seq(7.0).toDF("v"), "v", Seq(0.0, 0.5, 1.0))
      .select("value").as[Double].collect()
    assert(one.toSeq == Seq(7.0, 7.0, 7.0))
    val none = Outliers.exactQuantiles(
        Seq(Option.empty[Double]).toDF("v"), "v", Seq(0.5))
      .select("n", "value").as[(Long, Option[Double])].collect()
    assert(none.toSeq == Seq((0L, None)))
  }

  test("madStats/robustScale: hand values, outlier immunity, zero-MAD guard") {
    import graft.operators.Outliers
    // 1..9 plus a wild outlier: median 5.5 -> with 1000.0 appended the
    // median/MAD barely move while mean/stddev would explode
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).toDF("v")
    val Seq((n, med, mad)) = Outliers.madStats(df, "v")
      .as[(Long, Double, Double)].collect().toSeq
    assert(n == 10L && med == 5.5)
    // |v - 5.5| = 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5 -> median 2.5
    assert(mad == 2.5)
    val z = Outliers.robustScale(df, "v")
      .select("v", "robust_z").as[(Double, Double)].collect().toMap
    assert(math.abs(z(1000.0) - (1000.0 - 5.5) / (1.4826 * 2.5)) < 1e-12)
    assert(z.count { case (_, zz) => math.abs(zz) > 3.5 } == 1)
    // constant column: MAD = 0 -> z NULL, not Inf
    val const = Seq.fill(5)(3.0).toDF("v")
    val zc = Outliers.robustScale(const, "v")
      .select("robust_z").as[Option[Double]].collect()
    assert(zc.forall(_.isEmpty))
  }

  test("ksTest: identical=0, disjoint=1, hand CDFs, duplicates, empty side") {
    import graft.operators.Outliers
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(Outliers.ksTest(a, "v", a, "v")
      .as[(Long, Long, Double)].collect().head == ((4L, 4L, 0.0)))
    val far = Seq(10.0, 11.0).toDF("v")
    assert(Outliers.ksTest(a, "v", far, "v")
      .as[(Long, Long, Double)].collect().head._3 == 1.0)
    // overlap: F1-F2 peaks at 0.5 (values 2..4)
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    assert(Outliers.ksTest(a, "v", b, "v")
      .as[(Long, Long, Double)].collect().head._3 == 0.5)
    // duplicates: F1(1)=2/3 vs F2(1)=1/3
    val d1 = Seq(1.0, 1.0, 2.0).toDF("v")
    val d2 = Seq(1.0, 2.0, 2.0).toDF("v")
    val ks = Outliers.ksTest(d1, "v", d2, "v")
      .as[(Long, Long, Double)].collect().head._3
    assert(math.abs(ks - 1.0 / 3.0) < 1e-15)
    val none = Outliers.ksTest(a, "v", a.limit(0), "v")
      .as[(Long, Long, Option[Double])].collect().head
    assert(none == ((4L, 0L, None)))
  }

  test("chiSquared: independence=0, hand-computed dependence, empty cells count") {
    import graft.operators.Outliers
    // proportional table -> exactly independent
    val ind = (Seq.fill(10)(("a1", "b1")) ++ Seq.fill(20)(("a1", "b2"))
      ++ Seq.fill(20)(("a2", "b1")) ++ Seq.fill(40)(("a2", "b2"))).toDF("a", "b")
    val Seq((n1, dof1, c1)) = Outliers.chiSquared(ind, "a", "b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(n1 == 90L && dof1 == 1L && math.abs(c1) < 1e-9)
    // diagonal-only: every cell exp=5, |obs-exp|=5 -> chi2 = 4*25/5 = 20
    // (the two UNOBSERVED cells must contribute their expectation)
    val dep = (Seq.fill(10)(("a1", "b1")) ++ Seq.fill(10)(("a2", "b2"))).toDF("a", "b")
    val Seq((n2, dof2, c2)) = Outliers.chiSquared(dep, "a", "b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(n2 == 20L && dof2 == 1L && math.abs(c2 - 20.0) < 1e-9)
  }

  test("giniConcentration: uniform=0, hand-computed skew, singleton=0") {
    import graft.operators.Outliers
    val even = (1 to 4).flatMap(g => Seq.fill(5)(s"s$g")).toDF("source")
    val Seq((g1, t1, v1)) = Outliers.giniConcentration(even, "source")
      .as[(Long, Long, Double)].collect().toSeq
    assert(g1 == 4L && t1 == 20L && math.abs(v1) < 1e-12)
    // counts [1,1,1,97] -> G = 288/400
    val skew = (Seq("a", "b", "c") ++ Seq.fill(97)("d")).toDF("source")
    val Seq((_, _, v2)) = Outliers.giniConcentration(skew, "source")
      .as[(Long, Long, Double)].collect().toSeq
    assert(math.abs(v2 - 0.72) < 1e-12)
    val one = Outliers.giniConcentration(Seq("x").toDF("source"), "source")
      .as[(Long, Long, Double)].collect().head
    assert(one == ((1L, 1L, 0.0)))
  }

  test("mutualInformation: independent=0, bijective=ln2/nmi=1, zero-entropy guard") {
    import graft.operators.Outliers
    val ind = (Seq.fill(10)(("a1", "b1")) ++ Seq.fill(20)(("a1", "b2"))
      ++ Seq.fill(20)(("a2", "b1")) ++ Seq.fill(40)(("a2", "b2"))).toDF("a", "b")
    val mi0 = Outliers.mutualInformation(ind, "a", "b")
      .select("mi").as[Double].collect().head
    assert(math.abs(mi0) < 1e-12)
    val bij = (Seq.fill(5)(("a1", "b1")) ++ Seq.fill(5)(("a2", "b2"))).toDF("a", "b")
    val r = Outliers.mutualInformation(bij, "a", "b")
      .select("n", "h_a", "h_b", "mi", "nmi")
      .as[(Long, Double, Double, Double, Double)].collect().head
    val ln2 = math.log(2.0)
    assert(r._1 == 10L && math.abs(r._2 - ln2) < 1e-12 && math.abs(r._4 - ln2) < 1e-12)
    assert(math.abs(r._5 - 1.0) < 1e-12)
    // constant a -> H(a)=0 -> nmi NULL (not NaN/Inf)
    val const = Seq(("a", "b1"), ("a", "b2")).toDF("a", "b")
    assert(Outliers.mutualInformation(const, "a", "b")
      .select("nmi").as[Option[Double]].collect().head.isEmpty)
  }

  test("jensenShannon: identical=0, disjoint=ln2, hand-computed overlap") {
    import graft.operators.Outliers
    val p = Seq.fill(6)("x").toDF("v")
    assert(Outliers.jensenShannon(p, "v", p, "v")
      .as[(Long, Long, Double)].collect().head == ((6L, 6L, 0.0)))
    val q = Seq.fill(4)("y").toDF("v")
    assert(math.abs(Outliers.jensenShannon(p, "v", q, "v")
      .as[(Long, Long, Double)].collect().head._3 - math.log(2.0)) < 1e-12)
    // p={x:1}, q={x:.5,y:.5}: JS = .5·ln(4/3) + .5(.5·ln(2/3) + .5·ln2)
    val q2 = (Seq.fill(2)("x") ++ Seq.fill(2)("y")).toDF("v")
    val want = 0.5 * math.log(4.0 / 3.0) +
      0.5 * (0.5 * math.log(2.0 / 3.0) + 0.5 * math.log(2.0))
    assert(math.abs(Outliers.jensenShannon(p, "v", q2, "v")
      .as[(Long, Long, Double)].collect().head._3 - want) < 1e-12)
    // empty side -> NULL
    assert(Outliers.jensenShannon(p, "v", p.limit(0), "v")
      .as[(Long, Long, Option[Double])].collect().head == ((6L, 0L, None)))
  }

  test("gaps: maximal absent runs, edges excluded, dense series empty") {
    import graft.operators.Resample
    val d = Seq(("a", 1), ("a", 2), ("a", 5), ("a", 6), ("a", 9),
      ("a", 2),                        // duplicate bucket: no effect
      ("b", 10), ("b", 11), ("b", 12)).toDF("k", "b")
    val r = Resample.gaps(d, Seq("k"), $"b")
      .as[(String, Long, Long, Long)].collect().toSet
    // a: observed {1,2,5,6,9} -> gaps [3,4] and [7,8]; b dense -> none;
    // nothing before 1 or after 9 counts
    assert(r == Set(("a", 3L, 4L, 2L), ("a", 7L, 8L, 2L)))
  }

  test("proportionTest: hand z, empty/degenerate arms null, nulls fail") {
    import graft.operators.Outliers
    // a: 2/4 convert; b: 1/4; null success counts as failure
    val d = Seq(("a", Some(true)), ("a", Some(true)), ("a", Some(false)),
      ("a", None), ("b", Some(true)), ("b", Some(false)),
      ("b", Some(false)), ("b", None), ("c", Some(true))).toDF("v", "s")
    val r = Outliers.proportionTest(d, "v", $"s", "a", "b")
      .as[(String, Long, Long, String, Long, Long, Option[Double])].head()
    assert((r._1, r._2, r._3, r._4, r._5, r._6) == (("a", 4L, 2L, "b", 4L, 1L)))
    // z = (0.5 - 0.25)/sqrt(0.375*0.625*(0.25+0.25))
    val expect = 0.25 / math.sqrt(0.375 * 0.625 * 0.5)
    assert(math.abs(r._7.get - expect) < 1e-12)
    // all-success pool: p-hat = 1 -> no variance -> z NULL
    val deg = Seq(("a", true), ("b", true)).toDF("v", "s")
    assert(Outliers.proportionTest(deg, "v", $"s", "a", "b")
      .select($"z").as[Option[Double]].head().isEmpty)
    // one empty arm -> z NULL
    val one = Seq(("a", true), ("a", false)).toDF("v", "s")
    assert(Outliers.proportionTest(one, "v", $"s", "a", "b")
      .select($"z").as[Option[Double]].head().isEmpty)
    intercept[IllegalArgumentException](
      Outliers.proportionTest(d, "v", $"s", "a", "a"))
  }

  test("mannKendall: hand S, tie correction, flat series") {
    import graft.operators.Outliers
    // rising series with one dip and one value-tie:
    // y = 1, 3, 2, 3, 5 at x = 0..4
    // pairs (i<j): signs = (1,1,1,1),(−1,0,1),(1,1),(1) -> S = 7
    val d = Seq(("a", 0, 1.0), ("a", 1, 3.0), ("a", 2, 2.0),
      ("a", 3, 3.0), ("a", 4, 5.0),
      ("b", 0, 7.0), ("b", 1, 7.0), ("b", 2, 7.0)).toDF("g", "x", "y")
    val r = Outliers.mannKendall(d, Seq("g"), "x", "y")
      .as[(String, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r("a") == ("a", 5L, 7L,
      // var_num = n(n−1)(2n+5) − Σ t(t−1)(2t+5); one tie pair (t=2):
      // 5·4·15 − 2·1·9 = 300 − 18 = 282
      282L))
    // flat series: S = 0 and the tie correction kills the variance
    // entirely (t = 3): 3·2·11 − 3·2·11 = 0
    assert(r("b") == ("b", 3L, 0L, 0L))
  }

  test("mannKendall: NULL order/value rows are excluded, not misreported") {
    import graft.operators.Outliers
    // same rising series as above, padded with rows whose x or y is
    // NULL — those carry no ordering/value, so n, S, var_num must be
    // identical to the clean run, and the NULL x values must NOT trip
    // the duplicate-orderCol guard (count_distinct skips NULLs, so two
    // NULL-x rows used to read as "duplicates")
    val clean = Seq(("a", Some(0), Some(1.0)), ("a", Some(1), Some(3.0)),
      ("a", Some(2), Some(2.0)), ("a", Some(3), Some(3.0)),
      ("a", Some(4), Some(5.0)))
    val padded = clean ++ Seq(
      ("a", None, Some(99.0)), ("a", None, Some(98.0)),
      ("a", Some(9), None))
    val r = Outliers.mannKendall(padded.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .as[(String, Long, Long, Long)].head()
    assert(r == ("a", 5L, 7L, 282L))
  }

  test("theilSen: hand medians, outlier immunity, ties-in-x skipped, n<2") {
    import graft.operators.Outliers
    // y = 2x + 1 exactly, one wild outlier at x=4: pairwise slopes not
    // involving the outlier are all 2, so the median stays 2 and the
    // intercept median stays 1 (least squares would be dragged far off)
    val d = Seq(
      ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
      ("a", 4.0, 100.0),
      ("b", 5.0, 9.9)).toDF("g", "x", "y")
    val r = Outliers.theilSen(d, Seq("g"), "x", "y")
      .select($"g", $"n_points", $"n_pairs", $"slope", $"intercept")
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().map(t => t._1 -> t).toMap
    assert(r("a")._2 == 5L && r("a")._3 == 10L)
    assert(r("a")._4.contains(2.0) && r("a")._5.contains(1.0))
    // single point: no pairs, NULL slope/intercept
    assert(r("b")._2 == 1L && r("b")._3 == 0L && r("b")._4.isEmpty)
    // duplicate x values produce no vertical-pair slopes
    val tied = Seq(("t", 1.0, 0.0), ("t", 1.0, 10.0), ("t", 2.0, 4.0))
      .toDF("g", "x", "y")
    val t = Outliers.theilSen(tied, Seq("g"), "x", "y")
      .select($"n_pairs", $"slope").as[(Long, Option[Double])].head()
    // pairs: (1,2) from each of the two x=1 rows -> slopes 4, -6;
    // median = -1
    assert(t._1 == 2L && t._2.contains(-1.0))
  }

  test("autocorrelation: hand values, alternating series, zero variance") {
    import graft.operators.Resample
    val ramp = (1 to 5).map(t => ("r", t.toLong, t.toDouble)) ++
      Seq(("z", 1L, 7.0), ("z", 2L, 7.0), ("z", 3L, 7.0)) ++
      (1 to 6).map(t => ("alt", t.toLong, if (t % 2 == 0) 1.0 else -1.0))
    val r = Resample.autocorrelation(ramp.toDF("k", "t", "x"),
        "k", "t", "x", maxLag = 2)
      .select($"k", $"lag", $"n_terms", $"acf")
      .as[(String, Long, Long, Option[Double])]
      .collect().map(t => (t._1, t._2) -> t).toMap
    // ramp 1..5: mean 3, den 10; lag1 num = 4, lag2 num = -1
    assert(r(("r", 1L))._3 == 4L &&
      math.abs(r(("r", 1L))._4.get - 0.4) < 1e-12)
    assert(math.abs(r(("r", 2L))._4.get - (-0.1)) < 1e-12)
    // alternating ±1: acf(1) = -(n-1)/n at lag 1 under the biased
    // estimator (num = -5, den = 6), acf(2) = +4/6
    assert(math.abs(r(("alt", 1L))._4.get - (-5.0 / 6.0)) < 1e-12)
    assert(math.abs(r(("alt", 2L))._4.get - (4.0 / 6.0)) < 1e-12)
    // constant series: zero variance -> NULL acf, rows still emitted
    assert(r(("z", 1L))._4.isEmpty && r(("z", 2L))._4.isEmpty)
  }

  test("linearInterpolate: hand fill, uneven gaps, edge NULLs stay NULL") {
    import graft.operators.Resample
    val d = Seq[(String, Long, Option[Double])](
      ("k", 0L, None),          // leading: no prev -> stays NULL
      ("k", 1L, Some(10.0)),
      ("k", 2L, None),          // 10 -> 16 over 3 steps: 12
      ("k", 3L, None),          //                        14
      ("k", 4L, Some(16.0)),
      ("k", 6L, None),          // uneven spacing: t=6 between 4 and 7
      ("k", 7L, Some(22.0)),    // 16 + 6*(2/3) = 20
      ("k", 8L, None)           // trailing: no next -> stays NULL
    ).toDF("k", "t", "v")
    val r = Resample.linearInterpolate(d, "k", "t", "v")
      .select($"t", $"known", $"value_filled")
      .as[(Long, Boolean, Option[Double])].collect().map(x => x._1 -> x).toMap
    assert(!r(0L)._2 && r(0L)._3.isEmpty)
    assert(r(1L)._3.contains(10.0) && r(1L)._2)
    assert(r(2L)._3.contains(12.0) && r(3L)._3.contains(14.0))
    assert(r(6L)._3.contains(20.0))
    assert(r(8L)._3.isEmpty)
  }

  test("populationStability: identical ~ 0, hand two-bucket psi, edge clamp") {
    import graft.operators.Outliers
    val a = (1 to 100).map(_.toDouble).toDF("v")
    val same = Outliers.populationStability(a, a, "v", nBuckets = 4)
      .select($"psi", $"drifted").as[(Double, Boolean)].head()
    assert(math.abs(same._1) < 1e-12 && !same._2)
    // hand case: base 8 low + 2 high, cmp 2 low + 8 high over 2 buckets
    // p = (.8,.2), q = (.2,.8): psi = 2 * 0.6*ln(4) = 1.6636
    val base = (Seq.fill(8)(0.0) ++ Seq.fill(2)(10.0)).toDF("v")
    val cmp = (Seq.fill(2)(0.0) ++ Seq.fill(8)(10.0)).toDF("v")
    val h = Outliers.populationStability(base, cmp, "v", nBuckets = 2)
      .select($"bucket", $"n_base", $"n_cmp", $"psi", $"drifted")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(h.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 8L, 2L), (1L, 2L, 8L)))
    assert(math.abs(h.head._4 - 1.2 * math.log(4.0)) < 1e-12)
    assert(h.head._5)
    // cmp values beyond the baseline range clamp into edge buckets
    val wide = Seq(-100.0, 200.0).toDF("v")
    val c = Outliers.populationStability(base, wide, "v", nBuckets = 2)
      .select($"bucket", $"n_cmp").as[(Long, Long)].collect().toMap
    assert(c(0L) == 1L && c(1L) == 1L)
    // empty comparison fails fast rather than reporting infinite drift
    intercept[IllegalArgumentException] {
      Outliers.populationStability(base, base.filter($"v" > 1e9), "v")
    }
  }

  test("winsorize: clips to per-group percentile band, flags clipped rows") {
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "value")
    val out = graft.operators.Outliers.winsorize(df, Seq("g"), "value", 0.1, 0.9)
      .select("value", "clipped", "was_clipped")
      .as[(Double, Double, Boolean)].collect()
    // exact interpolated percentiles of 1..100, via the same IEEE
    // arithmetic the aggregate runs: pos = p*(n-1), linear interp
    val (p10, p90) = (10 + (0.1 * 99 - 9), 90 + (0.9 * 99 - 89))
    out.foreach { case (v, c, fl) =>
      assert(c == math.min(math.max(v, p10), p90))
      assert(fl == (c != v))
    }
    assert(out.count(_._3) == 20) // 10 below, 10 above
    intercept[IllegalArgumentException] {
      graft.operators.Outliers.winsorize(df, Seq("g"), "value", 0.9, 0.1)
    }
  }

  test("hourlyFfill: grid covers min..max hours, gaps forward-filled") {
    val df = Seq(
      (1L, ts(10), 1.0),   // hour 0
      (1L, ts(40), 2.0),   // hour 0 (later -> wins the bucket)
      (1L, ts(185), 9.0),  // hour 3: hours 1,2 are gaps
      (2L, ts(65), 5.0))   // single bucket key
      .toDF("user_id", "ts", "value")
    val out = graft.operators.Resample.hourlyFfill(df, "user_id", "ts", "value")
      .select($"user_id", hour($"hour"), $"v", $"filled", $"is_gap")
      .as[(Long, Int, Option[Double], Double, Boolean)].collect().toSet
    assert(out == Set(
      (1L, 0, Some(2.0), 2.0, false),
      (1L, 1, None, 2.0, true),
      (1L, 2, None, 2.0, true),
      (1L, 3, Some(9.0), 9.0, false),
      (2L, 1, Some(5.0), 5.0, false)))
  }

  test("percentileTiers: smallest-bound tier wins; values spread evenly") {
    val df = (1 to 100).map(i => i.toDouble).toDF("value")
    val out = graft.operators.Outliers.percentileTiers(df, "value", 4)
      .select("value", "tier").as[(Double, Int)].collect().toMap
    // quartile bounds of 1..100: 25.75, 50.5, 75.25
    assert(out(25.0) == 1 && out(26.0) == 2)
    assert(out(50.0) == 2 && out(51.0) == 3)
    assert(out(75.0) == 3 && out(76.0) == 4)
    assert(out(100.0) == 4)
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.values.forall(s => s >= 24 && s <= 26), s"skewed tiers: $sizes")
  }

  test("percentileTiers: NULL values get NULL tier, never binned into the top") {
    val df = ((1 to 10).map(i => (i.toLong, Some(i.toDouble))) :+ ((99L, None)))
      .toDF("id", "value")
    val out = graft.operators.Outliers.percentileTiers(df, "value", 2)
      .select("id", "tier").as[(Long, Option[Int])].collect().toMap
    assert(out(99L).isEmpty, "NULL value must yield NULL tier")
    assert(out(1L).contains(1) && out(10L).contains(2))
  }

  test("vocabularyOverlap: hand-computed jaccard between group vocabularies") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "a d"),      // vocab {a,b,c,d}
      ("s2", "a b x"),                     // vocab {a,b,x}
      ("s3", "zz")).toDF("src", "text")    // disjoint
    val out = graft.operators.TextAnalysis.vocabularyOverlap(docs, "src", "text")
      .select("group_a", "group_b", "n_common", "jaccard")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("s1", "s2")) == ((2L, 2.0 / 5))) // {a,b} of {a,b,c,d,x}
    assert(!out.contains(("s1", "s3"))) // empty intersections emit no row
    assert(!out.contains(("s2", "s3")))
  }

  test("emaPerKey: hand-computed fold, first value seeds, order by ts") {
    val df = Seq(
      (1L, ts(2), 10.0), (1L, ts(1), 0.0), (1L, ts(3), 20.0), // order: 0,10,20
      (2L, ts(1), 7.0))
      .toDF("user_id", "ts", "value")
    // key 1: ema = ((0*0.5 + 10*0.5) = 5) * 0.5 + 20*0.5 = 12.5
    val got = graft.operators.Resample.emaPerKey(df, "user_id", "ts", "value", 0.5)
      .select("user_id", "ema", "n_obs").as[(Long, Double, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((12.5, 3L)))
    assert(got(2L) == ((7.0, 1L))) // single value: init only
    intercept[IllegalArgumentException] {
      graft.operators.Resample.emaPerKey(df, "user_id", "ts", "value", 0.0)
    }
  }

  test("kAnonymitySuppress: small groups nulled and flagged, k=1 keeps all") {
    val df = Seq(
      (1L, "a", "x"), (2L, "a", "x"), (3L, "a", "x"),
      (4L, "b", "y")).toDF("id", "q1", "q2")
    val out = graft.operators.Pii.kAnonymitySuppress(df, Seq("q1", "q2"), k = 2)
      .select("id", "q1", "q2", "suppressed")
      .as[(Long, Option[String], Option[String], Boolean)].collect().toSet
    assert(out == Set(
      (1L, Some("a"), Some("x"), false),
      (2L, Some("a"), Some("x"), false),
      (3L, Some("a"), Some("x"), false),
      (4L, None, None, true)))
    val all = graft.operators.Pii.kAnonymitySuppress(df, Seq("q1", "q2"), k = 1)
    assert(all.filter($"suppressed").count() == 0)
  }

  test("file-source checkpoint: a second AvailableNow run ingests only new files") {
    // the continuous-ingestion contract: re-running the same sink with
    // the same checkpoint is incremental (new files only) and
    // exactly-once (no duplicates), which is what makes the streaming
    // dedup/sessionize paths restartable mid-corpus
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val (in, out, ckpt) = (s"$root/in", s"$root/out", s"$root/ckpt")
    val schema = spark.range(0).select($"id").schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.range(0, 10).select($"id").coalesce(1)
      .write.mode("append").parquet(in)
    runOnce()
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq == (0L until 10L))
    spark.range(10, 15).select($"id").coalesce(1)
      .write.mode("append").parquet(in)
    runOnce()
    assert(spark.read.parquet(out).as[Long].collect().sorted.toSeq == (0L until 15L),
      "second run must append exactly the new file's rows — no reprocessing, no loss")
  }

  test("hourlyAggregates: windowed counts over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val agg = EventStreams.hourlyAggregates(input.toDF())
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      input.addData(
        Event(1, ts(5), 10, "click", 1.0),
        Event(2, ts(20), 11, "click", 2.0),
        Event(3, ts(70), 10, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .select($"hour", $"event_type", $"n", $"total_value")
        .as[(Timestamp, String, Long, Double)].collect().sortBy(r => (r._1.getTime, r._2))
      assert(rows.toSeq == Seq(
        (Timestamp.valueOf("2024-01-01 00:00:00"), "click", 2L, 3.0),
        (Timestamp.valueOf("2024-01-01 01:00:00"), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("enrichWithDim: stream-static broadcast join matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((10L, "BUILDING"), (11L, "MACHINERY")).toDF("key", "seg")
    val enriched = EventStreams.enrichWithDim(
      input.toDF(), dim, "user_id", "key")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      input.addData(
        Event(1, ts(5), 10, "click", 1.0),
        Event(2, ts(6), 11, "view", 2.0),
        Event(3, ts(7), 99, "click", 3.0)) // no dim row: dropped
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .select($"event_id", $"seg").as[(Long, String)].collect().sortBy(_._1)
      assert(rows.toSeq == Seq(1L -> "BUILDING", 2L -> "MACHINERY"))
    } finally q.stop()
    // the dim side must be broadcast — a shuffle there would repeat
    // per micro-batch (assert on the batch twin: a streaming frame
    // cannot be planned outside writeStream)
    val batchTwin = EventStreams.enrichWithDim(
      Seq(Event(1, ts(5), 10, "click", 1.0)).toDF(), dim, "user_id", "key")
    assert(batchTwin.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    // same-named key on both sides must resolve (side-qualified join),
    // not throw ambiguity or degenerate to a cross join
    val sameName = Seq((10L, "BUILDING"), (77L, "OTHER"))
      .toDF("user_id", "seg")
    val joined = EventStreams.enrichWithDim(
      Seq(Event(1, ts(5), 10, "click", 1.0)).toDF(), sameName,
      "user_id", "user_id")
    assert(joined.select($"seg").as[String].collect().toSeq == Seq("BUILDING"))
  }

  test("sessionize: sessions close on inactivity gap (event-time)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStreams.sessionize(input.toDS(), gapMinutes = 30, watermark = "0 seconds")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // user 1: two events 10 min apart (one session), then 90 min gap
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0),
        Event(3, ts(100), 1, "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to time the second session out
      input.addData(Event(4, ts(600), 2, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(5, ts(1200), 2, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .filter($"user_id" === 1)
        .orderBy($"session_start")
        .collect()
        .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3), r.getDouble(4)))
      assert(got.length == 2)
      assert(got(0) == (ts(0), ts(10), 2L, 3.0))
      assert(got(1) == (ts(100), ts(100), 1L, 5.0))
    } finally q.stop()
  }

  test("file-source streaming: events parquet driven through readStream") {
    // schema must be provided for file sources: capture whatever the
    // writer produced (int64 nanos or a real timestamp) with a batch
    // read under the nanos flag; normalizeTs converts either in-plan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet").schema
    // file streams require a directory source — stage a link dir
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream.schema(schema)
      .parquet(streamDir.toString)
      .transform(d => graft.sources.Sources.normalizeTs(d, "ts"))
    val agg = EventStreams.hourlyAggregates(stream)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("file_stream_out").start()
    try {
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; all but the
      // final watermark-straddling hours of the fixture must be out
      val n = spark.table("file_stream_out").count()
      assert(n > 0, "no closed windows emitted")
      // spot-check against the batch equivalent for an early hour
      val batch = graft.sources.Sources.nanosTimestampParquet(
        spark, "/root/testdata/sf0.001/events.parquet", "ts")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val firstHour = batch.orderBy("hour").select("hour").limit(1)
        .collect().head.getTimestamp(0)
      val streamed = spark.table("file_stream_out")
        .filter($"hour" === firstHour).select($"event_type", $"n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val expected = batch.filter($"hour" === firstHour)
        .select($"event_type", $"n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(streamed == expected)
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
  }

  test("streamingContentDedup: first-seen doc per content hash survives") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = EventStreams.streamingContentDedup(
      input.toDF().toDF("doc_id", "ts", "text"), watermark = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      // same batch: duplicate text -> one survivor (first by stream order)
      input.addData((1L, ts(0), "alpha"), (2L, ts(1), "alpha"), (3L, ts(1), "beta"))
      q.processAllAvailable()
      // later batch within the watermark: still deduped against state
      input.addData((4L, ts(5), "alpha"), (5L, ts(6), "gamma"))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select($"doc_id", $"text").as[(Long, String)].collect().toSet
      assert(got.map(_._2) == Set("alpha", "beta", "gamma"))
      assert(got.size == 3, s"duplicates leaked: $got")
      // the alpha survivor is one of the first-batch rows, not doc 4
      assert(!got.map(_._1).contains(4L))
    } finally q.stop()
  }

  test("funnelPairs: stream-stream interval join with bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val funnel = EventStreams.funnelPairs(
      input.toDF(), "click", "purchase", withinMinutes = 30, watermark = "0 seconds")
    val q = funnel.writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "purchase", 5.0),  // within 30 min -> pair
        Event(3, ts(50), 1, "purchase", 7.0),  // 50 min after click -> no pair
        Event(4, ts(5), 2, "purchase", 9.0))   // different user's purchase
      q.processAllAvailable()
      // advance the watermark so matched pairs are emitted
      input.addData(Event(9, ts(600), 9, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(10, ts(1200), 9, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("funnel_out")
        .select($"user_id", $"first_id", $"then_id")
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 1L, 2L)), s"got $got")
    } finally q.stop()
  }

  test("funnelPairs batch form matches a plain SQL interval self-join") {
    val ev = graft.sources.Sources.nanosTimestampParquet(
      spark, "/root/testdata/sf0.001/events.parquet", "ts")
    val viaOp = EventStreams.funnelPairs(ev, "click", "purchase", 30)
      .select($"user_id", $"first_id", $"then_id")
      .as[(Long, Long, Long)].collect().toSet
    ev.createOrReplaceTempView("ev_funnel")
    val viaSql = spark.sql(
      """SELECT a.user_id, a.event_id, b.event_id
        |FROM ev_funnel a JOIN ev_funnel b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTES""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet
    assert(viaOp == viaSql && viaOp.nonEmpty)
  }

  test("sessionizeBatch matches streaming semantics on the events table") {
    val ev = graft.sources.Sources.nanosTimestampParquet(
      spark, "/root/testdata/sf0.001/events.parquet", "ts")
    val sessions = EventStreams.sessionizeBatch(ev, gapMinutes = 30)
    val n = sessions.count()
    assert(n > 0)
    // session invariants: start <= end, n_events >= 1, no user has
    // overlapping sessions
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"session_start")
    val bad = sessions
      .withColumn("prev_end", lag($"session_end", 1).over(w))
      .filter($"prev_end".isNotNull &&
        unix_millis($"session_start") - unix_millis($"prev_end") <= 30 * 60 * 1000L)
      .count()
    assert(bad == 0)
    assert(sessions.filter($"session_start" > $"session_end").count() == 0)
  }
}
