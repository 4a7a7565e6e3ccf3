package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("hashSample is deterministic and partition-independent") {
    val a = Sampling.hashSample(docs, "doc_id", 0.2, salt = "s")
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.2, salt = "s")
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    // approximately the requested fraction (md5 uniformity over 500 keys)
    assert(a.size > 50 && a.size < 150, s"got ${a.size} of 500 at fraction 0.2")
    // different salts decorrelate
    val c = Sampling.hashSample(docs, "doc_id", 0.2, salt = "other")
      .select($"doc_id").as[Long].collect().toSet
    assert(c != a)
  }

  test("hashSplit is disjoint and exhaustive") {
    val (train, test) = Sampling.hashSplit(docs, "doc_id", 0.25, salt = "split")
    val tr = train.select($"doc_id").as[Long].collect().toSet
    val te = test.select($"doc_id").as[Long].collect().toSet
    assert(tr.intersect(te).isEmpty)
    assert(tr.size + te.size == docs.count())
    assert(te.nonEmpty && tr.nonEmpty)
  }

  test("stratifiedHashSample keeps only listed classes at per-class fractions") {
    val withCls = docs.withColumn("cls",
      when($"doc_id" % 3 === 0, "a").when($"doc_id" % 3 === 1, "b").otherwise("c"))
    val got = Sampling.stratifiedHashSample(
      withCls, "doc_id", "cls", Map("a" -> 1.0, "b" -> 0.2))
    val byCls = got.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(!byCls.contains("c"), "unlisted class must be dropped")
    assert(byCls("a") == withCls.filter($"cls" === "a").count(), "fraction 1.0 keeps all")
    assert(byCls.getOrElse("b", 0L) > 0 && byCls("b") < withCls.filter($"cls" === "b").count())
  }

  test("threshold edges: fraction 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.hashSample(docs, "doc_id", 1.0).count() == docs.count())
    assert(Sampling.thresholdHex(0.5) == "8" + "0" * 31)
  }

  test("perKeyCap: bounded per key, deterministic, monotone in the cap") {
    val c3 = Sampling.perKeyCap(docs, "source", "doc_id", cap = 3, salt = "c")
    val perKey = c3.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perKey.values.forall(_ <= 3) && perKey.values.exists(_ == 3))
    // keys with <= cap rows keep everything
    val small = docs.groupBy("source").count().filter($"count" <= 3)
      .as[(String, Long)].collect().toMap
    small.foreach { case (k, n) => assert(perKey(k) == n) }
    // deterministic and partition-independent
    val again = Sampling.perKeyCap(docs.repartition(7), "source", "doc_id", 3, "c")
      .select($"doc_id").as[Long].collect().toSet
    assert(again == c3.select($"doc_id").as[Long].collect().toSet)
    // a larger cap keeps a superset (smallest-hash winners are stable)
    val c5 = Sampling.perKeyCap(docs, "source", "doc_id", 5, "c")
      .select($"doc_id").as[Long].collect().toSet
    assert(again.subsetOf(c5))
    intercept[IllegalArgumentException] {
      Sampling.perKeyCap(docs, "source", "doc_id", 0)
    }
  }

  test("temperatureSample: alpha=1 keeps all, alpha=0 equalizes expectations") {
    import graft.operators.Mixture
    val langs = Seq("de", "en", "es", "fr", "zh")
    // alpha=1: weights = natural shares -> every class binds -> rate 1
    val nat = Mixture.temperatureSample(docs, "doc_id", "lang", langs, 1.0, "t")
    assert(nat.count() == docs.filter($"lang".isInCollection(langs)).count())
    // alpha=0: uniform weights -> every class downsamples to ~min count
    val counts = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val minN = langs.map(counts).min
    val uni = Mixture.temperatureSample(docs, "doc_id", "lang", langs, 0.0, "t")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(uni(langs.minBy(counts)) == minN, "binding (smallest) class keeps all")
    langs.foreach { l =>
      assert(math.abs(uni(l) - minN.toDouble) <= 4 * math.sqrt(minN.toDouble),
        s"$l: ${uni(l)} vs expected ~$minN")
    }
    // alpha=0.5 sits between: en (the head class) downsampled, tail kept
    val half = Mixture.temperatureSample(docs, "doc_id", "lang", langs, 0.5, "t")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(half("en") < counts("en") && half("en") > uni("en"))
  }

  test("mixtureSampleWithRates: frozen rates apply to new batches without re-scan") {
    import graft.operators.Mixture
    val rates = Map("en" -> 1.0, "de" -> 0.5)
    val batch = docs.filter($"doc_id" < 100)
    val out = Mixture.mixtureSampleWithRates(batch, "doc_id", "lang", rates, "r")
    // membership is decided per row: the same rows survive whether the
    // rates were fit on this frame or anywhere else
    val direct = batch.filter(
      ($"lang" === "en") ||
        ($"lang" === "de" &&
          substring(Sampling.keyHash($"doc_id", "r"), 1, 15)
            < Mixture.prefixThresholdHex(0.5)))
    assert(out.select($"doc_id").as[Long].collect().toSet ==
      direct.select($"doc_id").as[Long].collect().toSet)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase(java.util.Locale.ROOT).contains("aggregate"))
  }

  test("tokenBudgetSample: budget respected per source, overshoot <= one doc, deterministic") {
    val budget = 1500L
    val got = Sampling.tokenBudgetSample(
      docs.filter($"text".isNotNull), "doc_id", "source", "text", budget, salt = "tb")
    val rows = got.select($"doc_id".as[Long], $"source".as[String],
      $"n_tokens".as[Long], $"cum_tokens".as[Long]).collect()
    assert(rows.nonEmpty)
    // every kept doc STARTED under budget; running total is consistent
    assert(rows.forall(r => r._4 - r._3 < budget))
    // per source: at most one doc crosses the budget (the last one)
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.count(_._4 >= budget) <= 1, s"source $src overshoots more than once")
    }
    // sources with more material than the budget actually reach it
    val perSourceTotal = docs.filter($"text".isNotNull)
      .groupBy($"source")
      .agg(sum(size(split(lower($"text"), "\\s+"))).as("tot"))
      .as[(String, Long)].collect().toMap
    rows.groupBy(_._2).foreach { case (src, rs) =>
      if (perSourceTotal(src) >= budget)
        assert(rs.map(_._3).sum >= budget, s"source $src under-filled its budget")
    }
    // partition-independent determinism
    val again = Sampling.tokenBudgetSample(
      docs.filter($"text".isNotNull).repartition(7), "doc_id", "source", "text",
      budget, salt = "tb").select($"doc_id").as[Long].collect().toSet
    assert(again == rows.map(_._1).toSet)
  }

  test("labeled split: disjoint, exhaustive, near-target fractions, stable") {
    val ids = (0L until 2000L).toDF("id")
    val out = Sampling.hashSplitLabeled(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
      .select($"id", $"split").as[(Long, String)].collect()
    assert(out.length == 2000, "exhaustive: every row labeled")
    val byLabel = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(math.abs(byLabel("train") - 1600) < 100)
    assert(math.abs(byLabel("val") - 200) < 60)
    // membership is a pure function of (key, salt): re-sharding agrees
    val again = Sampling.hashSplitLabeled(ids.repartition(13), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s1")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(out.toMap == again)
    // different salt reshuffles the assignment
    val salted = Sampling.hashSplitLabeled(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s2")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(out.toMap != salted)
  }

  test("group-aware split: groups never straddle, singletons fall back to own key") {
    // 300 keys; keys 0..99 grouped in threes (group = min member), the
    // rest ungrouped (NULL group — the near-dup cluster frame only
    // labels rows appearing in a pair)
    val rows = (0L until 300L).map { k =>
      (k, if (k < 100) Some((k / 3) * 3) else None)
    }.toDF("id", "grp")
    val out = Sampling.hashSplitGrouped(rows, "id", "grp",
      Seq("train" -> 0.8, "test" -> 0.2), salt = "g1")
      .select($"id", $"grp", $"split").as[(Long, Option[Long], String)]
      .collect()
    // exhaustive + disjoint: one label per row
    assert(out.length == 300 && out.map(_._1).distinct.length == 300)
    // no group straddles the boundary
    out.filter(_._2.isDefined).groupBy(_._2.get).foreach { case (g, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"group $g straddles splits")
    }
    // singletons (NULL group) match a plain row-keyed split exactly
    val plain = Sampling.hashSplitLabeled(
        rows.filter($"grp".isNull), "id",
        Seq("train" -> 0.8, "test" -> 0.2), salt = "g1")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    out.filter(_._2.isEmpty).foreach { case (id, _, sp) =>
      assert(plain(id) == sp)
    }
    // grouped rows match the split their GROUP key would get
    val groupKeyed = Sampling.hashSplitLabeled(
        rows.filter($"grp".isNotNull).select($"grp".as("id")).distinct(), "id",
        Seq("train" -> 0.8, "test" -> 0.2), salt = "g1")
      .select($"id", $"split").as[(Long, String)].collect().toMap
    out.filter(_._2.isDefined).foreach { case (_, g, sp) =>
      assert(groupKeyed(g.get) == sp)
    }
  }

  test("shuffle order: total order, contiguous per-shard ranks, stable") {
    val ids = (0L until 500L).toDF("id")
    val out = Sampling.shuffleOrder(ids, "id", salt = "s", nShards = 4)
      .select($"id", $"shard", $"pos").as[(Long, Int, Long)].collect()
    assert(out.length == 500)
    assert(out.map(r => (r._2, r._3)).distinct.length == 500, "total order")
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        "ranks contiguous from 1 within each shard")
    }
    // decorrelated from id order but identical across re-shardings
    val again = Sampling.shuffleOrder(ids.repartition(11), "id", "s", 4)
      .select($"id", $"shard", $"pos").as[(Long, Int, Long)].collect()
    assert(out.toSet == again.toSet)
    val firstShardByIdOrder = out.sortBy(_._1).take(20).map(_._2).distinct
    assert(firstShardByIdOrder.length > 1, "ids spread across shards")
  }

  test("labeled split: rejects bad fraction sets") {
    val ids = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Sampling.hashSplitLabeled(ids, "id", Seq("a" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplitLabeled(ids, "id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplitLabeled(ids, "id", Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("weighted sample w/o replacement: k per group, no dupes, weight-biased, top-k plan") {
    val rows = (1 to 400).map { i =>
      val g = if (i % 2 == 0) "even" else "odd"
      // half the rows get 50x weight — they should dominate the picks
      val w = if (i <= 200) 50.0 else 1.0
      (i.toLong, g, w)
    }.toDF("id", "g", "w")
    val got = Sampling.weightedSampleWithoutReplacement(
      rows, "id", col("w"), k = 20, groupCols = Seq("g"))
    val picked = got.select($"g", $"id", $"es_rank")
      .as[(String, Long, Int)].collect()
    // exactly k per group, ranks contiguous 1..k, no duplicate ids
    picked.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.length == 20, s"group $g: ${rs.length}")
      assert(rs.map(_._3).sorted.toSeq == (1 to 20), s"group $g ranks")
      assert(rs.map(_._2).distinct.length == 20, s"group $g dupes")
    }
    // bias: heavy rows (id <= 200) expected share = 50/51; even a loose
    // bound separates the hypotheses decisively
    val heavy = picked.count(_._2 <= 200)
    assert(heavy > 30, s"heavy-weight rows under-sampled: $heavy/40")
    // deterministic across runs
    val again = Sampling.weightedSampleWithoutReplacement(
      rows, "id", col("w"), k = 20, groupCols = Seq("g"))
      .select($"g", $"id", $"es_rank").as[(String, Long, Int)].collect()
    assert(again.toSet == picked.toSet)
    // groups smaller than k return whole group; non-positive weights drop
    val tiny = Seq((1L, "a", 1.0), (2L, "a", 0.0), (3L, "a", -4.0))
      .toDF("id", "g", "w")
    val tinyGot = Sampling.weightedSampleWithoutReplacement(
      tiny, "id", col("w"), k = 5, groupCols = Seq("g"))
      .select($"id").as[Long].collect()
    assert(tinyGot.toSeq == Seq(1L))
    // ungrouped path: distributed top-k (TakeOrderedAndProject), no
    // whole-corpus global-sort exchange
    val plan = Sampling.weightedSampleWithoutReplacement(
      rows, "id", col("w"), k = 7).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"ungrouped selection must plan as distributed top-k:\n$plan")
    assert(Sampling.weightedSampleWithoutReplacement(rows, "id", col("w"), k = 7)
      .count() == 7)
  }

  test("neymanAllocation: variance-weighted budget, caps, degenerate fallback") {
    // stratum a: {0, 10} -> sigma 5; b: constant -> sigma 0;
    // c: {0, 20, 40} -> sigma sqrt(800/3) ~ 16.33
    val d = (Seq(("a", 0), ("a", 10)) ++ Seq.fill(3)(("b", 1)) ++
      Seq(("c", 0), ("c", 20), ("c", 40))).toDF("g", "v")
    val r = Sampling.neymanAllocation(d, Seq("g"), "v", n = 6L)
      .select($"g", $"n_rows", $"sigma_micro", $"weight_micro", $"alloc")
      .as[(String, Long, Long, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    assert(r("a")._2 == 2L && r("a")._3 == 5000000L)
    // micro-σ: a = 5.0 -> 5,000,000; c = sqrt(800/3) = 16.329932 ->
    // 16,329,932 (floor(σ·1e6 + 0.5) — pure IEEE, no engine round()).
    assert(r("c")._3 == 16329932L)
    // weights: a = 2*5e6 = 1e7, c = 3*16329932 = 48,989,796; total
    // 58,989,796. ideal: a = 6*1e7/58989796 = 1.017 -> floor 1;
    // c = 4.98 -> floor 3 (cap); short = 2. Greedy fill by remainder:
    // c first (rem 1.98) but no headroom, a next absorbs 1 (cap 2),
    // overflow lands on b — the budget fills EXACTLY even though a
    // cap bound (sum = 6)
    assert(r("a")._5 == 2L && r("c")._5 == 3L && r("b")._5 == 1L)
    assert(r.values.map(_._5).sum == 6L, "budget must fill when capacity allows")
    // zero-variance stratum has zero WEIGHT (only cap overflow reaches it)
    assert(r("b")._4 == 0L)
    // all-degenerate: proportional fallback by n_rows
    val const = Seq(("x", 5), ("x", 5), ("y", 5), ("y", 5), ("y", 5), ("y", 5))
      .toDF("g", "v")
    val f = Sampling.neymanAllocation(const, Seq("g"), "v", n = 3L)
      .select($"g", $"alloc").as[(String, Long)].collect().toMap
    assert(f("x") == 1L && f("y") == 2L)
  }

  test("neymanAllocation: NULL values — observed-count sigma, NULL-only stratum errors") {
    // partially-NULL stratum: sigma comes from the OBSERVED values
    // {0, 10} (sigma 5), while n_rows stays 3 (allocation caps count
    // rows); before the fix the denominator was n_rows and sigma
    // silently shrank to sqrt(200/3) ~ 8.16e6 micro
    val part = Seq(("a", Some(0)), ("a", Some(10)), ("a", None),
      ("b", Some(0)), ("b", Some(20))).toDF("g", "v")
    val r = Sampling.neymanAllocation(part, Seq("g"), "v", n = 4L)
      .select($"g", $"n_rows", $"sigma_micro").as[(String, Long, Long)]
      .collect().map(t => t._1 -> t).toMap
    assert(r("a")._2 == 3L && r("a")._3 == 5000000L)
    assert(r("b")._3 == 10000000L)
    // NULL-only stratum: a dedicated error, not the misleading
    // "moment overflow" message
    val allNull = Seq(("a", Some(1)), ("x", None), ("x", None))
      .toDF("g", "v")
    val e = intercept[Exception] {
      Sampling.neymanAllocation(allNull, Seq("g"), "v", n = 2L).collect()
    }
    assert(e.getMessage.contains("no non-NULL values"),
      s"wrong error: ${e.getMessage}")
  }
}
