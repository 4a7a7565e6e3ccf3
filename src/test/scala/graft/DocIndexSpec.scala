package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.store.VectorStore

/** Materialized doc-field sidecar: indexed route ≡ scan route through
  * the full mutate lifecycle, with the predicate actually pushed into
  * the sidecar's parquet scan.
  */
class DocIndexSpec extends SparkSuite {
  import spark.implicits._

  private def mkStore(tag: String, tombstones: Boolean = true): VectorStore = {
    val root = Files.createTempDirectory(s"graft-dx-$tag").toString + "/s"
    VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = tombstones)
  }

  private def vec(seed: Int): Array[Float] =
    Array(seed.toFloat, (seed * 2).toFloat, 0f, 1f)

  private def docJson(g: Int, s: String): String =
    s"""{"g": "$g", "s": "$s"}"""

  private def seed(store: VectorStore, n: Int): Unit =
    store.insert(
      (0 until n).map(vec),
      (0 until n).map(i => docJson(i % 3, s"src${i % 5}")))

  test("indexed route ≡ scan route, and survives insert/delete/upsert") {
    val store = mkStore("life")
    seed(store, 30)
    val scanBefore = store.queryByDoc(Seq("g"), Seq("1")).map(_.id)
    store.materializeDocField(Seq("g"))
    assert(store.hasDocIndex(Seq("g")))
    assert(store.materializedDocFields == Seq(Seq("g")))
    assert(store.queryByDoc(Seq("g"), Seq("1")).map(_.id) == scanBefore)

    // post-materialization insert is picked up (O(batch) sidecar append)
    store.insert(Seq(vec(100)), Seq(docJson(1, "srcX")))
    val afterIns = store.queryByDoc(Seq("g"), Seq("1")).map(_.id)
    assert(afterIns.contains(30L), s"new row missing from indexed route: $afterIns")

    // delete: tombstone-masked out of the sidecar route
    val victim = afterIns.head
    store.delete(Seq(victim))
    assert(!store.queryByDoc(Seq("g"), Seq("1")).map(_.id).contains(victim))

    // upsert with a CHANGED field value under a reused id: the old
    // sidecar row must not resurrect the id for its old value
    val target = store.queryByDoc(Seq("g"), Seq("2")).map(_.id).head
    store.upsert(Seq(target), Seq(vec(7)), Seq(docJson(0, "srcY")))
    assert(!store.queryByDoc(Seq("g"), Seq("2")).map(_.id).contains(target),
      "stale sidecar value matched after upsert")
    assert(store.queryByDoc(Seq("g"), Seq("0")).map(_.id).contains(target))

    // full agreement with the scan route after all mutations
    store.dropDocField(Seq("g"))
    assert(!store.hasDocIndex(Seq("g")))
    val scanAfter = store.queryByDoc(Seq("g"), Seq("0", "2")).map(_.id)
    store.materializeDocField(Seq("g"))
    assert(store.queryByDoc(Seq("g"), Seq("0", "2")).map(_.id) == scanAfter)
  }

  test("compact folds tombstones without resurrecting old values") {
    val store = mkStore("cmp")
    seed(store, 20)
    store.materializeDocField(Seq("g"))
    val victim = store.queryByDoc(Seq("g"), Seq("1")).map(_.id).head
    store.delete(Seq(victim))
    store.compact() // mask is gone — sidecar must have been rebuilt
    assert(!store.queryByDoc(Seq("g"), Seq("1")).map(_.id).contains(victim))
    // plain layout (rewrite deletes, no tombstones): rebuild-on-delete
    val plain = mkStore("plain", tombstones = false)
    seed(plain, 12)
    plain.materializeDocField(Seq("s"))
    val v2 = plain.queryByDoc(Seq("s"), Seq("src2")).map(_.id).head
    plain.delete(Seq(v2))
    assert(!plain.queryByDoc(Seq("s"), Seq("src2")).map(_.id).contains(v2))
  }

  test("deleteWhere and searchWhere route through the sidecar") {
    val store = mkStore("dw")
    seed(store, 24)
    store.materializeDocField(Seq("g"))
    // filtered exact search agrees with the scan-route contract
    val hits = store.searchWhere(Seq(vec(3)), k = 2, Seq("g"), Seq("1"))
    assert(hits.head.nonEmpty)
    hits.head.foreach { r =>
      assert(get_json(r.doc) == "1")
    }
    val n = store.deleteWhere(Seq("g"), Seq("1"))
    assert(n > 0)
    assert(store.queryByDoc(Seq("g"), Seq("1")).isEmpty)
  }

  private def get_json(doc: String): String = {
    val m = """"g": "(\d+)"""".r.findFirstMatchIn(doc)
    m.map(_.group(1)).getOrElse("?")
  }

  test("numeric range index: parity, lifecycle, retention delete, pushdown") {
    val store = mkStore("num")
    store.insert((0 until 30).map(vec),
      (0 until 30).map(i => s"""{"ts": ${i * 10}, "g": "${i % 3}"}"""))
    // scan route baseline
    val scanIds = store.queryByDocRangeDF(Seq("ts"), Some(50.0), Some(120.0))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(scanIds == (5L to 12L).toSeq)
    store.materializeDocFieldNumeric(Seq("ts"))
    assert(store.hasDocIndexNumeric(Seq("ts")))
    assert(store.queryByDocRangeDF(Seq("ts"), Some(50.0), Some(120.0))
      .select($"id").as[Long].collect().sorted.toSeq == scanIds)
    // unbounded sides
    assert(store.queryByDocRangeDF(Seq("ts"), None, Some(25.0))
      .select($"id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    // post-materialization insert picked up
    store.insert(Seq(vec(99)), Seq("""{"ts": 55, "g": "9"}"""))
    assert(store.queryByDocRangeDF(Seq("ts"), Some(50.0), Some(60.0))
      .select($"id").as[Long].collect().sorted.toSeq == Seq(5L, 6L, 30L))
    // range pushdown reaches the typed sidecar scan
    val plan = store.queryByDocRangeDF(Seq("ts"), Some(50.0), Some(120.0))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("get_json_object"),
      s"indexed range route must not parse JSON:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(value,50.0)")
      && plan.contains("LessThanOrEqual(value,120.0)"),
      s"range bounds must be pushed into the sidecar scan:\n$plan")
    // retention delete through the index; non-numeric docs never match
    val n = store.deleteWhereRange(Seq("ts"), None, Some(95.0))
    assert(n == 11, s"expected 11 rows below the cutoff, got $n")
    assert(store.queryByDocRangeDF(Seq("ts"), None, Some(1e9))
      .select($"id").as[Long].collect().sorted.toSeq == (10L to 29L).toSeq)
    // upsert with changed ts under a reused id: stale value must not match
    store.upsert(Seq(15L), Seq(vec(1)), Seq("""{"ts": 9999, "g": "0"}"""))
    assert(!store.queryByDocRangeDF(Seq("ts"), Some(150.0), Some(150.0))
      .select($"id").as[Long].collect().contains(15L))
    assert(store.queryByDocRangeDF(Seq("ts"), Some(9000.0), None)
      .select($"id").as[Long].collect().toSeq == Seq(15L))
    store.dropDocFieldNumeric(Seq("ts"))
    assert(!store.hasDocIndexNumeric(Seq("ts")))
  }

  test("parent-doc rollup dispatches through the string sidecar, same results") {
    val store = mkStore("par2")
    // 12 chunks over 4 parents
    store.insert((0 until 12).map(vec),
      (0 until 12).map(i => s"""{"p": ${i / 3}}"""))
    val q = Seq((0L, vec(4))).toDF("qid", "qvec")
    val before = store.searchParentDocsDF(q, k = 3, Seq("p"),
      chunksPerQuery = 6).collect().map(_.toSeq).toSeq
    store.materializeDocField(Seq("p"))
    val after = store.searchParentDocsDF(q, k = 3, Seq("p"),
      chunksPerQuery = 6)
    assert(after.collect().map(_.toSeq).toSeq == before,
      "sidecar parent route must return identical rollups")
    val plan = after.queryExecution.executedPlan.toString
    assert(!plan.contains("get_json_object"),
      s"materialized parent path must not JSON-parse at query time:\n$plan")
  }

  test("streaming ingest maintains the sidecars through the insertDF hook") {
    val store = mkStore("strm")
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("ts"))
    // three applied micro-batches through the SAME foreachBatch body
    // ingestStream uses (replay-guard path exercised separately)
    val ck = Files.createTempDirectory("graft-dx-ck").toString
    (0 until 3).foreach { b =>
      val batch = spark.range(b * 4, b * 4 + 4)
        .select(
          org.apache.spark.sql.functions.array(
            col("id").cast("float"), lit(1f), lit(2f), lit(3f)).as("vec"),
          concat(lit("{\"g\": \""), (col("id") % 2).cast("string"),
            lit("\", \"ts\": "), (col("id") * 10).cast("string"),
            lit("}")).as("doc"),
          col("id").as("ord"))
      assert(store.applyIngestBatch(batch, b.toLong, ck, Seq(col("ord"))))
    }
    assert(store.count() == 12)
    // equality sidecar exact vs scan route
    val idx = store.queryByDoc(Seq("g"), Seq("1")).map(_.id)
    store.dropDocField(Seq("g"))
    assert(store.queryByDoc(Seq("g"), Seq("1")).map(_.id) == idx)
    // numeric sidecar exact vs scan route
    val rIdx = store.queryByDocRangeDF(Seq("ts"), Some(30.0), Some(80.0))
      .select($"id").as[Long].collect().sorted.toSeq
    store.dropDocFieldNumeric(Seq("ts"))
    val rScan = store.queryByDocRangeDF(Seq("ts"), Some(30.0), Some(80.0))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(rIdx == rScan && rIdx == (3L to 8L).toSeq, s"$rIdx vs $rScan")
  }

  test("predicate is pushed into the sidecar scan; no JSON parse in the plan") {
    val store = mkStore("push")
    seed(store, 16)
    store.materializeDocField(Seq("g"))
    val plan = store.queryByDocDF(Seq("g"), Seq("1", "2"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("get_json_object"),
      s"indexed route must not parse JSON at query time:\n$plan")
    assert(plan.contains("In(value") && plan.contains("PushedFilters: [In(value")
      || plan.contains("PushedFilters: [IsNotNull(value), In(value"),
      s"value predicate must reach the sidecar parquet scan:\n$plan")
    // scan route (no index): unchanged plan — JSON filter on the table
    store.dropDocField(Seq("g"))
    val scanPlan = store.queryByDocDF(Seq("g"), Seq("1"))
      .queryExecution.executedPlan.toString
    assert(scanPlan.contains("get_json_object"))
  }

  test("compound predicates: AND of two sidecars, parity through lifecycle, plan pushed") {
    import graft.store.{DocEquals, DocRange}
    val store = mkStore("multi")
    // docs carry a string field g (0/1/2) and a numeric score
    store.insert((0 until 24).map(vec),
      (0 until 24).map(i => s"""{"g": "${i % 3}", "score": ${i * 10}}"""))
    val preds = Seq(
      DocEquals(Seq("g"), Seq("1")),
      DocRange(Seq("score"), Some(40.0), Some(180.0)))
    def ids() = store.queryByDocAllDF(preds)
      .select($"id").as[Long].collect().sorted.toSeq
    // scan route truth: g ∈ {1,4,...}, score in [40,180] → ids 4..18 with id%3==1
    val expect = (0 until 24).filter(i => i % 3 == 1 && i * 10 >= 40 && i * 10 <= 180)
      .map(_.toLong)
    assert(ids() == expect, s"scan route: ${ids()}")
    // materialize BOTH sidecars: same answer, plan has two pushed
    // sidecar scans and zero JSON parsing
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("score"))
    assert(ids() == expect, "indexed route must agree with scan route")
    val plan = store.queryByDocAllDF(preds).queryExecution.executedPlan.toString
    assert(!plan.contains("get_json_object"),
      s"compound indexed route must not parse JSON:\n$plan")
    assert(plan.contains("docidx/") && plan.contains("docidx_num/"),
      s"both sidecars must be scanned:\n$plan")
    assert("PushedFilters: \\[[^\\]]*(In|EqualTo)\\(value".r
      .findFirstIn(plan).nonEmpty,
      s"equality term must push into its sidecar scan:\n$plan")
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(value".r
      .findFirstIn(plan).nonEmpty,
      s"range term must push into its sidecar scan:\n$plan")
    // mixed dispatch: one term materialized, one not — still exact
    store.dropDocFieldNumeric(Seq("score"))
    assert(ids() == expect, "mixed sidecar+scan dispatch must agree")
    store.materializeDocFieldNumeric(Seq("score"))
    // lifecycle: delete a matching row, upsert another out of the set
    store.delete(Seq(expect.head))
    store.upsert(Seq(expect(1)), Seq(vec(99)), Seq("""{"g": "0", "score": 50}"""))
    val after = expect.drop(2)
    assert(ids() == after, s"post-mutation: ${ids()} vs $after")
    // filtered exact search restricted to survivors
    val got = store.searchWhereAll(Seq(vec(after.head.toInt)), k = 2, preds)
    assert(got.head.map(_.id).forall(after.contains), s"${got.head.map(_.id)}")
    // compound delete
    assert(store.deleteWhereAll(preds) == after.size.toLong)
    assert(ids().isEmpty)
    // guards
    intercept[IllegalArgumentException](store.queryByDocAllDF(Seq.empty))
    intercept[IllegalArgumentException](
      store.queryByDocAllDF(Seq(DocRange(Seq("score"), None, None))))
    intercept[IllegalArgumentException](
      store.queryByDocAllDF(Seq(DocEquals(Seq.empty, Seq("1")))))
  }

  test("auto-maintenance rebuilds doc sidecars past the dead-fraction threshold") {
    import graft.store.IndexMaintenancePolicy
    val store = mkStore("amdoc")
    seed(store, 30)
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("g"))
    def deadRows(dir: String): Long = {
      val side = spark.read.parquet(
        new org.apache.hadoop.fs.Path(store.path, dir).toString)
      side.count() - store.queryByDocDF(Seq("g"), Seq("0", "1", "2")).count()
    }
    // no policy: deletes leave masked rows in the sidecars
    store.delete(Seq(0L, 1L))
    assert(deadRows("docidx/g") == 2, "masked rows expected without a policy")
    // policy on: the next delete crosses 20% dead and rebuilds BOTH
    // sidecar families (string + numeric)
    store.enableAutoMaintenance(IndexMaintenancePolicy(docMaxDeadFraction = 0.2))
    store.delete((2L until 10L))
    assert(deadRows("docidx/g") == 0, "string sidecar must be rebuilt")
    assert(deadRows("docidx_num/g") == 0, "numeric sidecar must be rebuilt")
    store.disableAutoMaintenance()
    // indexed route still agrees with the scan route after the rebuild
    val idx = store.queryByDoc(Seq("g"), Seq("1")).map(_.id)
    store.dropDocField(Seq("g"))
    assert(store.queryByDoc(Seq("g"), Seq("1")).map(_.id) == idx)
  }

  test("approx compound search: full probe equals the exact compound ranking") {
    import graft.store.{DocEquals, DocRange}
    val store = mkStore("apxmulti")
    store.insert((0 until 40).map(vec),
      (0 until 40).map(i => s"""{"g": "${i % 3}", "score": ${i * 5}}"""))
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("score"))
    store.buildAnnIndex(nCentroids = 4, iters = 2, seedRounds = 0)
    store.delete(Seq(4L, 7L))
    val preds = Seq(
      DocEquals(Seq("g"), Seq("1", "2")),
      DocRange(Seq("score"), Some(25.0), Some(150.0)))
    val qs = Seq((0L, vec(9)), (1L, vec(21))).toDF("qid", "qvec")
    val approx = store.searchApproxWhereAllDF(qs, k = 4, nProbe = 4, preds)
      .select($"qid", $"id", $"rn").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val exact = store.searchWhereAllDF(qs, k = 4, preds)
      .select($"qid", $"id", $"rn").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(approx == exact, s"full probe must be exact: $approx vs $exact")
    assert(approx.nonEmpty && approx.map(_._2).forall(id =>
      id % 3 != 0 && id * 5 >= 25 && id * 5 <= 150 && id != 4L && id != 7L))
  }

  test("exclusion predicates: complement semantics, anti-join dispatch, sidecar reuse") {
    import graft.store.{DocEquals, DocNotEquals, DocRange}
    val store = mkStore("notmulti")
    // one row (id 20) lacks 'g' entirely — the complement must KEEP it
    store.insert((0 until 21).map(vec),
      (0 until 20).map(i => s"""{"g": "${i % 3}", "score": ${i * 10}}""")
        :+ """{"score": 55}""")
    def ids(preds: Seq[graft.store.DocPredicate]) =
      store.queryByDocAllDF(preds).select($"id").as[Long]
        .collect().sorted.toSeq
    // pure exclusion: every live row not matching g=1, INCLUDING the
    // path-less row
    val not1 = ids(Seq(DocNotEquals(Seq("g"), Seq("1"))))
    assert(not1 == (0L until 21L).filterNot(i => i < 20 && i % 3 == 1),
      s"$not1")
    assert(not1.contains(20L), "path-less row must survive the exclusion")
    // mixed: range AND exclusion
    val mixed = ids(Seq(
      DocRange(Seq("score"), Some(30.0), Some(120.0)),
      DocNotEquals(Seq("g"), Seq("0"))))
    // id 20: score 55 in range, no 'g' → survives the exclusion too
    val expect = (0 until 20)
      .filter(i => i * 10 >= 30 && i * 10 <= 120 && i % 3 != 0)
      .map(_.toLong) :+ 20L
    assert(mixed == expect, s"$mixed vs $expect")
    // materialized dispatch: same answers, exclusion rides the sidecar
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("score"))
    assert(ids(Seq(DocNotEquals(Seq("g"), Seq("1")))) == not1)
    val plan = store.queryByDocAllDF(Seq(
        DocRange(Seq("score"), Some(30.0), Some(120.0)),
        DocNotEquals(Seq("g"), Seq("0"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("get_json_object"),
      s"indexed exclusion must not parse JSON:\n$plan")
    assert(plan.contains("LeftAnti"),
      s"exclusion must dispatch as an anti-join:\n$plan")
    // delete composes
    store.delete(Seq(expect.head))
    assert(ids(Seq(
      DocRange(Seq("score"), Some(30.0), Some(120.0)),
      DocNotEquals(Seq("g"), Seq("0")))) == expect.drop(1))
  }

  test("disjunction predicates: union dispatch, one scan for unindexed members, nesting") {
    import graft.store.{DocAnyOf, DocEquals, DocNotEquals, DocRange}
    val store = mkStore("ormulti")
    store.insert((0 until 24).map(vec),
      (0 until 24).map(i =>
        s"""{"g": "${i % 3}", "score": ${i * 10}, "src": "${if (i % 2 == 0) "a" else "b"}"}"""))
    def ids(preds: Seq[graft.store.DocPredicate]) =
      store.queryByDocAllDF(preds).select($"id").as[Long]
        .collect().sorted.toSeq
    // (g = 1 OR score >= 180) AND src = a
    val preds = Seq(
      DocAnyOf(Seq(DocEquals(Seq("g"), Seq("1")),
        DocRange(Seq("score"), Some(180.0), None))),
      DocEquals(Seq("src"), Seq("a")))
    val expect = (0 until 24)
      .filter(i => (i % 3 == 1 || i * 10 >= 180) && i % 2 == 0)
      .map(_.toLong)
    assert(ids(preds) == expect, s"${ids(preds)} vs $expect")
    // materialized dispatch parity (both OR members + the AND term)
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("score"))
    store.materializeDocField(Seq("src"))
    assert(ids(preds) == expect, "indexed union must agree with scan")
    val plan = store.queryByDocAllDF(preds)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("get_json_object"),
      s"indexed disjunction must not parse JSON:\n$plan")
    // nested OR + exclusion composes
    val nested = Seq(
      DocAnyOf(Seq(
        DocAnyOf(Seq(DocEquals(Seq("g"), Seq("0")))),
        DocRange(Seq("score"), Some(200.0), None))),
      DocNotEquals(Seq("src"), Seq("b")))
    val expect2 = (0 until 24)
      .filter(i => (i % 3 == 0 || i * 10 >= 200) && i % 2 == 0)
      .map(_.toLong)
    assert(ids(nested) == expect2, s"${ids(nested)} vs $expect2")
    // guards: empty OR, exclusion inside OR
    intercept[IllegalArgumentException](ids(Seq(DocAnyOf(Seq.empty))))
    intercept[IllegalArgumentException](ids(Seq(DocAnyOf(Seq(
      DocNotEquals(Seq("g"), Seq("1")))))))
    // no double counting: a row matching BOTH members appears once
    val both = ids(Seq(DocAnyOf(Seq(
      DocEquals(Seq("src"), Seq("a")), DocEquals(Seq("g"), Seq("0"))))))
    assert(both.distinct == both)
  }

  test("compound filter composes with hierarchical routing (full routing = exact)") {
    import graft.store.{DocEquals, DocRange}
    val store = mkStore("hiermulti")
    store.insert((0 until 48).map(vec),
      (0 until 48).map(i => s"""{"g": "${i % 2}", "score": ${i * 2}}"""))
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("score"))
    store.buildAnnIndex(nCentroids = 4, iters = 2, seedRounds = 0)
    store.buildAnnSuperQuantizer(nSuper = 2, iters = 2)
    store.delete(Seq(3L, 5L))
    val preds = Seq(
      DocEquals(Seq("g"), Seq("1")),
      DocRange(Seq("score"), Some(10.0), Some(80.0)))
    val qs = Seq((0L, vec(11)), (1L, vec(33))).toDF("qid", "qvec")
    val hier = store.searchApproxHierAllDF(qs, k = 4, nProbe = 4,
        superProbe = 2, preds)
      .select($"qid", $"id", $"rn").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    val exact = store.searchWhereAllDF(qs, k = 4, preds)
      .select($"qid", $"id", $"rn").as[(Long, Long, Int)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(hier == exact, s"full routing must be exact: $hier vs $exact")
    assert(hier.nonEmpty && hier.map(_._2).forall(id =>
      id % 2 == 1 && id * 2 >= 10 && id * 2 <= 80 && id != 3L && id != 5L))
  }

  test("compound hybrid retrieval: both modalities restricted to the conjunction") {
    import graft.store.{DocEquals, DocRange}
    val store = mkStore("hymulti")
    store.insert((0 until 30).map(vec),
      (0 until 30).map(i =>
        s"""{"g": "${i % 3}", "score": ${i * 10}, "t": "w${i % 4} common"}"""))
    val preds = Seq(
      DocEquals(Seq("g"), Seq("1")),
      DocRange(Seq("score"), Some(40.0), None))
    val matching = (0 until 30)
      .filter(i => i % 3 == 1 && i * 10 >= 40).map(_.toLong).toSet
    def fused() = store.searchHybridAll(
        Seq(vec(7), vec(13)), Seq("common w1", "w2 common"), k = 5, preds)
      .select($"qid", $"id", $"rank").as[(Int, Long, Int)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    val scan = fused()
    assert(scan.nonEmpty)
    assert(scan.map(_._2).forall(matching.contains),
      s"hybrid leaked rows outside the conjunction: ${scan.map(_._2)}")
    // dispatch parity: sidecars + posting index give the same fusion
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("score"))
    store.buildLexIndex()
    assert(fused() == scan,
      "indexed dispatch must fuse identically to the scan dispatch")
    // and through the ANN index (full probe keeps the dense side exact)
    store.buildAnnIndex(nCentroids = 2, iters = 1, seedRounds = 0)
    val approx = store.searchHybridAll(
        Seq(vec(7), vec(13)), Seq("common w1", "w2 common"), k = 5, preds,
        nProbe = 2)
      .select($"qid", $"id", $"rank").as[(Int, Long, Int)].collect()
      .sortBy(r => (r._1, r._3)).toSeq
    assert(approx == scan, "full-probe indexed hybrid must match exact")
  }

  test("auto-maintenance compacts doc sidecars past the file-count cap") {
    import graft.store.IndexMaintenancePolicy
    val store = mkStore("amdocf")
    seed(store, 12)
    store.materializeDocField(Seq("g"))
    def sidecarFiles(): Long = {
      val dir = new org.apache.hadoop.fs.Path(store.path, "docidx/g")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      var n = 0L
      val it = fs.listFiles(dir, true)
      while (it.hasNext) {
        if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
    val base = sidecarFiles()
    store.enableAutoMaintenance(IndexMaintenancePolicy(docMaxFiles = base + 2))
    (0 until 4).foreach(b =>
      store.insert(Seq(vec(50 + b)), Seq(docJson(b % 3, "x"))))
    val after = sidecarFiles()
    store.disableAutoMaintenance()
    assert(after <= base + 3,
      s"file-count compaction must have fired: $base -> $after")
    // indexed route still exact over everything ingested
    val idx = store.queryByDoc(Seq("g"), Seq("1")).map(_.id)
    store.dropDocField(Seq("g"))
    assert(store.queryByDoc(Seq("g"), Seq("1")).map(_.id) == idx)
  }

  test("compound-filtered parent retrieval ranks parents on matching chunks only") {
    import graft.store.{DocEquals, DocRange}
    val store = mkStore("parmulti")
    // 8 parents x 4 chunks; chunk metadata: lang alternates, pos = chunk idx
    store.insert((0 until 32).map(vec),
      (0 until 32).map(i =>
        s"""{"p": ${i / 4}, "lang": "${if (i % 2 == 0) "en" else "de"}", "pos": ${i % 4}}"""))
    val preds = Seq(
      DocEquals(Seq("lang"), Seq("en")),
      DocRange(Seq("pos"), Some(0.0), Some(2.0)))
    val qs = Seq((0L, vec(13))).toDF("qid", "qvec")
    val got = store.searchParentDocsAllDF(qs, k = 3, Seq("p"),
        chunksPerQuery = 32, preds)
      .select($"qid", $"parent", $"rank").as[(Long, Long, Int)]
      .collect().sortBy(_._3).toSeq
    assert(got.nonEmpty)
    // truth: per-parent best chunk among MATCHING chunks (even id, pos<=2)
    val matching = (0 until 32).filter(i => i % 2 == 0 && i % 4 <= 2)
    def l2(a: Array[Float], b: Array[Float]) =
      math.sqrt(a.zip(b).map { case (x, y) =>
        val d = (x - y).toDouble; d * d }.sum)
    val best = matching.groupBy(_ / 4).map { case (p, chunks) =>
      p.toLong -> chunks.map(c => l2(vec(c), vec(13))).min }
    val expect = best.toSeq.sortBy { case (p, d) => (d, p) }
      .take(3).map(_._1)
    assert(got.map(_._2) == expect, s"${got.map(_._2)} vs $expect")
    // indexed dispatch parity
    store.materializeDocField(Seq("lang"))
    store.materializeDocFieldNumeric(Seq("pos"))
    val idx = store.searchParentDocsAllDF(qs, k = 3, Seq("p"),
        chunksPerQuery = 32, preds)
      .select($"qid", $"parent", $"rank").as[(Long, Long, Int)]
      .collect().sortBy(_._3).toSeq
    assert(idx == got)
  }

  test("predicate algebra vs a reference evaluator over random trees (seeded)") {
    import graft.store.{DocAnyOf, DocEquals, DocExists, DocMissing,
      DocNotEquals, DocPredicate, DocRange}
    val store = mkStore("randpred")
    // fields: a ∈ {0..3} (every 6th doc LACKS it), b numeric
    val docs: Seq[Map[String, String]] = (0 until 40).map { i =>
      val base = Map("b" -> (i * 3 % 50).toString)
      if (i % 6 == 0) base else base + ("a" -> (i % 4).toString)
    }
    store.insert((0 until 40).map(vec),
      docs.map(m => m.map { case (k, v) =>
        if (k == "a") s""""$k": "$v"""" else s""""$k": $v"""
      }.mkString("{", ", ", "}")))
    store.materializeDocField(Seq("a"))
    store.materializeDocFieldNumeric(Seq("b"))
    // reference evaluator (string compare for a, double compare for b —
    // the documented dispatch semantics)
    def eval(pr: DocPredicate, d: Map[String, String]): Boolean = pr match {
      case DocEquals(p, vs) =>
        d.get(p.head).exists(v => vs.map(_.toString).contains(v))
      case DocNotEquals(p, vs) => !eval(DocEquals(p, vs), d)
      case DocRange(p, lo, hi) =>
        d.get(p.head).map(_.toDouble)
          .exists(x => lo.forall(x >= _) && hi.forall(x <= _))
      case DocExists(p) => d.contains(p.head)
      case DocMissing(p) => !d.contains(p.head)
      case DocAnyOf(ms) => ms.exists(eval(_, d))
    }
    val rnd = new scala.util.Random(1234L)
    def leaf(): DocPredicate = rnd.nextInt(4) match {
      case 0 =>
        DocEquals(Seq("a"),
          Seq.fill(rnd.nextInt(2) + 1)(rnd.nextInt(5).toString).distinct)
      case 1 =>
        val lo = rnd.nextInt(50).toDouble
        DocRange(Seq("b"), Some(lo), Some(lo + rnd.nextInt(30) + 1))
      case 2 => DocExists(Seq("a"))
      case _ => DocMissing(Seq("a"))
    }
    def tree(depth: Int): DocPredicate =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else DocAnyOf(Seq.fill(rnd.nextInt(2) + 2)(tree(depth - 1)))
    (0 until 12).foreach { case_ =>
      val conj = Seq.fill(rnd.nextInt(2) + 1)(tree(2)) ++
        (if (rnd.nextBoolean())
          Seq(DocNotEquals(Seq("a"), Seq(rnd.nextInt(4).toString)))
        else Seq.empty)
      val got = store.queryByDocAllDF(conj).select($"id").as[Long]
        .collect().sorted.toSeq
      val want = docs.zipWithIndex
        .filter { case (d, _) => conj.forall(eval(_, d)) }
        .map(_._2.toLong)
      assert(got == want, s"case $case_: preds=$conj\n got=$got\nwant=$want")
    }
  }

  test("existence predicates: sidecar ≡ scan, JSON null counts as missing, lifecycle") {
    import graft.store.{DocAnyOf, DocEquals, DocExists, DocMissing, DocRange}
    val store = mkStore("exists")
    // every 4th doc lacks "lic"; every 8th carries an explicit JSON
    // null there (extraction NULL either way — "missing" semantics,
    // matching the scan route and the DuckDB oracle)
    def doc(i: Int): String =
      if (i % 8 == 0) s"""{"lic": null, "x": $i}"""
      else if (i % 4 == 0) s"""{"x": $i}"""
      else s"""{"lic": "l${i % 3}", "x": $i}"""
    store.insert((0 until 40).map(vec), (0 until 40).map(doc))
    def ids(preds: Seq[graft.store.DocPredicate]): Seq[Long] =
      store.queryByDocAllDF(preds).select($"id").as[Long].collect().sorted.toSeq
    val wantHas = (0 until 40).filterNot(i => i % 4 == 0).map(_.toLong)
    val wantNot = (0 until 40).filter(i => i % 4 == 0).map(_.toLong)
    assert(ids(Seq(DocExists(Seq("lic")))) == wantHas, "scan route: exists")
    assert(ids(Seq(DocMissing(Seq("lic")))) == wantNot, "scan route: missing")
    // sidecar route must agree exactly (includes the JSON-null rows)
    store.materializeDocField(Seq("lic"))
    assert(ids(Seq(DocExists(Seq("lic")))) == wantHas, "sidecar: exists")
    assert(ids(Seq(DocMissing(Seq("lic")))) == wantNot, "sidecar: missing")
    // composes through AND / OR / NOT like any positive term
    store.materializeDocFieldNumeric(Seq("x"))
    val both = ids(Seq(DocExists(Seq("lic")),
      DocRange(Seq("x"), Some(10.0), Some(29.0))))
    assert(both == (10 until 30).filterNot(_ % 4 == 0).map(_.toLong))
    val anyOf = ids(Seq(DocAnyOf(Seq(DocMissing(Seq("lic")),
      DocEquals(Seq("lic"), Seq("l1"))))))
    assert(anyOf == (0 until 40)
      .filter(i => i % 4 == 0 || (i % 4 != 0 && i % 3 == 1)).map(_.toLong))
    // lifecycle: delete + upsert keep both routes aligned
    store.delete(Seq(0L, 1L, 4L))
    store.upsert(Seq(8L), Seq(vec(8)), Seq("""{"lic": "l9", "x": 8}"""))
    val afterIdx = ids(Seq(DocMissing(Seq("lic"))))
    store.dropDocField(Seq("lic"))
    assert(ids(Seq(DocMissing(Seq("lic")))) == afterIdx,
      "post-lifecycle parity: sidecar vs scan")
    assert(!afterIdx.contains(8L), "upsert must move a row OUT of missing")
    assert(!afterIdx.contains(0L) && !afterIdx.contains(4L))
  }

  test("adaptive filtered ANN: selective side skips the index (plan-asserted), both sides exact") {
    import graft.store.{DocEquals, DocRange}
    val store = mkStore("adaptive")
    // 200 rows; g = "9" on exactly 4 rows (selective), g = "0" on ~1/3
    // of the corpus (unselective); score = i % 50
    def doc(i: Int): String = {
      val g = if (i % 50 == 7) "9" else (i % 3).toString
      s"""{"g": "$g", "score": ${i % 50}}"""
    }
    def v(i: Int) = Array((i % 11).toFloat, (i / 11).toFloat, (i % 7).toFloat, 1f)
    store.insert((0 until 200).map(v), (0 until 200).map(doc))
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("score"))
    store.buildAnnIndex(nCentroids = 4, iters = 2, seedRounds = 0)
    store.delete(Seq(7L)) // one of the g="9" rows
    val qs = Seq((0L, v(13)), (1L, v(101))).toDF("qid", "qvec")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"qid", $"id", $"rn").as[(Long, Long, Int)]
        .collect().sortBy(r => (r._1, r._3)).toSeq
    // SELECTIVE: 3 live matches <= threshold -> exact arm, NO index scan
    val sel = store.searchApproxWhereAllDF(qs, k = 2, nProbe = 1,
      Seq(DocEquals(Seq("g"), Seq("9"))), refine = 0,
      bruteForceThreshold = 10L)
    assert(!sel.queryExecution.executedPlan.toString.contains("ann/index"),
      "selective side must never touch the probed index")
    assert(rows(sel) ==
      rows(store.searchWhereAllDF(qs, k = 2, Seq(DocEquals(Seq("g"), Seq("9"))))),
      "selective arm must equal the exact filtered ranking")
    // UNSELECTIVE: far above threshold -> probed arm (full probe = exact)
    val unsel = store.searchApproxWhereAllDF(qs, k = 5, nProbe = 4,
      Seq(DocEquals(Seq("g"), Seq("0")),
        DocRange(Seq("score"), Some(0.0), Some(49.0))),
      refine = 0, bruteForceThreshold = 10L)
    assert(unsel.queryExecution.executedPlan.toString.contains("ann/index"),
      "unselective side must keep the probed plan")
    assert(rows(unsel) ==
      rows(store.searchWhereAllDF(qs, k = 5,
        Seq(DocEquals(Seq("g"), Seq("0")),
          DocRange(Seq("score"), Some(0.0), Some(49.0))))),
      "full-probe arm must equal the exact filtered ranking")
    // the hier-routed variant dispatches identically
    store.buildAnnSuperQuantizer(nSuper = 2, iters = 2)
    val selH = store.searchApproxHierAllDF(qs, k = 2, nProbe = 1,
      superProbe = 1, Seq(DocEquals(Seq("g"), Seq("9"))),
      bruteForceThreshold = 10L)
    assert(!selH.queryExecution.executedPlan.toString.contains("ann/index"))
    assert(rows(selH) ==
      rows(store.searchWhereAllDF(qs, k = 2, Seq(DocEquals(Seq("g"), Seq("9"))))))
  }

  test("stale _staging dirs from a crashed rebuild are not fields and get swept") {
    val store = mkStore("staging")
    seed(store, 6)
    store.materializeDocField(Seq("g"))
    store.materializeDocFieldNumeric(Seq("g"))
    // simulate a rebuild that died between the staging write and the
    // activating rename: orphan _staging-<uuid> dirs under both roots
    val conf = spark.sparkContext.hadoopConfiguration
    for (root <- Seq("docidx", "docidx_num")) {
      val p = new org.apache.hadoop.fs.Path(
        store.path, s"$root/_staging-dead-rebuild")
      val fs = p.getFileSystem(conf)
      fs.mkdirs(p)
    }
    // the orphans are NOT reported as materialized JSON paths...
    assert(store.materializedDocFields == Seq(Seq("g")))
    assert(store.materializedNumericDocFields == Seq(Seq("g")))
    // ...and the listing swept them, so inserts never append to them
    // and compact/vacuum never rebuilds them
    for (root <- Seq("docidx", "docidx_num")) {
      val p = new org.apache.hadoop.fs.Path(
        store.path, s"$root/_staging-dead-rebuild")
      assert(!p.getFileSystem(conf).exists(p), s"$root staging not swept")
    }
    // lifecycle unaffected: insert appends only to the real sidecar,
    // indexed route still agrees with the scan route
    store.insert(Seq(vec(100)), Seq(docJson(1, "srcX")))
    val idx = store.queryByDoc(Seq("g"), Seq("1")).map(_.id)
    store.dropDocField(Seq("g"))
    assert(store.queryByDoc(Seq("g"), Seq("1")).map(_.id) == idx)
  }
}
