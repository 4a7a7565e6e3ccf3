package graft

import java.nio.file.Files

import graft.store.{VectorStore, SelectRecord}
import org.scalatest.BeforeAndAfterEach

/** Parity suite ported from the reference's unit tests
  * (/root/reference/test/tests.py — cited per test). Golden literals are
  * preserved exactly.
  */
class VectorStoreParitySpec extends SparkSuite with BeforeAndAfterEach {

  private var dir: String = _
  private def freshStore(dim: Int = 10): VectorStore =
    VectorStore.openOrCreate(spark, dir, dim)

  override def beforeEach(): Unit = {
    dir = Files.createTempDirectory("graft-vs").toString + "/store"
  }

  private def eye(n: Int): Seq[Array[Float]] =
    (0 until n).map(i => Array.tabulate(n)(j => if (i == j) 1f else 0f))

  private def genDocs(ns: Range): Seq[String] = ns.map(n => s"""{"k$n": "v$n"}""")

  test("fresh store is empty (tests.py:19)") {
    assert(freshStore().count() == 0)
  }

  test("insert single / batch / multi-batch (tests.py:32-48)") {
    val s = freshStore()
    val ids1 = s.insert(Seq(Array.fill(10)(0.5f)))
    assert(ids1 == Seq(0L) && s.count() == 1)
    val ids2 = s.insert(eye(10))
    assert(ids2 == (1L to 10L) && s.count() == 11)
    val ids3 = s.insert(eye(10))
    assert(ids3 == (11L to 20L) && s.count() == 21)
  }

  test("insert shape errors (tests.py:50-60)") {
    val s = freshStore()
    intercept[IllegalArgumentException](s.insert(Seq(Array.fill(9)(1f))))
    intercept[IllegalArgumentException](s.insert(Seq(Array.fill(11)(1f))))
    intercept[IllegalArgumentException](
      s.insert(Seq(Array.fill(10)(1f)), Seq("{}", "{}")))
  }

  test("head: n=0, n=1, n=5 round-trip (tests.py:162-193)") {
    val s = freshStore()
    s.insert(eye(10), genDocs(0 until 10))
    assert(s.head(0).isEmpty)
    val h1 = s.head(1)
    assert(h1 == Seq(SelectRecord(0L, null, null)).map(_ => h1.head)) // structural
    assert(h1.head.id == 0L && h1.head.doc == """{"k0": "v0"}""")
    assert(h1.head.vec.toSeq == eye(10).head.toSeq)
    val h5 = s.head()
    assert(h5.map(_.id) == (0L until 5L))
    assert(h5.map(_.doc) == genDocs(0 until 5))
    h5.zipWithIndex.foreach { case (r, i) => assert(r.vec.toSeq == eye(10)(i).toSeq) }
  }

  test("search goldens (tests.py:195-224)") {
    val s = freshStore()
    s.insert(eye(10), genDocs(0 until 10))
    val hits = s.search(Seq(Array(0f, 0f, 0f, 0.5f, 0f, 0f, 0f, 0f, 0f, 1f)), k = 2)
    assert(hits.size == 1)
    val top = hits.head
    assert(top.map(_.id) == Seq(9L, 3L))
    assert(top(0).distance == 0.5f)
    assert(top(1).distance == 1.118034f) // exact np.float32 golden
    assert(top(0).doc == """{"k9": "v9"}""")
  }

  test("search multi-query goldens (tests.py:226-275)") {
    val s = freshStore()
    s.insert(eye(10), genDocs(0 until 10))
    val q1 = Array(1f, 0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val q2 = Array(0f, 1f, 0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val hits = s.search(Seq(q1, q2), k = 2)
    assert(hits.size == 2 && hits.forall(_.size == 2))
    // exact reference goldens: ids, vecs, docs, np.float32 distances
    assert(hits(0).map(_.id) == Seq(0L, 1L))
    assert(hits(1).map(_.id) == Seq(1L, 2L))
    hits(0).zip(Seq(0, 1)).foreach { case (r, bv) =>
      assert(r.vec.toSeq == eye(10)(bv).toSeq)
      assert(r.doc == s"""{"k$bv": "v$bv"}""")
    }
    Seq(hits(0), hits(1)).foreach { h =>
      assert(h(0).distance == 0.5f)
      assert(h(1).distance == 1.118034f)
    }
  }

  test("zero-distance self match (tests.py:296-309)") {
    val s = freshStore()
    s.insert(eye(10))
    val hits = s.search(Seq(eye(10)(4)), k = 1)
    assert(hits.head.head.id == 4L && hits.head.head.distance == 0.0f)
  }

  test("all-ties break toward earlier-inserted ids (tests.py:311-338)") {
    val s = freshStore()
    s.insert(eye(10))
    // zero query: every unit vector is at distance 1.0 — argsort keeps
    // position order, i.e. ascending id
    val hits = s.search(Seq(Array.fill(10)(0f)), k = 3)
    assert(hits.head.map(_.id) == Seq(0L, 1L, 2L))
    assert(hits.head.forall(_.distance == 1.0f))
  }

  test("search k > n raises (tests.py:279-284)") {
    val s = freshStore()
    s.insert(eye(10))
    intercept[IllegalArgumentException](s.search(Seq(eye(10)(0)), k = 11))
  }

  test("persistence: reopen from existing path (tests.py:277-294)") {
    val s = freshStore()
    s.insert(eye(10), genDocs(0 until 10))
    val reopened = VectorStore.openOrCreate(spark, dir, 10)
    assert(reopened.count() == 10)
    val hits = reopened.search(Seq(eye(10)(3)), k = 1)
    assert(hits.head.head.id == 3L)
    intercept[IllegalArgumentException](VectorStore.openOrCreate(spark, dir, 7))
  }

  test("delete single / subset / all (tests.py:340-381)") {
    val s = freshStore()
    s.insert(eye(10))
    assert(s.delete(Seq(3L)) == 1L && s.count() == 9)
    assert(s.delete(Seq(0L, 9L)) == 2L && s.count() == 7)
    assert(s.delete((0L to 9L).toSeq) == 7L && s.count() == 0)
  }

  test("delete leaves id holes; later inserts continue from max (tests.py:383-407)") {
    val s = freshStore()
    s.insert(eye(10).take(5).map(_.take(10)))
    s.delete(Seq(2L))
    s.insert(eye(10).take(3))
    assert(s.toDF.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq ==
      Seq(0L, 1L, 3L, 4L, 5L, 6L, 7L))
    // index and durable store agree
    assert(s.dumpVecs().length == 7)
  }

  test("delete missing ids warns but deletes the present ones (tests.py:245-251)") {
    val s = freshStore()
    s.insert(eye(10))
    assert(s.delete(Seq(5L, 42L)) == 1L)
    assert(s.count() == 9)
  }

  test("upsert replaces existing ids, inserts new, leaves others untouched") {
    val s = freshStore()
    s.insert(eye(10), genDocs(0 until 10))
    val v = Array.tabulate(10)(_ => 9f)
    // 2 replacements + 1 insert at an explicit hole-making id
    val (replaced, inserted) =
      s.upsert(Seq(3L, 7L, 42L), Seq(v, v, v), Seq("""{"u": 1}""", null, """{"u": 3}"""))
    assert((replaced, inserted) == (2L, 1L))
    assert(s.count() == 11)
    val got = s.selectIds(Seq(3L, 7L, 42L))
    assert(got.map(_.id) == Seq(3L, 7L, 42L))
    assert(got.forall(_.vec.forall(_ == 9f)))
    assert(got.map(_.doc) == Seq("""{"u": 1}""", "{}", """{"u": 3}"""))
    // untouched row still intact; later insert continues after max id
    assert(s.selectIds(Seq(0L)).head.vec(0) == 1f)
    assert(s.insert(Seq(v)) == Seq(43L))
  }

  test("upsert rejects duplicate ids and wrong dimensions") {
    val s = freshStore()
    s.insert(eye(10))
    val v = Array.fill(10)(1f)
    intercept[IllegalArgumentException](s.upsert(Seq(1L, 1L), Seq(v, v)))
    intercept[IllegalArgumentException](s.upsert(Seq(1L), Seq(Array.fill(9)(1f))))
    intercept[IllegalArgumentException](s.upsert(Seq(1L, 2L), Seq(v)))
    assert(s.count() == 10)
  }

  test("selectIds: ascending order, missing ids silently absent (tests.py:493-514)") {
    val s = freshStore()
    s.insert(eye(10), genDocs(0 until 10))
    val got = s.selectIds(Seq(7L, 2L, 99L))
    assert(got.map(_.id) == Seq(2L, 7L))
    assert(got.head.doc == """{"k2": "v2"}""")
    assert(s.selectIds(Seq.empty).isEmpty)
  }

  test("dumpVecs: insertion order, consistent after delete (tests.py:516-543)") {
    val s = freshStore()
    s.insert(eye(10))
    val all = s.dumpVecs()
    assert(all.length == 10)
    all.zipWithIndex.foreach { case (v, i) => assert(v.toSeq == eye(10)(i).toSeq) }
    s.delete(Seq(4L))
    val after = s.dumpVecs()
    assert(after.length == 9)
    // order preserved: position 4 now holds the former id-5 vector
    assert(after(4).toSeq == eye(10)(5).toSeq)
  }

  test("queryByDoc: string and typed int values (tests.py:466-486)") {
    val s = freshStore()
    s.insert(eye(10).take(3), Seq("""{"k": "v1", "n": 1}""", """{"k": "v2", "n": 2}""", """{"k": "v3", "n": 3}"""))
    val byStr = s.queryByDoc(Seq("k"), Seq("v2"))
    assert(byStr.map(_.id) == Seq(1L))
    val byInt = s.queryByDoc(Seq("n"), Seq(1, 3))
    assert(byInt.map(_.id) == Seq(0L, 2L))
    // nested path
    val s2 = freshStore2()
    s2.insert(eye(10).take(2), Seq("""{"a": {"b": "x"}}""", """{"a": {"b": "y"}}"""))
    assert(s2.queryByDoc(Seq("a", "b"), Seq("y")).map(_.id) == Seq(1L))
  }

  private def freshStore2(): VectorStore =
    VectorStore.openOrCreate(spark, Files.createTempDirectory("graft-vs2").toString + "/store", 10)

  test("diffVersions: added/removed/changed/unchanged across writes") {
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    s.insert(eye(10).take(4), genDocs(0 until 4))
    val v1 = s.currentVersion().get
    s.delete(Seq(1L))
    s.upsert(Seq(2L), Seq(Array.fill(10)(0.25f)))
    s.insert(eye(10).take(1))
    val v2 = s.currentVersion().get
    val d = s.diffVersions(v1, v2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d == Map(0L -> "unchanged", 1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "added"))
    // doc-only change counts as changed
    import spark.implicits._
    s.upsert(Seq(3L), Seq(eye(10)(3)), Seq("""{"touched": true}"""))
    val v3 = s.currentVersion().get
    assert(s.diffVersions(v2, v3).filter($"status" === "changed")
      .select($"id").as[Long].collect().toSeq == Seq(3L))
    // identical versions: everything unchanged
    assert(s.diffVersions(v3, v3).filter($"status" =!= "unchanged")
      .count() == 0L)
  }

  test("searchWhere: pre-filter semantics, k caps at match count, errors") {
    val s = freshStore()
    s.insert(eye(10).take(4), Seq(
      """{"t": "a"}""", """{"t": "b"}""", """{"t": "a"}""", """{"t": "b"}"""))
    // query = e0: unfiltered nearest is id 0, but filter t=b restricts
    // to {1, 3}; both at distance sqrt(2), tie toward lower id
    val q = Array.tabulate(10)(j => if (j == 0) 1f else 0f)
    val hits = s.searchWhere(Seq(q), k = 2, Seq("t"), Seq("b")).head
    assert(hits.map(_.id) == Seq(1L, 3L))
    assert(hits.forall(h => math.abs(h.distance - math.sqrt(2f).toFloat) < 1e-6))
    // k larger than the match count caps (filter decides the pool)
    assert(s.searchWhere(Seq(q), k = 10, Seq("t"), Seq("b")).head.size == 2)
    // no matches: empty result, not an error
    assert(s.searchWhere(Seq(q), k = 1, Seq("t"), Seq("zzz")).head.isEmpty)
    // contract errors follow search
    intercept[IllegalArgumentException] {
      s.searchWhere(Seq(q), k = 0, Seq("t"), Seq("b"))
    }
    intercept[IllegalArgumentException] {
      s.searchWhere(Seq(Array(1f, 2f)), k = 1, Seq("t"), Seq("b"))
    }
  }

  test("searchByDoc goldens (tests.py:545-565)") {
    val s = freshStore()
    s.insert(eye(10).take(5), genDocs(0 until 5))
    val hits = s.searchByDoc(Seq("""{"1": "1"}"""), k = 5)
    val top = hits.head
    assert(top.head.id == 1L)
    assert(top.head.distance == 9.090909090909093) // exact float64 golden
    assert(top.tail.forall(_.distance == 27.272727272727266))
    // rapidfuzz scan-order tie-break: remaining ids ascending
    assert(top.tail.map(_.id) == Seq(0L, 2L, 3L, 4L))
  }

  test("searchByDoc multi-query goldens (tests.py:567-598)") {
    val s = freshStore()
    // reference uses all-ones vectors; docs {"k0":"v0"}..{"k4":"v4"}
    s.insert(Seq.fill(5)(Array.fill(10)(1f)), genDocs(0 until 5))
    // query 0 is a dict json-dumped; query 1 a bare string str()'d
    val hits = s.searchByDoc(Seq("""{"k1": ""}""", "v4"), k = 3)
    assert(hits.size == 2 && hits.forall(_.size == 3))
    assert(hits(0)(0).id == 1L)
    assert(hits(0)(0).doc == """{"k1": "v1"}""")
    assert(hits(0)(0).distance == 9.090909090909093)  // exact float64 goldens
    assert(hits(0)(1).distance == 18.181818181818187)
    assert(hits(1)(0).id == 4L)
    assert(hits(1)(0).doc == """{"k4": "v4"}""")
    assert(hits(1)(0).distance == 71.42857142857143)
    assert(hits(1)(1).distance == 85.71428571428571)
  }

  test("searchByDoc k<=0 raises; k>n caps (tests.py:600-617)") {
    val s = freshStore()
    s.insert(eye(10).take(3), genDocs(0 until 3))
    intercept[IllegalArgumentException](s.searchByDoc(Seq("{}"), k = 0))
    intercept[IllegalArgumentException](s.searchByDoc(Seq("{}"), k = -2))
    val hits = s.searchByDoc(Seq("""{"k1": "v1"}"""), k = 10)
    assert(hits.head.size == 3) // capped at n, no error
  }

  test("null docs default to {} (vector_store.py:126-137, 213-215)") {
    val s = freshStore()
    s.insert(Seq(eye(10)(0), eye(10)(1)), Seq(null, """{"x": 1}"""))
    assert(s.head(1).head.doc == "{}")
    val noDocs = freshStore2()
    noDocs.insert(eye(10).take(2))
    assert(noDocs.head(2).forall(_.doc == "{}"))
  }

  test("searchDF matches search results without collecting the index") {
    import spark.implicits._
    val s = freshStore()
    s.insert(eye(10), genDocs(0 until 10))
    val queries = Seq(
      (0L, Array(0f, 0f, 0f, 0.5f, 0f, 0f, 0f, 0f, 0f, 1f)),
      (1L, eye(10)(7))).toDF("qid", "qvec")
    val got = s.searchDF(queries, k = 2)
      .select($"qid", $"id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((0L, 9L, 1), (0L, 3L, 2), (1L, 7L, 1), (1L, 0L, 2)))
  }

  test("tombstone layout: identical delete semantics, O(batch) deletes, compaction") {
    val dir2 = Files.createTempDirectory("graft-ts").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir2, 10, tombstoneDeletes = true)
    s.insert(eye(10))
    assert(s.delete(Seq(2L, 42L)) == 1L) // missing id warns, not errors
    assert(s.count() == 9)
    s.insert(eye(10).take(2))
    // holes + continuation identical to the rewrite layout
    assert(s.toDF.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (Seq(0L, 1L) ++ (3L to 11L)))
    // search works through the tombstone anti-join
    assert(s.search(Seq(eye(10)(5)), k = 1).head.head.id == 5L)
    // compact folds tombstones, contents unchanged
    s.compact()
    assert(s.count() == 11)
    assert(s.toDF.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (Seq(0L, 1L) ++ (3L to 11L)))
    // reopening the tombstone store sees the same data
    val re = VectorStore.openOrCreate(spark, dir2, 10, tombstoneDeletes = true)
    assert(re.count() == 11)
  }

  test("tombstone layout: upsert replacements and max-id reuse stay visible") {
    val dir = Files.createTempDirectory("graft-ts-up").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    s.insert(eye(10), genDocs(0 until 10))
    // upsert = tombstone the ids + append replacements under the SAME
    // ids — the append must outrank the tombstone, not be masked by it
    val v = Array.fill(10)(9f)
    assert(s.upsert(Seq(3L, 42L), Seq(v, v), Seq("""{"u": 1}""", """{"u": 2}""")) == ((1L, 1L)))
    assert(s.count() == 11)
    val got = s.selectIds(Seq(3L, 42L))
    assert(got.map(_.doc) == Seq("""{"u": 1}""", """{"u": 2}"""))
    assert(got.forall(_.vec.forall(_ == 9f)))
    // delete the max id (42): max re-reads from the shrunk table
    // (reference: vector_store.py:195-203), so the next insert gets 10
    assert(s.delete(Seq(42L)) == 1L)
    assert(s.insert(Seq(Array.fill(10)(0.5f))) == Seq(10L))
    // delete THAT max and insert again: id 10 is REUSED — the reused
    // id's new row must be visible through the tombstone mask
    assert(s.delete(Seq(10L)) == 1L)
    assert(s.insert(Seq(Array.fill(10)(0.75f))) == Seq(10L))
    assert(s.count() == 11)
    assert(s.selectIds(Seq(10L)).head.vec(0) == 0.75f)
  }

  test("searchApprox: full probe ≡ exact search; delete/insert/upsert/compact consistent") {
    val dir = Files.createTempDirectory("graft-ann").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    // 30 vectors in 3 well-separated groups so cells are meaningful
    val vecs = (0 until 30).map { i =>
      Array.tabulate(10)(j => (i / 10) * 10f + (if (j == i % 10) 1f else 0f) +
        (i % 10) * 0.01f)
    }
    s.insert(vecs)
    intercept[IllegalStateException](
      s.searchApproxDF(spark.emptyDataFrame, k = 1, nProbe = 1))
    s.buildAnnIndex(nCentroids = 3, iters = 3)
    def exactIds(q: Array[Float], k: Int): Seq[Long] =
      s.search(Seq(q), k).head.map(_.id)
    def approxIds(q: Array[Float], k: Int, nProbe: Int): Seq[Long] =
      s.searchApprox(Seq(q), k, nProbe).head.map(_.id)
    // full probe degenerates to exact, rank for rank
    assert(approxIds(vecs(17), 5, 3) == exactIds(vecs(17), 5))
    // delete a row, query with ITS OWN vector: must not come back
    assert(s.delete(Seq(17L)) == 1L)
    assert(!approxIds(vecs(17), 5, 3).contains(17L))
    assert(approxIds(vecs(17), 5, 3) == exactIds(vecs(17), 5))
    // insert after build: appended to the index, immediately searchable
    val fresh = Array.tabulate(10)(j => 20f + j * 0.1f)
    val Seq(newId) = s.insert(Seq(fresh))
    assert(approxIds(fresh, 1, 3) == Seq(newId))
    // upsert id 4 with a replacement: the old vector's slot disappears,
    // the replacement (same id, newer gen) survives its tombstone
    val repl = Array.fill(10)(-5f)
    s.upsert(Seq(4L), Seq(repl))
    assert(approxIds(repl, 1, 3) == Seq(4L))
    assert(!approxIds(vecs(4), 1, 3).contains(4L) ||
      exactIds(vecs(4), 1).contains(4L) == approxIds(vecs(4), 1, 3).contains(4L))
    assert(approxIds(vecs(8), 5, 3) == exactIds(vecs(8), 5))
    // compact clears tombstones; the index is rebuilt from live rows
    s.compact()
    assert(!approxIds(vecs(17), 5, 3).contains(17L))
    assert(approxIds(repl, 1, 3) == Seq(4L))
    assert(approxIds(vecs(8), 5, 3) == exactIds(vecs(8), 5))
    // reduced probe still returns valid live rows (recall, not identity)
    val pruned = approxIds(vecs(8), 3, 1)
    assert(pruned.nonEmpty && !pruned.contains(17L))
  }

  test("rebalanceAnnIndex: hot cells split in place, lifecycle consistent") {
    val dir = Files.createTempDirectory("graft-ann-reb").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    val vecs = (0 until 30).map { i =>
      Array.tabulate(10)(j => (i / 15) * 10f + (if (j == i % 10) 1f else 0f) +
        (i % 10) * 0.01f)
    }
    s.insert(vecs)
    intercept[IllegalArgumentException](s.rebalanceAnnIndex(8)) // no index yet
    s.buildAnnIndex(nCentroids = 2, iters = 3)
    s.delete(Seq(7L)) // a pending tombstone must survive the rebalance
    def exactIds(q: Array[Float], k: Int): Seq[Long] =
      s.search(Seq(q), k).head.map(_.id)
    def approxIds(q: Array[Float], k: Int): Seq[Long] =
      s.searchApprox(Seq(q), k, nProbe = 64).head.map(_.id)
    val rep = s.rebalanceAnnIndex(maxCellRows = 8, iters = 2)
    assert(rep.splitCells >= 2 && rep.newCells >= 4, rep.toString)
    // full-probe search ≡ exact, the tombstone still masks, and the
    // rebalanced row set is intact
    assert(approxIds(vecs(3), 5) == exactIds(vecs(3), 5))
    assert(!approxIds(vecs(7), 5).contains(7L))
    assert(approxIds(vecs(20), 5) == exactIds(vecs(20), 5))
    // idempotent once within the cap (checked BEFORE the append — an
    // append can legitimately push a cell back over the cap)
    assert(s.rebalanceAnnIndex(8).splitCells == 0)
    // O(batch) append lands in the REBALANCED centroid set
    val fresh = Array.tabulate(10)(j => 30f + j * 0.1f)
    val Seq(newId) = s.insert(Seq(fresh))
    assert(approxIds(fresh, 1) == Seq(newId))
    // quantized kinds are rejected
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 1)
    intercept[IllegalArgumentException](s.rebalanceAnnIndex(8))
  }

  test("mergeAnnIndexCells: small cells dissolve, mask and append intact") {
    val dir = Files.createTempDirectory("graft-ann-mrg").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    val vecs = (0 until 30).map { i =>
      Array.tabulate(10)(j => (i / 15) * 10f + (if (j == i % 10) 1f else 0f) +
        (i % 10) * 0.01f)
    }
    s.insert(vecs)
    intercept[IllegalArgumentException](s.mergeAnnIndexCells(4)) // no index yet
    s.buildAnnIndex(nCentroids = 4, iters = 3)
    s.delete(Seq(6L))
    def exactIds(q: Array[Float], k: Int): Seq[Long] =
      s.search(Seq(q), k).head.map(_.id)
    def approxIds(q: Array[Float], k: Int, nProbe: Int): Seq[Long] =
      s.searchApprox(Seq(q), k, nProbe).head.map(_.id)
    // a floor above every cell size collapses the index to ONE cell —
    // whose single-probe scan is then the exact brute scan
    val rep = s.mergeAnnIndexCells(minCellRows = 31)
    assert(rep.survivingCells == 1, rep.toString)
    assert(approxIds(vecs(3), 5, 1) == exactIds(vecs(3), 5))
    assert(!approxIds(vecs(6), 5, 1).contains(6L)) // tombstone still masks
    // append lands in the merged centroid set and is searchable
    val fresh = Array.tabulate(10)(j => 30f + j * 0.1f)
    val Seq(newId) = s.insert(Seq(fresh))
    assert(approxIds(fresh, 1, 1) == Seq(newId))
    // quantized kinds are rejected
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 1)
    intercept[IllegalArgumentException](s.mergeAnnIndexCells(4))
  }

  test("buildAnnSuperQuantizer: routed search lifecycle, stale-after-rebalance") {
    val dir = Files.createTempDirectory("graft-ann-hier").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    val vecs = (0 until 30).map { i =>
      Array.tabulate(10)(j => (i / 15) * 10f + (if (j == i % 10) 1f else 0f) +
        (i % 10) * 0.01f)
    }
    s.insert(vecs)
    s.buildAnnIndex(nCentroids = 4, iters = 3)
    intercept[IllegalArgumentException](
      s.searchApproxHierDF(spark.emptyDataFrame, 1, 1, 1)) // no hierarchy yet
    s.buildAnnSuperQuantizer(nSuper = 2, iters = 2)
    s.delete(Seq(7L))
    def exactIds(q: Array[Float], k: Int): Seq[Long] =
      s.search(Seq(q), k).head.map(_.id)
    def hierIds(q: Array[Float], k: Int, nProbe: Int, sp: Int): Seq[Long] = {
      import spark.implicits._
      s.searchApproxHierDF(Seq((0L, q)).toDF("qid", "qvec"), k, nProbe, sp)
        .orderBy("rn").select("id").as[Long].collect().toSeq
    }
    // full routing degenerates to exact; the tombstone masks through it
    assert(hierIds(vecs(3), 5, 4, 2) == exactIds(vecs(3), 5))
    assert(!hierIds(vecs(7), 5, 4, 2).contains(7L))
    // a rebalance rewrites the cell set → the routing is REBUILT in
    // place at the same super count (never left stale, never dropped):
    // the hier path keeps working against the new cells with no manual
    // call
    s.rebalanceAnnIndex(maxCellRows = 8, iters = 2)
    assert(hierIds(vecs(3), 5, 64, 2) == exactIds(vecs(3), 5))
    val routed = spark.read.parquet(s"$dir/ann/super/routing").count()
    assert(routed == s.annIndexStats().nCells,
      "refreshed routing must cover every post-rewrite cell")
    // quantized kinds are rejected
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 1)
    intercept[IllegalArgumentException](s.buildAnnSuperQuantizer(2))
  }

  test("annIndexStats: cell distribution, dead rows, maintenance signals") {
    val dir = Files.createTempDirectory("graft-ann-st").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    val vecs = (0 until 30).map { i =>
      Array.tabulate(10)(j => (i / 15) * 10f + (if (j == i % 10) 1f else 0f) +
        (i % 10) * 0.01f)
    }
    s.insert(vecs)
    intercept[IllegalArgumentException](s.annIndexStats())
    s.buildAnnIndex(nCentroids = 2, iters = 3)
    val st0 = s.annIndexStats()
    assert(st0.kind == "ivf" && st0.metric == "l2")
    assert(st0.nCells == 2 && st0.nIndexRows == 30 && st0.nDeadRows == 0)
    assert(st0.minCellRows + st0.maxCellRows == 30)
    // deletes surface as dead INDEX rows until a compaction
    s.delete(Seq(1L, 2L))
    val st1 = s.annIndexStats()
    assert(st1.nIndexRows == 30 && st1.nDeadRows == 2)
    assert(math.abs(st1.deadRowFraction - 2.0 / 30) < 1e-12)
    // the merge-everything layout is perfectly balanced by definition
    s.mergeAnnIndexCells(minCellRows = 31)
    val st2 = s.annIndexStats()
    assert(st2.nCells == 1 && st2.nEmptyCells == 0 && st2.imbalance == 1.0)
    assert(st2.minCellRows == 30 && st2.maxCellRows == 30)
  }

  test("searchMaxSimDF: full shortlist ≡ brute MaxSim over live tokens") {
    import graft.operators.LateInteraction
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ms").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    // 8 parents × 3 tokens
    val vecs = (0 until 24).map { i =>
      Array.tabulate(8)(j => (if (j == i % 8) 1f else 0f) + i * 0.01f)
    }
    s.insert(vecs, (0 until 24).map(i => s"""{"p": ${i / 3}}"""))
    s.delete(Seq(4L))
    val qt = Seq(
      (0L, 0L, vecs(1)), (0L, 1L, vecs(9)),
      (1L, 0L, vecs(20))).toDF("qid", "qtok", "qvec")
    // full shortlist (≥ all parents) degenerates stage 1 away
    val got = s.searchMaxSimDF(qt, k = 3, Seq("p"), shortlist = 8,
        tokensPerQuery = 100)
      .select($"qid", $"parent", $"rn", $"score")
      .as[(Long, Long, Int, Double)].collect().toSet
    val liveTokens = (0 until 24).filter(_ != 4)
      .map(i => (i.toLong / 3, vecs(i))).toDF("parent", "vec")
    val brute = LateInteraction.maxSimTopK(liveTokens, "parent", "vec",
        qt, "qid", "qtok", "qvec", k = 3)
      .select($"qid", $"parent", $"rn", $"score")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(got == brute)
    intercept[IllegalArgumentException](
      s.searchMaxSimDF(qt, k = 5, Seq("p"), shortlist = 3, tokensPerQuery = 100))
  }

  test("searchApproxDF plan: partition-pruned scan, tombstone mask as anti-join") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ann-plan").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    val vecs = (0 until 30).map(i =>
      Array.tabulate(10)(j => (i / 10) * 10f + (if (j == i % 10) 1f else 0f)))
    s.insert(vecs)
    s.buildAnnIndex(nCentroids = 3, iters = 2)
    s.delete(Seq(7L)) // a pending tombstone forces the mask into the plan
    val q = Seq((0, vecs(3))).toDF("qid", "qvec")
    val plan = s.searchApproxDF(q, k = 2, nProbe = 1)
      .queryExecution.executedPlan.toString
    // the index scan must prune at the source: a NON-EMPTY
    // PartitionFilters on centroid_id (probed cells as a static IN)
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters:")).toSeq
    assert(pf.exists(l => l.contains("centroid_id") && !l.contains("PartitionFilters: []")),
      s"expected centroid_id partition pruning in:\n$plan")
    // the tombstone mask is a broadcast anti-join BEFORE the top-k
    assert(plan.contains("LeftAnti"),
      s"expected the tombstone anti-join in:\n$plan")
  }

  test("snapshotAt: pinned version ignores later deletes/upserts; plain layout refuses") {
    val dir = Files.createTempDirectory("graft-tt").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    s.insert(eye(10), genDocs(0 until 10))
    val v1 = s.currentVersion().get
    s.delete(Seq(2L))
    s.upsert(Seq(4L), Seq(Array.fill(10)(9f)))
    // current view: id 2 gone, id 4 replaced
    assert(s.selectIds(Seq(2L)).isEmpty)
    assert(s.selectIds(Seq(4L)).head.vec(0) == 9f)
    // pinned view: both as originally inserted
    import spark.implicits._
    val snap = s.snapshotAt(v1).orderBy("id")
      .select("id", "vec").as[(Long, Array[Float])].collect()
    assert(snap.length == 10)
    assert(snap(2)._2.toSeq == eye(10)(2).toSeq)
    assert(snap(4)._2.toSeq == eye(10)(4).toSeq)
    // plain layout: no versions to travel to
    val plain = freshStore()
    plain.insert(eye(10).take(2))
    assert(plain.currentVersion().isEmpty)
    intercept[UnsupportedOperationException](plain.snapshotAt(0L))
  }

  test("searchApprox: plain Parquet layout rebuilds index rows on delete") {
    val dir = Files.createTempDirectory("graft-ann-plain").toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10) // rewrite-on-delete
    val vecs = (0 until 12).map(i =>
      Array.tabulate(10)(j => if (j == i % 10) 1f + i else 0f))
    s.insert(vecs)
    s.buildAnnIndex(nCentroids = 2, iters = 2)
    assert(s.searchApprox(Seq(vecs(7)), 3, 2).head.map(_.id) ==
      s.search(Seq(vecs(7)), 3).head.map(_.id))
    s.delete(Seq(7L))
    val ids = s.searchApprox(Seq(vecs(7)), 3, 2).head.map(_.id)
    assert(!ids.contains(7L) && ids == s.search(Seq(vecs(7)), 3).head.map(_.id))
  }

  test("insertDF assigns contiguous ids after existing max") {
    import spark.implicits._
    val s = freshStore()
    s.insert(eye(10).take(3))
    val batch = Seq(
      (Array.fill(10)(0.1f), """{"b": 1}"""),
      (Array.fill(10)(0.2f), """{"b": 2}""")).toDF("vec", "doc")
    assert(s.insertDF(batch) == 2L)
    assert(s.toDF.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq ==
      (0L to 4L))
  }

  test("insertDF dtype matrix: bool + every numeric width coerces with a warning; " +
      "string/binary/nested reject (tests.py:62-160)") {
    import spark.implicits._
    val s = freshStore()
    var total = 0L
    // accepted-with-warning, single row then a 3-row batch per dtype —
    // the Spark analogue of the reference's working_dtypes loop
    // (bool_ + int8/16/32/64 + float64; float16/uint have no Spark type)
    val working: Seq[org.apache.spark.sql.DataFrame] = Seq(
      Seq(Tuple1(Seq.fill(10)(true))).toDF("vec"),
      Seq(Tuple1(Seq.fill(10)(1.toByte))).toDF("vec"),
      Seq(Tuple1(Seq.fill(10)(1.toShort))).toDF("vec"),
      Seq(Tuple1(Seq.fill(10)(1))).toDF("vec"),
      Seq(Tuple1(Seq.fill(10)(1L))).toDF("vec"),
      Seq(Tuple1(Seq.fill(10)(1.0d))).toDF("vec"))
    working.foreach { df =>
      total += s.insertDF(df)
      assert(s.lastCoercionWarning.isDefined, s"expected a coercion warning for ${df.schema}")
      total += s.insertDF(df.union(df).union(df)) // insert_many variant
      assert(s.count() == total)
    }
    assert(total == 24)
    // every coerced row stores float32 ones
    assert(s.dumpVecs().forall(_.forall(_ == 1f)))
    // native float32: accepted WITHOUT a warning (reference skips vec_dtype)
    total += s.insertDF(Seq(Tuple1(Seq.fill(10)(1f))).toDF("vec"))
    assert(s.lastCoercionWarning.isEmpty)
    // rejected (analogue of void/str_/complex/bytes_/object_):
    // string, binary, nested array, struct element types
    val rejected = Seq(
      Seq(Tuple1(Seq.fill(10)("x"))).toDF("vec"),
      Seq(Tuple1(Array.fill(10)(1.toByte))).toDF("vec"), // Array[Byte] = BinaryType
      Seq(Tuple1(Seq(Seq.fill(10)(1f)))).toDF("vec"),
      Seq(Tuple1(Seq.fill(10)((1, 2)))).toDF("vec"))
    rejected.foreach { df =>
      val e = intercept[IllegalArgumentException](s.insertDF(df))
      assert(e.getMessage.contains("not supported"), e.getMessage)
    }
    assert(s.count() == total)
  }

  test("insertDF bool vectors coerce to 1f/0f, not null (bool_ acceptance)") {
    import spark.implicits._
    val s = freshStore()
    s.insertDF(Seq(Tuple1((0 until 10).map(_ % 2 == 0))).toDF("vec"))
    assert(s.head(1).head.vec.toSeq ==
      (0 until 10).map(i => if (i % 2 == 0) 1f else 0f))
  }

  test("insertDicts: vec-only single and batch (tests.py:430-445)") {
    val s = freshStore()
    assert(s.insertDicts(Seq(Map("vec" -> Array.fill(10)(1f)))) == Seq(0L))
    assert(s.count() == 1)
    assert(s.insertDicts(
      (0 until 5).map(_ => Map[String, Any]("vec" -> Array.fill(10)(1f)))) ==
      (1L to 5L))
    assert(s.count() == 6)
    // missing doc stores the {} default
    assert(s.selectIds(Seq(0L)).head.doc == "{}")
  }

  test("insertDicts with docs serializes maps like json.dumps (tests.py:447-464)") {
    val s = freshStore()
    s.insertDicts(Seq(Map(
      "vec" -> Array.fill(10)(1f),
      "doc" -> Map("k0" -> "v0"))))
    assert(s.count() == 1)
    assert(s.selectIds(Seq(0L)).head.doc == """{"k0": "v0"}""")
    // ListMap: insertion-ordered like a Python dict, so the dumped key
    // order is deterministic
    s.insertDicts((1 until 5).map(i => Map(
      "vec" -> Array.fill(10)(1f),
      "doc" -> scala.collection.immutable.ListMap(
        s"k$i" -> s"v$i", "n" -> i, "f" -> 0.5d, "ok" -> true,
        "tags" -> Seq("a", "b"), "nested" -> Map("x" -> 1)))))
    assert(s.count() == 5)
    assert(s.selectIds(Seq(2L)).head.doc ==
      """{"k2": "v2", "n": 2, "f": 0.5, "ok": true, "tags": ["a", "b"], "nested": {"x": 1}}""")
  }

  test("jsonDump float rendering matches Python json.dumps across notation thresholds") {
    import graft.store.VectorStore.jsonDump
    assert(jsonDump(1.0e16) == "1e+16")
    assert(jsonDump(1.5e-7) == "1.5e-07")
    assert(jsonDump(9.99e-5) == "9.99e-05")
    assert(jsonDump(0.00012) == "0.00012")
    assert(jsonDump(12345678.5) == "12345678.5")
    assert(jsonDump(1.0e15) == "1000000000000000.0")
    assert(jsonDump(2.0) == "2.0")
    assert(jsonDump(0.5) == "0.5")
    assert(jsonDump(-1.23e100) == "-1.23e+100")
    assert(jsonDump(0.0) == "0.0")
    assert(jsonDump(-0.0) == "-0.0")
    // ensure_ascii parity: non-ASCII escapes as \uXXXX (surrogate
    // pairs for astral chars, exactly like CPython)
    assert(jsonDump("café") == "\"caf\\u00e9\"")
    assert(jsonDump("😀") == "\"\\ud83d\\ude00\"")
  }

  test("insertDicts rejects non-serializable docs before writing (tests.py:426-429)") {
    val s = freshStore()
    val e = intercept[IllegalArgumentException](s.insertDicts(Seq(
      Map("vec" -> Array.fill(10)(1f), "doc" -> new Object))))
    assert(e.getMessage.contains("JSON serializable"), e.getMessage)
    // nested non-serializable value fails too, and nothing was written
    intercept[IllegalArgumentException](s.insertDicts(Seq(
      Map("vec" -> Array.fill(10)(1f), "doc" -> Map("k" -> ((x: Int) => x))))))
    assert(s.count() == 0)
    // missing vec
    val e2 = intercept[IllegalArgumentException](s.insertDicts(Seq(
      Map("doc" -> Map("a" -> 1)))))
    assert(e2.getMessage.contains("vec"))
  }

  test("repr names the path and dimension (tests.py:488-491)") {
    val s = freshStore()
    // reference formats `db_path=` — match it exactly
    assert(s.toString == s"VectorStore(db_path=$dir, dim=10)")
  }

  test("insertDF rejects wrong-dimension vectors (job fails, store unchanged)") {
    import spark.implicits._
    val s = freshStore()
    s.insert(eye(10).take(2))
    val bad = Seq(Tuple1(Array.fill(7)(1f))).toDF("vec")
    intercept[Exception](s.insertDF(bad))
    assert(s.count() == 2)
  }

  test("searchApproxWhere: filter ∘ probe ∘ mask ≡ searchWhere on live rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fann")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    // 30 vectors in 3 separated groups; doc tag alternates a/b
    val vecs = (0 until 30).map { i =>
      Array.tabulate(10)(j => (i / 10) * 10f + (if (j == i % 10) 1f else 0f) +
        (i % 10) * 0.01f)
    }
    s.insert(vecs, (0 until 30).map(i =>
      s"""{"t": "${if (i % 2 == 0) "a" else "b"}"}"""))
    s.buildAnnIndex(nCentroids = 3, iters = 3)
    def exactW(q: Array[Float], k: Int): Seq[Long] =
      s.searchWhere(Seq(q), k, Seq("t"), Seq("b")).head.map(_.id)
    def approxW(q: Array[Float], k: Int, nProbe: Int): Seq[Long] =
      s.searchApproxWhere(Seq(q), k, nProbe, Seq("t"), Seq("b")).head.map(_.id)
    // full probe ≡ brute-force searchWhere, rank for rank — and the
    // unfiltered nearest (even ids, tag a) never leaks through
    assert(approxW(vecs(16), 5, 3) == exactW(vecs(16), 5))
    assert(approxW(vecs(16), 5, 3).forall(_ % 2 == 1))
    // delete a FILTER-MATCHING row, query its own vector: the
    // tombstone mask must compose with the predicate
    assert(s.delete(Seq(17L)) == 1L)
    assert(!approxW(vecs(17), 5, 3).contains(17L))
    assert(approxW(vecs(17), 5, 3) == exactW(vecs(17), 5))
    // k larger than the filtered match count caps, searchWhere-style
    // (14 live odd ids after the delete) — no error
    assert(approxW(vecs(16), 20, 3).size == 14)
    // contract errors follow searchWhere
    intercept[IllegalArgumentException](
      s.searchApproxWhere(Seq(vecs(0)), k = 0, 3, Seq("t"), Seq("b")))
    intercept[IllegalArgumentException](
      s.searchApproxWhere(Seq(Array(1f, 2f)), 1, 3, Seq("t"), Seq("b")))
    intercept[IllegalArgumentException](
      s.searchApproxWhereDF(spark.emptyDataFrame, 1, 3, Seq.empty, Seq("b")))
  }

  test("searchHybrid: BM25 + dense shortlists fuse by reciprocal rank") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hyb")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    // id 0: lexical hit only (vector far); id 1: dense hit only;
    // id 2: BOTH close-ish vector and matching text -> must fuse first
    val far = Array.fill(10)(9f)
    val e0 = Array.tabulate(10)(j => if (j == 0) 1f else 0f)
    val near = Array.tabulate(10)(j => if (j == 0) 0.9f else 0f)
    s.insert(Seq(far, e0, near), Seq(
      """{"t": "pad alpha beta pad"}""",
      """{"t": "pad gamma delta pad"}""",
      """{"t": "pad alpha alpha pad"}"""))
    val fused = s.searchHybrid(Seq(e0), Seq("alpha"), k = 3, shortlist = 3)
      .orderBy("rank").collect()
    // dense ranks: id1 (dist 0) -> 1, id2 (0.1) -> 2, id0 (far) -> 3
    // lexical (alpha): id2 tf=2 -> rank 1, id0 tf=1 -> rank 2, id1
    // no hit. RRF: id2 = 1/62 + 1/61 = .03253 (both modalities, top),
    // id0 = 1/63 + 1/62 = .03200, id1 = 1/61 = .01639
    assert(fused.map(_.getLong(1)).toSeq == Seq(2L, 0L, 1L))
    assert(fused.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    // with an ANN index the dense run rides the index; full probe
    // keeps the fusion identical
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    val fused2 = s.searchHybrid(Seq(e0), Seq("alpha"), k = 3,
      shortlist = 3, nProbe = 2).orderBy("rank").collect()
    assert(fused2.map(_.getLong(1)).toSeq == Seq(2L, 0L, 1L))
    intercept[IllegalArgumentException](
      s.searchHybrid(Seq(e0), Seq("alpha", "beta"), k = 1))
    intercept[IllegalArgumentException](
      s.searchHybrid(Seq(e0), Seq("   "), k = 1))
  }

  test("searchHybrid: empty store returns a typed empty frame, filtered hybrid composes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hyb2")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    val e0 = Array.tabulate(10)(j => if (j == 0) 1f else 0f)
    // empty store: an empty fused frame with the fused schema, not a
    // crash inside the BM25 shortlist builder ("k must be positive")
    val empty = s.searchHybrid(Seq(e0), Seq("alpha"), k = 1)
    assert(empty.columns.toSeq == Seq("qid", "id", "rrf", "rank"))
    assert(empty.count() == 0L)
    // filtered hybrid: both shortlists restricted to the JSON-path
    // match — id 1 is the best dense AND lexical hit but carries
    // src=b, so the filter must exclude it from the fused result
    val near = Array.tabulate(10)(j => if (j == 0) 0.9f else 0f)
    val far = Array.fill(10)(5f)
    s.insert(Seq(e0, near, far), Seq(
      """{"t": "pad alpha pad", "src": "b"}""",
      """{"t": "alpha alpha alpha", "src": "a"}""",
      """{"t": "pad beta pad", "src": "a"}"""))
    val fused = s.searchHybrid(Seq(e0), Seq("alpha"), k = 2, shortlist = 2,
        pathSteps = Seq("src"), values = Seq("a"))
      .orderBy("rank").collect()
    assert(fused.map(_.getLong(1)).toSeq == Seq(1L, 2L),
      s"got ${fused.mkString(",")}")
    // a predicate matching nothing: typed empty frame again
    assert(s.searchHybrid(Seq(e0), Seq("alpha"), k = 1,
      pathSteps = Seq("src"), values = Seq("zzz")).count() == 0L)
    // values without pathSteps is a contract error
    intercept[IllegalArgumentException](s.searchHybrid(Seq(e0), Seq("x"),
      k = 1, values = Seq("a")))
  }

  test("cosine ANN store lifecycle: angle ranking, O(batch) append, delete mask") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annc")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 4, tombstoneDeletes = true)
    // b is a MAGNITUDE-2 copy of a's direction: cosine must rank it at
    // distance 0 (an L2 index would put it at distance 1 — the metric
    // dispatch is what this fixture observes)
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(2f, 0f, 0f, 0f)
    val c = Array(1f, 1f, 0f, 0f)
    val d = Array(0f, 1f, 0f, 0f)
    val e = Array(-1f, 0f, 0f, 0f)
    s.insert(Seq(a, b, c, d, e))
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0,
      metric = "cosine")
    assert(s.annMetric == "cosine")
    val hits = s.searchApprox(Seq(a), k = 5, nProbe = 2).head
    assert(hits.map(_.id) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(hits.map(_.distance.toDouble).zip(
      Seq(0.0, 0.0, 1.0 - 1.0 / math.sqrt(2.0), 1.0, 2.0))
      .forall { case (got, want) => math.abs(got - want) < 1e-6 },
      s"distances ${hits.map(_.distance)}")
    // O(batch) append must assign by cosine too (the persisted metric
    // marker drives appendToIvfIndex): another colinear vector lands
    // at distance 0 and takes the id-tie slot after 0 and 1
    s.insert(Seq(Array(3f, 0f, 0f, 0f)))
    val hits2 = s.searchApprox(Seq(a), k = 3, nProbe = 2).head
    assert(hits2.map(_.id) == Seq(0L, 1L, 5L))
    // tombstone mask composes before the cosine top-k
    s.delete(Seq(0L))
    val hits3 = s.searchApprox(Seq(a), k = 3, nProbe = 2).head
    assert(hits3.map(_.id) == Seq(1L, 5L, 2L))
    // metric validation
    intercept[IllegalArgumentException](
      s.buildAnnIndex(2, metric = "manhattan"))
  }

  test("IVF-PQ store lifecycle: ADC parity with persisted codebook, append, delete mask") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft-pq")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    val vecs = (0 until 12).map(i =>
      Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))
    s.insert(vecs)
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 2)
    assert(s.annKind == "ivfpq")
    // whatever the trained codebook is, the store's full-probe search
    // must equal a flat operator-level ADC run over the live rows with
    // the SAME persisted codebook
    val cb = graft.operators.Pq.readCodebook(spark, s"$dir/ann/codebook")
    def flatTop(qid: Long, q: Array[Float], k: Int): Seq[(Long, Float)] = {
      import spark.implicits._
      val live = s.toDF.select(col("id"), col("vec"))
      graft.operators.Pq.adcTopK(
          graft.operators.Pq.encode(live, "vec", "codes", cb),
          "id", "codes", cb, Seq((qid, q)), k)
        .orderBy("rn").select(col("id"), col("adc_dist").cast("float"))
        .as[(Long, Float)].collect().toSeq
    }
    def storeTop(qid: Long, q: Array[Float], k: Int): Seq[(Long, Float)] = {
      import spark.implicits._
      s.searchApproxDF(
          Seq((qid, q)).toDF("qid", "qvec"), k, nProbe = 2)
        .orderBy("rn").select(col("id"), col("distance"))
        .as[(Long, Float)].collect().toSeq
    }
    assert(storeTop(0L, vecs(3), 5) == flatTop(0L, vecs(3), 5))
    // O(batch) append: the new row is encoded with the persisted
    // codebook and immediately searchable
    val nv = Array.tabulate(8)(j => (j % 5).toFloat)
    s.insert(Seq(nv))
    assert(storeTop(1L, nv, 6) == flatTop(1L, nv, 6))
    // delete mask: the removed id disappears from the store run and
    // the flat run over the reduced live set still matches
    val victim = storeTop(2L, vecs(5), 1).head._1
    s.delete(Seq(victim))
    val after = storeTop(3L, vecs(5), 5)
    assert(!after.map(_._1).contains(victim))
    assert(after == flatTop(3L, vecs(5), 5))
    // dimension contract
    intercept[IllegalArgumentException] {
      import spark.implicits._
      s.searchApproxDF(Seq((9L, Array(1f, 2f))).toDF("qid", "qvec"), 1, 1)
        .collect()
    }
  }

  test("PQ exact-refine: refine = live-count degenerates to exact brute force") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pqr")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    val vecs = (0 until 20).map(i =>
      Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))
    s.insert(vecs)
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 2)
    s.delete(Seq(2L, 9L))
    def refined(q: Array[Float], k: Int, refine: Int): Seq[(Long, Float)] =
      s.searchApproxDF(Seq((0L, q)).toDF("qid", "qvec"), k, nProbe = 2,
          refine = refine)
        .orderBy("rn").select(col("id"), col("distance"))
        .as[(Long, Float)].collect().toSeq
    def exact(q: Array[Float], k: Int): Seq[(Long, Float)] =
      s.search(Seq(q), k).head.map(r => (r.id, r.distance))
    // refine = live count: every live row is in the ADC shortlist, so
    // the exact re-rank IS brute-force search — ids AND float32
    // distances must match rank for rank (ADC order no longer matters)
    assert(refined(vecs(5), 5, refine = 18) == exact(vecs(5), 5))
    assert(refined(vecs(13), 4, refine = 18) == exact(vecs(13), 4))
    // a small refine still returns TRUE distances for what it returns
    val r3 = refined(vecs(5), 3, refine = 6)
    val ex = exact(vecs(5), 18).toMap
    r3.foreach { case (id, d) => assert(ex(id) == d) }
    // contracts: refine must be 0 or >= k; flat indexes reject refine
    intercept[IllegalArgumentException](refined(vecs(0), 5, refine = 3))
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    intercept[IllegalArgumentException](refined(vecs(0), 2, refine = 4))
  }

  test("buildAnnIndex over a PQ index clears the kind marker and codebook") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-pqk")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    val vecs = (0 until 12).map(i =>
      Array.tabulate(8)(j => ((i * 5 + j) % 7).toFloat))
    s.insert(vecs)
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 2)
    assert(s.annKind == "ivfpq")
    // legitimate rebuild to a flat index: the stale "ivfpq" marker (and
    // codebook) must not survive, or searches dispatch to the PQ path
    // and look for a `codes` column the flat rows don't have
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(s.annKind == "ivf")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/ann/codebook")))
    // and the flat search actually works post-rebuild
    val got = s.searchApproxDF(Seq((0L, vecs(3))).toDF("qid", "qvec"),
        k = 3, nProbe = 2)
      .orderBy("rn").select(col("id")).as[Long].collect().toSeq
    assert(got == s.search(Seq(vecs(3)), 3).head.map(_.id))
  }

  test("residual IVF-PQ store lifecycle: dispatch, append, delete mask, refine") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pqres")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    val vecs = (0 until 16).map(i =>
      Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))
    s.insert(vecs)
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 2, residual = true)
    assert(s.annKind == "ivfpq_res")
    // store search (residual ADC) must equal an operator-level residual
    // run over the live rows re-encoded with the PERSISTED centroids +
    // codebook — catches a raw-vs-residual encode/dispatch mix-up
    val cents = spark.read.parquet(s"$dir/ann/centroids")
    val cb = graft.operators.Pq.readCodebook(spark, s"$dir/ann/codebook")
    def flatTop(qid: Long, q: Array[Float], k: Int): Seq[(Long, Float)] = {
      val enc = graft.operators.Pq.encodeResidualAssigned(
        graft.operators.Ann.assign(
          s.toDF.select(col("id"), col("vec")), "id", "vec", cents),
        "vec", "codes", cents, cb)
      graft.operators.Pq.ivfPqSearchResidual(enc, "id", "codes", cents, cb,
          Seq((qid, q)), k, nProbe = 2)
        .orderBy("rn").select(col("id"), col("adc_dist").cast("float"))
        .as[(Long, Float)].collect().toSeq
    }
    def storeTop(qid: Long, q: Array[Float], k: Int): Seq[(Long, Float)] =
      s.searchApproxDF(Seq((qid, q)).toDF("qid", "qvec"), k, nProbe = 2)
        .orderBy("rn").select(col("id"), col("distance"))
        .as[(Long, Float)].collect().toSeq
    assert(storeTop(0L, vecs(3), 5) == flatTop(0L, vecs(3), 5))
    // O(batch) append: residual-encoded with the persisted codebook
    val nv = Array.tabulate(8)(j => (j % 5).toFloat)
    s.insert(Seq(nv))
    assert(storeTop(1L, nv, 6) == flatTop(1L, nv, 6))
    // delete mask composes before the residual ADC top-k
    val victim = storeTop(2L, vecs(5), 1).head._1
    s.delete(Seq(victim))
    val after = storeTop(3L, vecs(5), 5)
    assert(!after.map(_._1).contains(victim))
    assert(after == flatTop(3L, vecs(5), 5))
    // refine = live-count degenerates to exact — same contract as the
    // raw-PQ refine (codes drop out entirely at full refine)
    val live = s.count().toInt
    val ref = s.searchApproxDF(Seq((0L, vecs(7))).toDF("qid", "qvec"),
        k = 5, nProbe = 2, refine = live)
      .orderBy("rn").select(col("id"), col("distance"))
      .as[(Long, Float)].collect().toSeq
    assert(ref == s.search(Seq(vecs(7)), 5).head.map(r => (r.id, r.distance)))
  }

  test("vacuum: purges masked history, raises the snapshot floor, keeps newer versions") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vac")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    val vecs = (0 until 10).map(i =>
      Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))
    s.insert(vecs)                        // v1: rows 0-9 at gen 1
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    s.delete(Seq(1L, 2L))                 // v2: tombs (1,2),(2,2)
    s.upsert(Seq(5L), Seq(vecs(7)))       // v3 tomb (5,3), v4 new row
    assert(s.currentVersion().contains(4L))
    assert(s.snapshotAt(1L).count() == 10L)
    // vacuum up to v2: the two deleted rows are gone for good, the
    // upsert's history (tomb gen 3) survives
    assert(s.vacuum(2L) == 2L)
    assert(s.snapshotFloor.contains(2L))
    assert(s.count() == 8L)
    intercept[IllegalArgumentException](s.snapshotAt(1L).count())
    // v3 snapshot still faithful: 8 rows minus old id5 (masked) = 7
    assert(s.snapshotAt(3L).count() == 7L)
    assert(s.snapshotAt(4L).count() == 8L)
    // the ANN index must not resurrect purged rows (their masking
    // tombstones are gone — the post-vacuum rebuild covers them)
    val got = s.searchApproxDF(Seq((0L, vecs(1))).toDF("qid", "qvec"),
        k = 8, nProbe = 2)
      .select(col("id")).as[Long].collect().toSet
    assert(!got.contains(1L) && !got.contains(2L))
    assert(got == s.search(Seq(vecs(1)), 8).head.map(_.id).toSet)
    // vacuum the rest: upsert's old row purged, log empty, floor at 4
    assert(s.vacuum(99L) == 1L) // clamped to currentVersion
    assert(s.snapshotFloor.contains(4L))
    assert(s.count() == 8L)
    assert(s.snapshotAt(4L).count() == 8L)
    // compact also raises the floor (history folded = history gone)
    val s2 = VectorStore.openOrCreate(spark, dir + "2", 8,
      tombstoneDeletes = true)
    s2.insert(vecs)
    s2.delete(Seq(0L))
    s2.compact()
    intercept[IllegalArgumentException](s2.snapshotAt(1L).count())
    // plain layout refuses vacuum
    val s3 = VectorStore.openOrCreate(spark, dir + "3", 8,
      tombstoneDeletes = false)
    s3.insert(vecs.take(2))
    intercept[UnsupportedOperationException](s3.vacuum(1L))
  }

  test("parent-doc retrieval: chunk hits pool per parent, mask composes, indexed ≡ brute") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-parent")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    // 6 parents x 4 chunks; chunk i belongs to parent i/4
    val vecs = (0 until 24).map(i =>
      Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))
    val batch = vecs.zipWithIndex
      .map { case (v, i) => (v, s"""{"p": ${i / 4}}""") }.toDF("vec", "doc")
    s.insertDF(batch.coalesce(1))
    val q = Seq((0L, vecs(9))).toDF("qid", "qvec")
    def parents(k: Int, nProbe: Int = 0): Seq[(Long, Double, Long, Int)] =
      s.searchParentDocsDF(q, k, Seq("p"), chunksPerQuery = 8, nProbe = nProbe)
        .orderBy("rank")
        .select(col("parent"), col("max_score"), col("n_chunks"), col("rank"))
        .as[(Long, Double, Long, Int)].collect().toSeq
    val brute = parents(3)
    // the query IS chunk 9 -> its parent 2 wins on max-pool with a
    // distance-0 best chunk (score 0), and n_chunks is bounded by the
    // per-parent chunk count
    assert(brute.head._1 == 2L && brute.head._2 == 0.0 && brute.head._4 == 1)
    assert(brute.forall(_._3 <= 4))
    // indexed full-probe path is the same journey
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(parents(3, nProbe = 2) == brute)
    // deleting the best chunk demotes the parent's pooled score (mask
    // composes before the shortlist), never resurrects it
    s.delete(Seq(9L))
    val after = parents(3, nProbe = 2)
    assert(after.find(_._1 == 2L).forall(_._2 < 0.0))
    // contracts
    intercept[IllegalArgumentException](
      s.searchParentDocsDF(q, 3, Seq.empty, 8))
    intercept[IllegalArgumentException](
      s.searchParentDocsDF(q, 3, Seq("p"), 0))
  }

  test("OPQ store lifecycle: rotated dispatch, refine degenerates, append, mask") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-opq-store")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    val vecs = (0 until 20).map(i =>
      Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))
    s.insert(vecs)
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 2, opq = true)
    assert(s.annKind == "ivfpq_opq")
    def sq(qid: Long, q: Array[Float], k: Int, refine: Int = 0): Seq[(Long, Float)] =
      s.searchApproxDF(Seq((qid, q)).toDF("qid", "qvec"), k, nProbe = 2,
          refine = refine)
        .orderBy("rn").select(col("id"), col("distance"))
        .as[(Long, Float)].collect().toSeq
    def exact(q: Array[Float], k: Int): Seq[(Long, Float)] =
      s.search(Seq(q), k).head.map(r => (r.id, r.distance))
    // refine = live-count: ADC ran in rotated space, but the complete
    // shortlist re-ranks by exact L2 over ORIGINAL vectors — exact
    // brute force, rank for rank (the vs_ann_opq gate contract)
    assert(sq(0L, vecs(5), 5, refine = 20) == exact(vecs(5), 5))
    // un-refined ADC search works in the rotated space (ranking is
    // ADC-approximate by construction — recon error at m=2, k=4 can
    // legitimately outrank a self-match, as with plain PQ): returns k
    // live rows with non-decreasing distances
    val adc5 = sq(1L, vecs(7), 5)
    assert(adc5.length == 5 &&
      adc5.map(_._2.toDouble) == adc5.map(_._2.toDouble).sorted)
    // O(batch) append rotates with the PERSISTED rotation
    val nv = Array.tabulate(8)(j => (j % 5).toFloat + 0.25f)
    s.insert(Seq(nv))
    assert(sq(2L, nv, 3, refine = 21) == exact(nv, 3))
    // delete mask composes; post-delete refined search stays exact
    val victim = sq(3L, vecs(9), 1).head._1
    s.delete(Seq(victim))
    assert(!sq(4L, vecs(9), 5).map(_._1).contains(victim))
    assert(sq(5L, vecs(9), 5, refine = 20) == exact(vecs(9), 5))
    // rebuild hygiene: a flat rebuild clears marker + rotation dir
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/ann/opq")))
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(s.annKind == "ivf")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/ann/opq")))
    // residual + opq is an explicit contract error
    intercept[IllegalArgumentException](
      s.buildAnnIndexPq(2, 2, 4, 1, residual = true, opq = true))
  }

  test("SQ store lifecycle: SQDC bound, refine degenerates, append, mask, hygiene") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sq-store")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    val vecs = (0 until 20).map(i =>
      Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))
    s.insert(vecs)
    s.buildAnnIndexSq(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(s.annKind == "ivfsq")
    def sq(qid: Long, q: Array[Float], k: Int, refine: Int = 0): Seq[(Long, Float)] =
      s.searchApproxDF(Seq((qid, q)).toDF("qid", "qvec"), k, nProbe = 2,
          refine = refine)
        .orderBy("rn").select(col("id"), col("distance"))
        .as[(Long, Float)].collect().toSeq
    def exact(q: Array[Float], k: Int): Seq[(Long, Float)] =
      s.search(Seq(q), k).head.map(r => (r.id, r.distance))
    // SQDC distances are L2 to the reconstruction: within the grid's
    // closed-form bound sqrt(sum_j (scale_j/2)^2) of the true distance
    val p = graft.operators.Sq.readParams(spark, s"$dir/ann/sq")
    val bound = math.sqrt(p.scale.map(sc => (sc / 2.0) * (sc / 2.0)).sum) + 1e-4
    val ex = exact(vecs(5), 20).toMap
    sq(0L, vecs(5), 8).foreach { case (id, d) =>
      assert(math.abs(d - ex(id)) <= bound,
        s"id $id: SQDC $d vs exact ${ex(id)}, bound $bound")
    }
    // refine = live-count degenerates to exact brute force (float32
    // distances rank for rank) — the vs_ann_sq gate contract
    assert(sq(1L, vecs(5), 5, refine = 20) == exact(vecs(5), 5))
    // O(batch) append encodes with the PERSISTED grid; values outside
    // the trained range saturate but the refined search is still exact
    val nv = Array.tabulate(8)(j => 12f + j) // beyond vmax: saturates
    s.insert(Seq(nv))
    assert(sq(2L, nv, 3, refine = 21) == exact(nv, 3))
    // delete mask composes before the SQDC top-k
    val victim = sq(3L, vecs(9), 1).head._1
    s.delete(Seq(victim))
    assert(!sq(4L, vecs(9), 5).map(_._1).contains(victim))
    assert(sq(5L, vecs(9), 5, refine = 20) == exact(vecs(9), 5))
    // contracts: refine must be 0 or >= k
    intercept[IllegalArgumentException](sq(6L, vecs(0), 5, refine = 3))
    // rebuild hygiene: flat over SQ clears marker + grid; SQ over PQ
    // clears the stale codebook
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(s.annKind == "ivf")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/ann/sq")))
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 1)
    s.buildAnnIndexSq(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(s.annKind == "ivfsq")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/ann/codebook")))
    assert(sq(7L, vecs(5), 5, refine = 20) == exact(vecs(5), 5))
    // quantile-clipped grid: same persisted-params contract, refined
    // search still exact (saturated tails re-rank by true distance)
    s.buildAnnIndexSq(nCentroids = 2, iters = 2, seedRounds = 0,
      clipQuantile = 0.05)
    assert(sq(8L, vecs(5), 5, refine = 21) == exact(vecs(5), 5))
  }

  test("BQ store lifecycle: mandatory refine, degenerate exactness, append, mask, hygiene") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bq-store")
      .toString + "/store"
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    val vecs = (0 until 20).map(i =>
      Array.tabulate(8)(j => ((i * 7 + j * 3) % 11).toFloat))
    s.insert(vecs)
    s.buildAnnIndexBq(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(s.annKind == "ivfbq")
    def bq(qid: Long, q: Array[Float], k: Int, refine: Int): Seq[(Long, Float)] =
      s.searchApproxDF(Seq((qid, q)).toDF("qid", "qvec"), k, nProbe = 2,
          refine = refine)
        .orderBy("rn").select(col("id"), col("distance"))
        .as[(Long, Float)].collect().toSeq
    def exact(q: Array[Float], k: Int): Seq[(Long, Float)] =
      s.search(Seq(q), k).head.map(r => (r.id, r.distance))
    // hamming is a rank signal, not a distance: refine is MANDATORY
    intercept[IllegalArgumentException](bq(0L, vecs(5), 5, refine = 0))
    intercept[IllegalArgumentException](bq(0L, vecs(5), 5, refine = 3))
    // refine = live-count degenerates to exact brute force (true
    // float32 distances) — the vs_ann_bq gate contract
    assert(bq(1L, vecs(5), 5, refine = 20) == exact(vecs(5), 5))
    // partial refine still returns TRUE distances for whatever it ranks
    val ex = exact(vecs(5), 20).toMap
    bq(2L, vecs(5), 3, refine = 8).foreach { case (id, d) =>
      assert(math.abs(d - ex(id)) < 1e-5f, s"id $id: $d vs ${ex(id)}")
    }
    // O(batch) append packs with the PERSISTED thresholds
    val nv = Array.tabulate(8)(j => 12f + j)
    s.insert(Seq(nv))
    assert(bq(3L, nv, 3, refine = 21) == exact(nv, 3))
    // delete mask composes before the shortlist cut
    val victim = bq(4L, vecs(9), 1, refine = 21).head._1
    s.delete(Seq(victim))
    assert(!bq(5L, vecs(9), 5, refine = 20).map(_._1).contains(victim))
    assert(bq(6L, vecs(9), 5, refine = 20) == exact(vecs(9), 5))
    // rebuild hygiene: flat over BQ clears marker + thresholds; BQ
    // over PQ clears the stale codebook
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(s.annKind == "ivf")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/ann/bq")))
    s.buildAnnIndexPq(nCells = 2, m = 2, k = 4, iters = 1)
    s.buildAnnIndexBq(nCentroids = 2, iters = 2, seedRounds = 0)
    assert(s.annKind == "ivfbq")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/ann/codebook")))
    assert(bq(7L, vecs(5), 5, refine = 20) == exact(vecs(5), 5))
  }

  test("ingestStreamDedup approx: probed 1-NN rejects dups, falls back without index") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-sdd").toString
    val s = VectorStore.openOrCreate(spark, s"$base/store", 10,
      tombstoneDeletes = true)
    // 30 well-separated vectors in 3 groups (the searchApprox fixture)
    val vecs = (0 until 30).map { i =>
      Array.tabulate(10)(j => (i / 10) * 10f + (if (j == i % 10) 1f else 0f) +
        (i % 10) * 0.01f)
    }
    val ck = s"$base/ck"
    // batch 0 on the EMPTY store with approx = true: no index yet —
    // exact fallback path, everything lands
    val b0 = vecs.take(20).zipWithIndex
      .map { case (v, i) => (v, s"""{"o": $i}""") }.toDF("vec", "doc")
    assert(s.applyDedupIngestBatch(b0, 0L, ck, eps = 0.5,
      Seq(col("doc")), approx = true, nProbe = 3))
    assert(s.count() == 20L)
    s.buildAnnIndex(nCentroids = 3, iters = 3, seedRounds = 0)
    // batch 1: 5 exact copies (must be rejected through the PROBED
    // 1-NN — full probe here, so recall is total) + 5 novel rows
    val b1 = (vecs.take(5).map(v => (v, """{"c": 1}""")) ++
        vecs.drop(20).take(5).zipWithIndex
          .map { case (v, i) => (v, s"""{"n": $i}""") })
      .toDF("vec", "doc")
    assert(s.applyDedupIngestBatch(b1, 1L, ck, eps = 0.5,
      Seq(col("doc")), approx = true, nProbe = 3))
    assert(s.count() == 25L)
    assert(s.toDF.filter(col("doc").contains("\"c\"")).count() == 0L)
    assert(s.toDF.filter(col("doc").contains("\"n\"")).count() == 5L)
    // replay of batch 1 is skipped (guard shared with the exact path)
    assert(!s.applyDedupIngestBatch(b1, 1L, ck, eps = 0.5,
      Seq(col("doc")), approx = true, nProbe = 3))
    assert(s.count() == 25L)
    // approx ≡ exact on this fixture: a fresh exact-mode run over the
    // same batches keeps the same survivors
    val s2 = VectorStore.openOrCreate(spark, s"$base/store2", 10,
      tombstoneDeletes = true)
    assert(s2.applyDedupIngestBatch(b0, 0L, s"$base/ck2", eps = 0.5,
      Seq(col("doc")), approx = false, nProbe = 1))
    assert(s2.applyDedupIngestBatch(b1, 1L, s"$base/ck2", eps = 0.5,
      Seq(col("doc")), approx = false, nProbe = 1))
    assert(s2.count() == 25L)
  }

  test("ingestStream replay guard: an already-committed batchId is skipped") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-rep").toString
    val store = VectorStore.openOrCreate(spark, s"$base/store", 4,
      tombstoneDeletes = true)
    val ck = s"$base/ck"
    val b0 = Seq((Array.fill(4)(1f), """{"b": 0}"""),
      (Array.fill(4)(2f), """{"b": 0}""")).toDF("vec", "doc")
    assert(store.applyIngestBatch(b0, 0L, ck, Seq.empty))
    assert(store.count() == 2L)
    // crash-replay of the same batch: foreachBatch re-delivers batch 0
    // after the insert landed but before the stream's offset commit —
    // the marker makes the re-delivery a no-op instead of 2 dup rows
    assert(!store.applyIngestBatch(b0, 0L, ck, Seq.empty))
    assert(store.count() == 2L)
    // ids did not advance on the skipped replay
    assert(store.head(2).map(_.id) == Seq(0L, 1L))
    // the next batch applies, and a DIFFERENT stream (its own
    // checkpoint dir) is keyed independently
    val b1 = Seq((Array.fill(4)(3f), """{"b": 1}""")).toDF("vec", "doc")
    assert(store.applyIngestBatch(b1, 1L, ck, Seq.empty))
    assert(store.applyIngestBatch(b1, 1L, s"$base/ck-other", Seq.empty))
    assert(store.count() == 4L)
    // the marker LIVES IN the checkpoint dir: wiping the checkpoint to
    // reprocess from scratch (batchIds restart at 0) wipes the marker
    // with it, so the restarted stream's batch 0 APPLIES instead of
    // being silently skipped up to the old high-water mark
    val ckPath = new org.apache.hadoop.fs.Path(ck)
    val fs = ckPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(ckPath, true)
    assert(store.applyIngestBatch(b1, 0L, ck, Seq.empty))
    assert(store.count() == 5L)
  }

  test("deleteWhere: predicate delete, count returned, zero-match no-op") {
    val s = freshStore()
    s.insert(eye(10).take(6), (0 until 6).map(i =>
      s"""{"t": "${if (i % 2 == 0) "a" else "b"}"}"""))
    assert(s.deleteWhere(Seq("t"), Seq("b")) == 3L)
    assert(s.count() == 3L)
    assert(s.selectIds(Seq(1L, 3L, 5L)).isEmpty)
    // searches no longer see the deleted rows
    val q = Array.tabulate(10)(j => if (j == 1) 1f else 0f)  // id 1's vec
    assert(!s.search(Seq(q), 3).head.map(_.id).contains(1L))
    // zero matches: no-op, count 0
    assert(s.deleteWhere(Seq("t"), Seq("zzz")) == 0L)
    assert(s.count() == 3L)
    intercept[IllegalArgumentException](s.deleteWhere(Seq.empty, Seq("b")))
  }

  test("cloneTo: full snapshot with indexes, independent lineage, non-empty dest refused") {
    import spark.implicits._
    val s = VectorStore.openOrCreate(spark, dir, 10, tombstoneDeletes = true)
    s.insert(eye(10).take(8), (0 until 8).map(i => s"""{"g": "${i % 2}"}"""))
    s.buildAnnIndex(nCentroids = 2, iters = 1, seedRounds = 0)
    s.materializeDocField(Seq("g"))
    s.delete(Seq(3L))
    val dst = Files.createTempDirectory("graft-vs-clone").toString + "/c"
    val c = s.cloneTo(dst)
    assert(c.count() == 7 && c.hasAnnIndex && c.hasDocIndex(Seq("g")))
    // post-clone writes are independent in BOTH directions
    s.delete(Seq(4L))
    val newIds = c.insert(Seq(Array.tabulate(10)(_.toFloat)))
    assert(s.count() == 6 && c.count() == 8)
    assert(newIds == Seq(8L), "clone id lineage continues from the snapshot")
    // indexed query works on the clone without a rebuild
    assert(c.queryByDoc(Seq("g"), Seq("1")).nonEmpty)
    intercept[IllegalArgumentException](s.cloneTo(dst))
    // an EXISTING EMPTY directory is refused too: FileUtil.copy would
    // nest the store one level down (dst/<srcName>) and openOrCreate
    // would hand back a fresh zero-row store — the silent-empty-backup
    // failure mode, not a merge
    val emptyDst = Files.createTempDirectory("graft-vs-clone-empty").toString
    val ex = intercept[IllegalArgumentException](s.cloneTo(emptyDst))
    assert(ex.getMessage.contains("already exists"))
  }

  test("auto-maintenance: hot-cell split and cold-cell merge fire on their triggers, search unchanged") {
    import graft.store.IndexMaintenancePolicy
    val s = VectorStore.openOrCreate(spark, dir, 4, tombstoneDeletes = true)
    def vec(i: Int) = Array((i % 7).toFloat, (i / 7).toFloat, (i % 3).toFloat, 1f)
    s.insert((0 until 40).map(vec))
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    val qs = Seq(vec(3), vec(11))
    def full() = s.searchApprox(qs, k = 5, nProbe = 64)
      .map(_.map(r => (r.id, r.distance)))
    val before = full()
    // append-side trigger: no policy -> no split however hot the cells
    s.insert((40 until 80).map(vec))
    assert(s.annIndexStats().nCells == 2, "no policy must mean no maintenance")
    // policy on: the next append crosses maxCellRows and splits in place
    s.enableAutoMaintenance(IndexMaintenancePolicy(maxCellRows = 30))
    s.insert((80 until 100).map(vec))
    val st1 = s.annIndexStats()
    assert(st1.nCells > 2, s"hot-cell split must fire, got ${st1.nCells} cells")
    assert(st1.maxCellRows <= 30, s"post-split max ${st1.maxCellRows} > cap")
    // search equivalence: full probe before vs after the split over the
    // same live set (recompute 'before' against the grown corpus)
    val afterSplit = full()
    s.disableAutoMaintenance()
    assert(afterSplit.map(_.map(_._1)) ==
      s.searchApprox(qs, 5, nProbe = 64).map(_.map(r => r.id)),
      "full-probe results must be layout-independent")
    assert(before.head.nonEmpty)
    // delete-side trigger: shrink cells under minCellRows -> merge
    s.enableAutoMaintenance(IndexMaintenancePolicy(minCellRows = 20))
    val victims = (0 until 100 by 2).map(_.toLong) // halve every cell
    s.delete(victims)
    val st2 = s.annIndexStats()
    assert(st2.nCells < st1.nCells,
      s"cold-cell merge must fire: ${st1.nCells} -> ${st2.nCells}")
    val afterMerge = full()
    s.disableAutoMaintenance()
    assert(afterMerge.map(_.map(_._1)) ==
      s.searchApprox(qs, 5, nProbe = 64).map(_.map(r => r.id)))
    assert(afterMerge.head.map(_._1).forall(id => id % 2 == 1),
      "deleted rows must not resurface through the merged layout")
  }

  test("rebuildAnnIndex replays the persisted build recipe; quantized auto-rebuild fires") {
    import graft.store.IndexMaintenancePolicy
    val s = VectorStore.openOrCreate(spark, dir, 4, tombstoneDeletes = true)
    def vec(i: Int) = Array((i % 7).toFloat, (i / 7).toFloat, 1f, 0f)
    s.insert((0 until 50).map(vec))
    s.buildAnnIndexSq(nCentroids = 3, iters = 2, seedRounds = 0)
    val qs = Seq(vec(5), vec(30))
    def full() = s.searchApprox(qs, k = 4, nProbe = 64).map(_.map(_.id))
    val before = full()
    // recipe replay: same kind, same cell count, same full-probe result
    s.rebuildAnnIndex()
    assert(s.annKind == "ivfsq")
    assert(s.annIndexStats().nCells == 3)
    assert(full() == before, "recipe replay must preserve full-probe results")
    // quantized auto-rebuild: drifted appends skew one cell; the policy
    // must RETRAIN (codes are grid-relative, no in-place split exists)
    s.enableAutoMaintenance(
      IndexMaintenancePolicy(quantizedRebuildImbalance = 2.0))
    s.insert((0 until 60).map(i => Array(50f, 50f, 1f, 0f).map(_ + i * 0.01f)))
    val st = s.annIndexStats()
    s.disableAutoMaintenance()
    assert(st.imbalance <= 2.5,
      s"quantized retrain must have fired: imbalance ${st.imbalance}")
    assert(full().head.nonEmpty)
  }

  test("rebuildAnnIndex replays PQ and OPQ recipes (kind, hyperparams, results)") {
    val s = VectorStore.openOrCreate(spark, dir, 8, tombstoneDeletes = true)
    def vec(i: Int) = Array.tabulate(8)(j =>
      (i % 5).toFloat * 2 + (if (j == i % 8) 1f else 0f) + i * 0.01f)
    s.insert((0 until 60).map(vec))
    s.buildAnnIndexPq(nCells = 3, m = 2, k = 4, iters = 1, opq = true,
      opqSweeps = 1)
    assert(s.annKind == "ivfpq_opq")
    val qs = Seq(vec(7), vec(31))
    // full probe + full refine = exact whatever the codebook, so the
    // before/after comparison is decided by real results, not fp luck
    def full() = s.searchApprox(qs, k = 4, nProbe = 3, refine = 60)
      .map(_.map(_.id))
    val before = full()
    s.rebuildAnnIndex()
    assert(s.annKind == "ivfpq_opq", "recipe must preserve the OPQ kind")
    assert(s.annIndexStats().nCells == 3)
    assert(full() == before)
    // residual recipe round-trips too
    s.buildAnnIndexPq(nCells = 3, m = 2, k = 4, iters = 1, residual = true)
    val beforeRes = full()
    s.rebuildAnnIndex()
    assert(s.annKind == "ivfpq_res")
    assert(full() == beforeRes)
  }

  test("super quantizer is rebuilt, not dropped, when maintenance rewrites cells") {
    import spark.implicits._
    val s = VectorStore.openOrCreate(spark, dir, 4, tombstoneDeletes = true)
    def vec(i: Int) = Array((i % 8).toFloat, (i / 8).toFloat, 0f, 1f)
    s.insert((0 until 80).map(vec))
    s.buildAnnIndex(nCentroids = 4, iters = 2, seedRounds = 0)
    s.buildAnnSuperQuantizer(nSuper = 2, iters = 2)
    val rep = s.rebalanceAnnIndex(maxCellRows = 15, iters = 2)
    assert(rep.splitCells > 0, "fixture must actually split")
    // routing survived the rewrite: hierarchical search works and the
    // full-routing degenerate equals exact
    val got = s.searchApproxHierDF(
        Seq((0L, vec(9))).toDF("qid", "qvec"), k = 4,
        nProbe = 64, superProbe = 2)
      .select($"id").as[Long].collect().toSeq
    val exact = s.search(Seq(vec(9)), k = 4).head.map(_.id)
    assert(got == exact, s"$got vs $exact")
    // the routed cell set is the POST-rewrite one
    val routed = spark.read.parquet(s"$dir/ann/super/routing").count()
    assert(routed == s.annIndexStats().nCells,
      "routing must cover every post-rewrite cell")
  }

  test("auto-maintenance fires inside streaming ingest batches, search stays exact") {
    import graft.store.IndexMaintenancePolicy
    val s = VectorStore.openOrCreate(spark, dir, 4, tombstoneDeletes = true)
    def vec(i: Int) = Array((i % 9).toFloat, (i / 9 % 9).toFloat, 1f, 0f)
    s.insert((0 until 60).map(vec))
    s.buildAnnIndex(nCentroids = 2, iters = 2, seedRounds = 0)
    s.enableAutoMaintenance(IndexMaintenancePolicy(maxCellRows = 50))
    // five micro-batches through the foreachBatch body: the split must
    // fire INSIDE applyIngestBatch -> insertDF, no manual call anywhere
    val ck = Files.createTempDirectory("graft-am-ck").toString
    import org.apache.spark.sql.functions.{array, col, lit}
    (0 until 5).foreach { b =>
      val batch = spark.range(b * 20, b * 20 + 20)
        .select(array((col("id") % 9).cast("float"),
          ((col("id") / 9) % 9).cast("float"), lit(1f), lit(0f)).as("vec"),
          col("id").as("ord"))
      assert(s.applyIngestBatch(batch, b.toLong, ck, Seq(col("ord"))))
    }
    assert(s.count() == 160)
    val st = s.annIndexStats()
    assert(st.nCells > 2, "split must have fired during streaming ingest")
    assert(st.maxCellRows <= 50, s"cap violated: ${st.maxCellRows}")
    // full probe over the maintained layout = exact brute force
    val got = s.searchApprox(Seq(vec(5)), k = 4, nProbe = 64)
      .head.map(_.id)
    s.disableAutoMaintenance()
    val brute = s.search(Seq(vec(5)), k = 4).head.map(_.id)
    assert(got == brute, s"$got vs $brute")
  }

  test("auto-maintenance: posting-index rebuild fires on file count and dead fraction") {
    import graft.store.IndexMaintenancePolicy
    val s = VectorStore.openOrCreate(spark, dir, 4, tombstoneDeletes = true)
    def vec(i: Int) = Array(i.toFloat, 1f, 0f, 0f)
    def doc(i: Int) = s"""{"t": "w${i % 5} common pad${i % 3}"}"""
    s.insert((0 until 30).map(vec), (0 until 30).map(doc))
    s.buildLexIndex()
    val qs = Seq(0L -> Seq("common", "w1"))
    def ranks() = s.searchLexDF(qs, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).sortBy(_._3).toSeq
    val base = ranks()
    val files0 = s.lexIndexStats().nFiles
    // append accumulation: rebuild once the file count passes the cap
    s.enableAutoMaintenance(IndexMaintenancePolicy(lexMaxFiles = files0 + 2))
    (0 until 4).foreach(b =>
      s.insert(Seq(vec(100 + b)), Seq(doc(100 + b))))
    val files1 = s.lexIndexStats().nFiles
    assert(files1 <= files0 + 3,
      s"file-count rebuild must have fired: $files0 -> $files1")
    assert(s.lexIndexStats().nDocs == 34)
    // dead-fraction trigger: delete a third of the corpus
    s.enableAutoMaintenance(IndexMaintenancePolicy(lexMaxDeadFraction = 0.2))
    s.delete((0L until 12L))
    val st = s.lexIndexStats()
    assert(st.nDeadPostings == 0L,
      s"dead-fraction rebuild must fold the masked postings, got ${st.nDeadPostings}")
    s.disableAutoMaintenance()
    // ranking parity vs the scan route over the mutated live set
    val afterIdx = ranks()
    s.dropLexIndex()
    assert(ranks() == afterIdx, "maintained index must rank like the scan route")
    assert(base.nonEmpty && afterIdx.nonEmpty)
  }

  test("tuneNProbe: walks the ladder, full probe is recall 1.0, contracts hold") {
    import spark.implicits._
    val s = freshStore(4)
    s.insert((0 until 64).map(i =>
      Array((i % 8).toFloat, (i / 8).toFloat, (i % 3).toFloat, 1f)))
    s.buildAnnIndex(nCentroids = 4, iters = 2, seedRounds = 0)
    val sample = (0 until 8).map(i =>
      (i.toLong, Array((i % 8).toFloat, i.toFloat / 8, 0.5f, 1f)))
      .toDF("qid", "qvec")
    // target 1.0: terminates, last arm meets, recall exactly 1.0 at
    // the clamped full-probe arm if reached
    val (p1, f1) = s.tuneNProbe(sample, k = 3, targetRecall = 1.0,
      ladder = Seq(1, 2))
    val rows1 = f1.as[(Int, Double, Boolean)].collect().sortBy(_._1)
    assert(rows1.last._3, "walk must stop on a meeting arm")
    assert(rows1.last._1 == p1)
    assert(rows1.map(_._1).toSeq == rows1.map(_._1).sorted.toSeq)
    // a tiny target stops at the first arm
    val (p2, f2) = s.tuneNProbe(sample, k = 3, targetRecall = 0.01,
      ladder = Seq(1, 2, 4))
    assert(f2.count() == 1 && p2 == 1)
    // full-probe arm (ladder past cell count clamps to 4) is exact
    val (_, f3) = s.tuneNProbe(sample, k = 3, targetRecall = 1.0,
      ladder = Seq(4))
    val last3 = f3.as[(Int, Double, Boolean)].collect().maxBy(_._1)
    assert(last3._1 == 4 && last3._2 == 1.0 && last3._3)
    intercept[IllegalArgumentException](
      s.tuneNProbe(sample, 3, 0.0))
    intercept[IllegalArgumentException](
      s.tuneNProbe(sample, 3, 0.9, ladder = Seq(4, 2)))
  }

  test("searchDiverseDF: lambda=1 is NN order, diversity breaks clumps, no dups") {
    import spark.implicits._
    val s = freshStore(4)
    // a tight clump near the query plus spread-out singletons: plain
    // NN fills top-3 from the clump; MMR at low lambda must not
    val rows: Seq[Array[Float]] =
      Seq(Array(1f, 0f, 0f, 0f), Array(0.99f, 0.01f, 0f, 0f),
        Array(0.98f, 0.02f, 0f, 0f), Array(0f, 1f, 0f, 0f),
        Array(0f, 0f, 1f, 0f), Array(0f, 0f, 0f, 1f))
    s.insert(rows)
    val q = Seq((0, Array(1f, 0f, 0f, 0f))).toDF("qid", "qvec")
    val nn = s.searchDiverseDF(q, k = 3, shortlist = 6, lambda = 1.0)
      .orderBy("rank").select($"id").as[Long].collect().toSeq
    assert(nn == Seq(0L, 1L, 2L), s"lambda=1 must be plain NN order: $nn")
    val div = s.searchDiverseDF(q, k = 3, shortlist = 6, lambda = 0.3)
      .orderBy("rank").select($"id").as[Long].collect().toSeq
    assert(div.head == 0L, "first pick is pure relevance")
    assert(div.distinct.size == 3)
    assert(!(div.toSet == Set(0L, 1L, 2L)),
      s"low lambda must escape the clump: $div")
    intercept[IllegalArgumentException](
      s.searchDiverseDF(q, k = 5, shortlist = 3))
  }

  test("ingestStream: micro-batches append through insertDF, ids continue") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{concat, element_at, get_json_object, lit}
    val base = Files.createTempDirectory("graft-ing").toString
    val store = VectorStore.openOrCreate(spark, s"$base/store", 4,
      tombstoneDeletes = true)
    // pre-seed 2 rows so streamed ids must CONTINUE from the max
    store.insert(Seq(Array.fill(4)(9f), Array.fill(4)(8f)))
    val src = (0 until 10).map(i => (i.toLong, Array.fill(4)(i.toFloat)))
      .toDF("k", "vec")
    src.repartitionByRange(2, $"k").write.parquet(s"$base/src")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$base/src").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/src")
      .select($"vec", concat(lit("""{"k": """), $"k", lit("}")).as("doc"), $"k")
    store.ingestStream(stream, s"$base/ck", orderCols = Seq($"k"))
      .awaitTermination()
    assert(store.count() == 12L)
    assert(store.head(1).head.id == 0L)
    // every streamed row present exactly once, vec matching its origin
    val got = store.toDF
      .select(get_json_object($"doc", "$.k").cast("long").as("k"),
        element_at($"vec", 1).as("v0"))
      .filter($"k".isNotNull)
      .as[(Long, Float)].collect().toMap
    assert(got == (0 until 10).map(i => i.toLong -> i.toFloat).toMap)
  }

  test("ingestStreamDedup: near-dups of stored rows rejected, novel rows kept") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("graft-sdd").toString
    val store = VectorStore.openOrCreate(spark, s"$base/store", 4,
      tombstoneDeletes = true)
    def v(x: Float) = Array(x, 0f, 0f, 0f)
    // batch file 1: two well-separated originals; batch file 2: an
    // exact copy of the first, a near-copy (dist 0.1) of the second,
    // and one genuinely novel vector — the stream must keep only the
    // novel one from file 2
    Seq((1L, v(0f)), (2L, v(10f))).toDF("k", "vec")
      .repartitionByRange(2, $"k").write.parquet(s"$base/srcA")
    Seq((3L, v(0f)), (4L, Array(10.1f, 0f, 0f, 0f)), (5L, v(50f)))
      .toDF("k", "vec").write.parquet(s"$base/srcB")
    def stream(d: String) = spark.readStream
      .schema(spark.read.parquet(d).schema)
      .option("maxFilesPerTrigger", "1").parquet(d)
      .select(col("vec"), col("k"))
    // originals land first (two micro-batches), then the dirty batch
    store.ingestStreamDedup(stream(s"$base/srcA"), s"$base/ckA", eps = 0.5,
      orderCols = Seq(col("k"))).awaitTermination()
    store.ingestStreamDedup(stream(s"$base/srcB"), s"$base/ckB", eps = 0.5,
      orderCols = Seq(col("k"))).awaitTermination()
    val kept = store.dumpVecs().map(_.head).sorted.toSeq
    assert(kept == Seq(0f, 10f, 50f),
      s"copies must be rejected, novel kept: $kept")
    intercept[IllegalArgumentException](
      store.ingestStreamDedup(stream(s"$base/srcA"), s"$base/ck2",
        eps = -1.0))
  }
}
