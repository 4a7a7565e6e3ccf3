package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.store.{ParquetStorage, TombstoneStorage}

/** Direct StorageLayer contracts — above all the delete-cost split:
  * the tombstone layout must delete with O(batch) IO (append a slim id
  * log, never touch the data files), where the plain Parquet layout
  * rewrites the table. Semantics of the two layouts are asserted
  * identical through the VectorStore API in VectorStoreParitySpec.
  */
class StorageLayerSpec extends SparkSuite {
  import spark.implicits._

  private def dataFiles(root: String) = {
    val p = new Path(root, "data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
      .sortBy(_._1).toSeq
  }

  private def dirBytes(root: String, sub: String): Long = {
    val p = new Path(root, sub)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
  }

  private def table(n: Int) =
    spark.range(n).select(col("id"),
      concat(lit("payload-"), col("id")).as("doc"),
      array_repeat(rand(seed = 7).cast("float"), 32).as("vec"))

  test("tombstone delete is O(batch): data files untouched, log ~ batch size") {
    val root = Files.createTempDirectory("graft-sl-ts").toString + "/t"
    val st = new TombstoneStorage(spark, root)
    st.initialize(table(0).schema)
    st.append(table(10000))
    val before = dataFiles(root)
    val dataBytes = before.map(_._2).sum

    st.delete(Seq(1L, 2L, 3L).toDF("id"))

    // the table's files were not rewritten, renamed, or even touched —
    // a delete batch costs IO proportional to the BATCH, not the table
    assert(dataFiles(root) == before,
      "tombstone delete must not rewrite or touch the data files")
    val logBytes = dirBytes(root, "tombstones")
    assert(logBytes > 0 && logBytes < dataBytes / 10,
      s"tombstone log ($logBytes B) must be tiny next to the data ($dataBytes B)")

    // reads anti-join the log out — and as a BROADCAST anti-join, since
    // the tombstone set is planner-small relative to the table
    assert(st.read().count() == 9997)
    assert(st.read().filter(col("id") < 5).select("id")
      .as[Long].collect().sorted.toSeq == Seq(0L, 4L))
    val plan = st.read().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstone read must plan a broadcast anti-join:\n$plan")

    // second batch appends to the log; count reflects both
    st.delete(Seq(4L).toDF("id"))
    assert(dataFiles(root) == before)
    assert(st.tombstoneCount() == 4L && st.read().count() == 9996)

    // compact folds the log into one rewrite and clears it
    st.compact()
    assert(st.tombstoneCount() == 0L && st.read().count() == 9996)
    assert(dataFiles(root) != before, "compact is the one deliberate rewrite")
  }

  test("auto-compaction: reads stay O(live) after many delete batches, no manual call") {
    val root = Files.createTempDirectory("graft-sl-ac").toString + "/t"
    // thresholds scaled down so the policy fires at spec scale
    val st = new TombstoneStorage(spark, root,
      autoCompactFraction = 0.1, autoCompactMinTombstones = 50L)
    st.initialize(table(0).schema)
    st.append(table(1000))
    val before = dataFiles(root)

    // below the absolute floor the log just accumulates — no count job,
    // no rewrite (a handful of tombstones never triggers table IO)
    for (b <- 0 until 4) st.delete((b * 10 until b * 10 + 10).map(_.toLong).toDF("id"))
    assert(st.tombstoneCount() == 40L)
    assert(dataFiles(root) == before,
      "below the floor, deletes must stay O(batch)")

    // keep deleting: floor is crossed at 50, the fraction gate
    // (pending >= 0.1 * live) at the 10th batch (100 >= 0.1 * 900) —
    // compaction fires INSIDE delete(), no manual compact() anywhere
    for (b <- 4 until 10) st.delete((b * 10 until b * 10 + 10).map(_.toLong).toDF("id"))
    assert(st.tombstoneCount() == 0L, "policy must have compacted the log")
    assert(dirBytes(root, "tombstones") == 0L, "tombstone log cleared")
    assert(dataFiles(root) != before, "compaction rewrote to live rows only")
    assert(st.read().count() == 900)
    // and the post-compaction read carries no anti-join at all
    val plan = st.read().queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"),
      s"after auto-compaction reads must scan live data only:\n$plan")

    // the store keeps working: later deletes log again below the floor
    st.delete(Seq(500L).toDF("id"))
    assert(st.tombstoneCount() == 1L && st.read().count() == 899)
  }

  test("parquet delete rewrites the table (the contrast case)") {
    val root = Files.createTempDirectory("graft-sl-pq").toString + "/t"
    val st = new ParquetStorage(spark, root)
    st.initialize(table(0).schema)
    st.append(table(1000))
    val before = dataFiles(root)
    st.delete(Seq(1L).toDF("id"))
    assert(st.read().count() == 999)
    assert(dataFiles(root) != before,
      "plain parquet layout deletes via read-antijoin-rewrite")
  }

  test("tombstone layout: a row appended after a delete of the same id stays visible") {
    val root = Files.createTempDirectory("graft-sl-gen").toString + "/t"
    val st = new TombstoneStorage(spark, root)
    st.initialize(table(0).schema)
    st.append(table(10))
    st.delete(Seq(5L).toDF("id"))
    assert(st.read().count() == 9)
    // re-append id 5 (the upsert shape, and the reference's max-id reuse
    // after delete, vector_store.py:195-203): the tombstone recorded an
    // EARLIER write version, so the new row must survive the mask
    st.append(table(10).filter(col("id") === 5L).withColumn("doc", lit("replacement")))
    assert(st.read().count() == 10)
    assert(st.read().filter(col("id") === 5L).select("doc")
      .as[String].collect().toSeq == Seq("replacement"))
    // the internal write-version column never leaks out of read()
    assert(!st.read().columns.contains("_graft_gen"))
    // the replacement survives compaction, and a LATER delete still wins
    st.compact()
    assert(st.read().filter(col("id") === 5L).count() == 1)
    st.delete(Seq(5L).toDF("id"))
    assert(st.read().filter(col("id") === 5L).count() == 0)
  }

  test("tombstone layout: readAt time-travels across appends and deletes") {
    val root = Files.createTempDirectory("graft-sl-tt").toString + "/t"
    val st = new TombstoneStorage(spark, root)
    st.initialize(table(0).schema)
    st.append(table(5))                              // v1: ids 0-4
    st.delete(Seq(2L).toDF("id"))                    // v2: id 2 masked
    st.append(table(10).filter(col("id") >= 5))      // v3: ids 5-9
    assert(st.currentVersion() == 3L)
    def idsAt(v: Long) =
      st.readAt(v).select("id").as[Long].collect().sorted.toSeq
    assert(idsAt(1L) == (0L to 4L))
    assert(idsAt(2L) == Seq(0L, 1L, 3L, 4L))
    assert(idsAt(3L) == st.read().select("id").as[Long].collect().sorted.toSeq)
    // compaction bounds history: masked rows are physically gone, so
    // pre-compaction snapshots FAIL explicitly (the snapshot-floor
    // contract — a silent read would miss the folded deletes) while
    // the current version stays reproducible
    st.compact()
    assert(st.snapshotFloor() == 3L)
    intercept[IllegalArgumentException](idsAt(1L))
    assert(idsAt(3L).size == 9)
  }

  test("tombstone overwrite folds pending tombstones; staged swap stays atomic") {
    val root = Files.createTempDirectory("graft-sl-ow").toString + "/t"
    val st = new TombstoneStorage(spark, root)
    st.initialize(table(0).schema)
    st.append(table(100))
    st.delete(Seq(7L).toDF("id"))
    assert(st.tombstoneCount() == 1L)
    // overwrite describes a NEW table; stale tombstones must not leak
    // into it (id 7 exists again afterwards)
    st.overwrite(table(50))
    assert(st.tombstoneCount() == 0L)
    assert(st.read().count() == 50)
    assert(st.read().filter(col("id") === 7L).count() == 1)
    // no staging/backup debris left behind by the swap
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(n => n.startsWith("_staging-") || n.startsWith("_old-"))
    assert(leftovers.isEmpty, s"swap debris: ${leftovers.mkString(",")}")
  }

  test("single-writer lease: a second opener makes the first handle fail fast on write") {
    import graft.store.VectorStore
    val root = Files.createTempDirectory("graft-sl-sw").toString + "/s"
    def vec(i: Int) = Array(i.toFloat, 0f, 1f, 2f)
    val w1 = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    w1.insert(Seq(vec(0), vec(1)))
    // second writer opens the SAME store: the lease moves to it
    val w2 = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    w2.insert(Seq(vec(2)))
    // the stale handle must fail fast on every mutation kind, BEFORE
    // touching storage — never interleave id assignment
    val ex = intercept[IllegalStateException](w1.insert(Seq(vec(9))))
    assert(ex.getMessage.contains("single-writer violation"))
    intercept[IllegalStateException](w1.delete(Seq(0L)))
    intercept[IllegalStateException](w1.upsert(Seq(0L), Seq(vec(8))))
    intercept[IllegalStateException](w1.deleteWhere(Seq("k"), Seq("v")))
    intercept[IllegalStateException](w1.compact())
    // nothing corrupted: the live handle sees exactly its own writes,
    // contiguous ids, and keeps working
    assert(w2.count() == 3)
    w2.insert(Seq(vec(3)))
    assert(w2.count() == 4)
    // reads through the stale handle stay legal (readers never check)
    assert(w1.count() == 4)
    // re-opening takes the lease over cleanly
    val w3 = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    w3.insert(Seq(vec(4)))
    assert(w3.count() == 5)
    intercept[IllegalStateException](w2.insert(Seq(vec(5))))
  }

  test("read-only opens never claim the lease: a writer survives any number of them") {
    import graft.store.VectorStore
    val root = Files.createTempDirectory("graft-sl-ro").toString + "/s"
    def vec(i: Int) = Array(i.toFloat, 0f, 1f, 2f)
    val writer = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    writer.insert(Seq(vec(0), vec(1)))
    // diagnostic/reporting opens between the writer's batches: reads
    // only, so the writer's lease must stay untouched
    val r1 = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    assert(r1.count() == 2)
    assert(r1.head(1).head.id == 0L)
    writer.insert(Seq(vec(2))) // previously threw: r1's open stole the lease
    val r2 = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    assert(r2.stats().nLive == 3)
    writer.delete(Seq(0L))
    writer.upsert(Seq(1L), Seq(vec(9)))
    assert(writer.count() == 2)
    // the lease moves only when a second handle MUTATES
    r2.insert(Seq(vec(5)))
    val ex = intercept[IllegalStateException](writer.insert(Seq(vec(6))))
    assert(ex.getMessage.contains("single-writer violation"))
    assert(r2.count() == 3)
  }

  test("lease claim is fenced: the claimer verifies its own token after the write") {
    import graft.store.VectorStore
    val root = Files.createTempDirectory("graft-sl-fence").toString + "/s"
    def vec(i: Int) = Array(i.toFloat, 0f, 1f, 2f)
    val w1 = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    w1.insert(Seq(vec(0)))
    // simulate the check-then-act interleaving the fence closes: a
    // missing lease (manual delete — both handles would have "re-
    // claimed" it under the old code) is re-claimed by whichever handle
    // writes first; the OTHER handle's claim then reads a foreign token
    // and fails at claim time, never proceeding to write
    val lease = new Path(root, "_writer.lease")
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lease, false)
    val w2 = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    w2.insert(Seq(vec(1))) // re-claims the missing lease
    val ex = intercept[IllegalStateException](w1.insert(Seq(vec(2))))
    assert(ex.getMessage.contains("single-writer violation"))
    assert(w2.count() == 2)
    // ids stayed contiguous through the takeover — nothing interleaved
    assert(w2.head(10).map(_.id) == Seq(0L, 1L))
  }

  test("handle caches primed before a lease claim are dropped at the claim: no id collision, live-exact count") {
    import graft.store.VectorStore
    val root = Files.createTempDirectory("graft-sl-stale").toString + "/s"
    def vec(i: Int) = Array(i.toFloat, 0f, 1f, 2f)
    val writer = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    writer.insert(Seq(vec(0), vec(1), vec(2))) // ids 0,1,2 — writer holds the lease
    // a reader handle primes its count/max caches WITHOUT the lease
    val r = VectorStore.openOrCreate(spark, root, 4, tombstoneDeletes = true)
    assert(r.stats().nLive == 3) // primes count=3, max=2 in r
    // the original writer moves both underneath the reader
    writer.insert(Seq(vec(3), vec(4))) // ids 3,4 — live max is now 4
    writer.delete(Seq(0L))             // live count is now 4
    // the reader now mutates: its first mutation claims the lease,
    // which must drop the stale primes — a stale max would assign
    // colliding ids (start = 2+1 = 3, already taken)
    val newIds = r.insert(Seq(vec(5)))
    assert(newIds == Seq(5L), s"stale maxId cache produced colliding ids: $newIds")
    // count must be live-exact, not stale-prime + arithmetic delta
    assert(r.count() == 5)
    // and the table holds exactly the distinct live ids — no collision
    assert(r.head(10).map(_.id) == Seq(1L, 2L, 3L, 4L, 5L))
  }
}
