package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // deterministic pseudo-random fixtures crossing the origin (negative
  // buckets exercise the floor-division rounding)
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private lazy val points = lcg(1).take(500).zipWithIndex
    .map { case (r, i) => (i.toLong, r % 2000L - 1000L) }.toSeq
  private lazy val intervals = lcg(2).take(200).zipWithIndex
    .map { case (r, i) =>
      val s = r % 2000L - 1000L
      (i.toLong, s, s + math.floorMod(r >> 17, 120L))
    }.toSeq

  test("pointInInterval matches the naive cross-join filter") {
    val p = points.toDF("pid", "p")
    val iv = intervals.toDF("iid", "s", "e")
    for (w <- Seq(1L, 7L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(p, "p", iv, "s", "e", bucketWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val expected = (for {
        (pid, pv) <- points
        (iid, s, e) <- intervals
        if pv >= s && pv <= e
      } yield (pid, iid)).toSet
      assert(got == expected, s"bucketWidth=$w")
      assert(got.nonEmpty, "fixture must produce matches")
    }
  }

  test("intervalOverlap matches the naive cross-join filter, no dup pairs") {
    val a = intervals.take(100).toDF("aid", "as", "ae")
    val b = intervals.drop(100).toDF("bid", "bs", "be")
    for (w <- Seq(13L, 100L)) {
      val rows = RangeJoin.intervalOverlap(a, "as", "ae", b, "bs", "be", bucketWidth = w)
        .select("aid", "bid").as[(Long, Long)].collect()
      assert(rows.length == rows.toSet.size, "each overlapping pair exactly once")
      val expected = (for {
        (aid, as_, ae) <- intervals.take(100)
        (bid, bs, be) <- intervals.drop(100)
        if as_ <= be && bs <= ae
      } yield (aid, bid)).toSet
      assert(rows.toSet == expected, s"bucketWidth=$w")
      assert(expected.nonEmpty)
    }
  }

  test("inclusive bounds and degenerate intervals") {
    val p = Seq((1L, 10L), (2L, 11L)).toDF("pid", "p")
    val iv = Seq((1L, 10L, 10L), (2L, 11L, 9L)).toDF("iid", "s", "e") // second is empty
    val got = RangeJoin.pointInInterval(p, "p", iv, "s", "e", 4L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  test("bucketed plan is an equi-join shuffle, not a nested-loop scan") {
    val p = points.toDF("pid", "p")
    val iv = intervals.toDF("iid", "s", "e")
    val df = RangeJoin.pointInInterval(p, "p", iv, "s", "e", 64L)
    df.count() // resolve adaptive plan
    val s = df.queryExecution.executedPlan.toString
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoopJoin"),
      s"range join must ride the bucket equi-join, got:\n$s")
  }
}
