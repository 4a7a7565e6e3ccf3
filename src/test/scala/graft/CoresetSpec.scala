package graft

import org.apache.spark.sql.functions._

import graft.operators.Coreset

class CoresetSpec extends SparkSuite {
  import spark.implicits._

  // four tight clusters at the corners of a square, plus the seed's
  // cluster: greedy k-center must visit each corner before refining
  private def corners = Seq(
    (0L, Array(0f, 0f)), (1L, Array(0.1f, 0f)), (2L, Array(0f, 0.1f)),
    (10L, Array(10f, 0f)), (11L, Array(10.1f, 0f)),
    (20L, Array(0f, 10f)), (21L, Array(0f, 10.1f)),
    (30L, Array(10f, 10f)), (31L, Array(10.1f, 10f))
  ).toDF("id", "vec")

  test("greedy traversal visits all corners first; radius nonincreasing") {
    val sel = Coreset.kCenterSelect(corners, "id", "vec", k = 4)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(sel.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(sel(0)._2 == 0L && sel(0)._3 == 0.0, "seed must be smallest id at radius 0")
    // picks 1..3 are one point from each remaining corner cluster
    val cornersOf = sel.drop(1).map(_._2 / 10)
    assert(cornersOf.toSet == Set(1L, 2L, 3L), s"expected one pick per corner: ${sel.toSeq}")
    // cover radius never increases
    val radii = sel.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"radius must be nonincreasing: ${radii.toSeq}")
    // farthest-first: the first pick is the corner farthest from (0,0)
    assert(sel(1)._2 / 10 == 3L, "first pick must be the diagonal corner")
    // deterministic
    val again = Coreset.kCenterSelect(corners, "id", "vec", k = 4)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq == sel.toSeq)
  }

  test("seed override, k bounds, assignment") {
    val sel = Coreset.kCenterSelect(corners, "id", "vec", k = 2,
      seedId = Some(30L)).as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(sel(0)._2 == 30L)
    assert(sel(1)._2 == 0L, "farthest from (10,10) corner is the origin cluster")
    intercept[IllegalArgumentException] {
      Coreset.kCenterSelect(corners, "id", "vec", k = 0)
    }
    intercept[IllegalArgumentException] {
      Coreset.kCenterSelect(corners, "id", "vec", k = 10)
    }
    // assignment: every row lands on its own corner's exemplar, and the
    // realized cover radius is the within-cluster spread (0.1)
    val centers = Coreset.kCenterSelect(corners, "id", "vec", k = 4)
      .as[(Int, Long, Double)].collect().map(_._2)
    val centerVecs = corners.filter($"id".isInCollection(centers.toSeq))
      .as[(Long, Array[Float])].collect()
      .map { case (i, v) => i -> v.map(_.toDouble) }.toSeq
    val asg = Coreset.assignToCenters(corners, "id", "vec", centerVecs)
      .as[(Long, Long, Double)].collect()
    assert(asg.length == 9)
    asg.foreach { case (id, cid, d) =>
      assert(cid / 10 == id / 10, s"row $id assigned across corners to $cid")
      assert(d <= 0.1 + 1e-6, s"cover radius exceeded: $id -> $cid at $d")
    }
    // plan: selection scans are shuffle-free argmax (TakeOrdered)
    val plan = Coreset.kCenterSelect(corners, "id", "vec", k = 2)
    assert(plan.columns.toSeq == Seq("step", "id", "radius"))
  }

  test("extend: prefix-consistent continuation, only new picks returned") {
    val full = Coreset.kCenterSelect(corners, "id", "vec", k = 6)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    val head = full.take(3)
    val ext = Coreset.kCenterExtend(corners, "id", "vec",
      head.map(_._2), kMore = 3)
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(ext.map(_._1) == Seq(3, 4, 5), s"steps must continue: $ext")
    assert(head ++ ext == full,
      s"greedy must be prefix-consistent:\nfull=$full\next=$ext")
    // unknown existing id and size contracts
    intercept[IllegalArgumentException] {
      Coreset.kCenterExtend(corners, "id", "vec", Seq(999L), 2)
    }
    intercept[IllegalArgumentException] {
      Coreset.kCenterExtend(corners, "id", "vec", Seq(0L, 0L), 2)
    }
    intercept[IllegalArgumentException] {
      Coreset.kCenterExtend(corners, "id", "vec", Seq(0L), 9)
    }
  }

  test("sampled variant selects within the sample") {
    val big = (0 until 200).map(i => (i.toLong,
      Array((i % 20).toFloat, (i / 20).toFloat))).toDF("id", "vec")
    val sel = Coreset.kCenterSample(big, "id", "vec", k = 5, fraction = 0.5)
      .as[(Int, Long, Double)].collect()
    assert(sel.length == 5)
    assert(sel.map(_._2).distinct.length == 5)
    val sampleIds = graft.operators.Sampling.hashSample(big, "id", 0.5, "kc")
      .select($"id").as[Long].collect().toSet
    assert(sel.map(_._2).forall(sampleIds.contains), "picks must come from the sample")
  }
}
