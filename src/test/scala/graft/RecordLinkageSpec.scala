package graft

import graft.operators.RecordLinkage
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSuite {
  import spark.implicits._

  private def key = concat(substring(col("s"), 1, 1), lit("|"))

  test("blockedEditPairs: in-block pairs only, exact distance, threshold") {
    val d = Seq(
      (1L, "smith"), (2L, "smyth"), (3L, "smithe"),  // block 's'
      (4L, "jones"), (5L, "janes"),                  // block 'j'
      (6L, "zeta")                                   // singleton block
    ).toDF("id", "s")
    val p = RecordLinkage.blockedEditPairs(d, "id", "s", key, maxDist = 2)
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Long)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    // smith~smyth = 1 sub; smith~smithe = 1 ins; smyth~smithe = 2
    assert(p((1L, 2L)) == 1L && p((1L, 3L)) == 1L && p((2L, 3L)) == 2L)
    assert(p((4L, 5L)) == 1L)
    // cross-block pairs never compared, even if close (jones/zeta far
    // anyway); singleton blocks produce nothing
    assert(p.size == 4)
  }

  test("blockedEditPairs: maxDist filters, maxBlock drops oversized blocks") {
    val d = Seq(
      (1L, "aaaa"), (2L, "aaab"), (3L, "aabb"), (4L, "abbb"),
      (10L, "bcde"), (11L, "bcdf")).toDF("id", "s")
    // dist(aaaa, abbb) = 3 > 2 → excluded; the rest of block 'a' stays
    val p2 = RecordLinkage.blockedEditPairs(d, "id", "s", key, maxDist = 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(!p2.contains((1L, 4L)))
    assert(p2.contains((1L, 3L)) && p2.contains((2L, 4L)))
    // block 'a' has 4 rows: maxBlock = 3 removes ALL its pairs, block
    // 'b' (2 rows) survives
    val p3 = RecordLinkage.blockedEditPairs(d, "id", "s", key,
      maxDist = 2, maxBlock = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(p3 == Set((10L, 11L)))
  }

  test("resolveEntities: transitive closure, singletons keep own id") {
    // chain smith-smyth-smythe bridges dist-1 links into one entity
    // even though smith~smythe = 2 edits apart via different paths
    val d = Seq(
      (7L, "smith"), (2L, "smyth"), (9L, "smythe"),
      (4L, "jones"), (5L, "janes"), (6L, "zeta")).toDF("id", "s")
    val e = RecordLinkage.resolveEntities(d, "id", "s", key, maxDist = 1)
      .select($"id", $"entity").as[(Long, Long)].collect().toMap
    assert(e(7L) == 2L && e(2L) == 2L && e(9L) == 2L)
    assert(e(4L) == 4L && e(5L) == 4L)
    assert(e(6L) == 6L)
  }

  test("sortedNeighborhoodPairs: window pairs, gap, bucketed rank = global rank") {
    // sort order by s: janes(5) jones(4) smith(1) smithe(3) smyth(2) zeta(6)
    val d = Seq(
      (1L, "smith"), (2L, "smyth"), (3L, "smithe"),
      (4L, "jones"), (5L, "janes"), (6L, "zeta")
    ).toDF("id", "s")
    val p = RecordLinkage.sortedNeighborhoodPairs(
        d, "id", "s", col("s"), window = 3, maxDist = 2)
      .select($"id_a", $"id_b", $"gap", $"dist")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    // window 3 => each record pairs with the next 2 in sort order;
    // crossing hash-block boundaries (janes|jones vs smith) is the
    // point of the method
    assert(p((5L, 4L)) == (1L, 1L))   // janes->jones: gap 1, 1 sub
    assert(p((1L, 3L)) == (1L, 1L))   // smith->smithe: dist 1
    assert(p((1L, 2L)) == (2L, 1L))   // smith->smyth: gap 2 (smithe between)
    assert(p((3L, 2L)) == (1L, 2L))   // smithe->smyth
    assert(!p.contains((4L, 1L)), "jones->smith dist 5 must be dropped")
    // a 1-char prefix makes ALL of {smith, smithe, smyth} one bucket
    // and {janes, jones} another: per-bucket ranks + offsets must
    // reconstruct the same global order (same pair set)
    val p1 = RecordLinkage.sortedNeighborhoodPairs(
        d, "id", "s", col("s"), window = 3, maxDist = 2, prefixLen = 1)
      .select($"id_a", $"id_b", $"gap", $"dist")
      .as[(Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(p1 == p, "prefix bucketing must not change the pair set")
    // exactly n·(window−1) candidates before the distance filter minus
    // tail truncation: 6 records, window 3 -> 4+.. = 2n-3 = 9 candidates
    intercept[IllegalArgumentException](
      RecordLinkage.sortedNeighborhoodPairs(d, "id", "s", col("s"),
        window = 1, maxDist = 2))
  }

  test("blockSizes: histogram plus oversized flag") {
    val d = Seq((1L, "aa"), (2L, "ab"), (3L, "ac"), (4L, "ba"))
      .toDF("id", "s")
    val m = RecordLinkage.blockSizes(d, key, maxBlock = 2)
      .select($"block", $"n", $"oversized").as[(String, Long, Boolean)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(m("a|") == (3L, true) && m("b|") == (1L, false))
  }
}
