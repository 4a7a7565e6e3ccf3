package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private val trades = Seq(
    (1L, ts(1), "t1"), (1L, ts(5), "t2"), (1L, ts(10), "t3"),
    (2L, ts(3), "t4")).toDF("acct", "ts", "trade")
  private val quotes = Seq(
    (1L, ts(0), 10.0), (1L, ts(5), 11.0), (1L, ts(9), 12.0),
    (2L, ts(4), 20.0)).toDF("acct", "qts", "px")

  test("latest right row at or before each left ts, per key") {
    val got = AsOfJoin.joinAsOf(trades, quotes,
        Seq("acct"), "ts", "qts", Seq("px"))
      .select($"acct", $"trade", $"px")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(got == Set(
      (1L, "t1", Some(10.0)),
      (1L, "t2", Some(11.0)), // equal-ts match is inclusive
      (1L, "t3", Some(12.0)),
      (2L, "t4", None)))      // quote arrives after the trade
  }

  test("tolerance nulls out matches older than the bound") {
    val got = AsOfJoin.joinAsOf(trades, quotes,
        Seq("acct"), "ts", "qts", Seq("px"), toleranceMs = Some(60 * 1000L))
      .select($"trade", $"px")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(got("t1") == Some(10.0)) // 1 min gap, within tolerance
    assert(got("t2") == Some(11.0)) // exact-ts match
    assert(got("t3") == Some(12.0)) // 1 min gap
    val loose = AsOfJoin.joinAsOf(trades, quotes,
        Seq("acct"), "ts", "qts", Seq("px"), toleranceMs = Some(30 * 1000L))
      .select($"trade", $"px")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toMap
    assert(loose("t1").isEmpty && loose("t3").isEmpty) // 60s gaps > 30s bound
    assert(loose("t2") == Some(11.0))
  }

  test("output schema: left columns once each, no duplicates") {
    val out = AsOfJoin.joinAsOf(trades, quotes, Seq("acct"), "ts", "qts", Seq("px"))
    assert(out.columns.toSeq.sorted == Seq("acct", "px", "trade", "ts"))
    assert(out.columns.distinct.length == out.columns.length)
  }

  test("NULL payload on the matching row stays NULL (not shadowed by older rows)") {
    val l = Seq((1L, ts(6), "t")).toDF("acct", "ts", "trade")
    val r = Seq((1L, ts(0), Some(10.0)), (1L, ts(5), None))
      .toDF("acct", "qts", "px")
    val got = AsOfJoin.joinAsOf(l, r, Seq("acct"), "ts", "qts", Seq("px"))
      .select($"px").collect().head
    assert(got.isNullAt(0), s"expected NULL from the ts=5 match, got ${got.get(0)}")
  }

  test("NULL keys never match (equi-join semantics)") {
    val l = Seq((Option.empty[Long], ts(6), "t"), (Some(1L), ts(6), "u"))
      .toDF("acct", "ts", "trade")
    val r = Seq((Option.empty[Long], ts(0), 10.0), (Some(1L), ts(0), 20.0))
      .toDF("acct", "qts", "px")
    val got = AsOfJoin.joinAsOf(l, r, Seq("acct"), "ts", "qts", Seq("px"))
      .select($"trade", $"px")
      .collect().map(row => row.getString(0) -> Option(row.get(1))).toMap
    assert(got("t").isEmpty, "NULL-key left row must not match NULL-key right row")
    assert(got("u") == Some(20.0))
  }

  test("reserved internal column names rejected") {
    intercept[IllegalArgumentException](
      AsOfJoin.joinAsOf(trades.withColumn("_side", lit(1)), quotes,
        Seq("acct"), "ts", "qts", Seq("px")))
  }

  test("payload-name clash rejected") {
    intercept[IllegalArgumentException](
      AsOfJoin.joinAsOf(trades, quotes.withColumnRenamed("px", "trade"),
        Seq("acct"), "ts", "qts", Seq("trade")))
  }
}
