package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  // (id, key, ts, value) — deliberately unsorted input
  private lazy val quotes = Seq(
    (101L, "a", 10L, 1.0),
    (102L, "a", 20L, 2.0),
    (103L, "a", 20L, 3.0), // tie at ts=20: greatest id must win
    (104L, "b", 15L, 4.0),
    (105L, "c", 99L, 5.0)
  ).toDF("event_id", "key", "ts", "value")

  private lazy val trades = Seq(
    (1L, "a", 5L),   // before every quote -> no match
    (2L, "a", 20L),  // equal ts -> 103 when inclusive, 101 when strict
    (3L, "a", 50L),  // after everything -> 103
    (4L, "b", 15L),  // exact hit on the only b quote
    (5L, "d", 30L)   // key with no quotes -> null
  ).toDF("event_id", "key", "ts")

  test("backward as-of: latest right row at or before each left ts") {
    val got = AsofJoin.asofBackward(trades, quotes,
      Seq("key"), "ts", Seq("event_id", "value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_ => r.getLong(3)),
        Option(r.get(4)).map(_ => r.getDouble(4))))
    assert(got.toSeq === Seq(
      (1L, None, None),
      (2L, Some(103L), Some(3.0)),
      (3L, Some(103L), Some(3.0)),
      (4L, Some(104L), Some(4.0)),
      (5L, None, None)))
  }

  test("strict as-of: equal-ts right rows are not visible") {
    val got = AsofJoin.asofBackward(trades, quotes,
      Seq("key"), "ts", Seq("event_id"), strict = true)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_ => r.getLong(3))))
    assert(got.toSeq === Seq(
      (1L, None),
      (2L, Some(101L)), // ts=20 quotes excluded, falls back to ts=10
      (3L, Some(103L)),
      (4L, None),
      (5L, None)))
  }

  test("forward as-of: earliest right row at or after; strict excludes equal ts") {
    val got = AsofJoin.asofForward(trades, quotes,
      Seq("key"), "ts", Seq("event_id"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_ => r.getLong(3))))
    assert(got.toSeq === Seq(
      (1L, Some(101L)), // next quote after ts=5 is ts=10
      (2L, Some(102L)), // equal ts visible; SMALLEST id wins the tie
      (3L, None),       // nothing after ts=50
      (4L, Some(104L)), // exact hit
      (5L, None)))
    val strictGot = AsofJoin.asofForward(trades, quotes,
      Seq("key"), "ts", Seq("event_id"), strict = true)
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_ => r.getLong(3))))
    assert(strictGot.toSeq === Seq(
      (1L, Some(101L)),
      (2L, None),       // ts=20 quotes excluded, nothing later for key a
      (3L, None),
      (4L, None),
      (5L, None)))
  }

  test("tolerance nulls out matches farther than the bound") {
    val got = AsofJoin.asofBackward(trades, quotes,
      Seq("key"), "ts", Seq("event_id"), tolerance = Some(5L))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_ => r.getLong(3))))
    assert(got.toSeq === Seq(
      (1L, None),
      (2L, Some(103L)), // gap 0 <= 5
      (3L, None),       // nearest quote is 30 back -> out of tolerance
      (4L, Some(104L)), // gap 0
      (5L, None)))
  }

  test("every left row appears exactly once; left columns pass through") {
    val out = AsofJoin.asofBackward(trades, quotes,
      Seq("key"), "ts", Seq("value"))
    assert(out.columns.toSeq === Seq("event_id", "key", "ts", "asof_value"))
    assert(out.count() === trades.count())
  }

  test("matches a brute-force per-row scan on the events table") {
    val ev = graft.sources.EventTime.nanos(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("ts"))
    val got = AsofJoin.asofBackward(clicks, views,
      Seq("user_id"), "ts", Seq("event_id"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_ => r.getLong(3)))
      .toMap
    val vRows = views.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = clicks.collect().map { c =>
      val (cid, cu, cts) = (c.getLong(0), c.getLong(1), c.getLong(2))
      val best = vRows.filter(v => v._2 == cu && v._3 <= cts)
        .sortBy(v => (v._3, v._1)).lastOption
      cid -> best.map(_._1)
    }.toMap
    assert(got === expected)
  }
}
