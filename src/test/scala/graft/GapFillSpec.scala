package graft

import graft.operators.GapFill
import org.apache.spark.sql.functions._

class GapFillSpec extends SparkTestBase {
  import spark.implicits._

  private def resampled(points: Seq[(String, Long, Double)], step: Long) =
    GapFill.resampleLinear(
      points.toDF("key", "ts", "value"), Seq("key"), "ts", "value", step)
      .orderBy("key", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))

  test("exact grid hits pass the sample value through") {
    val got = resampled(Seq(("a", 0L, 1.5), ("a", 10L, 3.5)), step = 10L)
    assert(got === Array(("a", 0L, 1.5), ("a", 10L, 3.5)))
  }

  test("interior grid instants interpolate linearly") {
    // samples at 5 and 25, grid step 10 -> instants 10 and 20 sit at
    // 1/4 and 3/4 of the segment
    val got = resampled(Seq(("a", 5L, 0.0), ("a", 25L, 8.0)), step = 10L)
    assert(got === Array(("a", 10L, 2.0), ("a", 20L, 6.0)))
  }

  test("grid is clipped to each key's span; no extrapolation") {
    val got = resampled(
      Seq(("a", 12L, 1.0), ("a", 38L, 1.0), ("b", 5L, 9.0), ("b", 7L, 9.0)),
      step = 10L)
    // a spans [12, 38] -> instants 20, 30 only; b spans [5, 7] -> none
    assert(got.map(t => (t._1, t._2)).toSeq === Seq(("a", 20L), ("a", 30L)))
  }

  test("duplicate samples at one instant collapse by mean before interpolation") {
    val got = resampled(
      Seq(("a", 0L, 1.0), ("a", 0L, 3.0), ("a", 10L, 4.0)), step = 10L)
    assert(got === Array(("a", 0L, 2.0), ("a", 10L, 4.0)))
  }

  test("single on-grid sample yields exactly its own instant") {
    val got = resampled(Seq(("a", 20L, 7.25)), step = 10L)
    assert(got === Array(("a", 20L, 7.25)))
  }

  test("negative span: grid bounds floor, the first tick is not skipped") {
    // span [-25, -5] at step 10 -> grid {-20, -10}; truncating division
    // would derive g0 = -10 and silently drop the -20 tick
    val got = resampled(Seq(("a", -25L, 0.0), ("a", -5L, 4.0)), step = 10L)
    assert(got === Array(("a", -20L, 1.0), ("a", -10L, 3.0)))
  }

  test("resampled events table: every value sits within its segment's bounds") {
    val ev = graft.sources.EventTime.nanos(
      spark.read.parquet(s"$sf001/events.parquet"))
      .select(col("user_id"), expr("ts div 1000").as("ts"), col("value"))
    val out = GapFill.resampleLinear(ev, Seq("user_id"), "ts", "value",
      step = 86400000000L)
    val n = out.count()
    assert(n > 0)
    // interpolation is a convex combination: min(value) <= v <= max(value)
    val (lo, hi) = ev.agg(min("value"), max("value")).as[(Double, Double)].head()
    val outside = out.filter(col("value") < lo - 1e-6 || col("value") > hi + 1e-6).count()
    assert(outside === 0)
    assert(out.filter(col("value").isNull).count() === 0) // grid inside span
  }

  test("grid budget: a dirty-span key raises a clear key-naming error") {
    // one 1970-placeholder sample inflates key b's span to ~1e9 ticks;
    // sequence would fail with an opaque size error (or allocate GBs in
    // one row just under its limit) — the budget must name the key
    val pts = Seq(
      ("a", 1000L, 1.0), ("a", 1030L, 2.0),
      ("b", 0L, 5.0), ("b", 10000000000L, 6.0)).toDF("key", "ts", "value")
    val e = intercept[Exception] {
      GapFill.resampleLinear(pts, Seq("key"), "ts", "value", step = 10L,
        maxGridPerKey = 1000L).count()
    }
    val msg = String.valueOf(e.getMessage) +
      Option(e.getCause).map(c => String.valueOf(c.getMessage)).getOrElse("")
    assert(msg.contains("resampleLinear") && msg.contains("(b)") &&
      msg.contains("maxGridPerKey"), s"unhelpful error: $msg")
  }

  test("grid budget: skipOversizedKeys drops the dirty key, keeps the rest") {
    val pts = Seq(
      ("a", 1000L, 1.0), ("a", 1030L, 2.0),
      ("b", 0L, 5.0), ("b", 10000000000L, 6.0)).toDF("key", "ts", "value")
    val got = GapFill.resampleLinear(pts, Seq("key"), "ts", "value",
      step = 10L, maxGridPerKey = 1000L, skipOversizedKeys = true)
      .select("key").distinct().collect().map(_.getString(0)).toSet
    assert(got === Set("a"))
    // exactly AT the budget is allowed: key a spans 4 grid instants
    val atCap = GapFill.resampleLinear(
      Seq(("a", 1000L, 1.0), ("a", 1030L, 2.0)).toDF("key", "ts", "value"),
      Seq("key"), "ts", "value", step = 10L, maxGridPerKey = 4L)
    assert(atCap.count() === 4)
  }
}
