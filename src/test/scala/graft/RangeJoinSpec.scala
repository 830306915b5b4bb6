package graft

import graft.operators.{RangeJoin, Tfidf}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("rangePairs: exact window semantics, inclusive both ends, no dup pairs") {
    val left = Seq(
      (1L, "a", 1000L),
      (2L, "a", 5000L),
      (3L, "b", 1000L)
    ).toDF("event_id", "key", "ts")
    val right = Seq(
      (10L, "a", 900L),   // in [1000-100, 1000+100] for l1
      (11L, "a", 1100L),  // boundary: inclusive for l1
      (12L, "a", 1101L),  // just outside for l1
      (13L, "a", 4900L),  // in window for l2
      (14L, "b", 2000L),  // outside for l3
      (15L, "c", 1000L)   // wrong key
    ).toDF("event_id", "key", "ts")
    val got = RangeJoin.rangePairs(left, right, Seq("key"), "ts",
      -100L, 100L, Seq("event_id"))
      .select(col("event_id"), col("range_event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (1L, 11L), (2L, 13L)))
    // no pair emitted twice
    val cnt = RangeJoin.rangePairs(left, right, Seq("key"), "ts",
      -100L, 100L, Seq("event_id")).count()
    assert(cnt === 3)
  }

  test("rangePairs: negative and zero-straddling timestamps bucket correctly") {
    // pre-1970 placeholder dates are routine in dirty corpora; this
    // pins that signed and zero-straddling timestamps agree with a
    // brute scan (they did under the old truncating div too — division
    // stays monotone and the probe explodes the full bucket range — but
    // the floor-div form's uniform buckets and <=2 fanout deserve the
    // same generative evidence, and any future bucket-arithmetic change
    // must keep passing this)
    val rng = new scala.util.Random(0xFD00D)
    val ts = Vector.tabulate(200)(_ => rng.between(-5000L, 5000L))
    val left = ts.zipWithIndex.map { case (t, i) => (i.toLong, "k", t) }
      .toDF("event_id", "key", "ts")
    val right = ts.zipWithIndex.map { case (t, i) =>
      (1000L + i, "k", t + rng.between(-300L, 300L))
    }.toDF("event_id", "key", "ts")
    val lRows = left.collect().map(r => (r.getLong(0), r.getLong(2)))
    val rRows = right.collect().map(r => (r.getLong(0), r.getLong(2)))
    for ((lo, hi) <- Seq((-100L, 100L), (-250L, -50L), (50L, 250L))) {
      val got = RangeJoin.rangePairs(left, right, Seq("key"), "ts",
        lo, hi, Seq("event_id"))
        .select(col("event_id"), col("range_event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (lid, lts) <- lRows
        (rid, rts) <- rRows
        if rts >= lts + lo && rts <= lts + hi
      } yield (lid, rid)).toSet
      assert(got === want, s"window [$lo,$hi] disagreed with brute on signed ts")
    }
  }

  test("rangePairs matches a brute-force nested scan on the events table") {
    val ev = graft.sources.EventTime.nanos(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
    val w = 600000000000L
    val got = RangeJoin.rangePairs(clicks, errors, Seq("user_id"), "ts",
      -w, w, Seq("event_id"))
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("range_event_id"))).toSet
    val cRows = clicks.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val eRows = errors.collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    val expected = (for {
      (cid, cu, cts) <- cRows
      (eid, eu, ets) <- eRows
      if eu == cu && ets >= cts - w && ets <= cts + w
    } yield (cid, eid)).toSet
    assert(got === expected)
    assert(got.nonEmpty) // the corpus actually exercises the window
  }

  test("tfidf top terms: rare terms outrank common ones; k rows per doc") {
    // equal tf within each doc, so the idf term decides the order
    val docs = Seq(
      (1L, "common rare_one"),
      (2L, "common rare_two"),
      (3L, "common filler")
    ).toDF("doc_id", "text")
    val got = Tfidf.topTerms(docs, "doc_id", "text", 2)
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    // 'common' appears in every doc -> idf floor; doc-unique terms win rank 1
    assert(got(1L).head === "rare_one")
    assert(got(2L).head === "rare_two")
    assert(got(3L).head === "filler")
    assert(got.values.forall(_.size == 2))
  }
}
