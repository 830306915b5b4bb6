package graft

import graft.streaming.StreamingOracle
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-parity pins for the oracle-gated streaming queries (q67-q70):
  * each bounded streaming replay must equal the equivalent batch
  * computation row for row — the same equivalence the driver's DuckDB
  * oracle hashes, pre-flighted in-JVM.
  */
class StreamingOracleSpec extends SparkTestBase {

  private def ev: DataFrame =
    graft.sources.EventTime.nanos(spark.read.parquet(s"$sf001/events.parquet"))
      .withColumn("tss", expr("ts div 1000000000"))

  private def assertSameRows(actual: DataFrame, expected: DataFrame): Unit = {
    val a = actual.collect().map(_.toSeq).toSeq
    val e = expected.collect().map(_.toSeq).toSeq
    assert(a === e)
  }

  test("q67: bounded windowed-stats replay equals batch tumbling windows") {
    val streamed = StreamingOracle.windowedEventStats(spark, sf001)
    val batch = ev
      .groupBy(expr("tss div 300 * 300").as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("mean_value"))
      .orderBy("window_start", "event_type")
    assertSameRows(streamed, batch)
  }

  test("q68: bounded watermarked-dedup replay equals batch distinct keys") {
    val streamed = StreamingOracle.dedupDistinctKeys(spark, sf001)
    val batch = ev.select(col("user_id"), col("event_type"))
      .distinct().orderBy("user_id", "event_type")
    assertSameRows(streamed, batch)
  }

  test("q69: bounded mapGroupsWithState replay equals batch per-user totals") {
    val streamed = StreamingOracle.runningUserStats(spark, sf001)
    val batch = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("total_value"))
      .orderBy("user_id")
    assertSameRows(streamed, batch)
  }

  test("q70: bounded interval-join replay equals batch time-banded join") {
    val streamed = StreamingOracle.clickViewIntervalJoin(spark, sf001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("tss").as("click_s"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("vuid"), col("tss").as("view_s"))
    val batch = clicks.join(views,
        col("user_id") === col("vuid") &&
          col("view_s") >= col("click_s") - 1800 && col("view_s") <= col("click_s") + 1800)
      .select(col("click_id"), col("view_id"), col("user_id"), col("click_s"), col("view_s"))
      .orderBy("click_id", "view_id")
    assertSameRows(streamed, batch)
    // the join must have actually matched something at this tier
    assert(streamed.count() > 0)
  }

  test("q71: bounded as-of enrichment replay equals batch as-of with max-value ties") {
    val streamed = StreamingOracle.asofEnrich(spark, sf001)
    val probes = ev.select(col("event_id").as("id"), col("user_id").as("pkey"),
      col("tss").as("pts"))
    val refs = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("rkey"), col("tss").as("rts"))
      .agg(max(col("value")).as("rvalue"))
    val batch = probes.join(refs,
        col("pkey") === col("rkey") && col("rts") <= col("pts"), "left")
      .groupBy(col("id"), col("pkey"), col("pts"))
      .agg(max_by(col("rvalue"), col("rts")).as("asof_value"))
      .select(col("id"), col("pkey").as("key"), col("pts").as("ts"), col("asof_value"))
      .orderBy("id")
    assertSameRows(streamed, batch)
    // enrichment must have actually filled something at this tier
    assert(streamed.filter(col("asof_value").isNotNull).count() > 0)
  }
}
