package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the event-time contract (`events.ts` = epoch-nanos LongType)
  * across every physical encoding a writer has shipped: int64
  * nanos-as-long (driver rounds <= 9 under the legacy flag, and
  * Spark-regenerated rehearsal tiers), TIMESTAMP(MICROS) (driver round
  * 10), and TIMESTAMP with zone. The round-10 testdata regeneration
  * flipped the encoding silently and broke 18 tests — this spec fails
  * first if it flips again to something EventTime doesn't cover.
  */
class EventTimeSpec extends SparkTestBase {
  import spark.implicits._

  private val nanos = 1723500000123456000L // µs-precision instant

  test("integral ts passes through untouched") {
    val df = Seq((1L, nanos)).toDF("event_id", "ts")
    val out = graft.sources.EventTime.nanos(df)
    assert(out.schema("ts").dataType === LongType)
    assert(out.collect()(0).getLong(1) === nanos)
  }

  test("TIMESTAMP_NTZ micros converts exactly (x1000) under the UTC session") {
    val df = Seq((1L, java.time.LocalDateTime.ofEpochSecond(
      nanos / 1000000000L, ((nanos / 1000L) % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)))
      .toDF("event_id", "ts")
    assert(df.schema("ts").dataType === TimestampNTZType)
    val out = graft.sources.EventTime.nanos(df)
    assert(out.schema("ts").dataType === LongType)
    assert(out.collect()(0).getLong(1) === nanos)
  }

  test("TIMESTAMP (with zone) converts exactly") {
    val df = Seq((1L, java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(nanos / 1000000000L, nanos % 1000000000L))))
      .toDF("event_id", "ts")
    assert(df.schema("ts").dataType === TimestampType)
    val out = graft.sources.EventTime.nanos(df)
    assert(out.collect()(0).getLong(1) === nanos)
  }

  test("the shipped testdata resolves to long nanos through the normalizer") {
    val ev = graft.sources.EventTime.nanos(
      spark.read.parquet(s"$sf001/events.parquet"))
    assert(ev.schema("ts").dataType === LongType)
    // values land in a plausible epoch-nanos range (year 2000..2100)
    val r = ev.select(min(col("ts")), max(col("ts"))).head()
    assert(r.getLong(0) > 946684800L * 1000000000L)
    assert(r.getLong(1) < 4102444800L * 1000000000L)
  }

  test("frames without a ts column are untouched") {
    val df = Seq((1L, "x")).toDF("id", "payload")
    assert(graft.sources.EventTime.nanos(df).collect()(0).getString(1) === "x")
  }
}
