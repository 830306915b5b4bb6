package graft

import org.apache.spark.sql.functions._
import graft.sources.CsvSource

/** Pins the CsvSource contract: hardened defaults (quote-safe multiLine
  * record splitting, \N null marker) and the `splittable` single-file
  * fast path — including WHY it is an opt-in (it shears quoted embedded
  * newlines, the exact bug the default mode fixes).
  */
class CsvSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def withMaxPartitionBytes[T](bytes: Long)(body: => T): T = {
    val key = "spark.sql.files.maxPartitionBytes"
    val prior = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try body finally spark.conf.set(key, prior)
  }

  test("splittable opt-in: a single huge newline-free file splits across tasks") {
    // one big single-file corpus — the shape the opt-in exists for
    val n = 20000
    val rows = (0 until n).map(i => (i.toLong, s"user_$i", i % 7))
      .toDF("id", "name", "grp").coalesce(1)
    val stage = graft.core.TempDirs.scratch("graft_csv_split")
    CsvSource.write(rows, stage.toString)
    val schema = rows.schema
    withMaxPartitionBytes(64 * 1024) {
      // safe default: one FILE = one parse unit, regardless of size
      val safe = CsvSource.read(spark, stage.toString, schema)
      assert(safe.rdd.getNumPartitions === 1,
        "multiLine mode must parse the single file whole")
      // opt-in: the newline-split reader chunks the file at
      // maxPartitionBytes boundaries — real intra-file parallelism
      val fast = CsvSource.read(spark, stage.toString, schema,
        splittable = true)
      assert(fast.rdd.getNumPartitions > 1,
        s"splittable mode should split the ~600KB file at 64KB bounds, " +
          s"got ${fast.rdd.getNumPartitions} partition(s)")
      // identical results on newline-free data (sorted compare)
      val a = safe.orderBy("id").collect().map(_.toSeq)
      val b = fast.orderBy("id").collect().map(_.toSeq)
      assert(a.length === n && a.toSeq === b.toSeq)
    }
  }

  test("splittable is UNSAFE on quoted embedded newlines (why it's opt-in)") {
    val dirty = Seq(
      (1L, "plain", 0), (2L, "line one\nline two", 0), (3L, "ok", 1))
      .toDF("id", "name", "grp")
    val stage = graft.core.TempDirs.scratch("graft_csv_dirty")
    CsvSource.write(dirty, stage.toString)
    // safe default round-trips the embedded newline byte-exactly
    val safe = CsvSource.read(spark, stage.toString, dirty.schema)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(safe.toSeq === Seq((1L, "plain"), (2L, "line one\nline two"), (3L, "ok")))
    // splittable mode splits the record at the raw newline BEFORE quote
    // parsing: the quoted field shears into malformed rows (nulled
    // under PERMISSIVE) — the corruption the default mode exists to
    // prevent, pinned here so the hazard stays documented-by-test
    val sheared = CsvSource.read(spark, stage.toString, dirty.schema,
      splittable = true).collect()
    assert(sheared.length === 4, "the 3-row table shears into 4 records")
    assert(sheared.exists(_.isNullAt(0)), "shearing nulls malformed rows")
  }

  test("null vs empty string stay distinct through the round-trip") {
    val rows = Seq((1L, null: String), (2L, ""), (3L, "x"))
      .toDF("id", "name")
    val stage = graft.core.TempDirs.scratch("graft_csv_null")
    CsvSource.write(rows, stage.toString)
    val back = CsvSource.read(spark, stage.toString, rows.schema)
      .orderBy("id").collect()
    assert(back(0).isNullAt(1), "null reads back as null, not empty")
    assert(back(1).getString(1) === "", "empty reads back as empty, not null")
    assert(back(2).getString(1) === "x")
    // the splittable path shares the \N marker (this corpus is
    // newline-free, so both modes agree)
    val fast = CsvSource.read(spark, stage.toString, rows.schema,
      splittable = true).orderBy("id").collect()
    assert(fast(0).isNullAt(1) && fast(1).getString(1) === "")
  }
}
