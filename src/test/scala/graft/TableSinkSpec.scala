package graft

import graft.sources.TableSink
import org.apache.spark.sql.functions._

class TableSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("overwriteTable round-trips values and survives repeated overwrite") {
    val df = Seq((1L, 2.0), (2L, 3.0), (3L, 5.0)).toDF("id", "v")
    val back1 = TableSink.overwriteTable(df, "graft_spec_sink")
    assert(back1.orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      === Seq((1L, 2.0), (2L, 3.0), (3L, 5.0)))
    // overwrite with different content — catalog entry AND location reclaimed
    val df2 = Seq((9L, 1.0)).toDF("id", "v")
    val back2 = TableSink.overwriteTable(df2, "graft_spec_sink")
    assert(back2.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === Seq((9L, 1.0)))
    spark.sql("DROP TABLE IF EXISTS graft_spec_sink")
  }
}
