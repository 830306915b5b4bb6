package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The engine's event-time contract: `events.ts` is **epoch nanoseconds
  * as LongType**. The physical encoding of the driver's testdata has
  * varied across rounds — TIMESTAMP(NANOS) (reads as long under
  * `spark.sql.legacy.parquet.nanosAsLong`, rounds ≤9), TIMESTAMP(MICROS)
  * (reads as TIMESTAMP_NTZ, round 10), and Spark-regenerated rehearsal
  * tiers write plain int64 — so every consumer normalizes through here
  * instead of assuming a writer. Micros→nanos is exact (×1000); the NTZ
  * cast interprets wall time in the session time zone, which every graft
  * session pins to UTC.
  *
  * Works on streaming frames too (a stateless projection).
  */
object EventTime {
  def nanos(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema.find(_.name == tsCol).map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn(tsCol, unix_micros(col(tsCol).cast(TimestampType)) * 1000)
      case _ => df // already integral epoch-nanos
    }
}
