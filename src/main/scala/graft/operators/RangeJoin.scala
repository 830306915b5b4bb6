package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-fanout temporal range join: pairs every left row with the
  * right rows of the same key whose timestamp falls in
  * `[l.ts + lower, l.ts + upper]` (inclusive both ends).
  *
  * Spark-first shape: an inequality join condition plans as a nested
  * loop (per-key cartesian); instead both sides bucket their timestamp
  * by `width = upper - lower`, the left side explodes the (at most two)
  * bucket ids its window can overlap, and the join is a plain equi join
  * on (key, bucket) with the exact range predicate as a post-filter.
  * Cost at 100 TB: one hash exchange per side on (key, bucket) with a
  * fixed fanout of 2 on the probe side — never a per-key pair loop.
  * Each right row lives in exactly one bucket and the left's exploded
  * bucket ids are distinct, so no pair is emitted twice (no distinct
  * needed).
  *
  * `tsCol` must be integral (e.g. epoch nanos; the events table's
  * TIMESTAMP(NANOS) arrives as long under `nanosAsLong`) — integral
  * arithmetic keeps buckets exact where a double division would lose
  * whole seconds at 1e18 nanos. Bucket ids use FLOOR division
  * (`(x - pmod(x, w)) div w`) rather than bare `div` (truncation
  * toward zero). Correctness holds under either (both are monotone and
  * the probe explodes every bucket id in its window's range — signed
  * timestamps, e.g. pre-1970 placeholders, were never dropped:
  * regression-pinned against a brute scan in RangeJoinSpec), but
  * truncation makes bucket 0 twice as wide as every other, so windows
  * straddling zero exploded to three bucket ids and bucket 0 collected
  * double load; floor keeps the width uniform and the probe fanout
  * exactly <= 2 everywhere.
  */
object RangeJoin {

  /** One output row per matching (left, right) pair: all left columns
    * plus `range_<c>` for each of `rightValueCols`.
    */
  def rangePairs(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      lower: Long, upper: Long,
      rightValueCols: Seq[String]): DataFrame = {
    require(upper > lower, "empty range window")
    require(keyCols.nonEmpty, "range join needs at least one key column")
    val width = upper - lower
    // floor division: uniform bucket width and fanout <= 2 across the
    // sign boundary (see scaladoc; truncation was correct but uneven)
    def floorDiv(x: String): String = s"(($x) - pmod(($x), ${width}L)) div ${width}L"
    val l = left.withColumn("_bucket",
      explode(sequence(
        expr(floorDiv(s"`$tsCol` + ${lower}L")),
        expr(floorDiv(s"`$tsCol` + ${upper}L")))))
    val r = right.select(
      keyCols.map(col) ++ Seq(expr(floorDiv(s"`$tsCol`")).as("_bucket"),
        col(tsCol).as("_rts")) ++
        rightValueCols.map(c => col(c).as(s"range_$c")): _*)
    l.join(r, keyCols :+ "_bucket")
      .filter(col("_rts").between(col(tsCol) + lower, col(tsCol) + upper))
      .drop("_bucket", "_rts")
  }
}
