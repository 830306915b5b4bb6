package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal) join: for every left row, the single most recent
  * right row with the same key at or before the left row's timestamp.
  * The reference has no temporal surface; this is the standard
  * event-alignment operator a training-data pipeline needs (feature
  * lookup "as of" label time, impression -> last preceding view, etc.).
  *
  * Spark-first shape: NOT a range join (predicate `r.ts <= l.ts` under a
  * join explodes to per-key cartesian before filtering, and Spark plans
  * inequality-only joins as nested loops). Instead both sides union into
  * one relation tagged by side, shuffle ONCE on the key, sort within
  * partitions by (ts, side, payload), and a running `last(right payload,
  * ignoreNulls)` window carries the latest right row forward into each
  * left row. Cost at 100 TB: exactly one hash exchange + one sort per
  * side — the same shape as a sort-merge join, with no intermediate
  * blowup; AQE handles sizing. A key whose rows exceed one task's memory
  * spills in the sort, not in a join buffer.
  */
object AsofJoin {

  /** Backward as-of join.
    *
    * @param left          probe side; every left row appears exactly once
    *                      in the output
    * @param right         reference side
    * @param keyCols       equi-join key columns (present in both frames)
    * @param tsCol         ordering column (present in both frames); any
    *                      orderable type
    * @param rightValueCols right columns carried into the output as
    *                      `asof_<name>` (null when no right row is at or
    *                      before the left timestamp). Ties at identical
    *                      (key, ts) break by the lexicographic order of
    *                      this struct, greatest wins — put a unique id
    *                      first for fully deterministic output.
    * @param strict        when true, a right row at EXACTLY the left
    *                      timestamp is not visible (r.ts < l.ts)
    *
    * NULL-key semantics: the window PARTITION BY groups null keys
    * together (like GROUP BY), so null-key left rows can match null-key
    * right rows — unlike an equi join, where NULL = NULL never matches.
    * Filter null keys out first if join semantics are required.
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      rightValueCols: Seq[String],
      strict: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    val leftOutCols = left.columns.toSeq
    val rPayload = struct(rightValueCols.map(col): _*)
    val rStructType = right.select(rPayload.as("s")).schema("s").dataType
    val lPayload = struct(leftOutCols.map(col): _*)
    val lStructType = left.select(lPayload.as("s")).schema("s").dataType
    // side tag orders equal-ts rows: visible right rows must sort BEFORE
    // the left rows that may match them
    val (rightSide, leftSide) = if (strict) (1, 0) else (0, 1)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(leftSide).as("_side"),
        lPayload.as("_l"), lit(null).cast(rStructType).as("_r")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(rightSide).as("_side"),
        lit(null).cast(lStructType).as("_l"), rPayload.as("_r")): _*)
    // The frame ends at the current row, so visibility is purely the
    // sort order: right rows at the left row's exact ts sort inside the
    // frame when strict=false (side 0 < 1) and outside it when
    // strict=true (side 1 > 0).
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.union(r)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === leftSide)
    val out = leftOutCols.map(c => col("_l").getField(c).as(c)) ++
      rightValueCols.map(c => col("_asof").getField(c).as(s"asof_$c"))
    matched.select(out: _*)
  }
}
