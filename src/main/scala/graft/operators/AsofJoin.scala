package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single nearest right
  * row with the same key — at or before the left row's timestamp
  * (backward), or at or after it (forward), optionally within a
  * tolerance. The reference has no temporal surface; this is the
  * standard event-alignment operator a training-data pipeline needs
  * (feature lookup "as of" label time, impression -> last preceding
  * view, next-conversion attribution).
  *
  * Spark-first shape: NOT a range join (predicate `r.ts <= l.ts` under a
  * join explodes to per-key cartesian before filtering, and Spark plans
  * inequality-only joins as nested loops). Instead both sides union into
  * one relation tagged by side, shuffle ONCE on the key, sort within
  * partitions by (ts, side, payload), and a running `last`/`first`
  * (ignoreNulls) window carries the nearest right row into each left
  * row. Cost at 100 TB: exactly one hash exchange + one sort per side —
  * the same shape as a sort-merge join, with no intermediate blowup;
  * AQE handles sizing. A key whose rows exceed one task's memory spills
  * in the sort, not in a join buffer.
  *
  * NULL-key semantics: the window PARTITION BY groups null keys
  * together (like GROUP BY), so null-key left rows can match null-key
  * right rows — unlike an equi join, where NULL = NULL never matches.
  * Filter null keys out first if join semantics are required.
  */
object AsofJoin {

  /** Backward as-of join: latest right row at or before (strict:
    * strictly before) each left row's timestamp.
    *
    * @param left          probe side; every left row appears exactly once
    *                      in the output
    * @param right         reference side
    * @param keyCols       equi-join key columns (present in both frames)
    * @param tsCol         ordering column (present in both frames); any
    *                      orderable type (numeric for `tolerance`)
    * @param rightValueCols right columns carried into the output as
    *                      `asof_<name>` (null when no right row
    *                      qualifies). Ties at identical (key, ts) break
    *                      by the lexicographic order of this struct,
    *                      GREATEST wins — put a unique id first for
    *                      fully deterministic output.
    * @param strict        when true, a right row at EXACTLY the left
    *                      timestamp is not visible (r.ts < l.ts)
    * @param tolerance     max allowed l.ts - r.ts (same units as tsCol,
    *                      which must be numeric); matches farther back
    *                      are nulled out
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      rightValueCols: Seq[String],
      strict: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keyCols, tsCol, rightValueCols, strict,
      forward = false, tolerance)

  /** Forward as-of join: earliest right row at or after (strict:
    * strictly after) each left row's timestamp. Ties at identical
    * (key, ts) break by the right payload struct, SMALLEST wins.
    */
  def asofForward(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      rightValueCols: Seq[String],
      strict: Boolean = false,
      tolerance: Option[Long] = None): DataFrame =
    asofImpl(left, right, keyCols, tsCol, rightValueCols, strict,
      forward = true, tolerance)

  private def asofImpl(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], tsCol: String,
      rightValueCols: Seq[String],
      strict: Boolean, forward: Boolean,
      tolerance: Option[Long]): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    val leftOutCols = left.columns.toSeq
    // the right payload carries its own ts as a hidden leading field:
    // the tolerance check needs it, and as the leading field it keeps
    // the payload struct's sort order aligned with the row order
    val rPayload = struct(
      (col(tsCol).as("__asof_ts") +: rightValueCols.map(col)): _*)
    val rStructType = right.select(rPayload.as("s")).schema("s").dataType
    val lPayload = struct(leftOutCols.map(col): _*)
    val lStructType = left.select(lPayload.as("s")).schema("s").dataType
    // Side tags order equal-ts rows. The window frame is one-sided
    // ([unboundedPreceding, current] backward, [current,
    // unboundedFollowing] forward), so visibility at the EXACT left
    // timestamp is purely whether the right row sorts into the frame:
    //   backward inclusive: right sorts first (inside the trailing frame)
    //   backward strict:    right sorts last  (outside it)
    //   forward inclusive:  right sorts last  (inside the leading frame)
    //   forward strict:     right sorts first (outside it)
    val rightSortsFirst = strict == forward
    val (rightSide, leftSide) = if (rightSortsFirst) (0, 1) else (1, 0)
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(leftSide).as("_side"),
        lPayload.as("_l"), lit(null).cast(rStructType).as("_r")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).as("_ts"), lit(rightSide).as("_side"),
        lit(null).cast(lStructType).as("_l"), rPayload.as("_r")): _*)
    val w0 = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_r").asc)
    val (w, pick) =
      if (forward)
        (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("_r"), ignoreNulls = true))
      else
        (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("_r"), ignoreNulls = true))
    val withMatch = l.union(r)
      .withColumn("_asof", pick.over(w))
      .filter(col("_side") === leftSide)
    val bounded = tolerance match {
      case None => withMatch
      case Some(tol) =>
        val gap =
          if (forward) col("_asof").getField("__asof_ts") - col("_ts")
          else col("_ts") - col("_asof").getField("__asof_ts")
        withMatch.withColumn("_asof",
          when(col("_asof").isNotNull && gap <= tol, col("_asof")))
    }
    val out = leftOutCols.map(c => col("_l").getField(c).as(c)) ++
      rightValueCols.map(c => col("_asof").getField(c).as(s"asof_$c"))
    bounded.select(out: _*)
  }
}
