package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling: project each key's irregular samples onto a
  * fixed-step grid with linear interpolation — the standard first step
  * before windowed feature extraction on sensor streams (the reference's
  * HAR series arrive pre-resampled at 50 Hz; this operator is what
  * produces such a grid from raw irregular events).
  *
  * Spark-first shape (no per-key driver loop, no UDF):
  *   1. one grouped aggregate finds each key's [min, max] span;
  *   2. `sequence` + `explode` generates grid instants IN-PARTITION
  *      (the fan-out never shuffles);
  *   3. two [[AsofJoin]] passes attach the nearest sample at-or-before
  *      and at-or-after each grid instant — each pass is ONE hash
  *      exchange, no join operator;
  *   4. a codegen'd projection interpolates.
  *
  * Scale: everything shuffles by the series key; state per key is the
  * sample rows themselves (never the grid cross product). Keys with a
  * single sample yield their exact-hit instants only; grid instants
  * outside a key's observed span are not emitted (no extrapolation).
  */
object GapFill {

  /** Resample `points` (keyCols, tsCol: long, valueCol: numeric) onto the
    * step-aligned grid `t = k * step` within each key's observed span.
    * Duplicate samples at one (key, ts) collapse by mean first
    * (resampling is defined on a function, not a multiset), rounded to
    * 6 dp so downstream interpolation is reproducible across engines.
    * Output: keyCols, tsCol (grid instant), valueCol (interpolated,
    * 6 dp; null only when the span holds no opposite-side sample —
    * impossible by construction here since the grid sits inside the
    * span).
    */
  /** @param maxGridPerKey upper bound on grid instants per key. A
    *                      single dirty timestamp (a 1970 placeholder in
    *                      2024 data) otherwise inflates one key's span
    *                      to billions of ticks: `sequence` either dies
    *                      with an opaque size error naming no key, or —
    *                      just under its 2^31 limit — allocates a
    *                      multi-GB array in ONE row. Exceeding the
    *                      budget raises a clear error naming the key
    *                      and its span (`skipOversizedKeys = true`
    *                      drops such keys instead — explicit opt-in,
    *                      because silent row loss is worse than a loud
    *                      stop).
    */
  def resampleLinear(
      points: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String, step: Long,
      maxGridPerKey: Long = 10000000L,
      skipOversizedKeys: Boolean = false): DataFrame = {
    require(step > 0, "step must be positive")
    require(keyCols.nonEmpty, "resample needs at least one key column")
    require(maxGridPerKey > 0, "maxGridPerKey must be positive")
    val pts = points
      .groupBy((keyCols :+ tsCol).map(col): _*)
      .agg(round(avg(col(valueCol)), 6).as("_v"))
    // ceil/floor the span to grid multiples in INTEGER space — a double
    // detour loses whole ticks at nanosecond epochs (~1e18). FLOOR
    // division via pmod (x - pmod(x, step) == floor(x/step)*step for
    // step > 0), not `div`: `div` truncates toward zero, which for
    // negative timestamps skips the first grid tick and diverges from
    // SQL floor-division (`//`) oracles
    val gridStart = expr(s"(_tmin + ${step - 1}) - pmod(_tmin + ${step - 1}, $step)")
    val gridEnd = expr(s"_tmax - pmod(_tmax, $step)")
    val spans = pts
      .groupBy(keyCols.map(col): _*)
      .agg(min(col(tsCol)).as("_tmin"), max(col(tsCol)).as("_tmax"))
      .withColumn("_g0", gridStart).withColumn("_g1", gridEnd)
      // a span narrower than one step holds no grid instant: emit no
      // rows for that key (sequence would throw on start > stop)
      .filter(col("_g0") <= col("_g1"))
      // grid cardinality, exact in long arithmetic (both ends are step
      // multiples, so the difference divides exactly)
      .withColumn("_n", expr(s"(_g1 - _g0) div ${step}L + 1L"))
    val bounded =
      if (skipOversizedKeys) spans.filter(col("_n") <= maxGridPerKey)
      else spans.withColumn("_g0",
        // assert_true rides INSIDE the grid-start expression so column
        // pruning cannot drop it: null (+0) when the budget holds, a
        // clear key-naming error instead of sequence's opaque size
        // failure when it doesn't
        col("_g0") + coalesce(
          assert_true(col("_n") <= maxGridPerKey, format_string(
            s"resampleLinear: key (%s) spans %d grid instants at step $step " +
              s"(ts range [%d, %d]) exceeding maxGridPerKey=$maxGridPerKey — " +
              "a dirty timestamp usually causes this; clean the span, raise " +
              "the budget, or pass skipOversizedKeys=true",
            concat_ws(",", keyCols.map(col): _*), col("_n"),
            col("_tmin"), col("_tmax"))).cast("long"),
          lit(0L)))
    val grid = bounded
      .select(keyCols.map(col) :+
        explode(sequence(col("_g0"), col("_g1"), lit(step))).as(tsCol): _*)
    val prev = AsofJoin.asofBackward(grid, pts, keyCols, tsCol, Seq(tsCol, "_v"))
      .withColumnRenamed(s"asof_$tsCol", "_prev_ts")
      .withColumnRenamed("asof__v", "_prev_v")
    val both = AsofJoin.asofForward(prev, pts, keyCols, tsCol, Seq(tsCol, "_v"))
      .withColumnRenamed(s"asof_$tsCol", "_next_ts")
      .withColumnRenamed("asof__v", "_next_v")
    // exact grid hits pass the sample through untouched; interior
    // instants interpolate linearly. The tick deltas are < 2^53 nanos,
    // so the double casts are exact and the arithmetic replays
    // bit-for-bit in any IEEE SQL engine (the oracle's CASE mirrors
    // this expression order verbatim). The 6 dp rounding is the
    // explicit floor(x*1e6 + 0.5)/1e6 form rather than round():
    // engines implement round(double, n) differently at half-ulp
    // boundaries (BigDecimal half-up vs scaled-multiply), and
    // interpolated values land on those boundaries; the explicit form
    // is the same IEEE op sequence everywhere.
    val interpolated =
      when(col("_prev_ts") === col(tsCol), col("_prev_v"))
        .when(col("_prev_ts").isNull || col("_next_ts").isNull,
          lit(null).cast("double"))
        .otherwise(
          floor((col("_prev_v") + (col("_next_v") - col("_prev_v")) *
            ((col(tsCol) - col("_prev_ts")).cast("double") /
              (col("_next_ts") - col("_prev_ts")).cast("double"))) *
            lit(1000000.0) + lit(0.5)) / lit(1000000.0))
    both.select(keyCols.map(col) :+ col(tsCol) :+
      interpolated.as(valueCol): _*)
  }
}
