package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `df.sample(fraction)` is seed-dependent AND partitioning-dependent —
  * re-running after a repartition changes the sample, which poisons
  * dataset reproducibility. Hash sampling keys the keep/drop decision on
  * a row's own identity: `md5(id)` is stable across engines, partition
  * layouts, and re-runs, so the same row set is selected every time, and
  * the operator is a pure scan-side filter (no shuffle, no state, pushes
  * past column pruning at 100 TB).
  *
  * The decision compares the first 4 hex chars of the digest (16 bits,
  * uniform) against a hex threshold: `floor(rate * 65536)` as 4-digit
  * hex. Lowercase-hex lexicographic order IS numeric order, so the same
  * `substr(md5(..),1,4) < 'xxxx'` predicate replays verbatim in any SQL
  * engine with md5 — which puts sampled DATASET MEMBERSHIP itself under
  * an exact oracle, something a seeded `sample()` can never have.
  */
object Sampling {

  /** 4-hex-digit threshold for a sampling rate in [0, 1]. Rate 1.0 maps
    * to "zzzz" ('z' > every hex digit), so a `< threshold` compare keeps
    * all rows — a literal "10000" would sort BELOW most 4-char digests.
    */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    val n = math.round(math.floor(rate * 65536)).toInt
    if (n >= 65536) "zzzz" else f"$n%04x"
  }

  /** Keep-predicate: uniform hash sample of `idCol` at `rate`. */
  def hashSamplePredicate(idCol: Column, rate: Double): Column =
    if (rate >= 1.0) lit(true)
    else substring(md5(idCol.cast("string").cast("binary")), 1, 4) <
      lit(hexThreshold(rate))

  /** Uniform deterministic sample. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashSamplePredicate(col(idCol), rate))

  /** Stratified deterministic sample: per-stratum rates, unmatched
    * strata dropped. Scan-side only — the CASE over stratum thresholds
    * is a codegen'd projection, never a shuffle (contrast `sampleBy`,
    * which is seeded and layout-dependent).
    */
  def stratifiedHashSample(
      df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "stratified sample needs at least one stratum")
    val threshold = rates.foldLeft(lit(null).cast("string")) {
      case (acc, (stratum, rate)) =>
        when(col(stratumCol) === stratum, lit(hexThreshold(rate)))
          .otherwise(acc)
    }
    df.filter(
      substring(md5(col(idCol).cast("string").cast("binary")), 1, 4) <
        threshold)
  }
}
