package graft.ingest

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame}

/** Ingestion pipeline for raw text-encoded series — the Spark-native EP1
  * (reference `Team11-Project.py:38-114`).
  *
  * Differences by design:
  *  - the reference's array-cleaning Python UDF (`:50-54`) is a built-in
  *    higher-order `filter` here (codegen, no Python worker);
  *  - the reference's 561x `withColumn` pivot loop (`:68-74`) builds a
  *    561-deep Project tree (a Catalyst analysis stressor); [[pivotSeries]]
  *    emits ONE select with n expressions;
  *  - the reference's `row_number over orderBy(lit('A'))` (`:93-97`)
  *    funnels every row through a single partition; [[withRowId]] keeps the
  *    1..N contract with a two-phase (per-partition count + offset) scheme
  *    that never collapses parallelism.
  */
object SeriesIngest {

  /** "1.0 2.0  3.0 " -> array<double>: split on whitespace, drop empties
    * (reference P1+P2), cast to double (reference P5).
    */
  def parseSeries(raw: Column): Column =
    transform(
      filter(split(trim(raw), "\\s+"), t => t =!= ""),
      t => t.cast(DoubleType))

  /** array<double> -> n scalar columns feature_1..feature_n (reference's
    * wide pivot, `Team11-Project.py:68-74`), emitted as one projection.
    */
  def pivotSeries(df: DataFrame, seriesCol: String, n: Int): DataFrame = {
    val wide = (1 to n).map(i => get(col(seriesCol), lit(i - 1)).as(s"feature_$i"))
    df.select(df.columns.filterNot(_ == seriesCol).map(col).toIndexedSeq ++ wide: _*)
  }

  /** feature_1..feature_n -> one array<double> column (inverse of pivot;
    * the array-typed sibling of VectorAssembler, reference M1).
    */
  def assembleSeries(df: DataFrame, out: String, featureCols: Seq[String]): DataFrame =
    df.withColumn(out, array(featureCols.map(c => col(c).cast(DoubleType)): _*))

  /** Stable 1..N row ids without a single-partition window.
    *
    * `row_number over orderBy(monotonically_increasing_id())` preserves
    * the source row order (monotonic ids are ordered by (partition, local
    * offset)) but Spark still plans a 1-partition window for a global
    * ORDER BY; acceptable at notebook scale, not at ours. This
    * implementation zips with index per partition and adds per-partition
    * offsets (the classic `zipWithIndex` scheme): two narrow passes, no
    * shuffle, parallelism preserved.
    *
    * Determinism contract (same as RDD.zipWithIndex): ids are always
    * EXACTLY the permutation 1..N, but which row gets which id follows
    * the input's within-partition row order — deterministic for file
    * scans (stable row order per split), NOT for inputs downstream of a
    * shuffle on a multi-executor cluster, where reduce-side fetch
    * ARRIVAL order varies run to run (measured in the specfaults
    * rehearsal: local-mode fetches are deterministic, two-JVM fetches
    * are not). Need stable ids after a shuffle? Sort on a key first.
    */
  def withRowId(df: DataFrame, out: String = "row_id"): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val rdd = df.rdd
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val withId = rdd.mapPartitionsWithIndex { case (i, it) =>
      val base = offsets(i)
      it.zipWithIndex.map { case (row, j) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (base + j + 1))
      }
    }
    spark.createDataFrame(withId,
      schema.add(out, org.apache.spark.sql.types.LongType, nullable = false))
  }

  /** Positional zip of two equally-ordered frames (the reference's
    * features-to-labels join, `Team11-Project.py:93-101`): row-id both
    * sides, equi-join. Documents the reference's implicit assumption that
    * both inputs preserve source order.
    */
  def zipByPosition(a: DataFrame, b: DataFrame): DataFrame =
    withRowId(a).join(withRowId(b), "row_id")

  /** Full EP1: raw (value: string) features + (value: string) labels ->
    * (row_id, series, label).
    */
  def loadLabeledSeries(features: DataFrame, labels: DataFrame): DataFrame =
    zipByPosition(
      features.select(parseSeries(col("value")).as("series")),
      labels.select(col("value").cast(DoubleType).as("label")))
      .select(col("row_id"), col("series"), col("label"))
}
