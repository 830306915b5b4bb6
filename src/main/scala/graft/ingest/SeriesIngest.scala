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
    * offsets (the classic `zipWithIndex` scheme): two narrow passes over
    * ONE materialization of the input (persisted before the count pass —
    * see [[withRowIdUnchecked]]), no shuffle, parallelism preserved.
    *
    * Determinism contract (same as RDD.zipWithIndex): ids are always
    * EXACTLY the permutation 1..N, but which row gets which id follows
    * the input's within-partition row order — deterministic for file
    * scans (stable row order per split), NOT for inputs downstream of a
    * shuffle on a multi-executor cluster, where reduce-side fetch
    * ARRIVAL order varies run to run (measured in the specfaults
    * rehearsal: local-mode fetches are deterministic, two-JVM fetches
    * are not). Need stable ids after a shuffle? Sort on a key first.
    *
    * Pre-materialized inputs: to have the passes read an EXISTING
    * materialization instead of adding an internal one, persist via
    * `df.localCheckpoint()` (a plan-visible persisted `LogicalRDD`
    * leaf, which [[stableForRowId]] reads through) — NOT via
    * `df.rdd.persist()`: `Dataset.rdd` is its own query execution,
    * invisible to this frame's plan, so such inputs get a second,
    * redundant internal materialization (double executor storage), and
    * merely probing for one re-runs non-result stages under AQE (the
    * round-16 q35 byte-census finding — deliberately unprobed).
    */
  def withRowId(df: DataFrame, out: String = "row_id"): DataFrame = {
    // Misuse guard: downstream of an Exchange the within-partition row
    // order follows reduce-side fetch ARRIVAL order on a multi-executor
    // cluster (measured nondeterministic in the specfaults rehearsal),
    // so the id-to-row assignment is not stable run to run. Warn once
    // per JVM and point at the safe form; detection is plan-shape only
    // (no extra execution — the plan is compiled here regardless).
    val shuffled = planHasShuffle(df)
    if (shuffled && exchangeWarned.compareAndSet(false, true))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "withRowId input plan contains an Exchange: id assignment follows " +
          "shuffle fetch-arrival order and is NOT deterministic across " +
          "multi-executor runs; use withRowIdSorted(df, uniqueKeyCols) " +
          "for run-stable ids (warned once per JVM)")
    withRowIdUnchecked(df, out)
  }

  /** Whether `df`'s FINAL physical plan contains a shuffle exchange.
    *
    * Only SHUFFLE exchanges break within-partition order determinism (a
    * broadcast exchange leaves the streamed side's row order intact),
    * and under AQE the top node is an AdaptiveSparkPlanExec LEAF whose
    * `executedPlan` is the current physical plan WITH
    * EnsureRequirements-inserted exchanges (its `inputPlan` is the
    * pre-preparation tree, which holds only user-explicit repartitions
    * and would miss every aggregate/join/sort-induced shuffle — measured
    * in IngestSpec). Already-materialized stages appear as
    * ShuffleQueryStageExec leaves; query stages (ShuffleQueryStageExec,
    * and Spark 4's ResultQueryStageExec wrapping a finished plan) are
    * LEAF nodes a plain find() never descends into, so an
    * already-executed frame would go undetected without the recursion.
    */
  private[graft] def planHasShuffle(df: DataFrame): Boolean = {
    def containsShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      p.find {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => true
        case _: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => true
        case _ => false
      }.isDefined ||
        p.collect {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q.plan
        }.exists(containsShuffle)
    try {
      val phys = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      containsShuffle(phys)
    } catch { case scala.util.control.NonFatal(_) => false }
  }

  /** Whether `df` re-evaluates IDENTICALLY (same rows, same
    * within-partition order) every time — the precondition under which
    * [[withRowIdUnchecked]] may safely skip its persist-before-count
    * materialization and let both passes (and any later re-evaluation of
    * the result frame) recompute the lineage instead.
    *
    * Three conjuncts, each guarding a distinct way a recomputation can
    * diverge:
    *  - every leaf is a STABLE source — a FILE relation (parquet/CSV/
    *    JSONL/ORC scans have a stable row order per split and
    *    deterministic split planning), a LocalRelation (literal rows),
    *    or a Range. "File" is checked, not assumed: a v1
    *    LogicalRelation qualifies only when it wraps a
    *    HadoopFsRelation and a v2 ScanRelation only when its scan is a
    *    FileScan — the LEAF CLASSES also cover JDBC and arbitrary
    *    connector reads, whose within-partition row order is NOT
    *    deterministic across evaluations (a JDBC result set has
    *    whatever order the database felt like today). A LogicalRDD
    *    wraps an arbitrary caller RDD whose re-evaluation can differ
    *    (the IngestSpec shrinking-partition input is exactly that), so
    *    it fails the gate unless already persisted by the caller;
    *  - every expression in the plan is deterministic (a rand() filter
    *    keeps a different subset per evaluation) and NO expression
    *    embeds a subquery: a plan nested in a SubqueryExpression is
    *    not reached by the outer traversal OR by planHasShuffle's
    *    physical walk, and its value can shift between evaluations in
    *    ways the expression-level `deterministic` flag cannot see (an
    *    order-sensitive aggregate like `first()` downstream of a
    *    shuffle is flagged deterministic but is fetch-order-dependent
    *    across executor JVMs) — so any subquery fails closed;
    *  - the physical plan is Exchange-free: reduce-side fetch ARRIVAL
    *    order varies run to run across executor JVMs, so two
    *    evaluations downstream of a shuffle can order rows differently
    *    even when the row SETS match.
    * Unknown plan shapes fail closed (persist).
    */
  private[graft] def stableForRowId(df: DataFrame): Boolean =
    try {
      val opt = df.queryExecution.optimizedPlan
      val stableLeaves = opt.collectLeaves().forall {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation.isInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
          sr.scan.isInstanceOf[
            org.apache.spark.sql.execution.datasources.v2.FileScan]
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
        case _: org.apache.spark.sql.catalyst.plans.logical.Range => true
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE
        case _ => false
      }
      stableLeaves &&
        opt.collect { case p => p }.forall(_.expressions.forall { e =>
          e.deterministic && e.collectFirst {
            case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => ()
          }.isEmpty
        }) &&
        !planHasShuffle(df)
    } catch { case scala.util.control.NonFatal(_) => false }

  /** [[withRowId]] minus the Exchange misuse warning — for callers that
    * have already established an order ([[withRowIdSorted]]'s global
    * sort IS an Exchange, but a deterministic one).
    *
    * Double-evaluation hazard (closed here): the scheme runs TWO jobs
    * over the same input — a count pass, then the id-assignment pass.
    * Classic `zipWithIndex` shares the structure, and shares the bug it
    * implies: if the input lineage is non-deterministic (a recomputed
    * unseeded sample, a shuffle whose partition sizes shear between
    * evaluations), the offsets computed in pass 1 can mismatch the
    * partitions pass 2 actually sees — DUPLICATE or SKIPPED ids, a
    * strictly worse failure than the documented assignment-order
    * nondeterminism. Two defenses:
    *
    *  1. UNLESS the input plan is provably re-evaluation-stable
    *     ([[stableForRowId]]: file-scan/local/range-rooted,
    *     Exchange-free, deterministic expressions — the common ingest
    *     case, where recomputation is bit-identical by construction and
    *     persisting would materialize full rows for nothing), the input
    *     RDD is persisted (MEMORY_AND_DISK) before the count pass, so
    *     pass 2 reads the pass-1 blocks instead of re-running the
    *     lineage — the input is evaluated exactly ONCE. The blocks are
    *     reclaimed by ContextCleaner once the result frame (whose
    *     lineage pins the input) is garbage-collected; for a long-lived
    *     session that cannot wait for driver GC (executor storage is
    *     invisible to driver heap pressure),
    *     [[graft.core.Materialize.releaseOwned]] on the RESULT
    *     frame frees them eagerly (the persist is registered as
    *     graft-owned, so release never touches caller-persisted RDDs).
    *     Lineage is kept, so an evicted block recomputes rather than
    *     fails.
    *  2. pass 2 re-counts each partition as it emits and throws if the
    *     size differs from pass 1 — in BOTH modes — the backstop for
    *     the eviction-plus-nondeterministic-recompute corner (persisted
    *     mode) and for a wrongly-classified input (stable mode),
    *     turning silently wrong ids into a loud failure. (Under-count
    *     is only observable at exhaustion, so a consumer that stops
    *     early — LIMIT — skips the check; every id it DID see was still
    *     consistent with the pass-1 offsets.)
    *
    * Row layer (round 16): the two passes run over
    * `queryExecution.toRdd` (InternalRow) and the result re-enters SQL
    * via the internal bridge — `Dataset.rdd` + `createDataFrame` paid
    * the external-Row codec on EVERY call (deserialize each field on
    * read, convert back on re-entry), persist or not. Deliberately NO
    * `df.rdd`-was-persisted probe: `Dataset.rdd` is its OWN
    * `rddQueryExecution` whose exchanges are not shared with
    * `queryExecution`, and merely FORCING it under AQE eagerly
    * materializes every non-result stage — the probe alone re-ran
    * q35's sort map stage and doubled its input bytes (caught by the
    * round-16 byte census). The plan-visible form of a caller
    * materialization — a persisted `LogicalRDD` leaf — is respected
    * through [[stableForRowId]] (no internal persist; execution reads
    * their blocks); a caller-persisted top-level `df.rdd` is invisible
    * here, gets an internal persist like any other unstable lineage,
    * and is never touched by release (not graft-owned).
    */
  private def withRowIdUnchecked(df: DataFrame, out: String,
      assumeStable: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val schema = df.schema
    val outSchema =
      schema.add(out, org.apache.spark.sql.types.LongType, nullable = false)
    val base = df.queryExecution.toRdd
    val rdd =
      if (!assumeStable && !stableForRowId(df)) {
        // owned copies: plan output reuses per-partition row buffers,
        // and persisting uncopied rows caches one mutated buffer N times
        val copied = base.map(_.copy())
        copied.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        graft.core.Materialize.registerOwnedPersist(copied)
        copied
      } else base
    val withId = zipWithIds[org.apache.spark.sql.catalyst.InternalRow,
        org.apache.spark.sql.catalyst.InternalRow](rdd) { (row, id) =>
      // JoinedRow over the (possibly buffer-reused) input row is safe:
      // the downstream scan's UnsafeProjection consumes each row fully
      // before the iterator advances (standard pipelined contract), and
      // persisted-mode rows are stable copies
      new org.apache.spark.sql.catalyst.expressions.JoinedRow(row,
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](id)))
    }
    org.apache.spark.sql.graft.DataFrameBridge
      .internalCreateDataFrame(spark, withId, outSchema)
  }

  /** The two-pass per-partition id scheme shared by both row layers:
    * count pass, offsets, assignment pass with the shear backstop.
    * `append` builds the output row from (input row, 1-based id).
    */
  private def zipWithIds[T, U: scala.reflect.ClassTag](
      rdd: org.apache.spark.rdd.RDD[T])(append: (T, Long) => U):
      org.apache.spark.rdd.RDD[U] = {
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    rdd.mapPartitionsWithIndex { case (i, it) =>
      val base = offsets(i)
      val expected = counts(i)
      new Iterator[U] {
        private var j = 0L
        def hasNext: Boolean = {
          val h = it.hasNext
          if (!h && j != expected)
            throw new IllegalStateException(
              s"withRowId partition $i sheared between the count pass " +
                s"($expected rows) and the assignment pass ($j rows): " +
                "non-deterministic input recomputed differently — ids " +
                "would be skipped")
          h
        }
        def next(): U = {
          if (j >= expected)
            throw new IllegalStateException(
              s"withRowId partition $i grew past the count pass " +
                s"($expected rows): non-deterministic input recomputed " +
                "differently — ids would be duplicated")
          val r = append(it.next(), base + j + 1)
          j += 1
          r
        }
      }
    }
  }

  // one warning per JVM: withRowId sits inside per-row pipelines and a
  // per-call warning would flood executor-side driver logs
  private val exchangeWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** test hook: lets the spec assert the warn-once actually fires */
  private[graft] def resetExchangeWarning(): Boolean =
    exchangeWarned.getAndSet(false)

  /** [[withRowId]] with its determinism precondition made EXPLICIT: the
    * input is globally sorted on `sortCols` first, so the 1..N ids are a
    * pure function of the data rather than of within-partition arrival
    * order — the safe form for inputs downstream of any shuffle (join,
    * aggregate, repartition), where plain [[withRowId]]'s ids follow
    * fetch-arrival order across executor JVMs.
    *
    * Determinism contract: ids are run-stable iff `sortCols` is a total
    * order, i.e. a UNIQUE key — rows tying on every sort column still
    * land in arrival order within the tie. The sort costs one range
    * exchange; parallelism is preserved (no 1-partition window).
    *
    * Persist elision: when the PRE-SORT input is provably
    * re-evaluation-stable ([[stableForRowId]]), the sorted lineage
    * cannot shear between the count and assignment passes — the sort's
    * range exchange is the only exchange, its shuffle output is
    * computed once and REUSED by both passes (one ShuffleDependency),
    * and its partition bounds come from seeded sampling of a stable
    * input — so the persist would only freeze tie order, which the
    * unique-key contract above already governs. The full-row
    * materialization is skipped; the per-partition shear backstop
    * stays. An unstable pre-sort input persists as in [[withRowId]].
    */
  def withRowIdSorted(df: DataFrame, sortCols: Seq[String],
      out: String = "row_id"): DataFrame = {
    require(sortCols.nonEmpty, "withRowIdSorted needs at least one sort column")
    withRowIdUnchecked(df.sort(sortCols.map(col): _*), out,
      assumeStable = stableForRowId(df))
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
