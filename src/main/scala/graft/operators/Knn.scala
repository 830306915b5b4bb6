package graft.operators

import graft.core.KnnParams
import graft.functions.SeriesFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed KNN classification — the Spark-native re-expression of the
  * reference's two models:
  *
  *  - Model 1 (`Team11-Project.py:166-199`, `:347-381`): RDD
  *    `cartesian` + per-partition heap top-k + `groupByKey` + final top-k +
  *    majority vote. Here: `crossJoin` + distance expression + windowed
  *    `row_number <= k` (Spark >= 3.5 plans a partial `WindowGroupLimit`
  *    BEFORE the shuffle — the exact partial/final two-phase top-k the
  *    reference hand-built with heaps) + vote aggregate.
  *  - Model 2 (`Team11-Project.py:502-579`): driver `collect()` +
  *    broadcast variable + flatMap + `reduceByKey` min. Here:
  *    `crossJoin(broadcast(train))` + `min_by` — same semantics, no driver
  *    materialization, map-side combine for free.
  *
  * Scale: broadcast strategy shuffles ONLY the per-(test,label) partial
  * vote counts (k rows per test point after the group-limit), never the
  * raw pair matrix. Cartesian strategy is the fallback when train exceeds
  * broadcastable size; for 100 TB-class inputs use [[SimilaritySearch]]'s
  * LSH candidate pruning in front of `classify`.
  *
  * Vote tie-break (deterministic, SURVEY §2.4 A5): highest vote count,
  * then smallest best-distance-rank within the tied labels, then smallest
  * label.
  */
object Knn {

  def distanceColumn(p: KnnParams)(a: Column, b: Column): Column = p.distance match {
    case "euclidean" => SeriesFunctions.euclidean(a, b)
    case "sqdist"    => SeriesFunctions.sqdist(a, b)
    case "manhattan" => SeriesFunctions.manhattan(a, b)
    case "dtw"       => SeriesFunctions.dtw(a, b, p.band)
    case "fastdtw"   => SeriesFunctions.fastdtw(a, b, p.radius)
    // standard cosine DISTANCE (1 - similarity), not the bare negation:
    // the ordering is the same monotone shift, but excludeZeroDistance's
    // `dist =!= 0.0` contract only works when a self-match actually
    // lands on zero — under -cos a self-match sat at -1.0 (kept: the
    // point votes for itself) while an ORTHOGONAL pair sat at -0.0,
    // which Spark's comparison equates with 0.0 (legitimate neighbors
    // silently dropped)
    case "cosine"    => lit(1.0) - SeriesFunctions.cosine(a, b)
    case other       => throw new IllegalArgumentException(s"unknown distance: $other")
  }

  /** Strategy selection shared by every pair-generating phase (the
    * unpruned crossJoin AND the prune cascade's ranking + payload joins):
    * broadcast while the train side fits an executor, partitioned
    * cartesian beyond that.
    */
  /** Measured-size-aware broadcastability: Catalyst stats, raised to the
    * block manager's measured size for persisted (LogicalRDD) leaves —
    * the optimizer's estimate pre-dates materialization and cannot see
    * generated payload width, so the estimate-only path would happily
    * broadcast an arbitrarily large checkpointed side at scale
    * ([[graft.core.Materialize.storageBytes]]).
    *
    * A pair join replicates one side to every task EITHER way —
    * broadcast ships one copy per executor, a partitioned cartesian
    * shuffle-reads a whole side per opposite partition — so broadcast
    * wins while a side fits comfortably in executor memory. The floor is
    * deliberately higher than autoBroadcastJoinThreshold's 10 MB
    * default: that knob guards hash-join build memory, this guards a
    * replicated dense matrix (tunable via spark.graft.knn.broadcastFloor;
    * conf values may carry a byte-unit suffix, "64MB").
    */
  /** @param replication conservative multiplier applied to the measured/
    *                     estimated bytes before the threshold test — for
    *                     deciding a broadcast of a frame DERIVED from
    *                     `df` by row replication (LSH banding explodes
    *                     one row per band/chunk/table); the derived rows
    *                     are usually slimmer than `df`'s, so the scaled
    *                     gate only ever under-broadcasts, never over.
    */
  /** The effective broadcast byte cap: max(autoBroadcastJoinThreshold,
    * graft floor), or None when broadcasting is disabled (threshold -1).
    * Shared by [[fitsBroadcast]] and the dedup operators' slim-frame
    * row-count gates.
    */
  private[operators] def broadcastCapBytes(
      spark: org.apache.spark.sql.SparkSession): Option[Long] = {
    val conf = spark.conf
    val floor =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        conf.get("spark.graft.knn.broadcastFloor", "64m"))
      catch { case scala.util.control.NonFatal(_) => 67108864L }
    val threshold =
      try {
        val s = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        if (s.trim.startsWith("-")) -1L
        else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
      } catch { case scala.util.control.NonFatal(_) => 10485760L }
    // -1 is Spark's documented "broadcast disabled": honor it (an
    // explicit strategy="broadcast" still overrides via useBroadcast)
    if (threshold < 0) None else Some(math.max(threshold, floor))
  }

  private[operators] def fitsBroadcast(df: DataFrame): Boolean = {
    // a streaming frame can never be the broadcast build side, and
    // evaluating optimizedPlan.stats on one throws (streaming sources
    // must execute via writeStream) — decide without touching the plan
    if (df.isStreaming) return false
    val cap = broadcastCapBytes(df.sparkSession) match {
      case Some(c) => c
      case None => return false // broadcast disabled (threshold -1)
    }
    val planBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // a LogicalRDD WITHOUT origin stats (graft's internal persists via
    // internalCreateDataFrame — unlike localCheckpoint, which carries
    // the source plan's stats through) reports the defaultSizeInBytes
    // SENTINEL (Long.MaxValue unless overridden): that estimate carries
    // no information, and max()-ing it in would veto every broadcast of
    // a fully-measured persisted frame. Ignore the sentinel; any other
    // estimate still raises the measured floor (a partially-evicted
    // persist under-measures, and the estimate backstops it).
    val sentinel = BigInt(
      try df.sparkSession.conf
        .get("spark.sql.defaultSizeInBytes", Long.MaxValue.toString).toLong
      catch { case scala.util.control.NonFatal(_) => Long.MaxValue })
    val informative = planBytes != sentinel
    // measured size when persisted; the raw estimate only when its
    // sources make it trustworthy — an untrusted estimate (generated
    // payloads over Range, non-persisted RDD scans) means NOT
    // broadcastable, never "probably fine"
    val bytes = graft.core.Materialize.storageBytes(df)
      .map(m => if (informative) m.max(planBytes) else m)
      .orElse(if (informative && graft.core.Materialize.estimateTrusted(df))
        Some(planBytes) else None)
    bytes.exists(_ <= BigInt(cap))
  }

  private def useBroadcast(trainSel: DataFrame, p: KnnParams): Boolean = p.strategy match {
    case "broadcast" => true
    case "cartesian" => false
    case _           => fitsBroadcast(trainSel)
  }

  /** Strategy-aware all-pairs cross join of a (possibly projected) train
    * side against the spread test side. `broadcastTrain` carries a
    * pre-computed decision so callers that build several pair joins per
    * query (the prune cascade: sampled tau pass, main scoring pass,
    * payload join-back) analyze the train subtree once, not per join.
    *
    * When the train side exceeds the broadcast budget: broadcast the
    * TEST side instead if it fits (the train side then STREAMS — never
    * shuffled, never replicated per partition — the right plan when a
    * bounded query set probes a huge corpus); only when neither side
    * fits, force a true partitioned cartesian via shuffle_replicate_nl.
    * The explicit hint matters: an unhinted cross join lets Catalyst
    * pick BNLJ from its own stats, which underestimate checkpointed
    * inputs — it would silently broadcast the huge side this decision
    * just rejected.
    */
  private[operators] def crossPairs(
      trainSel: DataFrame, spreadTest: DataFrame, p: KnnParams,
      broadcastTrain: Option[Boolean] = None,
      broadcastTest: Option[Boolean] = None): DataFrame =
    if (spreadTest.isStreaming)
      // stream-static all-pairs has exactly ONE executable plan: the
      // static side broadcast under a BroadcastNestedLoopJoin (an
      // unbounded side can be neither broadcast nor replicated into a
      // partitioned cartesian). Broadcast the train side regardless of
      // the measured-size decision — the floor protects BATCH plans
      // that have a partitioned fallback; here the alternative is an
      // AnalysisException, and a train set genuinely too big to
      // broadcast must be sharded upstream (ANN prefilter / per-class
      // split) before it meets an unbounded test stream.
      spreadTest.crossJoin(broadcast(trainSel))
    else if (broadcastTrain.getOrElse(useBroadcast(trainSel, p)))
      spreadTest.crossJoin(broadcast(trainSel))
    else {
      val t = if (p.trainPartitions > 0) trainSel.repartition(p.trainPartitions) else trainSel
      if (p.strategy != "cartesian" &&
          broadcastTest.getOrElse(fitsBroadcast(spreadTest)))
        t.crossJoin(broadcast(spreadTest))
      else
        spreadTest.hint("shuffle_replicate_nl").crossJoin(t)
    }

  /** All (test x train) candidate pairs with distances.
    * train: (train_id, train_series, label); test: (test_id, test_series).
    */
  private def pairs(train: DataFrame, test: DataFrame, p: KnnParams): DataFrame = {
    val trainSel = train.select(
      col("train_id"), col("train_series"), col("label"))
    val testSel = test.select(col("test_id"), col("test_series"))
    // The stream (test) side often arrives as a handful of input splits
    // (one small parquet file = one partition = one task for the whole
    // distance loop). Spread it across the cluster before the join; the
    // distance kernels dominate, so this tiny shuffle always pays off.
    // A STREAMING test side gets an unconditional stateless repartition:
    // spread() cannot probe a micro-batch's width, each batch inherits
    // its file's split count (a single staged file = ONE task for the
    // whole pair loop — q78's measured 1.5 s single-task stage), and the
    // one-row-moved-once shuffle is always amortized by the |train| x dim
    // kernel work that row then pays.
    val spreadTest =
      if (testSel.isStreaming)
        testSel.repartition(
          if (p.testPartitions > 0) p.testPartitions
          else testSel.sparkSession.sparkContext.defaultParallelism)
      else Partitioning.spread(testSel, p.testPartitions)
    val joined = crossPairs(trainSel, spreadTest, p)
    val distExpr = distanceColumn(p)(col("test_series"), col("train_series"))
    // When the zero-distance exclusion is on, wrap the distance in a
    // barrier(): a non-deterministic projection field cannot be inlined by
    // predicate pushdown, so the exclusion filter keeps referencing the
    // dist ATTRIBUTE and the kernel runs once per candidate pair (instead
    // of once in the join condition + once in the projection).
    // Null series yield null distances, which would sort NULLS FIRST in
    // the rank window and "win" as nearest neighbors — always drop them
    // (the exclusion predicate already rejects nulls; the plain path needs
    // the explicit isNotNull).
    val withDist = joined.withColumn("dist", SeriesFunctions.barrier(distExpr))
    if (p.excludeZeroDistance) withDist.filter(col("dist") =!= 0.0)
    else withDist.filter(col("dist").isNotNull)
  }

  /** Top-k neighbors per test point: (test_id, train_id, label, dist, rank). */
  def neighbors(train: DataFrame, test: DataFrame, p: KnnParams): DataFrame = {
    val w = Window.partitionBy(col("test_id"))
      .orderBy(col("dist"), col("train_id")) // deterministic under distance ties
    val candidates =
      if (p.lbPruning && (p.distance == "dtw" || p.distance == "fastdtw"))
        prunedCandidates(train, test, p)
      else pairs(train, test, p)
    candidates
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= p.k)
  }

  /** Prune cascade, the DTW scale path:
    * 1. sketch each side ONCE scan-side (PAA block means by default, or
    *    the test-side LB_Keogh envelope);
    * 2. score every pair with the cheap ranking kernel — O(n/coarsen)
    *    for PAA-Manhattan, O(n) for LB_Keogh;
    * 3. keep the candidateFactor*k best-ranked per test point via a
    *    bounded-heap aggregate (partial before the shuffle);
    * 4. run the exact kernel only on survivors.
    *
    * Ranker choice (KnnParams.pruneRanker): "paa" ranks by Manhattan
    * distance between PAA sketches — not an admissible bound, but it
    * tracks the DTW ordering tightly (it is FastDTW's coarse level used
    * as a ranker, Salvador & Chan 2007 §4.1). "lb_keogh" ranks by the
    * admissible lower bound (Keogh & Ratanamahatana 2005) — tight for
    * narrow bands, but DEGENERATE when the band window spans the
    * signal's value range (envelope covers everything, every bound ~0,
    * selection collapses to the tie-break). Neither ranker is a proof;
    * equality with the exact path is pinned per-workload in KnnSpec.
    *
    * Every join here follows the same broadcast-vs-partitioned strategy
    * decision as the unpruned path ([[useBroadcast]]) — when the train
    * side exceeds executor memory, the ranking join degrades to a
    * partitioned cross join instead of OOMing.
    */
  private def prunedCandidates(train: DataFrame, test: DataFrame, p: KnnParams): DataFrame = {
    val trainSel = train.select(col("train_id"), col("train_series"), col("label"))
    val testSel = test.select(col("test_id"), col("test_series"))
    val spreadTest = Partitioning.spread(testSel, p.testPartitions)
    // barrier() on the STREAM side: a single-use alias gets inlined by
    // CollapseProject, which would recompute the O(n)/O(n*band) sketch
    // once per PAIR instead of once per row. The TRAIN side deliberately
    // carries NO barrier: the build side of a pair join materializes its
    // projection once per row into the broadcast/shuffle block (nothing
    // collapses across the join boundary), and keeping that subtree
    // deterministic lets the tau pass and the main pass REUSE one
    // materialized sketch exchange (sameResult rejects non-deterministic
    // plans, so a barrier there would force two builds).
    def paaSide(df: DataFrame, seriesCol: String, idCol: String, out: String,
        withBarrier: Boolean = true) = {
      val sketch = SeriesFunctions.paa(col(seriesCol), p.coarsenFactor)
      df.withColumn(out,
        if (withBarrier) SeriesFunctions.barrier(sketch) else sketch)
        .select(col(idCol), col(out))
    }
    def trainSketchOf(tr: DataFrame): DataFrame = p.pruneRanker match {
      case "lb_keogh" => tr.select(col("train_id"), col("train_series").as("tsk"))
      case _          => paaSide(tr, "train_series", "train_id", "tsk",
        withBarrier = false)
    }
    // coarse band for the warp-aware ranker, scaled to sketch resolution
    val coarseBand =
      if (p.band < 0) -1 else math.max(1, p.band / p.coarsenFactor + 1)
    // one stats-driven decision per query and side (conservative:
    // measured on the FULL train projection, reused for the smaller
    // sketch/sample joins; the test-side decision is only consulted when
    // the train side exceeds the budget)
    val bcastTrain = useBroadcast(trainSel, p)
    val fk = p.candidateFactor * p.k
    val distExpr = SeriesFunctions.barrier(
      distanceColumn(p)(col("test_series"), col("train_series")))

    if (bcastTrain) {
      // FUSED broadcast path (r22, guide §1.2/§2.4): the train sketches
      // travel as ONE broadcast array<struct<id, sketch>> row and a
      // single expression ([[graft.functions.TopKScanIds]]) ranks every
      // train entry and selects the top-fk candidates per TEST ROW —
      // replacing two BroadcastNestedLoopJoin pair passes (sampled-tau +
      // main), two ObjectHashAggregate pairs with their exchanges, the
      // test-payload SortMergeJoin and the explicit repartition of the
      // old shape (measured ~2.5 us/pair of join+aggregate machinery
      // around a ~0.1 us ranking kernel at HAR scale). Selection
      // semantics are identical — same kernels, same TopKIdsBuffer total
      // order — and the sampled-tau prefilter is unnecessary here: it
      // existed to bound aggregate state, and the fused heap is local to
      // one row's evaluation. The test payload stays ON the row through
      // candidate selection, so the exact phase explodes in-partition at
      // the spread's parallelism with no join-back.
      val (testSk, kind, kband) = p.pruneRanker match {
        case "lb_keogh" =>
          (spreadTest.withColumn("sk", SeriesFunctions.barrier(
            SeriesFunctions.envelope(col("test_series"), p.band))),
            "lb_keogh", -1)
        case "paa_dtw" =>
          (spreadTest.withColumn("sk", SeriesFunctions.barrier(
            SeriesFunctions.paa(col("test_series"), p.coarsenFactor))),
            "dtw", coarseBand)
        case _ => // "paa": unwarped Manhattan on the sketches (cheapest)
          (spreadTest.withColumn("sk", SeriesFunctions.barrier(
            SeriesFunctions.paa(col("test_series"), p.coarsenFactor))),
            "manhattan", -1)
      }
      val trainArr = trainSketchOf(trainSel)
        .agg(collect_list(struct(col("train_id"), col("tsk"))).as("tarr"))
      // barrier on cand_ids: InferFiltersFromGenerate adds a
      // size(cand_ids) > 0 predicate above this projection, and pushdown
      // through a deterministic alias would re-run the whole scan per row
      val withDist = testSk
        .crossJoin(broadcast(trainArr))
        .select(col("test_id"), col("test_series"),
          SeriesFunctions.barrier(SeriesFunctions.topkScan(
            col("sk"), col("tarr"), fk, kind, kband)).as("cand_ids"))
        .select(col("test_id"), col("test_series"),
          explode(col("cand_ids")).as("train_id"))
        .join(broadcast(trainSel), "train_id")
        .withColumn("dist", distExpr)
      val filtered =
        if (p.excludeZeroDistance) withDist.filter(col("dist") =!= 0.0)
        else withDist
      return filtered.select(
        col("test_id"), col("train_id"), col("label"), col("dist"))
    }

    // Oversize-train path: slim pair scores + bounded-heap selection (the
    // shape that never replicates or collects the train payload).
    val (testSketch, scoreExpr) = p.pruneRanker match {
      case "lb_keogh" =>
        val ts = spreadTest.withColumn("sk", SeriesFunctions.barrier(
          SeriesFunctions.envelope(col("test_series"), p.band)))
          .select(col("test_id"), col("sk"))
        (ts, SeriesFunctions.lbKeogh(col("sk"), col("tsk")))
      case "paa_dtw" =>
        // warp-aware coarse ranking (FastDTW's coarse level as a ranker):
        // banded DTW on the sketches, band scaled to sketch resolution —
        // for series where the band is a large fraction of the length,
        // an unwarped sketch distance misranks warped near-neighbors
        (paaSide(spreadTest, "test_series", "test_id", "sk"),
          SeriesFunctions.dtw(col("sk"), col("tsk"), coarseBand))
      case _ => // "paa": unwarped Manhattan on the sketches (cheapest)
        (paaSide(spreadTest, "test_series", "test_id", "sk"),
          SeriesFunctions.manhattan(col("sk"), col("tsk")))
    }
    // barrier on the score: the prefilter path puts a filter + projection
    // ABOVE this select (across the tau join), and predicate pushdown
    // would otherwise inline the ranking kernel into the filter — one
    // evaluation per pair becomes two
    val bcastTest = fitsBroadcast(testSketch)
    def slimScores(tr: DataFrame): DataFrame =
      crossPairs(trainSketchOf(tr), testSketch, p, Some(bcastTrain), Some(bcastTest))
        .select(col("test_id"), col("train_id"),
          SeriesFunctions.barrier(scoreExpr).as("score"))
    // SLIM ranking rows: only (test_id, train_id, score) feed candidate
    // selection — payloads would put candidateCount * seriesBytes into
    // every buffer. Selection is a bounded-heap AGGREGATE (the
    // reference's two-phase heap, `Team11-Project.py:180`/`:195`), not a
    // window rank: sorting tens of millions of pair rows to keep
    // factor*k per group costs more than every ranking score combined.
    //
    // Sampled-threshold pushdown in front of the heap: the fk-th smallest
    // score within a deterministic ~1/mod train subsample upper-bounds
    // the fk-th smallest overall (any subset's order statistic can only
    // move up), so filtering `score <= tau` provably keeps the true
    // top-fk — while the aggregate then sees ~fk*mod rows per test point
    // instead of |train|. This is TakeOrdered's sampling trick applied
    // map-side; the aggregation machinery (not the score kernel) is the
    // measured bottleneck at HAR scale.
    val slimDf =
      if (p.prefilterSampleMod > 1) {
        // The sampled pass reuses the FULL train-sketch subtree and
        // filters pairs AFTER the join (barrier keeps the predicate out
        // of the join condition and un-pushable): the tau pass and the
        // main pass then share ONE materialized sketch exchange
        // (ReusedExchange) instead of building a second
        // sketch-of-the-sample broadcast — one fewer scheduler
        // round-trip and one sketch materialization, at the cost of a
        // cheap codegen'd hash test per pair (the ranking kernel still
        // runs only on sampled survivors: the filter sits below the
        // score projection).
        val sampledScores =
          crossPairs(trainSketchOf(trainSel), testSketch, p,
            Some(bcastTrain), Some(bcastTest))
            .filter(SeriesFunctions.barrier(
              pmod(xxhash64(col("train_id")), lit(p.prefilterSampleMod)) === 0))
            .select(col("test_id"), col("train_id"),
              SeriesFunctions.barrier(scoreExpr).as("score"))
        // bounded-heap order statistic: the fk-th smallest sampled score,
        // with at most fk doubles of state per group (collect_list would
        // buffer ~|train|/mod scores per test id — unbounded state inside
        // the prefilter that exists to bound state)
        val tau = sampledScores
          .groupBy(col("test_id"))
          .agg(SeriesFunctions.topkScores(col("score"), col("train_id"), fk).as("ss"))
          .select(col("test_id"),
            coalesce(get(col("ss"), lit(fk - 1)), lit(Double.MaxValue)).as("tau"))
        // attach tau to the TEST side (a |test|-row broadcast join), so
        // the threshold filter fuses into the crossJoin's output
        // projection — no second pass over the pair stream. Left join: an
        // empty subsample (tiny train side) must disable the filter, not
        // drop every row.
        val testWithTau = testSketch.join(broadcast(tau), Seq("test_id"), "left")
        crossPairs(trainSketchOf(trainSel), testWithTau, p, Some(bcastTrain), Some(bcastTest))
          .select(col("test_id"), col("train_id"),
            SeriesFunctions.barrier(scoreExpr).as("score"), col("tau"))
          .filter(col("score") <= coalesce(col("tau"), lit(Double.MaxValue)))
          .select("test_id", "train_id", "score")
      } else slimScores(trainSel)
    // ONE row per test point (test_id, candidate-id array) out of the
    // heap — the exact phase joins payloads at |test| row counts, not
    // |test|*fk. Selection runs as the native TypedImperativeAggregate
    // (graft_topk_ids): primitive-array heap buffer, no per-row tuple
    // boxing or Kryo buffer codec — the typed-Aggregator twin
    // ([[BoundedTopKByScore]]) keeps identical semantics and cross-checks
    // it in KnnSpec
    val perTest = slimDf.groupBy(col("test_id"))
      .agg(SeriesFunctions.topkIds(col("score"), col("train_id"), fk).as("cand_ids"))
    // Oversize train: broadcast the SLIM (train_id, test_id)
    // candidate pairs instead — fk ids per test point, payload-free —
    // so the train payload STREAMS through the hash join, never
    // collected, never shuffled. An unhinted equi join here would let
    // Catalyst build-broadcast the train side from its lying
    // LogicalRDD estimate. The test-payload join is pinned to
    // sort-merge for the same reason (exchanges the candidate rows
    // and |test| payload rows; replicates nothing unbounded).
    val slimPairs = perTest.select(
      col("test_id"), explode(col("cand_ids")).as("train_id"))
    val withDist = trainSel
      .join(broadcast(slimPairs), "train_id")
      .join(testSel.hint("merge"), "test_id")
      .withColumn("dist", distExpr)
    val filtered =
      if (p.excludeZeroDistance) withDist.filter(col("dist") =!= 0.0) else withDist
    filtered.select(col("test_id"), col("train_id"), col("label"), col("dist"))
  }

  /** Majority-vote classification: (test_id, predicted_label). */
  def classify(train: DataFrame, test: DataFrame, p: KnnParams): DataFrame = {
    val votes = neighbors(train, test, p)
      .groupBy(col("test_id"), col("label"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val w = Window.partitionBy(col("test_id"))
      .orderBy(col("votes").desc, col("best_rank"), col("label"))
    votes
      .withColumn("vr", row_number().over(w))
      .filter(col("vr") === 1)
      .select(col("test_id"), col("label").as("predicted_label"))
  }

  /** Hyper-parameter sweep over k in ONE pass over the pair matrix — the
    * reference ran the sweep as independent notebook cells, one full
    * cartesian + rank + vote per k (`Team11-Project.py:237-322`). Every
    * swept k's top-k is a PREFIX of the k=max ranking (the rank window
    * orders by (dist, train_id), independent of k), so: rank once at
    * k = max(ks), explode each neighbor row into every swept k >= its
    * rank (a <= |ks|-wide fan-out of the already-k-bounded neighbor
    * frame, NOT of the pair matrix), and run one vote aggregation over
    * (test_id, k, label). The expensive scoring subtree appears exactly
    * once in the plan.
    *
    * Returns (test_id, k, predicted_label), one row per test point per
    * swept k, with vote semantics identical per-k to [[classify]].
    */
  def sweepClassify(train: DataFrame, test: DataFrame, p: KnnParams, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be non-empty, all >= 1")
    val nb = neighbors(train, test, p.copy(k = ks.max))
    val ksArr = array(ks.distinct.sorted.map(lit): _*)
    val votes = nb
      .select(col("test_id"), col("label"), col("rank"),
        explode(filter(ksArr, kc => kc >= col("rank"))).as("k"))
      .groupBy(col("test_id"), col("k"), col("label"))
      .agg(count(lit(1)).as("votes"), min(col("rank")).as("best_rank"))
    val w = Window.partitionBy(col("test_id"), col("k"))
      .orderBy(col("votes").desc, col("best_rank"), col("label"))
    votes
      .withColumn("vr", row_number().over(w))
      .filter(col("vr") === 1)
      .select(col("test_id"), col("k"), col("label").as("predicted_label"))
  }

  /** k=1 fast path, the reference's Model 2 `reduceByKey` min-by
    * (`Team11-Project.py:546`): a single `min_by` aggregate — partial
    * (map-side) + final, no window, one shuffle of one row per test point.
    */
  def classify1NN(train: DataFrame, test: DataFrame, p: KnnParams): DataFrame = {
    val pr =
      if (p.lbPruning && (p.distance == "dtw" || p.distance == "fastdtw"))
        prunedCandidates(train, test, p.copy(k = 1))
      else pairs(train, test, p.copy(k = 1))
    pr.groupBy(col("test_id"))
      .agg(min_by(
        struct(col("dist"), col("train_id"), col("label")),
        struct(col("dist"), col("train_id"))).as("nn"))
      .select(col("test_id"),
        col("nn.label").as("predicted_label"),
        col("nn.dist").as("min_distance"))
  }
}
