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
    case "cosine"    => -SeriesFunctions.cosine(a, b) // larger similarity = smaller distance
    case other       => throw new IllegalArgumentException(s"unknown distance: $other")
  }

  /** All (test x train) candidate pairs with distances.
    * train: (train_id, train_series, label); test: (test_id, test_series).
    */
  private def pairs(train: DataFrame, test: DataFrame, p: KnnParams): DataFrame = {
    val trainSel = train.select(
      col("train_id"), col("train_series"), col("label"))
    val testSel = test.select(col("test_id"), col("test_series"))
    val useBroadcast = p.strategy match {
      case "broadcast" => true
      case "cartesian" => false
      case _ =>
        // auto: Catalyst-stats-driven choice, mirroring Spark's own
        // autoBroadcastJoinThreshold logic — broadcast while the train
        // side fits an executor, partitioned cartesian beyond that.
        // The conf value may carry a byte-unit suffix ("10MB").
        val threshold =
          try {
            val s = train.sparkSession.conf
              .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
            if (s.trim.startsWith("-")) -1L
            else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
          } catch { case _: Throwable => 10485760L }
        val trainBytes = trainSel.queryExecution.optimizedPlan.stats.sizeInBytes
        threshold < 0 || trainBytes <= BigInt(math.max(threshold, 10485760L))
    }
    // The stream (test) side often arrives as a handful of input splits
    // (one small parquet file = one partition = one task for the whole
    // distance loop). Spread it across the cluster before the join; the
    // distance kernels dominate, so this tiny shuffle always pays off.
    val spreadTest = Partitioning.spread(testSel, p.testPartitions)
    val joined =
      if (useBroadcast) spreadTest.crossJoin(broadcast(trainSel))
      else {
        val t = if (p.trainPartitions > 0) trainSel.repartition(p.trainPartitions) else trainSel
        spreadTest.crossJoin(t)
      }
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

  /** LB_Keogh cascade (Keogh & Ratanamahatana 2005), the DTW scale path:
    * 1. envelope each TEST series once (scan-side projection);
    * 2. score every pair with the O(n) LB_Keogh lower bound;
    * 3. keep the candidateFactor*k lowest bounds per test point (window
    *    group-limit — partial before the shuffle, like the main top-k);
    * 4. run the exact kernel only on survivors.
    * Exact when the true k-th neighbor's bound ranks within the candidate
    * budget (holds in practice; raise candidateFactor to tighten).
    */
  private def prunedCandidates(train: DataFrame, test: DataFrame, p: KnnParams): DataFrame = {
    val trainSel = train.select(col("train_id"), col("train_series"), col("label"))
    val testSel = test.select(col("test_id"), col("test_series"))
    // barrier(): a single-use alias gets inlined by CollapseProject, which
    // would recompute the O(n*band) envelope once per PAIR instead of once
    // per test row
    val testEnv = Partitioning.spread(testSel, p.testPartitions)
      .withColumn("env", SeriesFunctions.barrier(
        SeriesFunctions.envelope(col("test_series"), p.band)))
    // SLIM ranking rows: only (test_id, train_id, lb) feed candidate
    // selection — payloads would put candidateCount * seriesBytes into
    // every buffer. Selection is a bounded-heap AGGREGATE (the
    // reference's two-phase heap, `Team11-Project.py:180`/`:195`), not a
    // window rank: sorting tens of millions of pair rows to keep
    // factor*k per group costs more than every LB score combined.
    val spark0 = train.sparkSession
    import spark0.implicits._
    val slim = testEnv.crossJoin(broadcast(trainSel))
      .select(col("test_id"), col("train_id"),
        SeriesFunctions.lbKeogh(col("env"), col("train_series")).as("lb"))
      .as[(Long, Long, Double)]
    val agg = new BoundedTopKByScore(p.candidateFactor * p.k)
    val survivors = slim.groupByKey(_._1).agg(agg.toColumn)
      .flatMap { case (tid, ids) => ids.map(tid -> _) }
      .toDF("test_id", "train_id")
    // join the payloads back for the exact phase (candidates are k-scale,
    // so these joins move factor*k rows per test point, not n*m).
    // The explicit repartition matters: the candidate set is so small that
    // AQE coalesces its exchanges to ONE partition, which would serialize
    // the expensive exact-kernel projection into a single task; an
    // explicit partition count is respected by AQE.
    val withDist = survivors
      .join(testSel, "test_id")
      .join(broadcast(trainSel), "train_id")
      .repartition(spark0.sparkContext.defaultParallelism)
      .withColumn("dist",
        SeriesFunctions.barrier(
          distanceColumn(p)(col("test_series"), col("train_series"))))
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
