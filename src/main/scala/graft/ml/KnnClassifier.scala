package graft.ml

import graft.core.KnnParams
import graft.operators.Knn
import org.apache.hadoop.fs.Path
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.graft.MlReadWriteBridge
import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.ml.param._
import org.apache.spark.ml.util._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** Shared Params for [[KnnClassifier]] and [[KnnClassifierModel]] — the
  * `org.apache.spark.ml` veneer over [[graft.core.KnnParams]]
  * (SURVEY §7.1's "KnnClassifier (Estimator-ish)"; the reference
  * declares its approach as "MLlib + custom transformers", so the
  * engine's KNN should be usable INSIDE an MLlib `Pipeline` next to
  * `VectorAssembler`, not only through [[graft.operators.Knn]]).
  *
  * Every knob mirrors a [[KnnParams]] field (same names, same
  * defaults); `featuresCol` accepts BOTH an MLlib `Vector` (the
  * `VectorAssembler` output — the q37 surface) and an `array` of any
  * numeric type (the engine's native series form — the q10 surface).
  */
private[ml] trait KnnClassifierParams extends Params {

  final val k = new IntParam(this, "k", "neighbor count (>= 1)",
    ParamValidators.gtEq(1))
  final val distance = new Param[String](this, "distance",
    "euclidean | sqdist | manhattan | dtw | fastdtw | cosine",
    ParamValidators.inArray(Array(
      "euclidean", "sqdist", "manhattan", "dtw", "fastdtw", "cosine")))
  final val strategy = new Param[String](this, "strategy",
    "auto | broadcast | cartesian (pair-join strategy)",
    ParamValidators.inArray(Array("auto", "broadcast", "cartesian")))
  final val band = new IntParam(this, "band",
    "Sakoe-Chiba band for exact DTW; -1 = unconstrained",
    (v: Int) => v >= -1)
  final val radius = new IntParam(this, "radius", "FastDTW radius (>= 0)",
    ParamValidators.gtEq(0))
  final val excludeZeroDistance = new BooleanParam(this, "excludeZeroDistance",
    "drop zero-distance (self-match) neighbors")
  final val lbPruning = new BooleanParam(this, "lbPruning",
    "candidate pruning for dtw/fastdtw (the scale path)")
  final val candidateFactor = new IntParam(this, "candidateFactor",
    "pruned candidates kept per test point = factor * k",
    ParamValidators.gtEq(1))
  final val featuresCol = new Param[String](this, "featuresCol",
    "features column: MLlib Vector or array of numerics")
  final val labelCol = new Param[String](this, "labelCol",
    "label column (cast to double)")
  final val predictionCol = new Param[String](this, "predictionCol",
    "output prediction column (double)")
  final val idCol = new Param[String](this, "idCol",
    "optional UNIQUE id column in transform input; when set, transform " +
      "correlates predictions through it directly — no internal row-id " +
      "materialization (empty = assign internal row ids). Contract: ids " +
      "must be unique and non-null — rows sharing an id are merged into " +
      "ONE vote group (silently wrong predictions), rows with a null id " +
      "are never matched by the join-back (null prediction); set " +
      "validateIdCol (or the global spark.graft.knn.validateIdCol " +
      "conf) to assert uniqueness per transform")
  final val cacheInput = new BooleanParam(this, "cacheInput",
    "materialize the transform input once (graft-owned persist) on the " +
      "idCol path — the input lineage is otherwise referenced twice " +
      "(classification + join-back) and recomputes per reference; turn " +
      "on when the upstream is expensive, free the blocks eagerly with " +
      "graft.core.Materialize.releaseOwned(result) once consumed " +
      "(lineage is kept: a released frame recomputes, never fails). " +
      "Trade: the input is pinned through an RDD materialization, so " +
      "scan pushdown/columnar execution stop at the persist boundary. " +
      "Ignored without idCol (the internal-id path already materializes " +
      "via withRowId when the lineage is not provably stable)")
  final val validateIdCol = new BooleanParam(this, "validateIdCol",
    "assert the idCol contract per transform (throw on duplicate ids, " +
      "warn on null ids) at the cost of one extra aggregate over the " +
      "input. A Param — NOT only a session conf — so the assertion " +
      "persists through MLWriter/MLReader with the model like idCol " +
      "and cacheInput do (an inference service loading a saved model " +
      "keeps it); the session conf spark.graft.knn.validateIdCol=true " +
      "remains a global override that turns validation ON regardless " +
      "of the param. Ignored without idCol")

  setDefault(k -> 1, distance -> "euclidean", strategy -> "auto",
    band -> -1, radius -> 1, excludeZeroDistance -> true,
    lbPruning -> false, candidateFactor -> 4,
    featuresCol -> "features", labelCol -> "label",
    predictionCol -> "prediction", idCol -> "", cacheInput -> false,
    validateIdCol -> false)

  private[ml] def knnParams: KnnParams = KnnParams(
    k = $(k), distance = $(distance), strategy = $(strategy),
    excludeZeroDistance = $(excludeZeroDistance), radius = $(radius),
    band = $(band), lbPruning = $(lbPruning),
    candidateFactor = $(candidateFactor))

  /** `featuresCol` as `array<double>` — `vector_to_array` for the
    * MLlib `Vector` form, a cast for the native array form.
    */
  private[ml] def seriesColumn(schema: StructType): Column = {
    val dt = schema($(featuresCol)).dataType
    dt match {
      case v if v == SQLDataTypes.VectorType =>
        vector_to_array(col($(featuresCol)))
      case ArrayType(_: NumericType, _) =>
        col($(featuresCol)).cast(ArrayType(DoubleType))
      case other => throw new IllegalArgumentException(
        s"featuresCol '${$(featuresCol)}' must be an MLlib Vector or an " +
          s"array of numerics, got ${other.catalogString}")
    }
  }

  private[ml] def validateAndTransformSchema(schema: StructType,
      fitting: Boolean): StructType = {
    seriesColumn(schema) // validates featuresCol presence + type
    if (fitting) {
      val lt = schema($(labelCol)).dataType
      require(lt.isInstanceOf[NumericType],
        s"labelCol '${$(labelCol)}' must be numeric, got ${lt.catalogString}")
    }
    if (!fitting && $(idCol).nonEmpty) {
      val it = schema($(idCol)).dataType // throws if the column is absent
      require(!it.isInstanceOf[MapType],
        s"idCol '${$(idCol)}' must be an equi-joinable type, got ${it.catalogString}")
    }
    require(!schema.fieldNames.contains($(predictionCol)),
      s"output column ${$(predictionCol)} already exists")
    StructType(schema.fields :+
      StructField($(predictionCol), DoubleType, nullable = true))
  }
}

/** KNN classification as an `org.apache.spark.ml.Estimator`, usable
  * inside a `Pipeline` (e.g. downstream of `VectorAssembler`). A lazy
  * learner: `fit` canonicalizes and MATERIALIZES the training set
  * (`localCheckpoint`) — there is no other training step — and
  * `transform` runs [[Knn.classify]] against it, so every scale
  * property of the underlying operator (measured-size broadcast
  * decision, prune cascade, partitioned-cartesian degrade) carries
  * over unchanged.
  *
  * Why fit materializes: train rows need a unique id for the
  * deterministic vote tie-break, assigned via
  * `monotonically_increasing_id` and FROZEN by the eager checkpoint —
  * a pure function of nothing but the fitted model from then on
  * (re-evaluating a nondeterministic id against live lineage on every
  * transform is the withRowId double-evaluation hazard class). The
  * checkpoint also gives the broadcast planner a MEASURED size
  * ([[graft.core.Materialize.storageBytes]]) instead of a lying
  * LogicalRDD estimate. Call [[KnnClassifierModel.release]] when done
  * with a model to free the blocks eagerly.
  *
  * Deployment constraint (`localCheckpoint` semantics): the fitted
  * training set lives ONLY as storage blocks on the executors that
  * computed it — lineage is truncated by design — so losing any of
  * those executors (preemption, dynamic-allocation scale-down, OOM
  * kill) makes the in-memory model permanently unusable, INCLUDING
  * `save()`; the failure is loud (missing block), never silent. For
  * cluster deployments: `save()` the model right after `fit` and serve
  * from `load` (the parquet under `path/data` is the durable form), or
  * keep executor allocation static for the model's lifetime
  * (`spark.dynamicAllocation.enabled=false`).
  */
class KnnClassifier(override val uid: String)
    extends Estimator[KnnClassifierModel] with KnnClassifierParams
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("graft_knnc"))

  def setK(value: Int): this.type = set(k, value)
  def setDistance(value: String): this.type = set(distance, value)
  def setStrategy(value: String): this.type = set(strategy, value)
  def setBand(value: Int): this.type = set(band, value)
  def setRadius(value: Int): this.type = set(radius, value)
  def setExcludeZeroDistance(value: Boolean): this.type = set(excludeZeroDistance, value)
  def setLbPruning(value: Boolean): this.type = set(lbPruning, value)
  def setCandidateFactor(value: Int): this.type = set(candidateFactor, value)
  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setLabelCol(value: String): this.type = set(labelCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setIdCol(value: String): this.type = set(idCol, value)
  def setCacheInput(value: Boolean): this.type = set(cacheInput, value)
  def setValidateIdCol(value: Boolean): this.type = set(validateIdCol, value)

  override def fit(dataset: Dataset[_]): KnnClassifierModel = {
    transformSchema(dataset.schema)
    val df = dataset.toDF()
    val train = df
      .select(monotonically_increasing_id().as("train_id"),
        seriesColumn(df.schema).as("train_series"),
        col($(labelCol)).cast(DoubleType).as("label"))
      .localCheckpoint() // eager: ids frozen, size measured
    copyValues(new KnnClassifierModel(uid, train)).setParent(this)
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema, fitting = true)

  override def copy(extra: ParamMap): KnnClassifier = defaultCopy(extra)
}

object KnnClassifier extends DefaultParamsReadable[KnnClassifier] {
  override def load(path: String): KnnClassifier = super.load(path)
}

/** Fitted KNN model: the canonicalized, checkpointed training set plus
  * the params. `transform` appends `predictionCol` (majority-vote
  * label, [[Knn.classify]] semantics: votes desc, then best rank, then
  * smallest label) to the input, preserving every input column.
  *
  * Inference-scale knob: set `idCol` to a UNIQUE, NON-NULL key of the
  * transform input to correlate predictions through the caller's own
  * column — the input plan stays declarative (columnar scan, pushdown,
  * no RDD round-trip and no per-call input materialization). Duplicate
  * ids merge distinct rows into one vote group (wrong predictions);
  * null ids surface with a null prediction; `setValidateIdCol(true)`
  * (a Param — it persists with a saved model; the session conf
  * `spark.graft.knn.validateIdCol=true` is a global override) asserts
  * the contract per transform. The input is referenced twice (classification +
  * join-back) and recomputes per reference — `setCacheInput(true)` to
  * materialize it once (graft-owned persist, freed eagerly via
  * `Materialize.releaseOwned(result)`), or `cache()` it yourself.
  * Without `idCol`, transform assigns an internal row id, which
  * materializes the input once per call when its lineage is not
  * provably re-evaluation-stable; in a long-lived session, free that
  * materialization eagerly with
  * `graft.core.Materialize.releaseOwned(result)` once the result
  * is consumed (it releases only graft-owned persists, and the frame
  * stays evaluable — it recomputes).
  *
  * Persistence ([[MLWritable]]): params via the standard metadata
  * format, the training set as parquet under `path/data` — the
  * ALSModel pattern for models that ARE a DataFrame. `load` re-reads
  * the parquet, so the frozen train ids round-trip exactly and a
  * loaded model predicts row-for-row identically.
  */
class KnnClassifierModel private[ml] (
    override val uid: String,
    private[graft] val train: DataFrame)
    extends Model[KnnClassifierModel] with KnnClassifierParams
    with MLWritable {

  def setFeaturesCol(value: String): this.type = set(featuresCol, value)
  def setPredictionCol(value: String): this.type = set(predictionCol, value)
  def setIdCol(value: String): this.type = set(idCol, value)
  def setCacheInput(value: Boolean): this.type = set(cacheInput, value)
  def setValidateIdCol(value: Boolean): this.type = set(validateIdCol, value)

  override def transform(dataset: Dataset[_]): DataFrame = {
    // Fail fast with a routable message: the row-id path below calls
    // df.rdd, which on a streaming frame dies deep inside the ingest
    // layer with an opaque "Queries with streaming sources must be
    // executed with writeStream.start()" AnalysisException.
    if (dataset.isStreaming)
      throw new UnsupportedOperationException(
        "KnnClassifierModel.transform does not support streaming input; " +
          "use graft.streaming.StreamingClassify.classifyStream1NN " +
          "(stream-static broadcast KNN) on the streaming side")
    transformSchema(dataset.schema)
    val df = dataset.toDF()
    if ($(idCol).nonEmpty) {
      // User-supplied UNIQUE id: the prediction correlates through the
      // caller's own key, so the input plan stays fully declarative —
      // no RDD round-trip, no withRowId persist (at inference scale the
      // internal-id path materializes the WHOLE input per transform
      // call), columnar scan + pushdown preserved on the join-back left
      // side. Uniqueness AND non-nullness are the caller's contract,
      // and the failure modes differ from a plain join key's:
      //  - DUPLICATE ids are merged by Knn.classify's per-test_id vote
      //    group (distinct rows pool their neighbor candidates into one
      //    top-k), producing silently WRONG predictions — not a mere
      //    join-back fan-out;
      //  - NULL ids form one merged null vote group whose prediction
      //    the join-back never matches (USING-join equality is
      //    null-rejecting), so null-id rows surface with a NULL
      //    prediction.
      // spark.graft.knn.validateIdCol=true trades one aggregate over
      // the input for a loud failure on either breach.
      // opt-in single evaluation: the input is referenced twice below
      // (classification + join-back); persist it graft-owned —
      // InternalRow layer, no external-Row codec
      // (Materialize.persistInternal) — so both references read ONE
      // materialization. EAGER (count()): the two references sit
      // under one action whose independent subtrees AQE schedules
      // concurrently, and a cold persist lets them RACE to compute
      // the same partitions (duplicated upstream work — the exact
      // cost the knob exists to remove); warming the blocks first
      // makes single evaluation true by construction. Lineage is
      // kept (eviction recomputes); the caller frees the blocks
      // eagerly with Materialize.releaseOwned(result).
      val base =
        if ($(cacheInput)) graft.core.Materialize.persistInternal(df) else df
      // warm + validate + BUILD THE RESULT under ONE unpersist-on-
      // failure guard: an exception out of any of them (a failing
      // upstream in count(), a duplicate-id require, an analysis or
      // planner failure while constructing the classify/join-back
      // plan — Knn.classify runs size-measurement actions of its own)
      // escapes BEFORE any result frame reaches the caller, so the
      // caller has no handle for releaseOwned and the warmed
      // graft-owned blocks would otherwise linger until driver GC +
      // ContextCleaner reclaim them (r16 advisory; the guard covers
      // construction too, or an AMBIGUOUS_REFERENCE out of the final
      // select would leak the same way). Release is a registry-only
      // unpersist — rethrowing loses nothing. On SUCCESS nothing is
      // released: the result's evaluation reads the warmed blocks and
      // the caller frees them via Materialize.releaseOwned(result).
      try {
        if ($(cacheInput)) base.count()
        // validation reads the warmed blocks (one cheap extra pass)
        // rather than re-running the upstream lineage
        if ($(validateIdCol) || df.sparkSession.conf.get(
            "spark.graft.knn.validateIdCol", "false").toBoolean) {
          val c = base.agg(
            count(col($(idCol))).as("cnt"),
            count_distinct(col($(idCol))).as("dst"),
            count(lit(1)).as("total")).head()
          require(c.getLong(0) == c.getLong(1),
            s"idCol '${$(idCol)}' is not unique: ${c.getLong(0)} non-null " +
              s"rows over ${c.getLong(1)} distinct ids — duplicate ids " +
              "merge distinct rows into one vote group and produce wrong " +
              "predictions")
          if (c.getLong(2) > c.getLong(0))
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"idCol '${$(idCol)}': ${c.getLong(2) - c.getLong(0)} rows " +
                "carry a null id and will surface with a null prediction")
        }
        val test = base.select(col($(idCol)).as("test_id"),
          seriesColumn(base.schema).as("test_series"))
        val preds = Knn.classify(train, test, knnParams)
          .select(col("test_id").as($(idCol)),
            col("predicted_label").as($(predictionCol)))
        // merge hint, same rationale as the internal-id path: the preds
        // side is post-aggregate with untrustworthy size estimates. The
        // trailing select restores the input column order (a USING join
        // fronts the join key) so both paths emit the same shape.
        base.hint("merge").join(preds, Seq($(idCol)), "left")
          .select((base.columns.map(col) :+ col($(predictionCol))).toIndexedSeq: _*)
      } catch { case e: Throwable =>
        // the cleanup must not MASK the original failure: releaseOwned
        // can itself throw (e.g. a stopped SparkContext when `e` is the
        // shutdown), and the original exception is the routable one
        if ($(cacheInput))
          try graft.core.Materialize.releaseOwned(base)
          catch { case r: Throwable if r ne e => e.addSuppressed(r) }
        throw e
      }
    } else {
      val idC = "__graft_knn_test_id"
      // withRowId (not a bare monotonic id): the id-annotated frame is
      // referenced TWICE below — once feeding classify, once as the
      // join-back left side — and withRowId's persist-before-count makes
      // both references read ONE materialization, so the ids they see
      // are identical even when the input lineage sits downstream of a
      // shuffle (the double-evaluation hazard class). On such an input
      // withRowId logs its once-per-JVM Exchange warning; here the id is
      // an EPHEMERAL correlation key dropped before the result surfaces,
      // so run-to-run id stability (what the warning protects) is not
      // required — only the within-evaluation consistency the persist
      // provides, with the partition-size backstop turning the
      // eviction-plus-nondeterministic-recompute corner loud.
      // (Provably re-evaluation-stable inputs — file-scan-rooted,
      // Exchange-free — skip the persist inside withRowId itself; both
      // references then recompute identically by construction.)
      val withId = graft.ingest.SeriesIngest.withRowId(df, idC)
      val test = withId.select(col(idC).as("test_id"),
        seriesColumn(withId.schema).as("test_series"))
      val preds = Knn.classify(train, test, knnParams)
        .select(col("test_id").as(idC),
          col("predicted_label").as($(predictionCol)))
      // merge hint: both sides are O(|input|) LogicalRDD-rooted frames
      // whose stats estimates are untrustworthy — an unhinted join lets
      // Catalyst build-broadcast an arbitrarily large side (the r12
      // build-side audit class). Sort-merge exchanges each side once and
      // replicates nothing. Left join: a row that produced no prediction
      // (e.g. all-null series) keeps its place with a null prediction.
      withId.hint("merge").join(preds, Seq(idC), "left").drop(idC)
    }
  }

  override def transformSchema(schema: StructType): StructType =
    validateAndTransformSchema(schema, fitting = false)

  override def copy(extra: ParamMap): KnnClassifierModel =
    copyValues(new KnnClassifierModel(uid, train), extra).setParent(parent)

  /** Free the checkpointed training blocks. The model (and anything
    * derived from its transforms) must not be used afterwards.
    */
  def release(): Unit = graft.core.Materialize.releaseCheckpoint(train)

  override def write: MLWriter = new KnnClassifierModel.Writer(this)
}

object KnnClassifierModel extends MLReadable[KnnClassifierModel] {

  private val className = classOf[KnnClassifierModel].getName

  private[ml] class Writer(instance: KnnClassifierModel) extends MLWriter {
    override protected def saveImpl(path: String): Unit = {
      MlReadWriteBridge.saveMetadata(instance, path, sparkSession)
      instance.train.write.parquet(new Path(path, "data").toString)
    }
  }

  private class Reader extends MLReader[KnnClassifierModel] {
    override def load(path: String): KnnClassifierModel = {
      val uid = MlReadWriteBridge.loadUid(path, sparkSession, className)
      val data = sparkSession.read.parquet(new Path(path, "data").toString)
      val model = new KnnClassifierModel(uid, data)
      MlReadWriteBridge.loadAndSetParams(model, path, sparkSession, className)
      model
    }
  }

  override def read: MLReader[KnnClassifierModel] = new Reader

  override def load(path: String): KnnClassifierModel = super.load(path)
}
