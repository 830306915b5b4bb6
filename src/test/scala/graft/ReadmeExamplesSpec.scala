package graft

import graft.core.KnnParams
import graft.operators.{Dedup, Evaluation, Knn, SimilaritySearch}
import org.apache.spark.sql.functions._

/** Pins README.md's Quickstart: every example there must keep compiling
  * and running verbatim (same imports, same calls, same column
  * contracts). If an API change breaks this spec, update the README in
  * the same commit.
  */
class ReadmeExamplesSpec extends SparkTestBase {

  test("quickstart: time-series KNN + accuracy") {
    val train = spark.range(60).select(
      col("id").as("train_id"),
      call_function("graft_har_series", col("id"), lit(16)).as("train_series"),
      pmod(col("id"), lit(6)).cast("double").as("label"))
    val test = spark.range(12).select(
      (col("id") + 1000).as("test_id"),
      call_function("graft_har_series", col("id") + 1000, lit(16)).as("test_series"))
    val truth = spark.range(12).select(
      (col("id") + 1000).as("test_id"),
      pmod(col("id") + 1000, lit(6)).cast("double").as("label"))

    // verbatim from README
    val pred = Knn.classify(train, test, KnnParams(k = 5, distance = "euclidean"))
    val pred1 = Knn.classify1NN(train, test,
      KnnParams(distance = "dtw", band = 56, lbPruning = true, candidateFactor = 16))
    val acc = Evaluation.accuracy(pred, truth, idCol = "test_id")

    assert(pred.columns.toSet === Set("test_id", "predicted_label"))
    assert(pred1.columns.toSet === Set("test_id", "predicted_label", "min_distance"))
    assert(pred.count() === 12 && pred1.count() === 12)
    val row = acc.collect()(0)
    assert(acc.columns.toSeq === Seq("accuracy", "n"))
    assert(row.getLong(1) === 12L)
  }

  test("quickstart: dedup family") {
    // 10 groups of 4 identical docs; groups share NO tokens (every word
    // carries the group digit), so only exact duplicates exceed the
    // jaccard threshold and the expected cluster count is exact
    val g = (col("id") % 10).cast("string")
    val docs = spark.range(40).select(
      col("id").as("doc_id"),
      concat_ws(" ", concat(lit("alpha"), g), concat(lit("beta"), g),
        concat(lit("gamma"), g), concat(lit("delta"), g),
        concat(lit("epsilon"), g), concat(lit("zeta"), g),
        concat(lit("token"), g)).as("text"))

    // verbatim from README
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
    val nears = Dedup.minhashLshPairs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 96, numBands = 32, threshold = 0.3)
    val clust = Dedup.duplicateClusters(docs, "doc_id", "text",
      shingleSize = 2, threshold = 0.3)

    assert(kept.count() === 10) // 10 distinct texts, keep-first each
    assert(kept.columns.toSeq === docs.columns.toSeq)
    assert(nears.columns.toSet === Set("id_a", "id_b", "jaccard"))
    // each group of 4 identical docs: C(4,2)=6 exact-dup pairs at 1.0
    assert(nears.filter(col("jaccard") === 1.0).count() === 60)
    assert(clust.count() === 40)
    assert(clust.select(countDistinct(col("cluster_id"))).collect()(0).getLong(0) === 10)
  }

  test("quickstart: ANN brute / IVF / LSH") {
    val vecs = spark.range(80).select(col("id"),
      array((0 until 64).map(d =>
        sin(col("id") * lit(0.7) + lit(d * 0.31)).cast("double")): _*).as("v"))
    val queries = vecs.filter(col("id") % 10 === 0)
      .select(col("id").as("query_id"), col("v").as("query_vec"))
    val corpus = vecs.filter(col("id") % 10 =!= 0)
      .select(col("id").as("item_id"), col("v").as("item_vec"))

    // verbatim from README
    val exact = SimilaritySearch.bruteForceTopK(queries, corpus, k = 5)
    val ivf = SimilaritySearch.ivfTopK(queries, corpus, k = 5)
    val lsh = SimilaritySearch.lshTopK(queries, corpus, k = 5, dim = 64)

    Seq(exact, ivf, lsh).foreach { df =>
      assert(Set("query_id", "rank", "item_id").subsetOf(df.columns.toSet))
      assert(df.groupBy("query_id").count().filter(col("count") > 5).count() === 0)
    }
    assert(exact.count() === 8 * 5)
  }

  test("quickstart: MLlib pipeline (VectorAssembler -> KnnClassifier) " +
      "with save/load") {
    import org.apache.spark.ml.{Pipeline, PipelineModel}
    import org.apache.spark.ml.feature.VectorAssembler
    import graft.ml.KnnClassifier
    def frame(n: Int, offset: Int) = spark.range(n).select(
      (col("id") + offset).as("key"),
      (col("id") % 2).cast("double").as("label"),
      (col("id") % 2 * 100 + pmod(col("id") * 37, lit(19))).cast("double").as("f1"),
      (col("id") % 2 * 100 + pmod(col("id") * 53, lit(23))).cast("double").as("f2"),
      (col("id") % 2 * 100 + pmod(col("id") * 71, lit(29))).cast("double").as("f3"))
    val train = frame(60, 0)
    val test = frame(20, 1000)
    val modelDir = java.nio.file.Files
      .createTempDirectory("graft_readme_ml").toString
    try {
      // verbatim from README (modelDir made temp)
      val model = new Pipeline().setStages(Array(
        new VectorAssembler().setInputCols(Array("f1", "f2", "f3"))
          .setOutputCol("features"),
        new KnnClassifier().setK(5).setDistance("euclidean")
          .setIdCol("key"))).
        fit(train)
      model.write.overwrite().save(modelDir)
      val preds = PipelineModel.load(modelDir).transform(test)

      assert(preds.columns.contains("prediction"))
      val got = preds.select("key", "prediction").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.size === 20)
      // the manifold is learnable: predictions equal true labels
      assert(got.forall { case (k, v) => v === (k % 2).toDouble })
      import graft.ml.KnnClassifierModel
      model.stages.last.asInstanceOf[KnnClassifierModel].release()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(modelDir))
    }
  }

  test("quickstart: streaming classify") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val trainStatic = spark.range(30).select(
      col("id").as("train_id"),
      call_function("graft_har_series", col("id"), lit(8)).as("train_series"),
      pmod(col("id"), lit(6)).cast("double").as("label"))
    val stream = MemoryStream[Long]
    val testStream = stream.toDF().select(col("value").as("test_id"),
      call_function("graft_har_series", col("value") + 500, lit(8)).as("test_series"))

    // verbatim from README (queryName made collision-safe)
    val scored = graft.streaming.StreamingClassify.classifyStream1NN(
      trainStatic, testStream, KnnParams(distance = "euclidean"))
    val qname = s"readme_preds_${System.nanoTime()}"
    val q = scored.writeStream.outputMode("update").format("memory")
      .queryName(qname).start()
    try {
      stream.addData(1L, 2L, 3L, 4L)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table(qname)
    assert(out.count() === 4)
    assert(out.columns.toSet === Set("test_id", "predicted_label", "min_distance"))
  }
}
