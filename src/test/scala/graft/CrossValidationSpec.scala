package graft

import graft.core.KnnParams
import graft.operators.{CrossValidation, Knn}
import org.apache.spark.sql.functions._

class CrossValidationSpec extends SparkTestBase {
  import spark.implicits._

  test("kfold1NNAccuracy: separable clusters score 1.0 in every fold") {
    // ids 0..19, label = id % 2, vectors on two far-apart points plus a
    // tiny id-dependent wiggle so distances are unique
    val df = spark.range(20).select(
      col("id"),
      array(col("id").cast("double") % 2 * 100.0 + col("id") * 1e-3,
        lit(0.0)).as("v"),
      (col("id") % 2).as("label"))
    val acc = CrossValidation.kfold1NNAccuracy(df, "id", "v", "label", folds = 4)
      .orderBy("fold").as[(Long, Double, Long)].collect()
    assert(acc.length === 4)
    assert(acc.forall(_._2 === 1.0))
    assert(acc.map(_._3).sum === 20)
  }

  test("kfold1NNAccuracy: a point's own fold is never its neighbor") {
    // doc 0 has an identical twin in ITS OWN fold (id 4, fold 0 with
    // folds=2? -> choose ids so twin shares fold) and a differently
    // labeled near-neighbor in the other fold: if the own fold leaked,
    // the twin (distance 0) would win and score 1.0; correct exclusion
    // must pick the foreign point and score 0.0 for that row.
    val rows = Seq(
      (0L, Seq(0.0, 0.0), 1L),  // fold 0
      (2L, Seq(0.0, 0.0), 1L),  // fold 0 — identical twin, same fold
      (1L, Seq(0.1, 0.0), 2L),  // fold 1 — nearest FOREIGN point
      (3L, Seq(9.0, 9.0), 1L)   // fold 1 — far
    ).toDF("id", "v", "label")
    val byFold = CrossValidation.kfold1NNAccuracy(rows, "id", "v", "label", folds = 2)
      .orderBy("fold").as[(Long, Double, Long)].collect()
    // fold 0: rows 0 and 2 both predict label 2 (wrong) -> acc 0.0
    assert(byFold(0) === ((0L, 0.0, 2L)))
  }

  test("kfold1NNAccuracy: rows with no foreign-fold neighbor count as incorrect") {
    // every id ≡ 0 (mod 2): fold 1 is empty, so no row has a foreign-fold
    // neighbor — the left join must keep all rows with pred NULL (scored
    // incorrect), matching the oracle's scalar subquery, not drop them
    val rows = Seq(
      (0L, Seq(0.0, 0.0), 1L),
      (2L, Seq(1.0, 0.0), 1L),
      (4L, Seq(2.0, 0.0), 1L)
    ).toDF("id", "v", "label")
    val byFold = CrossValidation.kfold1NNAccuracy(rows, "id", "v", "label", folds = 2)
      .orderBy("fold").as[(Long, Double, Long)].collect()
    assert(byFold.toSeq === Seq((0L, 0.0, 3L)))
  }

  test("kfold1NNAccuracy matches per-fold classify1NN on real embeddings") {
    val folds = 3
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val got = CrossValidation
      .kfold1NNAccuracy(e, "vec_id", "embedding", "label", folds)
      .orderBy("fold").as[(Long, Double, Long)].collect()
    val want = (0 until folds).map { f =>
      val train = e.filter(col("vec_id") % folds =!= f).select(
        col("vec_id").as("train_id"),
        col("embedding").cast("array<double>").as("train_series"),
        col("label"))
      val test = e.filter(col("vec_id") % folds === f).select(
        col("vec_id").as("test_id"),
        col("embedding").cast("array<double>").as("test_series"))
      val truth = e.filter(col("vec_id") % folds === f)
        .select(col("vec_id").as("test_id"), col("label"))
      val pred = Knn.classify1NN(train, test, KnnParams(distance = "euclidean"))
      val scored = pred.join(truth, "test_id")
      val n = scored.count()
      val correct = scored
        .filter(col("predicted_label") === col("label").cast("double")).count()
      (f.toLong, math.round(correct.toDouble / n * 1e6) / 1e6, n)
    }
    assert(got.map(t => (t._1, t._2, t._3)).toSeq === want)
  }

  test("kfold1NNAccuracy: one null-vector train row must not hijack " +
      "every prediction (nulls-first min_by struct hazard)") {
    // ids 0..5 across 2 folds, two tight separable clusters with BOTH
    // clusters in BOTH folds (each row's nearest foreign-fold neighbor
    // shares its label); id 99 carries a NULL vector — if its null dist
    // reaches min_by it sorts ahead of every real distance and becomes
    // everyone's 1-NN, poisoning every fold
    val clean = Seq(
      (0L, Array(0.0, 0.0), 0.0), (1L, Array(0.1, 0.0), 0.0),
      (2L, Array(0.0, 0.1), 0.0),
      (3L, Array(9.0, 9.0), 1.0), (4L, Array(9.1, 9.0), 1.0),
      (5L, Array(9.0, 9.1), 1.0))
    val dirty = clean :+ ((99L, null.asInstanceOf[Array[Double]], 1.0))
    val acc = CrossValidation
      .kfold1NNAccuracy(dirty.toDF("id", "v", "label"), "id", "v", "label", 2)
      .orderBy("fold").as[(Long, Double, Long)].collect()
    // fold 1 (odd ids) holds the null row: its prediction is NULL
    // (no real pairs) and counts incorrect among n=4; every clean row
    // still matches its own cluster
    assert(acc.toSeq === Seq((0L, 1.0, 3L), (1L, 0.75, 4L)),
      s"null-vector row must only cost ITSELF, got ${acc.toSeq}")
  }
}
