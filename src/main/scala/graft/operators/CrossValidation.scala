package graft.operators

import graft.functions.SeriesFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic k-fold cross-validation for the KNN family — the
  * evaluation loop the reference runs as separate notebook cells per
  * split (its k-sweep, `Team11-Project.py:237-322`, holds ONE split
  * fixed; k-fold rotates the split itself).
  *
  * Spark-first shape: fold assignment is a pure projection (`id mod
  * folds` — deterministic, no seed, no shuffle), and ALL folds evaluate
  * in ONE pair pass: the cross join's `fold != fold` predicate makes
  * every row a test point against the union of the other folds — no
  * per-fold loop, no k plans for k folds. The pair matrix is the same
  * one a single split scores; only the filter differs.
  */
object CrossValidation {

  /** Per-fold 1-NN accuracy (Euclidean) over (idCol, vecCol, labelCol).
    * Output: (fold, acc 6 dp, n) — one row per fold.
    *
    * Broadcast the whole (small-dim) table as the train side; min_by
    * picks the nearest foreign-fold neighbor with (dist, id) tie-break,
    * exactly [[Knn.classify1NN]]'s rule.
    */
  def kfold1NNAccuracy(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      folds: Int): DataFrame = {
    require(folds >= 2, "k-fold needs at least 2 folds")
    val e = df.select(
      col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"),
      col(labelCol).as("label"),
      pmod(col(idCol), lit(folds)).as("fold"))
    val test = Partitioning.spread(e.select(col("id"), col("v"), col("fold")))
    val train = e.select(col("id").as("tid"), col("v").as("tv"),
      col("label").as("tlabel"), col("fold").as("tfold"))
    val pred = test.crossJoin(broadcast(train))
      .filter(col("fold") =!= col("tfold"))
      .withColumn("dist", SeriesFunctions.barrier(
        SeriesFunctions.euclidean(col("v"), col("tv"))))
      .groupBy(col("id"), col("fold"))
      .agg(min_by(col("tlabel"), struct(col("dist"), col("tid"))).as("pred"))
    pred
      .join(e.select(col("id"), col("label")), "id")
      .groupBy(col("fold"))
      .agg(
        round(avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)), 6)
          .as("acc"),
        count(lit(1)).as("n"))
  }
}
