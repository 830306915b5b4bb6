package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Classification evaluation — the reference's `getAccuracy`
  * (`Team11-Project.py:208-227`) joined predictions to truth, computed
  * `abs(pred - truth)`, filtered `== 0`, and ran TWO `count()` actions.
  * Here it is one single-pass aggregate (`avg(when(...))`) — one job, no
  * second scan, and no join on a 561-dim vector key (the reference's J2
  * hazard; we join on row id).
  */
object Evaluation {

  /** Accuracy from a joined frame with prediction + truth columns.
    *
    * WARNING — this overload scores exactly the rows the caller's join
    * produced. If that join was INNER on prediction ids, a classifier
    * that silently drops hard rows loses them from the numerator AND
    * the denominator together, inflating the reported score; two
    * independent callers have now hit exactly that (the r17
    * `kfold1NNAccuracy` fix, the r18 `KSweep` fix). Unless the
    * upstream join is deliberately inner (e.g. pinned by an oracle
    * that joins the same way), prefer the drop-proof
    * [[accuracy(predictions:org\.apache\.spark\.sql\.DataFrame,truth:org\.apache\.spark\.sql\.DataFrame,idCol:String)* 3-arg overload]],
    * which joins LEFT from truth so a missing prediction counts as
    * incorrect and `n` stays the truth-set size.
    */
  def accuracy(joined: DataFrame, pred: Column, truth: Column): DataFrame =
    joined.agg(
      round(avg(when(abs(pred - truth) === 0.0, 1.0).otherwise(0.0)), 6).as("accuracy"),
      count(lit(1)).as("n"))

  /** Accuracy per group (the k-sweep shape) — same metric as [[accuracy]]. */
  def groupedAccuracy(joined: DataFrame, groupCols: Seq[Column], pred: Column, truth: Column): DataFrame =
    joined.groupBy(groupCols: _*).agg(
      round(avg(when(abs(pred - truth) === 0.0, 1.0).otherwise(0.0)), 6).as("accuracy"),
      count(lit(1)).as("n"))

  /** Accuracy joining predictions (id, predicted_label) to truth
    * (id, label). The join is LEFT FROM TRUTH: a truth row with no
    * prediction (the classifier emitted nothing for that id — null
    * series, every candidate excluded) counts as INCORRECT and `n` is
    * the truth-set size, matching
    * [[CrossValidation.kfold1NNAccuracy]]'s contract. An inner join
    * here would shrink numerator AND denominator together, silently
    * inflating the score of a classifier that only answers its easy
    * rows — and hiding a prediction-dropping regression from every
    * accuracy check built on this entry point.
    */
  def accuracy(predictions: DataFrame, truth: DataFrame, idCol: String): DataFrame =
    accuracy(
      truth.join(predictions, Seq(idCol), "left"),
      col("predicted_label"), col("label"))

  /** Per-class precision/recall/F1 + support (beyond the reference's
    * single accuracy number; standard multiclass evaluation).
    * Zero-denominator classes (never predicted, or absent from truth)
    * report 0.0 for the undefined ratios. NULL labels do not merge
    * across the two sides (full-outer equi-join null semantics: a null
    * predicted class and a null truth class each get their own row) —
    * filter null labels upstream for a clean report.
    */
  def perClassMetrics(joined: DataFrame, pred: Column, truth: Column): DataFrame = {
    val base = joined.select(pred.cast("double").as("p"), truth.cast("double").as("t"))
    val byTruth = base.groupBy(col("t").as("label"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("p") === col("t"), 1L).otherwise(0L)).as("tp"))
    val byPred = base.groupBy(col("p").as("label"))
      .agg(count(lit(1)).as("predicted"))
    // Under Spark 4's default ANSI mode a 0/0 THROWS DIVIDE_BY_ZERO
    // instead of yielding null, so every division here runs only under
    // a guard whose CONDITION involves no division (CaseWhen evaluates
    // the matched branch only). The guards test the denominators
    // directly: `predicted`/`support` come from count aggregates (>= 1
    // or NULL after the outer join) today, but a zero-valued guard
    // expression would itself throw if this ever fed pre-aggregated
    // input with explicit zeros. tp > 0 implies both denominators
    // positive here, and then prec0, rec0 > 0 so the harmonic-mean
    // denominator is positive too; any zero/null denominator or tp = 0
    // (a never-correct class — routine in any real confusion) falls
    // through to the 0.0 the coalesce always intended.
    val prec0 = when(coalesce(col("predicted"), lit(0L)) > 0,
      col("tp") / col("predicted"))
    val rec0 = when(coalesce(col("support"), lit(0L)) > 0,
      col("tp") / col("support"))
    byTruth.join(byPred, Seq("label"), "full_outer")
      .select(
        col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        round(coalesce(prec0, lit(0.0)), 6).as("precision"),
        round(coalesce(rec0, lit(0.0)), 6).as("recall"),
        round(coalesce(
          when(coalesce(col("tp"), lit(0L)) > 0,
            lit(2.0) * prec0 * rec0 / (prec0 + rec0)),
          lit(0.0)), 6).as("f1"))
  }
}
