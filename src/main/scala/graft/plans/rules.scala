package graft.plans

import graft.functions.{EuclideanDistance, SquaredDistance}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite threshold comparisons on Euclidean distance to
  * squared distance — `euclidean(a,b) <= r` becomes `sqdist(a,b) <= r*r`
  * — removing a `sqrt` per candidate pair in radius-search / near-dup
  * filters. Sound because sqrt is monotone and both sides are
  * non-negative; applied only for non-negative literal thresholds and
  * only inside Filter conditions (a projected euclidean value keeps its
  * sqrt).
  *
  * Registered through [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) — the engine's demonstration that custom
  * rewrites ride the normal Catalyst optimization pipeline.
  */
object EuclideanThresholdToSqdist extends Rule[LogicalPlan] {

  private def lit(v: Any): Option[Double] = v match {
    case d: Double => Some(d)
    case f: Float => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case d: java.math.BigDecimal => Some(d.doubleValue())
    case _ => None
  }

  private def sq(r: Double): Expression = Literal(r * r)

  private val rewrite: PartialFunction[Expression, Expression] = {
    case LessThan(EuclideanDistance(a, b), Literal(v, _)) if lit(v).exists(_ >= 0) =>
      LessThan(SquaredDistance(a, b), sq(lit(v).get))
    case LessThanOrEqual(EuclideanDistance(a, b), Literal(v, _)) if lit(v).exists(_ >= 0) =>
      LessThanOrEqual(SquaredDistance(a, b), sq(lit(v).get))
    case GreaterThan(EuclideanDistance(a, b), Literal(v, _)) if lit(v).exists(_ >= 0) =>
      GreaterThan(SquaredDistance(a, b), sq(lit(v).get))
    case GreaterThanOrEqual(EuclideanDistance(a, b), Literal(v, _)) if lit(v).exists(_ >= 0) =>
      GreaterThanOrEqual(SquaredDistance(a, b), sq(lit(v).get))
    case LessThan(Literal(v, _), EuclideanDistance(a, b)) if lit(v).exists(_ >= 0) =>
      LessThan(sq(lit(v).get), SquaredDistance(a, b))
    case LessThanOrEqual(Literal(v, _), EuclideanDistance(a, b)) if lit(v).exists(_ >= 0) =>
      LessThanOrEqual(sq(lit(v).get), SquaredDistance(a, b))
    case GreaterThan(Literal(v, _), EuclideanDistance(a, b)) if lit(v).exists(_ >= 0) =>
      GreaterThan(sq(lit(v).get), SquaredDistance(a, b))
    case GreaterThanOrEqual(Literal(v, _), EuclideanDistance(a, b)) if lit(v).exists(_ >= 0) =>
      GreaterThanOrEqual(sq(lit(v).get), SquaredDistance(a, b))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val newCond = cond.transform(rewrite)
      if (newCond fastEquals cond) f else Filter(newCond, child)
    case j: Join if j.condition.isDefined =>
      // predicate pushdown moves threshold filters into join conditions
      val newCond = j.condition.get.transform(rewrite)
      if (newCond fastEquals j.condition.get) j else j.copy(condition = Some(newCond))
  }
}
