package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Optimizer rule (injected via SparkSessionExtensions): any filter of
  * the Jaccard-threshold shape
  *
  *   size(array_intersect(a,b)) / size(array_union(a,b)) >= t
  *
  * gets a strictly-implied cheap conjunct prepended:
  *
  *   least(size(a), size(b)) / greatest(size(a), size(b)) >= t
  *
  * Soundness: |A∩B| ≤ min(|A|,|B|) and |A∪B| ≥ max(|A|,|B|), so
  * jaccard ≤ min/max — a pair failing the size ratio can never pass the
  * threshold. The expensive intersect/union then evaluates only on
  * survivors (conjuncts evaluate left-to-right), typically pruning the
  * bulk of a near-dup candidate join's pairs. Users who write the
  * naive predicate get the optimization for free — the same contract
  * as Catalyst's own InferFiltersFromConstraints.
  *
  * Idempotent: skips filters that already contain a least/greatest
  * size-ratio conjunct over the same arrays (safe under the
  * optimizer's fixpoint iteration).
  */
object JaccardPruneRule extends Rule[LogicalPlan] {

  private def sizeOf(e: Expression): Expression = Size(e, legacySizeOfNull = false)

  private object JaccardGte {
    /** Matches jaccard(a,b) >= t (with optional casts around sizes). */
    def unapply(e: Expression): Option[(Expression, Expression, Expression)] =
      e match {
        case GreaterThanOrEqual(
            Divide(CastedSize(ArrayIntersect(a1, b1)),
              CastedSize(ArrayUnion(a2, b2)), _),
            t @ Literal(_, DoubleType))
          if a1.semanticEquals(a2) && b1.semanticEquals(b2) =>
          Some((a1, b1, t))
        case _ => None
      }
  }

  private object CastedSize {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(Size(c, _), _, _, _) => Some(c)
      case Size(c, _) => Some(c)
      case _ => None
    }
  }

  private def hasPrune(cond: Expression, a: Expression,
                       b: Expression): Boolean =
    cond.exists {
      case GreaterThanOrEqual(
          Divide(Cast(Least(Seq(Size(x, _), Size(y, _))), _, _, _),
            Cast(Greatest(Seq(Size(_, _), Size(_, _))), _, _, _), _), _) =>
        x.semanticEquals(a) && y.semanticEquals(b)
      case _ => false
    }

  private def pruneFor(a: Expression, b: Expression,
                       t: Expression): Expression =
    GreaterThanOrEqual(
      Divide(
        Cast(Least(Seq(sizeOf(a), sizeOf(b))), DoubleType),
        Cast(Greatest(Seq(sizeOf(a), sizeOf(b))), DoubleType)),
      t)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val targets = scala.collection.mutable.ArrayBuffer
        .empty[(Expression, Expression, Expression)]
      cond.foreach {
        case JaccardGte(a, b, t) if !hasPrune(cond, a, b) =>
          targets += ((a, b, t))
        case _ => ()
      }
      if (targets.isEmpty) f
      else {
        val prunes = targets.map { case (a, b, t) => pruneFor(a, b, t) }
          .reduce[Expression](And)
        Filter(And(prunes, cond), child)
      }
  }
}
