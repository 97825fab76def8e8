package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Abs, And, Expression, GreaterThanOrEqual, LessThan, LessThanOrEqual, Length, Levenshtein, Literal, Subtract}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: cheap length pre-pruning for edit-distance filters.
  *
  * `levenshtein(a, b) <= k` implies `abs(length(a) - length(b)) <= k`
  * (each edit changes the length by at most one), so the O(|a|·|b|)
  * dynamic program only needs to run on pairs that pass an O(1) length
  * check. In a blocked fuzzy self-join the quadratic candidate set hits
  * this filter before anything else — at corpus scale the length test
  * eliminates most pairs for pennies.
  *
  * The conjunct is ADDED, never substituted, so semantics are identical
  * by construction (X → X ∧ weaker-consequence). Guarded on
  * `maxDistance >= 0` literals; the marker prevents re-adding on later
  * optimizer passes (rules run to fixpoint).
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule` — the
  * pattern for whole-plan rewrites the expression/aggregate surface
  * can't express.
  */
object LevenshteinPruning extends Rule[LogicalPlan] {

  private def lengthGuard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def alreadyGuarded(cond: Expression, a: Expression, b: Expression): Boolean =
    cond.exists {
      case LessThanOrEqual(Abs(Subtract(Length(x), Length(y), _), _), _) =>
        (x.semanticEquals(a) && y.semanticEquals(b)) ||
          (x.semanticEquals(b) && y.semanticEquals(a))
      case _ => false
    }

  private def nonNegativeLit(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v >= 0
    case _ => false
  }

  private def splitConjuncts(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** The guards implied by every thresholded-Levenshtein TOP-LEVEL
    * conjunct of `cond` that is not guarded yet.
    *
    * Only top-level conjuncts may contribute: a threshold inside a
    * disjunction (`levenshtein(a,b) <= 2 OR c = 1`) does NOT imply the
    * length bound for the whole predicate — rows can satisfy the other
    * disjunct alone, so AND-ing the guard there would drop them. */
  private def impliedGuards(cond: Expression): Seq[Expression] = {
    val conjuncts = splitConjuncts(cond)
    conjuncts.collect {
      case LessThanOrEqual(lev @ Levenshtein(a, b, None), k)
          if nonNegativeLit(k) && !alreadyGuarded(cond, a, b) &&
            lev.deterministic =>
        lengthGuard(a, b, k)
      case LessThan(lev @ Levenshtein(a, b, None), k)
          if nonNegativeLit(k) && !alreadyGuarded(cond, a, b) &&
            lev.deterministic =>
        lengthGuard(a, b, k)
      case GreaterThanOrEqual(k, lev @ Levenshtein(a, b, None))
          if nonNegativeLit(k) && !alreadyGuarded(cond, a, b) &&
            lev.deterministic =>
        lengthGuard(a, b, k)
    }.distinct
  }

  private def guard(cond: Expression): Expression =
    // And(guard, cond): conjuncts evaluate left-to-right, so the O(1)
    // length test short-circuits ahead of the O(n·m) edit distance
    impliedGuards(cond).foldLeft(cond)((c, g) => And(g, c))

  /** Both shapes matter: a standalone Filter, and a Join whose condition
    * absorbed the predicate via PushPredicateThroughJoin (the blocked
    * fuzzy self-join plans this way — the experimental-rules batch runs
    * after predicate pushdown). */
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val g = guard(cond)
      if (g.fastEquals(cond)) f else Filter(g, child)
    case j @ Join(_, _, _, Some(cond), _) =>
      val g = guard(cond)
      if (g.fastEquals(cond)) j else j.copy(condition = Some(g))
  }
}
