package graft.ops

import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._

/** Conservative per-column bounds implied by a SQL predicate — the
  * bridge between an arbitrary `WHERE` clause and the commit log's
  * min/max file skipping ([[TxTable.pruneFiles]]).
  *
  * Only TOP-LEVEL CONJUNCTS contribute: `a = 5 AND ts >= 10` yields a
  * point bound on `a` and a lower bound on `ts`; anything the walk
  * does not recognize (disjunctions, negations, function calls, IN
  * lists, subqueries) contributes NO bound — which is always safe,
  * because a missing bound merely keeps more candidate files and the
  * caller re-applies the exact predicate. Returned triples may repeat
  * a column; `pruneFiles` intersects per-bound candidate sets, so
  * repetition composes instead of needing interval arithmetic here.
  *
  * Works on UNRESOLVED expressions (straight out of the parser): the
  * pruning decision needs only attribute NAMES and literal values, so
  * resolution — and the exact-filter application — stays with the
  * rewrite job. Qualified attributes (`t.k`) are skipped: pruning
  * keys must be bare table columns.
  */
object TxPredicates {

  type Bound = (String, Option[Any], Option[Any])

  def bounds(e: Expression): Seq[Bound] = e match {
    case And(l, r) => bounds(l) ++ bounds(r)
    case EqualTo(a, v) =>
      point(a, v).toSeq ++ point(v, a).toSeq
    case GreaterThan(a, v) =>
      lower(a, v).toSeq ++ upper(v, a).toSeq
    case GreaterThanOrEqual(a, v) =>
      lower(a, v).toSeq ++ upper(v, a).toSeq
    case LessThan(a, v) =>
      upper(a, v).toSeq ++ lower(v, a).toSeq
    case LessThanOrEqual(a, v) =>
      upper(a, v).toSeq ++ lower(v, a).toSeq
    // the parser renders `x BETWEEN lo AND hi` as an unresolved call
    // to the builtin `between`
    case f: UnresolvedFunction
        if f.nameParts.map(_.toLowerCase) == Seq("between") &&
          f.arguments.size == 3 =>
      (for {
        c <- name(f.arguments.head)
        lo <- value(f.arguments(1))
        hi <- value(f.arguments(2))
      } yield (c, Some(lo), Some(hi))).toSeq
    case _ => Nil
  }

  /** `a` is a bare column and `v` a literal → a point bound. Strict
    * comparisons reuse their inclusive envelope: pruning is candidate
    * SELECTION, the exact predicate re-applies downstream. */
  private def point(a: Expression, v: Expression): Option[Bound] =
    for { c <- name(a); w <- value(v) } yield (c, Some(w), Some(w))

  private def lower(a: Expression, v: Expression): Option[Bound] =
    for { c <- name(a); w <- value(v) } yield (c, Some(w), None)

  private def upper(a: Expression, v: Expression): Option[Bound] =
    for { c <- name(a); w <- value(v) } yield (c, None, Some(w))

  private def name(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.size == 1 =>
      Some(a.nameParts.head)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Literal → external Scala value (UTF8String → String, Decimal →
    * BigDecimal, …), the forms [[TxTable.mayOverlap]] and the bloom
    * probes understand. A NULL literal yields no bound — `col = NULL`
    * matches nothing, and pruning to nothing is the exact filter's
    * job, not ours. */
  private def value(e: Expression): Option[Any] = e match {
    case Literal(null, _) => None
    case Literal(v, dt) =>
      Option(CatalystTypeConverters.convertToScala(v, dt))
    case _ => None
  }

  /** If `e` is a recognized MONOTONE NON-DECREASING function of
    * exactly one bare column, that column — the test that lets a
    * bound on a base column propagate to a generated column
    * (`event_date = to_date(ts)`: `ts ∈ [a, b]` implies
    * `event_date ∈ [f(a), f(b)]`, which is what makes
    * `WHERE ts BETWEEN …` prune partitions keyed on the DERIVED
    * date). The shape whitelist is deliberately conservative — a
    * non-monotone function admitted here (month-of-year, hash) would
    * prune files that hold matching rows, i.e. wrong answers; an
    * unrecognized monotone shape merely skips the derivation:
    *
    *  - the column itself; `+`/`-` a literal; `*`/`/`/`DIV` by a
    *    POSITIVE literal (attribute side only for `-` and `/`);
    *  - temporal truncations: `year`, `to_date`, `date`,
    *    `date_trunc(unit, x)`, `trunc(x, unit)`, `unix_timestamp(x)`;
    *  - `floor`/`ceil`; `substring(x, 1, n)` (string prefix order);
    *  - CAST to a temporal type (any source orders consistently), and
    *    CAST to a numeric type only over an arithmetic/function child
    *    (a numeric cast of a raw column could be a string column,
    *    where numeric order diverges from string order). */
  def monotoneBase(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.size == 1 =>
      Some(a.nameParts.head)
    case c: Cast => c.dataType match {
      case org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampType =>
        monotoneBase(c.child)
      case _: org.apache.spark.sql.types.NumericType => c.child match {
        case _: UnresolvedAttribute => None
        case ch => monotoneBase(ch)
      }
      case _ => None
    }
    case f: UnresolvedFunction =>
      (f.nameParts.last.toLowerCase, f.arguments) match {
        case ("year" | "to_date" | "date" | "floor" | "ceil" |
              "ceiling" | "unix_timestamp", Seq(x)) => monotoneBase(x)
        case ("date_trunc", Seq(Literal(_, _), x)) => monotoneBase(x)
        case ("trunc", Seq(x, Literal(_, _))) => monotoneBase(x)
        case ("substring" | "substr", Seq(x, Literal(s, _), _))
            if s == 1 => monotoneBase(x)
        case _ => None
      }
    case Add(l, r, _) =>
      if (isLit(r)) monotoneBase(l)
      else if (isLit(l)) monotoneBase(r) else None
    case Subtract(l, r, _) if isLit(r) => monotoneBase(l)
    case Multiply(l, r, _) =>
      if (posLit(r)) monotoneBase(l)
      else if (posLit(l)) monotoneBase(r) else None
    case Divide(l, r, _) if posLit(r) => monotoneBase(l)
    case IntegralDivide(l, r, _) if posLit(r) => monotoneBase(l)
    case _ => None
  }

  private def isLit(e: Expression): Boolean = e match {
    case Literal(v, _) => v != null
    case _ => false
  }

  private def posLit(e: Expression): Boolean = e match {
    case Literal(v, _) if v != null =>
      try BigDecimal(v.toString) > 0 catch { case NonFatal(_) => false }
    case _ => false
  }
}
