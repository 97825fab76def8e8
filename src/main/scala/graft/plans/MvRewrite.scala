package graft.plans

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.ops.{MaterializedView, TxTable}

/** TRANSPARENT materialized-view query rewrite — the real lakehouse MV
  * value (a view nobody queries directly is just a cache): a grouped
  * aggregate over a base table whose CURRENT state a registered MV
  * already holds is answered from the MV's O(groups) rows instead of
  * the base scan.
  *
  * Conservatism ladder (cheapest test first; ANY doubt keeps the base
  * plan — correctness never depends on the rewrite firing, it can only
  * skip an optimization; measured in `tools.MvRewriteProbe` at under a
  * millisecond of detection on non-matching plans):
  *  1. registry non-empty and the Aggregate's child — seen through the
  *     attribute-only Project column pruning inserts — is a parquet
  *     scan whose location roots sit under a registered base dir;
  *  2. the grouping is EXACTLY the MV's group columns (set equality;
  *     a coarser rollup is derivable from the MV but is v2 scope) and
  *     every aggregate output maps onto maintained state: COUNT(*) →
  *     n_rows, SUM(c) → c_sum, MIN(c) → c_min, MAX(c) → c_max,
  *     AVG(c) → c_avg — DISTINCT or unmapped aggregates refuse;
  *  3. FRESHNESS last (it costs a log probe): the scan's file set
  *     equals the base snapshot at the MV's applied watermark, so a
  *     stale MV or a time-travel read keeps its base plan.
  * On a match the Aggregate becomes a Project over the MV's read,
  * re-aliased under the ORIGINAL exprIds (cast where the aggregate's
  * result type differs from the stored state, e.g. DuckDB-parity
  * decimal sums are out of scope — the Cast is exact for the
  * long/double states the engine maintains).
  *
  * Scale shape: the win is O(base) → O(groups) on every routed query —
  * unbounded at 100 TB — for a per-query detection cost of one string
  * compare on non-candidates and one bounded log probe on candidates.
  *
  * Registration: `CREATE MATERIALIZED VIEW` and `REFRESH MATERIALIZED
  * VIEW` register on the session automatically; [[MvRegistry.register]]
  * re-arms a view created elsewhere from its persisted definition
  * properties. Kill switch: `spark.graft.mv.rewrite=false`.
  */
object MvRegistry {

  /** One registered view: where it lives, what it covers. */
  final case class Entry(mvDir: String, baseDir: String,
      groupCols: Seq[String], sumCols: Set[String], minCols: Set[String],
      maxCols: Set[String], avgCols: Set[String])

  // session -> (mvDir -> entry); weak keys so a dropped session's
  // registrations do not outlive it
  private val bySession =
    new java.util.WeakHashMap[SparkSession, Map[String, Entry]]()

  def register(spark: SparkSession, mvDir: String): Unit = {
    val t = TxTable(spark, mvDir)
    def csv(k: String): Seq[String] = t.property(k).toSeq
      .flatMap(_.split(",")).filter(_.nonEmpty)
    t.property("txtable.mv.base").foreach { baseDir =>
      val e = Entry(mvDir, baseDir, csv("txtable.mv.groupBy"),
        csv("txtable.mv.sums").toSet, csv("txtable.mv.mins").toSet,
        csv("txtable.mv.maxs").toSet, csv("txtable.mv.avgs").toSet)
      bySession.synchronized {
        val cur = Option(bySession.get(spark)).getOrElse(Map.empty)
        bySession.put(spark, cur + (mvDir -> e))
        ()
      }
    }
  }

  def unregister(spark: SparkSession, mvDir: String): Unit =
    bySession.synchronized {
      Option(bySession.get(spark)).foreach { cur =>
        bySession.put(spark, cur - mvDir)
        ()
      }
    }

  private[plans] def entries(spark: SparkSession): Seq[Entry] =
    bySession.synchronized {
      Option(bySession.get(spark)).map(_.values.toSeq).getOrElse(Nil)
    }
}

final class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.get("spark.graft.mv.rewrite", "true") == "true"

  /** The scan's file set when the plan is a parquet relation (under
    * attribute-only Projects) rooted under `baseDir`. */
  private def baseScanFiles(p: LogicalPlan, baseDir: String)
      : Option[Set[String]] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      baseScanFiles(child, baseDir)
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation
          if h.location.rootPaths.nonEmpty &&
            h.location.rootPaths.forall(
              _.toString.stripPrefix("file:").startsWith(baseDir)) =>
        Some(h.location.inputFiles.map(_.stripPrefix("file:")).toSet)
      case _ => None
    }
    case _ => None
  }

  /** The maintained MV column answering `e`, or None. */
  private def mvNameFor(e: NamedExpression,
      m: MvRegistry.Entry): Option[String] = e match {
    case a: AttributeReference if m.groupCols.contains(a.name) =>
      Some(a.name)
    case al: Alias => al.child match {
      case AggregateExpression(c: Count, _, false, None, _)
          if c.children.forall {
            case Literal(v, _) => v != null
            case _ => false
          } => Some(MaterializedView.NRows)
      case AggregateExpression(Sum(c: AttributeReference, _), _, false, None, _)
          if m.sumCols.contains(c.name) => Some(c.name + "_sum")
      case AggregateExpression(Min(c: AttributeReference), _, false, None, _)
          if m.minCols.contains(c.name) => Some(c.name + "_min")
      case AggregateExpression(Max(c: AttributeReference), _, false, None, _)
          if m.maxCols.contains(c.name) => Some(c.name + "_max")
      case AggregateExpression(Average(c: AttributeReference, _), _, false, None, _)
          if m.avgCols.contains(c.name) => Some(c.name + "_avg")
      case _ => None
    }
    case _ => None
  }

  /** Freshness + replacement plan, or None (any failure — a deleted MV
    * dir, a log fault — refuses the rewrite rather than the query). */
  private def freshMvPlan(m: MvRegistry.Entry, scan: Set[String])
      : Option[LogicalPlan] =
    try {
      val base = TxTable(spark, m.baseDir)
      val applied = MaterializedView(spark, base, m.mvDir,
        m.groupCols, m.sumCols.toSeq, m.minCols.toSeq, m.maxCols.toSeq,
        m.avgCols.toSeq).appliedVersion
      if (applied < 0) None
      else {
        val valid = base.readAt(applied).inputFiles
          .map(_.stripPrefix("file:")).toSet
        if (scan != valid) None
        // the STORED view table: every derived column (avg, moments) is
        // physically materialized by the refresh, and the backing
        // columns it additionally carries are harmless — the Project
        // below selects only the mapped ones
        else Some(TxTable(spark, m.mvDir).read()
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.analyzed)
      }
    } catch { case NonFatal(_) => None }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvs = MvRegistry.entries(spark)
    if (mvs.isEmpty || !enabled) plan
    else plan transform {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        val groupNames = groupExprs.map {
          case a: AttributeReference => Some(a.name)
          case _ => None
        }
        val candidate = mvs.find { m =>
          groupNames.forall(_.isDefined) &&
            groupNames.flatten.toSet == m.groupCols.toSet &&
            groupNames.flatten.size == m.groupCols.size &&
            baseScanFiles(child, m.baseDir).isDefined &&
            aggExprs.forall(e => mvNameFor(e, m).isDefined)
        }
        candidate.flatMap { m =>
          freshMvPlan(m, baseScanFiles(child, m.baseDir).get).map { mvPlan =>
            val byName: Map[String, Attribute] =
              mvPlan.output.map(a => a.name -> a).toMap
            Project(
              agg.output.zip(aggExprs.map(e => mvNameFor(e, m).get))
                .map { case (o, n) =>
                  val src = byName(n)
                  val e: Expression =
                    if (src.dataType == o.dataType) src
                    else Cast(src, o.dataType)
                  Alias(e, o.name)(exprId = o.exprId)
                }, mvPlan)
          }
        }.getOrElse(agg)
    }
  }
}
