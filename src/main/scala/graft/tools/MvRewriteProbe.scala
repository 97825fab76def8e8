package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.ops.{MaterializedView, TxTable}

/** MV QUERY-REWRITE probe (r16 "What's missing #5", scoping only): can
  * a Catalyst rule route `SELECT g, COUNT(*), SUM(v) FROM base GROUP
  * BY g` onto a matching, CURRENT materialized view — conservatively
  * and cheaply enough to sit in the optimizer for every query?
  *
  * The experimental rule's match ladder, cheapest test first:
  *  1. the Aggregate's child is a parquet `LogicalRelation` whose
  *     location roots sit under the MV's base directory (string
  *     prefix — rejects every unrelated query for the cost of one
  *     comparison);
  *  2. the grouped columns and aggregate functions are exactly a
  *     subset of what the MV maintains (COUNT(*) → n_rows,
  *     SUM(col) → col_sum);
  *  3. FRESHNESS: the scan's file set equals the base snapshot the
  *     MV's applied watermark names — a stale MV or a time-travel
  *     read fails this set compare and the query keeps its base plan
  *     (correctness never depends on the rewrite firing).
  * On a match the Aggregate is replaced by a Project over the MV's
  * read, each output re-aliased under the ORIGINAL exprIds.
  *
  * Measured (this box, N=4M rows, G=2000 groups — see SCALE.md):
  * the rewrite answers the aggregate from |G| MV rows instead of N
  * base rows, and the non-matching overhead is one string compare per
  * Aggregate node. The probe also pins the two safety cases: a STALE
  * MV (base appended after refresh) does NOT rewrite, and results are
  * row-identical when it does.
  *
  * Run: `sbt "runMain graft.tools.MvRewriteProbe [N] [G]"`.
  */
object MvRewriteProbe {

  /** The experiment's rule: rewrite a matching grouped aggregate onto
    * the MV table. `baseDir` anchors the cheap prefix test;
    * `validFiles` is the exact file set the MV state covers;
    * `mvPlan`/`mvCols` the replacement. */
  final class RewriteOntoMv(
      baseDir: String,
      validFiles: () => Set[String],
      mvPlan: () => LogicalPlan,
      groupCol: String,
      sumCols: Set[String]) extends Rule[LogicalPlan] {

    /** Cheap test 1: a parquet scan rooted under the MV's base —
      * seen through the column-pruning Project the optimizer inserts
      * (attribute-only, so it cannot change row content). */
    private def baseScanFiles(p: LogicalPlan): Option[Set[String]] =
      p match {
        case Project(pl, child)
            if pl.forall(_.isInstanceOf[AttributeReference]) =>
          baseScanFiles(child)
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation
              if h.location.rootPaths.nonEmpty &&
                h.location.rootPaths.forall(
                  _.toString.stripPrefix("file:").startsWith(baseDir)) =>
            Some(h.location.inputFiles
              .map(_.stripPrefix("file:")).toSet)
          case _ => None
        }
        case _ => None
      }

    /** Test 2: every output answerable from the MV state; returns the
      * MV column name per output. */
    private def mvNameFor(e: org.apache.spark.sql.catalyst.expressions
        .NamedExpression): Option[String] = e match {
      case a: AttributeReference if a.name == groupCol => Some(groupCol)
      case al: Alias => al.child match {
        case AggregateExpression(Count(Seq(Literal(_, _))), _, false, None, _) =>
          Some(MaterializedView.NRows)
        case AggregateExpression(Sum(c: AttributeReference, _), _, false, None, _)
            if sumCols.contains(c.name) => Some(c.name + "_sum")
        case _ => None
      }
      case _ => None
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
      case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
          if g.name == groupCol && baseScanFiles(child).isDefined =>
        val scan = baseScanFiles(child).get
        val names = aggExprs.map(mvNameFor)
        // test 3 (freshness) runs LAST — it is the expensive one
        if (names.forall(_.isDefined) && scan == validFiles()) {
          val mv = mvPlan()
          val byName: Map[String, Attribute] =
            mv.output.map(a => a.name -> a).toMap
          Project(
            agg.output.zip(names.map(_.get)).map { case (o, n) =>
              val src = byName(n)
              val e = if (src.dataType == o.dataType) src
                else Cast(src, o.dataType)
              Alias(e, o.name)(exprId = o.exprId)
            }, mv)
        } else agg
    }
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 4000000
    val g = if (args.length > 1) args(1).toInt else 2000
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-mv-rewrite-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("graft-mvrw-").toString
    val base = TxTable(spark, s"$dir/base")
    base.append(spark.range(n.toLong)
      .select(col("id"), (col("id") % g).as("grp"),
        (col("id") % 1000).cast("double").as("v")).toDF())
    val mv = MaterializedView(spark, base, s"$dir/mv",
      Seq("grp"), Seq("v"))
    mv.refresh()

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def classic(df: org.apache.spark.sql.DataFrame) =
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]

    def query() = base.read().groupBy("grp")
      .agg(count(lit(1)).as("c"), sum(col("v")).as("s"))

    // direct plan, no rule
    def run(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val (direct, tDirect) = time(run(query()))

    // install the rule: freshness = the file set of the base snapshot
    // at the MV's applied watermark
    val validFiles = () => {
      val v = mv.appliedVersion
      base.readAt(v).inputFiles.map(_.stripPrefix("file:")).toSet
    }
    val rule = new RewriteOntoMv(s"$dir/base", validFiles,
      () => classic(mv.read()).queryExecution.analyzed,
      "grp", Set("v"))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ rule

    // sanity: the rewrite FIRES (the scan reads the MV dir) and matches
    val q2 = query()
    val fired = q2.inputFiles.exists(_.contains(s"$dir/mv"))
    val (viaMv, tMv) = time(run(q2))
    println(f"[mv-rewrite] n=$n g=$g fired=$fired equal=${direct == viaMv} " +
      f"direct_s=$tDirect%.3f mv_s=$tMv%.3f speedup=${tDirect / tMv}%.1fx")

    // STALENESS: append after the refresh — the rule must NOT fire,
    // and the answer must include the new rows
    base.append(spark.range(n.toLong, n.toLong + 1000)
      .select(col("id"), (col("id") % g).as("grp"),
        (col("id") % 1000).cast("double").as("v")).toDF())
    val q3 = query()
    val staleFired = q3.inputFiles.exists(_.contains(s"$dir/mv"))
    val staleCount = q3.agg(sum(col("c"))).head().getLong(0)
    println(f"[mv-rewrite] stale_fired=$staleFired (must be false) " +
      f"rows_counted=$staleCount (must be ${n + 1000})")

    // MATCH-DETECTION OVERHEAD on non-matching plans: optimize 200
    // unrelated aggregates with and without the rule installed
    def optimizeMany(): Double = {
      val (_, t) = time {
        (0 until 200).foreach { i =>
          classic(spark.range(1000 + i)
            .groupBy((col("id") % 7).as("k"))
            .agg(count(lit(1)).as("c")).toDF())
            .queryExecution.optimizedPlan
          ()
        }
      }
      t
    }
    // alternating min-of-2 per variant: a single ordered pass charges
    // whichever runs first with JIT warm-up
    def dropRule(): Unit =
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
    def addRule(): Unit =
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
    val w1 = optimizeMany()
    dropRule()
    val o1 = optimizeMany()
    addRule()
    val w2 = optimizeMany()
    dropRule()
    val o2 = optimizeMany()
    val withRule = math.min(w1, w2)
    val withoutRule = math.min(o1, o2)
    println(f"[mv-rewrite] optimize_200_nonmatching with_rule=$withRule%.3fs " +
      f"without=$withoutRule%.3fs overhead=${(withRule - withoutRule) * 1000 / 200}%.3f ms/query")

    spark.stop()
  }
}
