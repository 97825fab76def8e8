package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.ColumnShim

/** SQL-TEXT face for the transactional table — the statements a
  * Delta user types, dispatched onto the existing [[TxTable]] engine
  * paths (the reference drives everything through `spark.sql`,
  * `etl.py:284-324`; a Delta-shaped table whose DML is Scala-API-only
  * is API-complete but not user-complete):
  *
  * {{{
  * val sql = TxSql(spark)
  * sql.run("MERGE INTO txtable.`/data/t` AS t USING updates s " +
  *         "ON t.k = s.k " +
  *         "WHEN MATCHED AND s.ts > t.ts THEN UPDATE SET * " +
  *         "WHEN MATCHED AND s.op = 'D' THEN DELETE " +
  *         "WHEN NOT MATCHED THEN INSERT *")
  * sql.run("UPDATE tbl SET bal = bal + 10 WHERE k BETWEEN 5 AND 9")
  * sql.run("DELETE FROM tbl WHERE k % 7 = 0")
  * sql.run("DESCRIBE HISTORY tbl")
  * sql.run("OPTIMIZE tbl")
  * sql.run("VACUUM tbl RETAIN 3 VERSIONS")
  * }}}
  *
  * Statements are parsed by SPARK'S OWN PARSER (`parsePlan` yields
  * `MergeIntoTable` / `UpdateTable` / `DeleteFromTable` — full ANSI
  * grammar, quoting, expression syntax for free), then the parsed
  * pieces are translated onto `TxTable.merge` / `updateCore` /
  * `deleteCore`, so SQL text and the programmatic API run the SAME
  * commit machinery: stats-pruned rewrites, CHECK + generated-column
  * enforcement, optimistic retries. `DESCRIBE HISTORY` / `OPTIMIZE` /
  * `VACUUM … RETAIN n VERSIONS` are Delta grammar, not Spark's — a
  * regex layer routes them before the parser. Anything else falls
  * through to `spark.sql`, so this is a strict superset entry point.
  *
  * Table references resolve two ways, both Delta's shapes:
  * `txtable.`&#96;/path&#96;`` addresses a table by location;
  * a bare identifier looks up a catalog table created with
  * `CREATE TABLE t USING txtable LOCATION …` (the k25 face).
  *
  * DML statements return a ONE-ROW summary frame (commit version,
  * action, file counts) — the table itself is read back through any
  * of the read faces. Supported MERGE clauses mirror the engine's:
  * `UPDATE SET *`, `DELETE`, `INSERT *`, each at most once, with
  * arbitrary AND-ed conditions; SQL clause ORDER is honored (a row
  * matching an earlier DELETE clause is deleted even if a later
  * UPDATE clause also matches — expressed by conjoining the negation,
  * since the engine's fixed order evaluates UPDATE first).
  * Column-level `UPDATE SET c = …` inside MERGE and
  * `WHEN NOT MATCHED BY SOURCE` are refused loudly.
  *
  * Scale shape: zero new data-path code — every statement lands on
  * the same pruned rewrites the Scala API uses; the face itself is
  * driver-side parsing, O(statement length).
  */
final class TxSql(spark: SparkSession) {
  import TxSql._

  def run(sql: String): DataFrame = {
    val s = sql.trim.stripSuffix(";").trim
    s match {
      case DescribeHistoryRe(ident) => resolve(ident).history()
      case OptimizeRe(ident) =>
        val t = resolve(ident)
        t.compactBinPack() match {
          case Some(c) => summary(c)
          case None    => summary0()
        }
      case VacuumRe(ident, n) =>
        val t = resolve(ident)
        val head = t.snapshot().version
        val retain = math.max(0L, head - (n.toLong - 1))
        val names = t.vacuum(retain)
        val sq = spark; import sq.implicits._
        names.toDF("reclaimed_file")
      case _ =>
        spark.sessionState.sqlParser.parsePlan(s) match {
          case d: DeleteFromTable => runDelete(d)
          case u: UpdateTable     => runUpdate(u)
          case m: MergeIntoTable  => runMerge(m)
          case _                  => spark.sql(sql)
        }
    }
  }

  // ------------------------------------------------------------ DELETE
  private def runDelete(d: DeleteFromTable): DataFrame = {
    val (t, names) = target(d.table)
    val cond = unqualify(
      Option(d.condition).getOrElse(Literal(true)), names)
    summary(t.deleteCore(
      TxPredicates.bounds(cond), ColumnShim.column(cond), 20))
  }

  // ------------------------------------------------------------ UPDATE
  private def runUpdate(u: UpdateTable): DataFrame = {
    val (t, names) = target(u.table)
    val cond = unqualify(
      u.condition.getOrElse(Literal(true)), names)
    val set: Map[String, Column] = u.assignments.map { a =>
      val key = a.key match {
        case attr: UnresolvedAttribute => attr.nameParts.last
        case other => sys.error(
          s"UPDATE assignment key must be a column, got: ${other.sql}")
      }
      key -> ColumnShim.column(unqualify(a.value, names))
    }.toMap
    summary(t.updateCore(
      TxPredicates.bounds(cond), ColumnShim.column(cond), set, 20))
  }

  // ------------------------------------------------------------- MERGE
  private def runMerge(m: MergeIntoTable): DataFrame = {
    require(!m.withSchemaEvolution,
      "MERGE WITH SCHEMA EVOLUTION is not supported (the table's " +
        "schema is fixed by its files; use appendEvolve for evolution)")
    require(m.notMatchedBySourceActions.isEmpty,
      "WHEN NOT MATCHED BY SOURCE is not supported: target-only rows " +
        "are always carried unchanged")
    val (t, tnames) = target(m.targetTable)
    val (srcDf, snames) = source(m.sourceTable)

    // ON: every conjunct must be a target-column = source-column
    // equality on the SAME name — the engine's key contract (schemas
    // are identical by the merge guard). Arbitrary ON expressions
    // would need a different physical strategy; refuse loudly.
    val keys = conjuncts(m.mergeCondition).map { e =>
      def side(x: Expression): Option[(Boolean, String)] = x match {
        case a: UnresolvedAttribute if a.nameParts.size >= 2 =>
          val q = a.nameParts.dropRight(1).last.toLowerCase
          if (tnames.contains(q)) Some((true, a.nameParts.last))
          else if (snames.contains(q)) Some((false, a.nameParts.last))
          else None
        case _ => None
      }
      e match {
        case EqualTo(l, r) =>
          (side(l), side(r)) match {
            case (Some((true, a)), Some((false, b))) if a == b => a
            case (Some((false, a)), Some((true, b))) if a == b => a
            case _ => sys.error(
              s"MERGE ON condition must be AND-ed equalities of the " +
                s"form target.col = source.col (same column name, both " +
                s"sides alias-qualified); got: ${e.sql}")
          }
        case other => sys.error(
          s"MERGE ON condition must be AND-ed equalities; got: " +
            other.sql)
      }
    }

    def clause(c: Option[Expression]): Column =
      c.map(x => ColumnShim.column(remap(x, tnames, snames)))
        .getOrElse(lit(true))

    // WHEN MATCHED: at most one UPDATE SET * and one DELETE. SQL
    // evaluates clauses in ORDER; the engine evaluates UPDATE before
    // DELETE, so a DELETE clause appearing FIRST must shadow the
    // update — conjoin its negation.
    var upd: Option[Column] = None
    var del: Option[Column] = None
    var delBeforeUpd = false
    m.matchedActions.foreach {
      case UpdateStarAction(c) =>
        require(upd.isEmpty, "at most one WHEN MATCHED … UPDATE clause")
        upd = Some(clause(c))
        if (del.isDefined) delBeforeUpd = true
      case DeleteAction(c) =>
        require(del.isEmpty, "at most one WHEN MATCHED … DELETE clause")
        del = Some(clause(c))
      case _: UpdateAction => sys.error(
        "only UPDATE SET * is supported in MERGE (column-level SET " +
          "would need per-column carry logic the engine's rewrite " +
          "does not model); pre-shape the source instead")
      case other => sys.error(s"unsupported WHEN MATCHED action: $other")
    }
    val updAdjusted = (upd, del) match {
      case (Some(u), Some(d)) if delBeforeUpd =>
        Some(u && !org.apache.spark.sql.functions.coalesce(d, lit(false)))
      case _ => upd
    }
    var ins: Option[Column] = None
    m.notMatchedActions.foreach {
      case InsertStarAction(c) =>
        require(ins.isEmpty, "at most one WHEN NOT MATCHED clause")
        ins = Some(clause(c))
      case _: InsertAction => sys.error(
        "only INSERT * is supported in MERGE; pre-shape the source " +
          "to the table's schema instead")
      case other => sys.error(s"unsupported WHEN NOT MATCHED action: $other")
    }
    summary(t.merge(srcDf, keys, updAdjusted, del, ins))
  }

  // ------------------------------------------------- reference helpers
  /** Unwrap a DML target to its TxTable plus the lowercase names
    * (alias and table identifier tail) its columns may be qualified
    * with. */
  private def target(p: LogicalPlan): (TxTable, Set[String]) = p match {
    case SubqueryAlias(id, child) =>
      val (t, names) = target(child)
      (t, names + id.name.toLowerCase)
    case r: UnresolvedRelation =>
      (resolveParts(r.multipartIdentifier),
        Set(r.multipartIdentifier.last.toLowerCase))
    case other => sys.error(
      "DML target must be a plain table reference, got: " +
        other.nodeName)
  }

  /** Resolve a MERGE source — a table/view reference or an arbitrary
    * subquery — to a DataFrame plus its qualifier names. A
    * `txtable.`&#96;path&#96; source short-circuits to the table's own
    * read (the catalog would otherwise look for a database named
    * txtable). */
  private def source(p: LogicalPlan): (DataFrame, Set[String]) = p match {
    case SubqueryAlias(id, child) =>
      val (df, names) = source(child)
      (df, names + id.name.toLowerCase)
    case r: UnresolvedRelation
        if r.multipartIdentifier.size == 2 &&
          r.multipartIdentifier.head.equalsIgnoreCase("txtable") =>
      (TxTable(spark, r.multipartIdentifier.last).read(),
        Set(r.multipartIdentifier.last.toLowerCase))
    case r: UnresolvedRelation =>
      (ColumnShim.ofRows(spark, r),
        Set(r.multipartIdentifier.last.toLowerCase))
    case other => (ColumnShim.ofRows(spark, other), Set.empty)
  }

  /** A bare or qualified identifier string → TxTable. */
  private def resolve(ident: String): TxTable =
    resolveParts(
      spark.sessionState.sqlParser.parseMultipartIdentifier(ident.trim))

  private def resolveParts(parts: Seq[String]): TxTable = parts match {
    case Seq(p, path) if p.equalsIgnoreCase("txtable") =>
      TxTable(spark, path)
    case _ =>
      val id = parts match {
        case Seq(t0)     => TableIdentifier(t0)
        case Seq(db, t0) => TableIdentifier(t0, Some(db))
        case _ => sys.error(
          s"cannot resolve table ${parts.mkString(".")}: use " +
            "txtable.`/path` or a catalog table name")
      }
      val meta = spark.sessionState.catalog.getTableMetadata(id)
      require(meta.provider.exists(_.equalsIgnoreCase("txtable")),
        s"${parts.mkString(".")} is not a txtable table (provider: " +
          s"${meta.provider.getOrElse("none")})")
      val path = meta.storage.properties
        .map { case (k, v) => k.toLowerCase -> v }.get("path")
        .orElse(meta.storage.locationUri.map(_.getPath))
        .getOrElse(sys.error(
          s"${parts.mkString(".")} has neither a path option nor a " +
            "location"))
      TxTable(spark, path)
  }

  /** Strip qualifiers that name the statement's own table/alias so
    * predicates and assignment values resolve against the bare-column
    * rewrite frames (`WHERE t.k = 5` ≡ `WHERE k = 5`). */
  private def unqualify(e: Expression, names: Set[String]): Expression =
    e.transform {
      case a: UnresolvedAttribute
          if a.nameParts.size >= 2 &&
            names.contains(a.nameParts.dropRight(1).last.toLowerCase) =>
        UnresolvedAttribute(Seq(a.nameParts.last))
    }

  /** Requalify clause-condition attributes onto the engine's merge
    * aliases: target-qualified → `t.col`, source-qualified → `s.col`,
    * bare names left for the analyzer (unique across the join or a
    * loud ambiguity error — never a silent wrong side). */
  private def remap(e: Expression, tnames: Set[String],
      snames: Set[String]): Expression =
    e.transform {
      case a: UnresolvedAttribute if a.nameParts.size >= 2 =>
        val q = a.nameParts.dropRight(1).last.toLowerCase
        if (tnames.contains(q)) UnresolvedAttribute(Seq("t", a.nameParts.last))
        else if (snames.contains(q))
          UnresolvedAttribute(Seq("s", a.nameParts.last))
        else a
    }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  private def summary(c: TxTable.Commit): DataFrame = {
    val sq = spark; import sq.implicits._
    Seq((c.version, c.action, c.add.size.toLong, c.remove.size.toLong))
      .toDF("version", "action", "files_added", "files_removed")
  }

  private def summary0(): DataFrame = {
    val sq = spark; import sq.implicits._
    Seq.empty[(Long, String, Long, Long)]
      .toDF("version", "action", "files_added", "files_removed")
  }
}

object TxSql {
  def apply(spark: SparkSession): TxSql = new TxSql(spark)

  // Delta-grammar statements Spark's parser does not know — routed by
  // regex BEFORE parsePlan. Identifiers may be quoted/qualified; the
  // captured text goes through parseMultipartIdentifier.
  private val DescribeHistoryRe =
    """(?is)DESCRIBE\s+HISTORY\s+(.+)""".r
  private val OptimizeRe = """(?is)OPTIMIZE\s+([^\s]+)""".r
  private val VacuumRe =
    """(?is)VACUUM\s+([^\s]+)\s+RETAIN\s+(\d+)\s+VERSIONS""".r
}
