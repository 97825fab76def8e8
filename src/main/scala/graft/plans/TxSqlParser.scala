package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, MergeIntoTable, UpdateTable}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StructType}

import graft.ops.TxSql

/** Parser injection that makes PLAIN `spark.sql(…)` speak the
  * transactional table's DML/DDL dialect — the last step from
  * "SQL face exists" to "a Delta user's code runs unchanged":
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *   …
  * spark.sql("MERGE INTO txtable.`/data/t` t USING u s ON t.k = s.k " +
  *           "WHEN MATCHED THEN UPDATE SET *")      // just works
  * spark.sql("DESCRIBE HISTORY txtable.`/data/t`").show()
  * spark.sql("SELECT * FROM txtable.`/data/t` VERSION AS OF 3")
  * spark.sql("INSERT INTO txtable.`/data/t` SELECT ...")
  * }}}
  *
  * Dispatch is conservative and parse-time-cheap: the Delta-grammar
  * statements (DESCRIBE HISTORY / OPTIMIZE / VACUUM / RESTORE / the
  * ALTER family) route only when their table reference RESOLVES to a
  * transactional table (`txtable.`path`` syntactically, catalog names
  * by provider lookup — never opening the table); MERGE/UPDATE/DELETE
  * parse through the DELEGATE first and re-route only when the parsed
  * target is transactional. Everything else — including DML on
  * ordinary tables — returns the delegate's plan untouched, so the
  * injected parser is invisible outside the txtable surface.
  *
  * The routed plan is a [[TxSqlStatement]] leaf command: execution
  * happens at command run time through [[graft.ops.TxSql]] (the same
  * translation the programmatic face uses), with the result schema
  * declared at PLAN time from the statement shape so `spark.sql`
  * returns a normally-typed DataFrame. */
class TxSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    TxSql.statementSchema(session, sqlText) match {
      case Some(schema) => TxSqlStatement(sqlText, schema)
      case None =>
        val plan = delegate.parsePlan(sqlText)
        plan match {
          case (_: DeleteFromTable | _: UpdateTable | _: MergeIntoTable)
              if TxSql.isDmlOnTx(session, plan) =>
            TxSqlStatement(sqlText, TxSql.SummarySchema)
          case p => rewriteTxRelations(p)
        }
    }

  /** Replace `txtable.`&#96;path&#96;`` references anywhere in a query —
    * including under `VERSION AS OF` / `TIMESTAMP AS OF` — with the
    * resolved batch relation, so plain `spark.sql("SELECT * FROM
    * txtable.`&#96;/p&#96;` VERSION AS OF 3")` and `INSERT INTO
    * txtable.`&#96;/p&#96;` SELECT …` work without a catalog entry
    * (Delta's `delta.`&#96;path&#96;`` device). Top-down so the
    * time-travel wrapper sees its child before the bare-relation rule
    * consumes it; every other relation is untouched. */
  private def rewriteTxRelations(p: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.Literal
    def txPath(x: LogicalPlan): Option[String] = x match {
      case r: UnresolvedRelation
          if r.multipartIdentifier.size == 2 &&
            r.multipartIdentifier.head.equalsIgnoreCase("txtable") =>
        Some(r.multipartIdentifier.last)
      case _ => None
    }
    def reader(path: String, version: Option[String],
        ts: Option[org.apache.spark.sql.catalyst.expressions.Expression])
        : LogicalPlan = {
      var r = session.read.format("txtable").option("path", path)
      version.foreach(v => r = r.option("versionAsOf", v))
      ts.foreach {
        case Literal(v, org.apache.spark.sql.types.TimestampType) =>
          // typed literal carries epoch MICROS; the option speaks millis
          r = r.option("timestampAsOf",
            (v.asInstanceOf[Long] / 1000L).toString)
        case Literal(v, _) if v != null =>
          r = r.option("timestampAsOf", v.toString)
        case other => sys.error(
          s"txtable TIMESTAMP AS OF must be a literal, got: ${other.sql}")
      }
      r.load().queryExecution.analyzed
    }
    p.transformDown {
      // INSERT's target is a constructor FIELD, not a child — a plain
      // tree transform never visits it
      case ins: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement
          if txPath(ins.table).isDefined =>
        ins.copy(table = reader(txPath(ins.table).get, None, None))
      case tt: RelationTimeTravel if txPath(tt.relation).isDefined =>
        reader(txPath(tt.relation).get, tt.version, tt.timestamp)
      case r: UnresolvedRelation if txPath(r).isDefined =>
        reader(txPath(r).get, None, None)
      case ct: org.apache.spark.sql.catalyst.plans.logical.CreateTable
          if isTxCreate(ct) &&
            ct.columns.exists(c => c.identityColumnSpec.isDefined ||
              c.generationExpression.isDefined) =>
        specCreate(ct)
      case ctas => rewritePartitionedCtas(ctas)
    }
  }

  /** Is this CreateTable's provider the transactional table? */
  private def isTxCreate(
      ct: org.apache.spark.sql.catalyst.plans.logical.CreateTable): Boolean =
    ct.tableSpec match {
      case u: org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec =>
        u.provider.exists(_.equalsIgnoreCase("txtable"))
      case _ => false
    }

  /** `CREATE TABLE t (id BIGINT GENERATED ALWAYS AS IDENTITY
    * [(START WITH n INCREMENT BY m)], y INT GENERATED ALWAYS AS
    * (year(d)), …) USING txtable LOCATION p` — Delta's PRIMARY
    * surface for BOTH column-spec families (the ALTER forms are the
    * retrofit path). Spark's parser delivers the specs on the
    * `ColumnDefinition`; a DSv1 provider would silently drop them, so
    * the plan is rewritten to (a) the same CREATE with the specs
    * STRIPPED (the columns keep their types in the declared schema —
    * empty reads serve them) and (b) follow-up
    * `addIdentityColumn`/`addGeneratedColumn` calls per spec, all run
    * by one command. `GENERATED BY DEFAULT` (caller-supplied values
    * allowed) contradicts the engine's ALWAYS-only allocation
    * contract and refuses loudly at parse time, as does a generation
    * expression referencing a column the CREATE does not declare. */
  private def specCreate(
      ct: org.apache.spark.sql.catalyst.plans.logical.CreateTable)
      : LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedIdentifier}
    val ids = ct.columns.collect {
      case c if c.identityColumnSpec.isDefined =>
        val s = c.identityColumnSpec.get
        require(!s.isAllowExplicitInsert,
          s"column ${c.name}: GENERATED BY DEFAULT AS IDENTITY is not " +
            "supported — identity columns are GENERATED ALWAYS " +
            "(engine-allocated)")
        require(c.dataType == org.apache.spark.sql.types.LongType,
          s"identity column ${c.name} must be BIGINT, got " +
            c.dataType.sql)
        (c.name, s.getStart, s.getStep)
    }
    val declared = ct.columns.map(_.name.toLowerCase).toSet
    val gens = ct.columns.collect {
      case c if c.generationExpression.isDefined =>
        val e = c.generationExpression.get
        // catch a typo'd base column AT CREATE TIME — on the dataless
        // table the engine-side validation is vacuous by design
        val refs = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseExpression(e).collect {
            case a: UnresolvedAttribute => a.nameParts.head.toLowerCase
          }
        val unknown = refs.filterNot(declared.contains).distinct
        require(unknown.isEmpty,
          s"generated column ${c.name}: expression references " +
            s"${unknown.mkString(", ")}, not declared by this CREATE")
        (c.name, e)
    }
    val cleaned = ct.copy(columns = ct.columns.map { c =>
      var c2 = c
      if (c2.identityColumnSpec.isDefined)
        c2 = c2.copy(identityColumnSpec = None)
      if (c2.generationExpression.isDefined)
        c2 = c2.copy(generationExpression = None)
      c2
    })
    val parts = ct.name match {
      case u: UnresolvedIdentifier => u.nameParts
      case other => sys.error(
        s"unexpected CREATE TABLE name plan: ${other.nodeName}")
    }
    TxCreateWithSpecs(rewritePartitionedCtas(cleaned), parts, ids, gens,
      ct.ignoreIfExists)
  }

  /** `CREATE TABLE … USING txtable PARTITIONED BY (…) AS SELECT`:
    * Spark's DSv1 CTAS path drops `PARTITIONED BY` before the
    * provider ever sees it (the provider receives only the OPTIONS
    * map), which would silently write a FLAT layout under a catalog
    * entry claiming a partitioned one. Rewrite the plan to carry the
    * keys as the provider's `__partition_columns` option (the same
    * channel `DataFrameWriter.partitionBy` uses) and strip the
    * `partitioning` clause — like Delta, the table's own log is the
    * layout's source of truth, not the catalog. Identity transforms
    * only; bucket/days/… refuse loudly rather than silently flatten. */
  private def rewritePartitionedCtas(p: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.plans.logical.{CreateTable, CreateTableAsSelect, OptionList, UnresolvedTableSpec}
    def txSpec(s: Any): Option[UnresolvedTableSpec] = s match {
      case u: UnresolvedTableSpec
          if u.provider.exists(_.equalsIgnoreCase("txtable")) => Some(u)
      case _ => None
    }
    def colsOf(partitioning: Seq[
        org.apache.spark.sql.connector.expressions.Transform]) =
      partitioning.map { tr =>
        val refs = tr.references
        if (tr.name == "identity" && refs.length == 1 &&
            refs(0).fieldNames.length == 1) refs(0).fieldNames.head
        else sys.error(
          s"txtable supports only PARTITIONED BY (column…); got: " +
            tr.describe)
      }
    def withOpt(spec: UnresolvedTableSpec, cols: Seq[String]) = {
      val json = cols.map(c =>
        "\"" + c.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
      spec.copy(optionExpression = OptionList(
        spec.optionExpression.options :+
          ("__partition_columns" ->
            org.apache.spark.sql.catalyst.expressions.Literal(json))))
    }
    p match {
      case ctas: CreateTableAsSelect if ctas.partitioning.nonEmpty &&
          txSpec(ctas.tableSpec).isDefined =>
        ctas.copy(partitioning = Nil,
          tableSpec = withOpt(txSpec(ctas.tableSpec).get,
            colsOf(ctas.partitioning)))
      // plain CREATE: record the keys as the option so the relation's
      // INSERT path partitions the first batch (catalog partitioning
      // would be dropped before a DSv1 provider anyway)
      case ct: CreateTable if ct.partitioning.nonEmpty &&
          txSpec(ct.tableSpec).isDefined =>
        ct.copy(partitioning = Nil,
          tableSpec = withOpt(txSpec(ct.tableSpec).get,
            colsOf(ct.partitioning)))
      case other => other
    }
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** A txtable SQL statement as a leaf command: runs the [[TxSql]]
  * translation when the command executes, returning its rows under
  * the schema the parser declared. Driver-side work plus whatever
  * distributed jobs the dispatched engine path runs — identical cost
  * to calling `TxSql(spark).run(text)` directly. */
case class TxSqlStatement(sqlText: String, resultSchema: StructType)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    DataTypeUtils.toAttributes(resultSchema)

  override def run(sparkSession: SparkSession): Seq[Row] =
    TxSql(sparkSession).run(sqlText).collect().toIndexedSeq
}

/** CREATE TABLE with identity and/or generated column specs, as one
  * command: run the spec-stripped CREATE (the ordinary catalog path),
  * then record each declaration on the fresh table — the columns are
  * engine-owned/derived from the table's first commit on, before any
  * data can land without allocation or enforcement. `inner` is a
  * constructor FIELD, not a child: it is a raw parsed plan that must
  * not be analyzed until this command executes it. */
case class TxCreateWithSpecs(inner: LogicalPlan,
    nameParts: Seq[String], ids: Seq[(String, Long, Long)],
    gens: Seq[(String, String)] = Nil,
    ignoreIfExists: Boolean = false)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(sparkSession: SparkSession): Seq[Row] = {
    // CREATE TABLE IF NOT EXISTS on an existing table is a WHOLE-
    // STATEMENT no-op (the idempotent bootstrap-script idiom): the
    // inner CREATE would no-op, and the follow-up declarations must
    // not fire either — re-running would error "already declared",
    // and a pre-existing table created WITHOUT the specs must not
    // have its write contract changed by a statement that does
    // nothing. Without IF NOT EXISTS the inner CREATE refuses itself.
    if (ignoreIfExists) {
      val exists = nameParts match {
        case Seq(t0) => sparkSession.sessionState.catalog
          .tableExists(org.apache.spark.sql.catalyst.TableIdentifier(t0))
        case Seq(db, t0) => sparkSession.sessionState.catalog.tableExists(
          org.apache.spark.sql.catalyst.TableIdentifier(t0, Some(db)))
        case _ => false
      }
      if (exists) return Nil
    }
    org.apache.spark.sql.graft.ColumnShim
      .ofRows(sparkSession, inner).collect()
    val t = TxSql(sparkSession).resolveParts(nameParts)
    gens.foreach { case (n, e) => t.addGeneratedColumn(n, e) }
    ids.foreach { case (n, start, step) =>
      t.addIdentityColumn(n, start, step)
    }
    // the declaration commits landed AFTER the catalog entry: drop any
    // cached relation so the first read resolves the token-bearing head
    TxSql(sparkSession).refreshCatalog(nameParts)
    Nil
  }
}
