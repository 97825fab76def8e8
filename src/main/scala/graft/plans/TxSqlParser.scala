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
          case p => p
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
