package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Expression ↔ Column conversion.
  *
  * Since the Spark 4 Column refactor a `Column` wraps a `ColumnNode`,
  * not a catalyst `Expression`; the two-way bridge
  * (`classic.ExpressionUtils`) is `private[sql]`. The SQL DML face
  * ([[graft.ops.TxSql]]) parses statements with Spark's own parser
  * and must hand the parsed catalyst expressions (clause conditions,
  * assignment values) to the DataFrame API — this object exists only
  * to reach that bridge; it adds no behavior. */
object ColumnShim {

  /** Wrap a catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Run an (unresolved) logical plan through analysis into a
    * DataFrame — how the SQL face turns a parsed MERGE source
    * subquery into the frame it hands the engine. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
