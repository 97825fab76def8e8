package org.apache.spark.sql.graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Bridge into Spark's `private[sql]` streaming-DataFrame machinery.
  *
  * A v1 streaming `Source.getBatch` must return a DataFrame whose
  * logical plan carries `isStreaming = true` — `MicroBatchExecution`
  * asserts it ("DataFrame returned by getBatch ... did not have
  * isStreaming=true"). Spark's own `FileStreamSource` satisfies this by
  * flipping the flag on the `LogicalRelation` it builds; the only
  * fully-public alternative is a DSv2 `MicroBatchStream` with
  * hand-rolled parquet partition readers, which would abandon Spark's
  * vectorized parquet scan. This object lives under
  * `org.apache.spark.sql` purely to reach the same two `private[sql]`
  * constructors the built-in source uses; it adds no behavior of its
  * own.
  */
object StreamingShim {

  /** Re-flag `df`'s plan as streaming. A plan that is a SINGLE file
    * relation under stateless unary operators keeps its
    * `LogicalRelation` (so pushdown/pruning survive into the scan).
    * Any other shape — joins, set ops, aggregates — falls back to
    * wrapping the computed RDD as one opaque streaming leaf: flipping
    * every relation inside a joined plan would hand the engine a
    * MULTI-leaf streaming plan, which it plans as a STATEFUL
    * stream-stream join (state stores, watermark demands, and restart
    * failures), when the source's contract is "this batch's content is
    * the already-computed result of a bounded batch query". The wrap
    * executes the window as an ordinary batch DAG (broadcast joins and
    * all) and streams only its output. */
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cds = df.asInstanceOf[Dataset[Row]]
    val spark = cds.sparkSession.asInstanceOf[SparkSession]
    val analyzed = cds.queryExecution.analyzed
    import org.apache.spark.sql.catalyst.plans.logical._
    val relations = analyzed.collect { case l: LogicalRelation => l }
    val stateful = analyzed.exists {
      case _: Join | _: Except | _: Intersect | _: Union |
           _: Aggregate | _: Window | _: Deduplicate => true
      case _ => false
    }
    if (relations.size == 1 && !stateful)
      Dataset.ofRows(spark, analyzed.transform {
        case l: LogicalRelation => l.copy(isStreaming = true)
      })
    else
      spark.internalCreateDataFrame(
        cds.queryExecution.toRdd, cds.schema, isStreaming = true)
  }

  /** The inverse bridge, for a v1 streaming SINK: the DataFrame
    * `addBatch` receives carries a streaming (incremental-execution)
    * plan that ordinary batch writers refuse ("Queries with streaming
    * sources must be executed with writeStream.start()"). Re-wrap the
    * batch's computed rows as a plain batch frame — the same
    * `internalCreateDataFrame` re-plant Spark's own `ForeachBatchSink`
    * performs before handing the user their batch view. Executing the
    * returned frame re-runs the wrapped RDD lineage, which for a
    * micro-batch window is a bounded, deterministic replay. */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cds = df.asInstanceOf[Dataset[Row]]
    val spark = cds.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(
      cds.queryExecution.toRdd, cds.schema, isStreaming = false)
  }
}
