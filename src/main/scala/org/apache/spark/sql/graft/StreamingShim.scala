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

  /** Re-flag `df`'s plan as streaming. File-backed plans keep their
    * `LogicalRelation` (so pushdown/pruning survive); any other plan
    * shape falls back to wrapping the computed RDD. */
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cds = df.asInstanceOf[Dataset[Row]]
    val spark = cds.sparkSession.asInstanceOf[SparkSession]
    val analyzed = cds.queryExecution.analyzed
    val hasRelation =
      analyzed.collectFirst { case l: LogicalRelation => l }.isDefined
    if (hasRelation)
      Dataset.ofRows(spark, analyzed.transform {
        case l: LogicalRelation => l.copy(isStreaming = true)
      })
    else
      spark.internalCreateDataFrame(
        cds.queryExecution.toRdd, cds.schema, isStreaming = true)
  }
}
