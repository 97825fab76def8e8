package com.github.saurfang.sas.spark

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

/** TEST STUB for the public `saurfang/spark-sas7bdat` reader the
  * reference loads by format name (`/root/reference/etl.py:133-135`) —
  * that jar is unresolvable in this offline build, so the production
  * format string stays data (`graft.immigration.Sources.SasFormat`)
  * and THIS class, living on the test classpath under the same package
  * name, is what Spark's DataSource lookup finds when specs exercise
  * the sas-preference branch end-to-end.
  *
  * It is NOT a sas7bdat decoder: it reads the given path as parquet
  * (fixtures are parquet dirs named `*.sas7bdat`). What it proves live
  * is everything around the decode — the format-string resolution, the
  * branch preference order, and the relation/scan plumbing. */
final class DefaultSource extends RelationProvider {
  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("path is required"))
    val df = ctx.sparkSession.read.parquet(path)
    new BaseRelation with TableScan {
      override val sqlContext: SQLContext = ctx
      override val schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }
  }
}
