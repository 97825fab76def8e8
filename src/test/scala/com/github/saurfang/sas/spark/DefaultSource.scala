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
  * For a REAL binary `.sas7bdat` (magic sniff) it delegates to the
  * engine's built-in decoder ([[graft.sources.sas.SasRelation]]) — the
  * third-party jar would decode the same bytes itself; offline, the
  * built-in reader is the decoder, and `Sas7bdatReaderSpec` drives a
  * real binary fixture through this exact resolution path. For
  * anything else it reads the path as parquet (legacy fixtures are
  * parquet dirs named `*.sas7bdat`), which keeps proving the plumbing
  * around the decode — format-string resolution, branch preference
  * order, relation/scan wiring. */
final class DefaultSource extends RelationProvider {
  override def createRelation(
      ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("path is required"))
    if (graft.sources.sas.Sas7bdat.looksLikeSas(path))
      return new graft.sources.sas.SasRelation(ctx, path)
    val df = ctx.sparkSession.read.parquet(path)
    new BaseRelation with TableScan {
      override val sqlContext: SQLContext = ctx
      override val schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }
  }
}
