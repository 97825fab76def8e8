package graft.sources.tx

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import graft.ops.TxTable

/** Streaming over CATALOG NAMES — `spark.readStream.table("t")` and
  * `df.writeStream.toTable("t")`, the forms every Delta tutorial
  * types. Batch SQL names already resolve through the catalog
  * ([[graft.ops.TxSql.resolveParts]]); these specs pin that the
  * STREAMING faces do too: Spark's own v1 fallback relays the catalog
  * entry's provider + location (and its recorded schema, which the
  * source now accepts when it agrees with the snapshot). */
class TxStreamCatalogSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(r: Range) =
    r.map(i => (i.toLong, s"row-$i")).toDF("id", "payload")

  private def ckpt(): String =
    Files.createTempDirectory("graft-txcat-ck-").toString

  test("readStream.table tails a txtable catalog table exactly-once") {
    val dir = Files.createTempDirectory("graft-txcat-src-").toString
    spark.sql("DROP TABLE IF EXISTS graft_cat_src")
    spark.sql(s"CREATE TABLE graft_cat_src USING txtable LOCATION '$dir/t'")
    val t = TxTable(spark, s"$dir/t")
    t.append(rows(0 until 12))
    try {
      val q = spark.readStream.table("graft_cat_src")
        .writeStream.format("memory").queryName("txcat_src")
        .option("checkpointLocation", ckpt())
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("txcat_src").count() === 12)
        // incremental appends keep arriving, once each
        t.append(rows(12 until 30))
        q.processAllAvailable()
        assert(spark.table("txcat_src").count() === 30)
        assert(spark.table("txcat_src").select("id")
          .distinct().count() === 30)
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_src")
  }

  test("readStream.table accepts the catalog's DECLARED schema when it agrees") {
    val dir = Files.createTempDirectory("graft-txcat-decl-").toString
    spark.sql("DROP TABLE IF EXISTS graft_cat_decl")
    // a DECLARED-columns entry relays a NON-empty schema to the source
    spark.sql("CREATE TABLE graft_cat_decl (id BIGINT, payload STRING) " +
      s"USING txtable LOCATION '$dir/t'")
    val t = TxTable(spark, s"$dir/t")
    t.append(rows(0 until 7))
    try {
      val q = spark.readStream.table("graft_cat_decl")
        .writeStream.format("memory").queryName("txcat_decl")
        .option("checkpointLocation", ckpt())
        .start()
      try {
        q.processAllAvailable()
        assert(spark.table("txcat_decl").count() === 7)
        assert(spark.table("txcat_decl").columns.toSeq ===
          Seq("id", "payload"))
      } finally q.stop()
      // a CONTRADICTORY user schema still refuses loudly
      val e = intercept[Exception] {
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "id INT, wrong STRING"))
          .format("txtable").option("path", s"$dir/t").load()
          .writeStream.format("memory").queryName("txcat_bad").start()
      }
      assert(e.getMessage.contains("disagrees"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_decl")
  }

  test("writeStream.toTable lands micro-batches as txtable commits, exactly-once") {
    val dir = Files.createTempDirectory("graft-txcat-snk-").toString
    spark.sql("DROP TABLE IF EXISTS graft_cat_snk")
    spark.sql(s"CREATE TABLE graft_cat_snk (id BIGINT, payload STRING) " +
      s"USING txtable LOCATION '$dir/t'")
    try {
      val in = MemoryStream[(Long, String)](spark)
      val q = in.toDF().toDF("id", "payload")
        .writeStream.format("txtable")
        .option("checkpointLocation", ckpt())
        .toTable("graft_cat_snk")
      try {
        in.addData((0L until 10L).map(i => (i, s"b-$i")): _*)
        q.processAllAvailable()
        val t = TxTable(spark, s"$dir/t")
        assert(t.read().count() === 10)
        assert(spark.table("graft_cat_snk").count() === 10)
        // the commit carries the sink's txn marker (replay protection)
        assert(t.history().select("action").as[String].collect()
          .forall(_ == "append"))
        in.addData((10L until 25L).map(i => (i, s"b-$i")): _*)
        q.processAllAvailable()
        assert(spark.table("graft_cat_snk").count() === 25)
        assert(spark.table("graft_cat_snk").select("id")
          .distinct().count() === 25)
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS graft_cat_snk")
  }
}
