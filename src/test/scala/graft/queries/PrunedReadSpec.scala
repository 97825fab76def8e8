package graft.queries

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Plan-audit for the K3 partitioned-sink read: the partition-key
  * predicate must reach the scan as a `PartitionFilters` entry and prune
  * the file listing to the single matching directory — the property that
  * makes a partitioned 100 TB table readable. */
class PrunedReadSpec extends SparkTestBase {

  test("partition predicate prunes the file listing to one directory") {
    val out = Files.createTempDirectory("graft-prunespec-").toString
    spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)

    val df = spark.read.parquet(out)
      .where(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val scan = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }.head

    // the predicate is a partition filter, not a post-scan data filter
    assert(scan.partitionFilters.exists(_.toString.contains("o_orderpriority")))
    val pruned = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    val all = scan.relation.location.listFiles(Nil, Nil)
    assert(all.size === 5, "orders has 5 priorities -> 5 partition dirs")
    assert(pruned.size === 1, "exactly one partition dir survives pruning")
    assert(pruned.flatMap(_.files).size < all.flatMap(_.files).size)

    // and the pruned read computes the same answer as the plain filter
    val expect = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
  }
}
