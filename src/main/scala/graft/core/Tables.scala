package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the synthetic benchmark tables (`TESTDATA.md`).
  *
  * All scans are plain `spark.read.parquet` DataFrames so Catalyst is free
  * to push filters and column projections into the parquet reader — at the
  * 100 TB target the scan is the dominant cost and `PushedFilters` /
  * `ReadSchema` pruning is what makes every downstream operator viable.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Idempotent: guarantees the engine's native functions (ws_tokens,
    // shingle_set, minhash_sig, simhash32, vec_dot, ...) resolve in any
    // query built over these tables, whatever session the harness passes.
    graft.functions.VectorExpressions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events.parquet` stores `TIMESTAMP(NANOS)`, which Spark's parquet
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). Read the nanos as a
    * raw long and derive the session timestamp by integer-dividing to
    * microseconds — both branches stay inside whole-stage codegen.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("CAST(ts DIV 1000 AS LONG)")))
  }

  /** Raw events with `ts` kept as nanosecond epoch long. */
  def eventsRawNanos(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
  }
}
