package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query surface lives in `graft.queries` (one `GraftQuery`
  * per SURVEY §2 operator row / training-data op); this object is the
  * thin adapter the harness calls.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-schema broadcast join + grouped aggregate (SURVEY §2 J1+A1). */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("j1_star_join_broadcast")
      .build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. Queries with
    * `verify = false` (reference-dataset inputs, golden-asserted in
    * their bench setup and the E2E spec) stay out of the sf-directory
    * oracle dump. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.filter(_.verify).map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
