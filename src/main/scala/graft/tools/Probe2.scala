package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev probe: bench-protocol cold repeats of named queries. */
object Probe2 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (a.nonEmpty) a.toSeq else Seq("x_dedup_minhash_lsh")
    val reg = graft.queries.Registry.all.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = reg(n)
      try q.build(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        q.build(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
