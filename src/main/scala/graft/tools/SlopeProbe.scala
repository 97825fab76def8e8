package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Scaling-slope evidence for the iterative queries: replicates the
  * sf0.1 `documents` and `embeddings` tables K times into a scaled
  * directory, then cold-times REGISTRY queries (by name) against it.
  * Near-linear growth across 1×/16×/64× is the committed evidence
  * (`SCALE.md`) that the plan shapes — banded candidate generation,
  * capped buckets, active-set label propagation, centroid
  * broadcast — carry beyond what the test SFs can show.
  *
  * Document replication is an exact per-copy TOKEN BIJECTION (every
  * token suffixed per copy): the shingle/near-dup graph repeats per
  * copy instead of exploding into cross-copy cliques. Embedding
  * replication offsets `vec_id` per copy (identical vectors — the
  * centroid geometry repeats, query count scales with the corpus).
  *
  * Run: `sbt "runMain graft.tools.SlopeProbe [k1,k2,...] [q1,q2,...]"`
  * (defaults: 1,16,64 and the three iterative queries). Timings are
  * alternating min-of-2 with cache+checkpoint cleanup between runs
  * (first-pass-cold and JIT effects measured ~4 s of phantom cost
  * otherwise — see ScaleProbe). */
object SlopeProbe {
  def main(args: Array[String]): Unit = {
    val ks = (if (args.nonEmpty) args(0).split(",").toSeq.map(_.trim.toInt)
              else Seq(1, 16, 64))
    val names = (if (args.length > 1) args(1).split(",").toSeq.map(_.trim)
                 else Seq("x_dedup_ngram_inverted", "x_dedup_clusters",
                   "x_embed_ann_ivf"))
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-slope-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = graft.queries.Registry.all
      .filter(q => names.contains(q.name))
    require(queries.map(_.name).toSet == names.toSet,
      s"unknown query among $names")

    def scaledDir(k: Int): String = {
      val dir = s"/tmp/graft_slope_${k}x"
      val marker = new java.io.File(s"$dir/_READY")
      if (!marker.exists()) {
        val base = "/root/testdata/sf0.1"
        val docs = Tables.documents(spark, base)
        (0 until k).map { i =>
          docs.select(
            (col("doc_id") + lit(i.toLong * 10_000_000L)).as("doc_id"),
            regexp_replace(col("text"), "(\\S+)", s"$$1zz$i").as("text"),
            col("lang"), col("source"), col("n_chars"))
        }.reduce(_ union _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val emb = Tables.embeddings(spark, base)
        (0 until k).map { i =>
          emb.withColumn("vec_id",
            col("vec_id") + lit(i.toLong * 10_000_000L))
        }.reduce(_ union _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
        marker.createNewFile()
      }
      dir
    }

    def cold(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def timeOne(q: graft.queries.GraftQuery, dir: String): Double = {
      cold()
      val t0 = System.nanoTime()
      q.build(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    // JIT/codegen warm-up per query at the smallest SF
    queries.foreach(q => q.build(spark, "/root/testdata/sf0.001").count())

    ks.foreach { k =>
      val dir = scaledDir(k)
      // alternating min-of-2: round-robin the queries twice so no query
      // is systematically charged with first-touch costs of the dir
      val t1 = queries.map(q => q.name -> timeOne(q, dir)).toMap
      val t2 = queries.map(q => q.name -> timeOne(q, dir)).toMap
      queries.foreach { q =>
        val t = math.min(t1(q.name), t2(q.name))
        println(f"[slope] k=$k%-3d ${q.name}%-28s $t%7.2f s")
      }
    }
    spark.stop()
  }
}
