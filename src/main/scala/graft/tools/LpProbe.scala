package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc A/B: label-propagation round shapes (join-fallback vs
  * union-fallback) at the bench SF. */
object LpProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def lp(variant: String)(): Long = {
      val base =
        if (variant == "enc")
          graft.core.Tables.lineitem(spark, dir)
            .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
            .distinct()
            .select(
              graft.queries.GraphQueries.encKey(sPrefix = true, col("sk"))
                .as("src"),
              graft.queries.GraphQueries.encKey(sPrefix = false, col("pk"))
                .as("dst"))
            .localCheckpoint()
        else graft.core.Tables.lineitem(spark, dir)
        .select(concat(lit("s"), col("l_suppkey")).as("src"),
          concat(lit("p"), col("l_partkey")).as("dst"))
        .distinct().localCheckpoint()
      val edges = base.union(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val e = edges.select(col("src"), col("dst")).localCheckpoint()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct().localCheckpoint()
      val bcast = nodes.count() <= 5000000L
      def side(df: DataFrame): DataFrame = if (bcast) broadcast(df) else df
      var labels = nodes.withColumn("label", col("node"))
      (1 to 3).foreach { _ =>
        val votes = e.join(side(labels), col("src") === col("node"))
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("__n"))
        labels = (variant match {
          case "union" | "enc" =>
            votes.select(col("dst").as("node"), col("label"), col("__n"))
              .union(labels.select(col("node"), col("label"),
                lit(0L).as("__n")))
              .groupBy(col("node"))
              .agg(expr("min_by(label, struct(-__n, label))").as("label"))
          case "join" =>
            val winner = votes.groupBy(col("dst").as("node2"))
              .agg(expr("min_by(label, struct(-__n, label))").as("__new"))
            labels.join(side(winner), col("node") === col("node2"), "left")
              .select(col("node"),
                coalesce(col("__new"), col("label")).as("label"))
        }).localCheckpoint()
      }
      if (variant == "enc")
        labels.select(graft.queries.GraphQueries.decKey(col("node")),
          graft.queries.GraphQueries.decKey(col("label"))).count()
      else labels.count()
    }

    // full-operator variant: enc keys + the packed-argmax fast path
    def lpPack(): Long = {
      val base = graft.core.Tables.lineitem(spark, dir)
        .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
        .distinct()
        .select(
          graft.queries.GraphQueries.encKey(sPrefix = true, col("sk"))
            .as("src"),
          graft.queries.GraphQueries.encKey(sPrefix = false, col("pk"))
            .as("dst"))
        .localCheckpoint()
      val edges = base.union(
        base.select(col("dst").as("src"), col("src").as("dst")))
      graft.ops.Graph.labelPropagation(edges, 3, packedLongLabels = true)
        .select(graft.queries.GraphQueries.decKey(col("node")),
          graft.queries.GraphQueries.decKey(col("label"))).count()
    }
    // r18 A/B: the packed round with its two vote exchanges FUSED into
    // one repartition(node2) — HashPartitioning(node2) satisfies the
    // ClusteredDistribution of BOTH aggregations (a strict subset of
    // (node2, label)), so the whole round runs in one shuffle + one
    // codegen stage. The cost: the fused exchange moves RAW vote rows
    // (no map-side partial aggregation), and every one of a hub node's
    // in-edges lands in ONE partition — the skew the two-exchange
    // shape's partials absorb. This probe prices the trade at bench SF.
    def lpPackFused(): Long = {
      val base = graft.core.Tables.lineitem(spark, dir)
        .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
        .distinct()
        .select(
          graft.queries.GraphQueries.encKey(sPrefix = true, col("sk"))
            .as("src"),
          graft.queries.GraphQueries.encKey(sPrefix = false, col("pk"))
            .as("dst"))
        .localCheckpoint()
      val edges = base.union(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val e = edges.select(col("src"), col("dst")).localCheckpoint()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct().localCheckpoint()
      val PackBase = 1L << 40
      var labels = nodes.withColumn("label", col("node"))
      (1 to 3).foreach { _ =>
        val votes = e.join(broadcast(labels), col("src") === col("node"))
          .select(col("dst").as("node2"), col("label"), lit(1L).as("__w"))
          .union(labels.select(col("node").as("node2"), col("label"),
            lit(0L).as("__w")))
          .repartition(col("node2"))
          .groupBy(col("node2"), col("label"))
          .agg(sum(col("__w")).as("__n"))
        labels = votes
          .select(col("node2"),
            (col("__n").cast("decimal(25,0)") *
              lit(PackBase).cast("decimal(14,0)") +
              (lit(PackBase - 1) - col("label")).cast("decimal(25,0)"))
              .as("__p"))
          .groupBy(col("node2"))
          .agg(max(col("__p")).as("__pm"))
          .select(col("node2").as("node"),
            (lit(PackBase - 1) -
              pmod(col("__pm"), lit(PackBase).cast("decimal(25,0)"))
                .cast("long")).as("label"))
          .localCheckpoint()
      }
      labels.select(graft.queries.GraphQueries.decKey(col("node")),
        graft.queries.GraphQueries.decKey(col("label"))).count()
    }
    // PACKED round-1 plan dump (the r17 evidence gap: the committed
    // after-plan was the enc-only variant and still showed
    // SortAggregate) — this is the shape x_graph_label_prop runs 3×.
    if (sys.env.get("LP_EXPLAIN_PACKED").contains("1")) {
      val base = graft.core.Tables.lineitem(spark, dir)
        .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
        .distinct()
        .select(
          graft.queries.GraphQueries.encKey(sPrefix = true, col("sk"))
            .as("src"),
          graft.queries.GraphQueries.encKey(sPrefix = false, col("pk"))
            .as("dst"))
        .localCheckpoint()
      val edges = base.union(
        base.select(col("dst").as("src"), col("src").as("dst")))
      val e = edges.select(col("src"), col("dst")).localCheckpoint()
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct().localCheckpoint()
      val PackBase = 1L << 40
      val labels = nodes.withColumn("label", col("node"))
      def round1(fuse: Boolean) = {
        val votes0 = e.join(broadcast(labels), col("src") === col("node"))
          .select(col("dst").as("node2"), col("label"), lit(1L).as("__w"))
          .union(labels.select(col("node").as("node2"), col("label"),
            lit(0L).as("__w")))
        val votes = (if (fuse) votes0.repartition(col("node2")) else votes0)
          .groupBy(col("node2"), col("label"))
          .agg(sum(col("__w")).as("__n"))
        votes
          .select(col("node2"),
            (col("__n").cast("decimal(25,0)") *
              lit(PackBase).cast("decimal(14,0)") +
              (lit(PackBase - 1) - col("label")).cast("decimal(25,0)"))
              .as("__p"))
          .groupBy(col("node2"))
          .agg(max(col("__p")).as("__pm"))
          .select(col("node2").as("node"),
            (lit(PackBase - 1) -
              pmod(col("__pm"), lit(PackBase).cast("decimal(25,0)"))
                .cast("long")).as("label"))
      }
      println("\n===== round-1 plan, variant=packed (shipped) =====")
      round1(fuse = false).explain("formatted")
      println("\n===== round-1 plan, variant=packed+fused-exchange (A/B) =====")
      round1(fuse = true).explain("formatted")
    }
    // ROUND-SHAPE explain (the query-level explain only shows the final
    // localCheckpoint scan): print round-1's plan for each variant —
    // this is the shape that runs 3× per query
    if (sys.env.get("LP_EXPLAIN").contains("1")) {
      Seq("union", "enc").foreach { v =>
        println(s"\n===== round-1 plan, variant=$v =====")
        val base =
          if (v == "enc")
            graft.core.Tables.lineitem(spark, dir)
              .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
              .distinct()
              .select(
                graft.queries.GraphQueries.encKey(sPrefix = true, col("sk"))
                  .as("src"),
                graft.queries.GraphQueries.encKey(sPrefix = false, col("pk"))
                  .as("dst"))
              .localCheckpoint()
          else graft.core.Tables.lineitem(spark, dir)
            .select(concat(lit("s"), col("l_suppkey")).as("src"),
              concat(lit("p"), col("l_partkey")).as("dst"))
            .distinct().localCheckpoint()
        val edges = base.union(
          base.select(col("dst").as("src"), col("src").as("dst")))
        val e = edges.select(col("src"), col("dst")).localCheckpoint()
        val nodes = e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node")))
          .distinct().localCheckpoint()
        val labels = nodes.withColumn("label", col("node"))
        val votes = e.join(broadcast(labels), col("src") === col("node"))
          .groupBy(col("dst"), col("label"))
          .agg(count(lit(1)).as("__n"))
        votes.select(col("dst").as("node"), col("label"), col("__n"))
          .union(labels.select(col("node"), col("label"), lit(0L).as("__n")))
          .groupBy(col("node"))
          .agg(expr("min_by(label, struct(-__n, label))").as("label"))
          .explain("formatted")
      }
    }
    // warm both
    Seq("union", "enc").foreach { v =>
      val t0 = System.nanoTime(); lp(v)()
      println(f"warm $v ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    locally { val t0 = System.nanoTime(); lpPack()
      println(f"warm pack ${(System.nanoTime() - t0) / 1e9}%.2f") }
    locally { val t0 = System.nanoTime(); lpPackFused()
      println(f"warm packfuse ${(System.nanoTime() - t0) / 1e9}%.2f") }
    (1 to 3).foreach { _ =>
      Seq("union", "enc", "pack", "packfuse").foreach { v =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        if (v == "pack") lpPack()
        else if (v == "packfuse") lpPackFused()
        else lp(v)()
        println(f"$v%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
