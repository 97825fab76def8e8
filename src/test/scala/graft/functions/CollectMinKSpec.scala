package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

class CollectMinKSpec extends SparkTestBase {
  import spark.implicits._

  test("keeps the k smallest, sorted ascending, duplicates retained") {
    val df = Seq(5L, 1L, 3L, 1L, 9L, 2L).toDF("id")
      .select(call_function("collect_min_k", col("id"), lit(4)).as("ids"))
    assert(df.as[Seq[Long]].head() === Seq(1L, 1L, 2L, 3L))
  }

  test("group smaller than k returns the complete sorted membership") {
    val df = Seq(7L, 2L, 4L).toDF("id")
      .select(call_function("collect_min_k", col("id"), lit(10)).as("ids"))
    assert(df.as[Seq[Long]].head() === Seq(2L, 4L, 7L))
  }

  test("nulls are skipped, matching collect_list") {
    val df = Seq(Some(3L), None, Some(1L), None).toDF("id")
      .select(call_function("collect_min_k", col("id"), lit(5)).as("ids"))
    assert(df.as[Seq[Long]].head() === Seq(1L, 3L))
  }

  test("empty group evaluates to an empty array, not null") {
    val df = Seq.empty[Long].toDF("id")
      .select(call_function("collect_min_k", col("id"), lit(3)).as("ids"))
    assert(df.as[Seq[Long]].head() === Seq.empty)
  }

  test("bounded buffer survives heavy per-group volume and merge paths") {
    // 200k rows, 8 groups, k=5 — forces many trim cycles and partial
    // (map-side) buffers merging across 32 shuffle partitions; the
    // retained set must still be exactly the k smallest of each group
    val df = spark.range(200000)
      .select((col("id") % 8).as("g"), floor(col("id") / 8).cast("long").as("v"))
      .groupBy("g")
      .agg(call_function("collect_min_k", col("v"), lit(5)).as("ids"))
    val got = df.as[(Long, Seq[Long])].collect().toMap
    (0L until 8L).foreach { g =>
      assert(got(g) === Seq(0L, 1L, 2L, 3L, 4L))
    }
  }

  test("cap-filter contract: bit-equivalent to sort_array(collect_list) + post-hoc size filter") {
    // the Dedup usage: k = cap+1, groups over cap dropped, groups at or
    // under cap keep complete sorted membership — identical output to the
    // unbounded collect_list form on every group shape (sizes 1..cap+3)
    val cap = 6
    val rows = (0 until 10).flatMap { g =>
      // group g has g+1 members, ids descending to exercise the sort
      (0 until (g + 1)).map(i => (g.toLong, (1000 - i).toLong))
    }
    val df = rows.toDF("g", "id")
    val bounded = df.groupBy("g")
      .agg(call_function("collect_min_k", col("id"), lit(cap + 1)).as("ids"))
      .where(size(col("ids")).between(2, cap))
    val unbounded = df.groupBy("g")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")).between(2, cap))
    val a = bounded.as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    val b = unbounded.as[(Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("over-cap group retains exactly k elements including the true minimum") {
    val df = Seq(50L, 10L, 40L, 30L, 20L, 5L, 60L).toDF("id")
      .select(call_function("collect_min_k", col("id"), lit(4)).as("ids"))
    val ids = df.as[Seq[Long]].head()
    assert(ids === Seq(5L, 10L, 20L, 30L))
    assert(ids.head === 5L) // ids[0] = global min — the chain representative
  }

  test("analysis-time rejection: wrong id type, non-literal or invalid k") {
    val df = Seq((1, "a")).toDF("i", "s")
    intercept[AnalysisException] {
      df.select(call_function("collect_min_k", col("s"), lit(3))).collect()
    }
    intercept[AnalysisException] {
      df.select(call_function("collect_min_k", col("i").cast("long"), col("i")))
        .collect()
    }
    intercept[AnalysisException] {
      df.select(call_function("collect_min_k", col("i").cast("long"), lit(0)))
        .collect()
    }
  }
}
