package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ops.TxTable

/** The transactional table's BATCH reader/writer face
  * (`spark.read.format("txtable")`, SQL `USING txtable`, save modes,
  * time-travel options, and the filter-pushdown file skipping). */
class TxBatchRelationSpec extends SparkTestBase {

  private def df(range: Range) = {
    import spark.implicits._
    range.map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("read.format and SQL USING table read the head snapshot") {
    val dir = Files.createTempDirectory("graft-txrel-").toString
    val t = TxTable(spark, s"$dir/t")
    t.append(df(0 until 50))
    val viaReader = spark.read.format("txtable")
      .option("path", s"$dir/t").load()
    assert(viaReader.count() === 50)
    assert(viaReader.where(col("payload") === "row-7").count() === 1)
    spark.sql(s"CREATE TABLE graft_tx_rel USING txtable " +
      s"LOCATION '$dir/t'")
    try {
      assert(spark.sql(
        "SELECT COUNT(*) FROM graft_tx_rel WHERE id < 10")
        .head().getLong(0) === 10L)
    } finally spark.sql("DROP TABLE graft_tx_rel")
  }

  test("versionAsOf and timestampAsOf options time-travel") {
    val dir = Files.createTempDirectory("graft-txrel-tt-").toString
    val t = TxTable(spark, s"$dir/t")
    t.append(df(0 until 10)) // v0
    val tsAfterV0 = System.currentTimeMillis()
    Thread.sleep(5)
    t.overwrite(df(100 until 103)) // v1
    // fresh reader per read: DataFrameReader options are mutable state
    def read = spark.read.format("txtable").option("path", s"$dir/t")
    assert(read.option("versionAsOf", "0").load().count() === 10)
    assert(read.load().count() === 3)
    assert(read.option("timestampAsOf", tsAfterV0.toString)
      .load().count() === 10)
    intercept[IllegalArgumentException] {
      read.option("versionAsOf", "0")
        .option("timestampAsOf", "0").load()
    }
  }

  test("pushed filters skip files: out-of-range file is never opened") {
    val dir = Files.createTempDirectory("graft-txrel-skip-").toString
    val t = TxTable(spark, s"$dir/t")
    (0 until 4).foreach(i => t.append(df(i * 100 until i * 100 + 100)))
    // corrupt a file whose id range is [300, 399]: a scan that opens it
    // fails loudly, so a SUCCESSFUL pruned read PROVES it was skipped.
    // Only the DATA PAGES are destroyed — the parquet magic and footer
    // stay intact — because schema inference legitimately reads ONE
    // footer (the lexicographically first data file's), and the staged
    // names are random UUIDs: truncating the whole file made the test
    // flake whenever the victim happened to sort first (observed), which
    // tests inference's file pick, not the pruned scan under test.
    val victim = t.snapshot().files.find { f =>
      spark.read.parquet(f).agg(min(col("id"))).head().getLong(0) == 300L
    }.get
    locally {
      val raf = new java.io.RandomAccessFile(victim, "rw")
      try {
        // footer = trailing [4-byte length][PAR1]; wreck everything
        // between the leading magic and the footer start
        raf.seek(raf.length() - 8)
        val lenBytes = new Array[Byte](4)
        raf.readFully(lenBytes)
        val footerLen = java.nio.ByteBuffer.wrap(lenBytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
        val footerStart = raf.length() - 8 - footerLen
        raf.seek(4)
        raf.write(Array.fill[Byte]((footerStart - 4).toInt)(0x7))
      } finally raf.close()
    }
    val rel = spark.read.format("txtable").option("path", s"$dir/t").load()
    assert(rel.where(col("id") === 42L).count() === 1)
    assert(rel.where(col("id") >= 100L && col("id") < 150L).count() === 50)
    // IN prunes via its conservative [min, max] envelope too
    assert(rel.where(col("id").isin(42L, 55L)).count() === 2)
    // without the predicate the corrupt file IS read -> loud failure
    // (an aggregate over a real column: a bare count() is served from
    // footer metadata alone and never touches the wrecked pages)
    intercept[Exception] { rel.agg(sum(col("id"))).head() }
  }

  test("save modes: append, overwrite, errorIfExists, ignore") {
    val dir = Files.createTempDirectory("graft-txrel-w-").toString
    val p = s"$dir/t"
    df(0 until 10).write.format("txtable").option("path", p).save()
    df(10 until 15).write.format("txtable").option("path", p)
      .mode("append").save()
    val t = TxTable(spark, p)
    assert(t.read().count() === 15)
    assert(t.snapshot().version === 1) // two atomic commits
    df(100 until 102).write.format("txtable").option("path", p)
      .mode("overwrite").save()
    assert(t.read().count() === 2)
    assert(t.readAt(1).count() === 15) // history preserved
    intercept[Exception] {
      df(0 until 3).write.format("txtable").option("path", p)
        .mode("errorifexists").save()
    }
    df(0 until 3).write.format("txtable").option("path", p)
      .mode("ignore").save() // existing table: no-op
    assert(t.read().count() === 2)
    // write-path guards still apply through the writer API
    intercept[Exception] {
      import spark.implicits._
      Seq((1, "x")).toDF("wrong", "cols").write.format("txtable")
        .option("path", p).mode("append").save()
    }
  }

  test("CTAS: CREATE TABLE ... USING txtable AS SELECT seeds the table") {
    val dir = Files.createTempDirectory("graft-txrel-ctas-").toString
    df(0 until 25).createOrReplaceTempView("txrel_ctas_src")
    spark.sql(
      s"CREATE TABLE graft_tx_ctas USING txtable LOCATION '$dir/t' " +
        "AS SELECT * FROM txrel_ctas_src WHERE id < 20")
    try {
      // the catalog table reads back through the relation...
      assert(spark.table("graft_tx_ctas").count() === 20)
      // ...and the location is a REAL transactional table: commit log,
      // snapshot, programmatic API all work
      val t = TxTable(spark, s"$dir/t")
      assert(t.snapshot().version === 0)
      assert(t.read().where(col("id") === 7L).count() === 1)
      t.append(df(100 until 105))
      // catalog reads cache the resolved relation (standard Spark DSv1
      // behavior, same as parquet tables) — and the relation pins its
      // version — so an external commit surfaces after refreshTable
      spark.catalog.refreshTable("graft_tx_ctas")
      assert(spark.table("graft_tx_ctas").count() === 25)
    } finally spark.sql("DROP TABLE graft_tx_ctas")
  }

  test("a head read pins the version resolved at relation creation") {
    val dir = Files.createTempDirectory("graft-txrel-pin-").toString
    val t = TxTable(spark, s"$dir/t")
    t.append(df(0 until 20)) // v0
    val rel = spark.read.format("txtable")
      .option("path", s"$dir/t").load()
    // a commit landing BETWEEN relation creation and the scan must not
    // leak into the relation: schema was captured at creation, so data
    // must come from the same pinned version — and two scans of the
    // same relation must agree with each other
    t.append(df(20 until 35)) // v1
    assert(rel.count() === 20)
    assert(rel.where(col("id") >= 0).count() === 20)
    // a FRESH relation sees the new head
    assert(spark.read.format("txtable").option("path", s"$dir/t")
      .load().count() === 35)
  }

  test("batch CDF options: version window, inclusive bounds, tags") {
    val dir = Files.createTempDirectory("graft-txrel-cdf-").toString
    val t = TxTable(spark, s"$dir/t")
    t.append(df(0 until 10))   // v0
    t.append(df(10 until 15))  // v1
    t.deleteBetween("id", 0L, 2L) // v2: rewrite, net 3 deletes
    def read = spark.read.format("txtable").option("path", s"$dir/t")
      .option("readChangeFeed", "true")
    // [1, head]: v1's 5 inserts + v2's 3 deletes
    val w1 = read.option("startingVersion", "1").load()
    assert(w1.count() === 8)
    assert(w1.where(col("_change_type") === "insert").count() === 5)
    assert(w1.where(col("_change_type") === "delete")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(0L, 1L, 2L))
    // inclusive ending bound cuts v2 out
    assert(read.option("startingVersion", "1")
      .option("endingVersion", "1").load().count() === 5)
    // from v0: the initial append surfaces as inserts too
    assert(read.option("startingVersion", "0").load().count() === 18)
  }

  test("batch CDF timestamp forms resolve via UTC, not the host zone") {
    val dir = Files.createTempDirectory("graft-txrel-cdfts-").toString
    val t = TxTable(spark, s"$dir/t")
    t.append(df(0 until 4)) // v0
    Thread.sleep(5)
    val mid = System.currentTimeMillis()
    Thread.sleep(5)
    t.append(df(4 until 9)) // v1
    def read = spark.read.format("txtable").option("path", s"$dir/t")
      .option("readChangeFeed", "true")
    // epoch-millis forms: start at the first commit at-or-after mid
    assert(read.option("startingTimestamp", mid.toString)
      .load().count() === 5)
    assert(read.option("startingTimestamp", "0")
      .option("endingTimestamp", mid.toString).load().count() === 4)
    // the wall-clock string form is parsed as UTC: render `mid` in UTC
    // and expect the same window a host-zone parse would only give on
    // a UTC machine
    val utc = java.time.Instant.ofEpochMilli(mid)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime.toString
      .replace('T', ' ')
    assert(read.option("startingTimestamp", utc).load().count() === 5)
  }

  test("batch CDF option conflicts refuse loudly") {
    val dir = Files.createTempDirectory("graft-txrel-cdfx-").toString
    val t = TxTable(spark, s"$dir/t")
    t.append(df(0 until 3))
    def read = spark.read.format("txtable").option("path", s"$dir/t")
      .option("readChangeFeed", "true")
    intercept[IllegalArgumentException] { read.load() } // no start
    intercept[IllegalArgumentException] {
      read.option("startingVersion", "0")
        .option("startingTimestamp", "0").load()
    }
    intercept[IllegalArgumentException] {
      read.option("startingVersion", "0")
        .option("versionAsOf", "0").load()
    }
    intercept[IllegalArgumentException] {
      read.option("startingVersion", "1")
        .option("endingVersion", "0").load()
    }
  }

  test("sizeInBytes: a small txtable dimension auto-broadcasts in a join") {
    val dir = Files.createTempDirectory("graft-txsize-").toString
    val t = TxTable(spark, s"$dir/dim")
    t.append(df(0 until 100))
    val rel = spark.read.format("txtable").option("path", s"$dir/dim")
      .load()
    // the relation reports the snapshot's real byte size, not the
    // infinite default that forbids broadcasting forever
    val stats = rel.queryExecution.optimizedPlan.stats
    val onDisk = t.snapshot().files
      .map(f => new File(f).length()).sum
    assert(onDisk > 0)
    assert(stats.sizeInBytes.toLong <= 4 * onDisk,
      s"sizeInBytes ${stats.sizeInBytes} not derived from $onDisk")
    // and the planner ACTS on it: dim joined to a wide range becomes
    // a broadcast join with no explicit hint
    import spark.implicits._
    val fact = spark.range(100000L).map(i => (i % 100L, i))
      .toDF("id", "v")
    val plan = fact.join(rel, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected auto-broadcast of the txtable side:\n$plan")
    // time travel keeps its own pinned size (v0 == head here)
    val v0 = spark.read.format("txtable").option("path", s"$dir/dim")
      .option("versionAsOf", "0").load()
    assert(v0.queryExecution.optimizedPlan.stats
      .sizeInBytes.toLong <= 4 * onDisk)
  }

  test("buildScan applies pushed filters INSIDE the inner parquet plan") {
    import org.apache.spark.sql.sources.{EqualTo, In, IsNotNull}
    val dir = Files.createTempDirectory("graft-txpush-").toString
    val t = TxTable(spark, s"$dir/t")
    t.append(df(0 until 100))
    val rel = new graft.sources.tx.DefaultSource()
      .createRelation(spark.sqlContext, Map("path" -> s"$dir/t"))
      .asInstanceOf[org.apache.spark.sql.sources.PrunedFilteredScan]
    // the contract allows false positives, but delivering them means
    // every row of every candidate file is decoded and shipped — the
    // scan must return ONLY matching rows, proving the filter reached
    // the inner plan (where parquet row-group skipping engages)
    assert(rel.buildScan(Array("id"),
      Array(EqualTo("id", 5L))).count() === 1)
    assert(rel.buildScan(Array("id", "payload"),
      Array(In("id", Array(1L, 3L, 999L)))).count() === 2)
    assert(rel.buildScan(Array("id"),
      Array(IsNotNull("id"))).count() === 100)
    // an untranslatable filter is skipped, never dropped rows
    assert(rel.buildScan(Array("id"),
      Array(org.apache.spark.sql.sources
        .StringContains("payload", "row-1"))).count() === 100)
    // and through the DataFrame face the results stay exact
    val viaDf = spark.read.format("txtable").option("path", s"$dir/t")
      .load().where(col("id").between(10, 12))
    assert(viaDf.count() === 3)
  }

  test("IN with NaN/Infinity values scans unpruned instead of crashing") {
    import spark.implicits._
    import org.apache.spark.sql.sources.In
    val dir = Files.createTempDirectory("graft-txnan-").toString
    val t = TxTable(spark, s"$dir/t")
    t.append((0 until 20).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    val rel = new graft.sources.tx.DefaultSource()
      .createRelation(spark.sqlContext, Map("path" -> s"$dir/t"))
      .asInstanceOf[org.apache.spark.sql.sources.PrunedFilteredScan]
    // NaN/Infinity can't feed the min/max envelope's BigDecimal
    // ordering — such a list must skip FILE pruning (the inner-plan
    // `isin` still filters rows), never throw NumberFormatException
    assert(rel.buildScan(Array("id", "x"),
      Array(In("x", Array[Any](1.0d, Double.NaN)))).count() === 1)
    assert(rel.buildScan(Array("id", "x"),
      Array(In("x", Array[Any](2.0d, Double.PositiveInfinity))))
      .count() === 1)
    assert(rel.buildScan(Array("id", "x"),
      Array(In("x", Array[Any](3.0f, Float.NaN)))).count() === 1)
    // through the SQL face the RESULT stays exact
    val got = spark.read.format("txtable").option("path", s"$dir/t")
      .load().where(col("x").isin(1.0d, Double.NaN))
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L))
    // finite-only IN lists still prune (two well-separated files)
    t.append((1000 until 1020).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x"))
    assert(rel.buildScan(Array("id"),
      Array(In("x", Array[Any](1.0d, 3.0d)))).count() === 2)
  }
}
