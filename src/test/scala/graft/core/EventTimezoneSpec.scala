package graft.core

import org.apache.spark.sql.functions.{col, unix_micros}

import graft.SparkTestBase

/** [[Tables.events]]' UTC pin: the loader's NTZ→TZ normalization cast is
  * value-preserving only under a UTC session zone, so the loader must
  * pin the zone itself — a caller whose session runs a wall-clock zone
  * gets the SAME instants, not zone-shifted ones. */
class EventTimezoneSpec extends SparkTestBase {
  import spark.implicits._

  test("events() yields identical instants under a non-UTC session zone") {
    val dir = sf("sf0.001")
    val zoneKey = "spark.sql.session.timeZone"
    def instants(): Seq[Long] = Tables.events(spark, dir)
      .select(unix_micros(col("ts"))).as[Long]
      .orderBy(col("ts")).limit(50).collect().toSeq
    val underUtc = instants()
    try {
      // a caller session running wall-clock time: without the loader's
      // pin, the TimestampNTZ→Timestamp cast shifts every instant by
      // the zone offset (hours!) — far outside any rounding tolerance
      spark.conf.set(zoneKey, "America/New_York")
      val underNyc = instants()
      assert(underNyc === underUtc,
        "events() shifted instants under a non-UTC session zone")
      // the loader leaves the session pinned to the engine's contract
      assert(spark.conf.get(zoneKey) === "UTC")
    } finally spark.conf.set(zoneKey, "UTC")
  }

  test("eventsRawNanos() yields identical nanos under a non-UTC session zone") {
    val dir = sf("sf0.001")
    val zoneKey = "spark.sql.session.timeZone"
    def nanos(): Seq[Long] = Tables.eventsRawNanos(spark, dir)
      .select(col("ts")).as[Long]
      .orderBy(col("ts")).limit(50).collect().toSeq
    val underUtc = nanos()
    try {
      spark.conf.set(zoneKey, "Asia/Tokyo")
      assert(nanos() === underUtc,
        "eventsRawNanos() shifted under a non-UTC session zone")
    } finally spark.conf.set(zoneKey, "UTC")
  }
}
