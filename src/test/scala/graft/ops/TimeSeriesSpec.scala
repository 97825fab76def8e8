package graft.ops

import graft.SparkTestBase

/** Batch recurrences of [[TimeSeries]]: EWMA fold values and ordering,
  * CUSUM accumulation/reset/alarm semantics. */
class TimeSeriesSpec extends SparkTestBase {

  private def pts(vs: (Long, Long, Double)*) = {
    import spark.implicits._
    vs.map { case (id, ts, v) => TimeSeries.Point(1L, id, ts, v) }.toDS()
  }

  test("ewma: first value seeds; fold follows event-time order, not input order") {
    import spark.implicits._
    // deliberately out of order in the input
    val out = TimeSeries.ewma(pts((2L, 200L, 4.0), (1L, 100L, 2.0)), 0.3)
      .collect().map(p => p.event_id -> p.ewma).toMap
    assert(out(1L) === 2.0)
    assert(math.abs(out(2L) - (0.3 * 4.0 + 0.7 * 2.0)) < 1e-12)
  }

  test("cusum: drift accumulates, in-control resets to zero, alarm trips") {
    import spark.implicits._
    // k = 5: values 4,3 are in-control (reset to 0); then a sustained
    // shift 9,9,9 accumulates 4, 8, 12 and trips h = 10 at the third
    val out = TimeSeries.cusum(pts(
      (1L, 1L, 4.0), (2L, 2L, 3.0), (3L, 3L, 9.0), (4L, 4L, 9.0),
      (5L, 5L, 9.0)), k = 5.0, h = 10.0)
      .collect().sortBy(_.event_id)
    assert(out.map(_.cusum).toSeq === Seq(0.0, 0.0, 4.0, 8.0, 12.0))
    assert(out.map(_.alarm).toSeq ===
      Seq(false, false, false, false, true))
  }
}
