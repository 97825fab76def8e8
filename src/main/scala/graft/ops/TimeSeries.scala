package graft.ops

import org.apache.spark.sql.Dataset

/** Sequential per-key time-series kernels. The windowed/relational
  * event analytics (sessionization, gap fill, funnels, sliding
  * windows) live in the query layer as window functions; this module
  * carries the RECURRENCES — per-key running state that window
  * functions cannot express without an O(n²) prefix blow-up.
  *
  * Scale shape: `groupByKey(key).flatMapGroups` — one shuffle on the
  * key, then a single ordered O(n) pass per key with O(1) state. This
  * is the batch twin of `mapGroupsWithState`: the same fold runs
  * incrementally under Structured Streaming. Per-key event counts
  * bound the in-memory sort; a skewed key costs its own events only,
  * never a partition-wide materialization.
  */
object TimeSeries {

  /** One observation: `tsUs` = event time in epoch micros (ties break
    * on `event_id`, making the fold order total and cross-engine
    * deterministic). */
  final case class Point(user_id: Long, event_id: Long, tsUs: Long,
      value: Double)

  final case class EwmaPoint(user_id: Long, event_id: Long, ewma: Double)

  /** Exponentially-weighted moving average per key, emitted AT EVERY
    * POINT: `ewma_1 = x_1`, `ewma_i = α·x_i + (1−α)·ewma_{i−1}` — the
    * standard monitoring/feature-engineering smoother. The closed-form
    * power-sum rewrite would let plain window functions express this,
    * but its `(1−α)^{-i}` factors overflow doubles after ~2.5k points
    * per key; the sequential fold is exact for any length. */
  def ewma(points: Dataset[Point], alpha: Double): Dataset[EwmaPoint] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0, 1], got $alpha")
    import points.sparkSession.implicits._
    points.groupByKey(_.user_id).flatMapGroups { (u, it) =>
      val xs = it.toArray
      java.util.Arrays.sort(xs, Ordering.by((p: Point) => (p.tsUs, p.event_id)))
      var acc = 0.0
      var first = true
      xs.iterator.map { p =>
        acc =
          if (first) { first = false; p.value }
          else alpha * p.value + (1 - alpha) * acc
        EwmaPoint(u, p.event_id, acc)
      }
    }
  }

  final case class CusumPoint(user_id: Long, event_id: Long,
      cusum: Double, alarm: Boolean)

  /** One-sided CUSUM changepoint statistic per key (Page 1954 — the
    * classic sequential drift detector): `s_0 = 0`,
    * `s_i = max(0, s_{i−1} + x_i − k)` with reference level `k`, alarm
    * when `s_i > h`. A sustained upward shift of the mean accumulates;
    * in-control noise resets to zero — the monitoring recurrence that,
    * like EWMA, no window function expresses in O(n). Same scale and
    * streaming shape as [[ewma]]: one key shuffle, O(n) ordered fold,
    * O(1) state. */
  def cusum(points: Dataset[Point], k: Double,
      h: Double): Dataset[CusumPoint] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.user_id).flatMapGroups { (u, it) =>
      val xs = it.toArray
      java.util.Arrays.sort(xs, Ordering.by((p: Point) => (p.tsUs, p.event_id)))
      var s = 0.0
      xs.iterator.map { p =>
        s = math.max(0.0, s + p.value - k)
        CusumPoint(u, p.event_id, s, s > h)
      }
    }
  }
}
