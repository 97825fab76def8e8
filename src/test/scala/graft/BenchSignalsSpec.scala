package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's MID-RUN congestion verdict ([[Bench.midrunCongested]]):
  * per-query-boundary canary samples against the run's own median.
  * The r14 failure mode this pins: congestion arriving AFTER the start
  * canary/loadavg gate (which stamped `congested:false` over a 57%
  * phantom regression) must flip the stamp; ordinary GC/scheduler
  * jitter — the measured clean-run band is ~0.076–0.125 s — must not. */
class BenchSignalsSpec extends AnyFunSuite {

  private val idle = 0.066 // the scaled idle floor (idleCal / 4)

  /** A realistic clean-run sample stream: the measured band, with the
    * occasional high tail a busy JVM produces. */
  private def clean(n: Int): Seq[Double] =
    (0 until n).map(i =>
      if (i % 17 == 0) 0.118 else 0.080 + 0.006 * (i % 4))

  test("a clean run (measured jitter band included) is not congested") {
    assert(!Bench.midrunCongested(clean(180), idle))
  }

  test("congestion arriving mid-suite flips the stamp") {
    // clean majority (establishes the baseline), tail under sustained
    // external load (~2x samples, the r11/r14 class); congestion
    // covering MORE than half the suite overlaps an endpoint, where
    // the start/end canary pair gates instead
    val arrived = clean(110) ++ (0 until 70).map(_ => 0.17)
    assert(Bench.midrunCongested(arrived, idle))
    // even a stretch of three adjacent queries under load flags
    val burst = clean(90) ++ Seq(0.16, 0.17, 0.16) ++ clean(87)
    assert(Bench.midrunCongested(burst, idle))
  }

  test("one or two isolated hiccups do not fake congestion") {
    val one = clean(90) ++ Seq(0.16) ++ clean(89)
    assert(!Bench.midrunCongested(one, idle))
    val two = clean(90) ++ Seq(0.16, 0.17) ++ clean(88)
    assert(!Bench.midrunCongested(two, idle))
  }

  test("a single EXTREME sample (>2.5x median) flags alone") {
    val extreme = clean(90) ++ Seq(0.30) ++ clean(89)
    assert(Bench.midrunCongested(extreme, idle))
  }

  test("the idle floor guards a run whose whole distribution is depressed") {
    // a hypothetical faster box: samples near 0.03 with one 0.08
    // spike — relative to the floor (0.066) nothing is hot
    val fast = (0 until 100).map(i => if (i == 50) 0.080 else 0.030)
    assert(!Bench.midrunCongested(fast, idle))
  }

  test("degenerate inputs stay quiet") {
    assert(!Bench.midrunCongested(Nil, idle))
    assert(!Bench.midrunCongested(Seq(0.5, 0.5), idle))
  }

  test("self-calibration: stored host minimum replaces the constant; env wins") {
    // precedence: env override > stored per-host minimum > bootstrap
    assert(Bench.effectiveIdleCal(None, None) === 0.263)
    assert(Bench.effectiveIdleCal(None, Some(0.1)) === 0.1)
    assert(Bench.effectiveIdleCal(Some("0.4"), Some(0.1)) === 0.4)
    // a fabricated LOWER calibration tightens the stamp: a 0.2 s
    // canary is clean against the 0.263 bootstrap (1.5x = 0.3945)
    // but flags against a 0.1 host calibration (1.5x = 0.15)
    val canary = 0.2
    assert(canary <= 1.5 * Bench.effectiveIdleCal(None, None))
    assert(canary > 1.5 * Bench.effectiveIdleCal(None, Some(0.1)))
  }

  test("calibration file: min-ever fold, atomic write, garbage tolerated") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-cal-").toString + "/cal"
    assert(Bench.readCal(path).isEmpty) // absent: no calibration
    Bench.updateCal(path, Seq(0.30, 0.28), Seq(0.09, 0.08))
    assert(Bench.readCal(path) === Some((0.28, 0.08)))
    // a later (congested) run can only LOWER the minima, never raise
    Bench.updateCal(path, Seq(0.90), Seq(0.40))
    assert(Bench.readCal(path) === Some((0.28, 0.08)))
    Bench.updateCal(path, Seq(0.21), Seq(0.07))
    assert(Bench.readCal(path) === Some((0.21, 0.07)))
    // garbage or non-positive content is ignored, not fatal
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "not numbers".getBytes("UTF-8"))
    assert(Bench.readCal(path).isEmpty)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "-1 0".getBytes("UTF-8"))
    assert(Bench.readCal(path).isEmpty)
    Bench.updateCal(path, Seq(0.25), Seq(0.06)) // recovers from garbage
    assert(Bench.readCal(path) === Some((0.25, 0.06)))
  }
}
