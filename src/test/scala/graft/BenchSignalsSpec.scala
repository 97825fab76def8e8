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

  test("calibration hardening: implausibly-fast minima are rejected, not folded") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-cal-").toString + "/cal"
    // a corrupt/foreign file claiming a 1 ms idle would permanently
    // tighten the 1.5x congestion gate (every later run self-labels
    // congested) — the physical floor rejects it outright
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "0.001 0.0001".getBytes("UTF-8"))
    assert(Bench.readCal(path).isEmpty)
    // the next genuine run replaces it rather than min-folding the bogus value
    Bench.updateCal(path, Seq(0.25), Seq(0.06))
    assert(Bench.readCal(path) === Some((0.25, 0.06)))
    // implausible observations are filtered on the write side too
    Bench.updateCal(path, Seq(0.001), Seq(0.0001))
    assert(Bench.readCal(path) === Some((0.25, 0.06)))
  }

  test("calibration aging: a stale stamp recalibrates; writes refresh it") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-cal-").toString + "/cal"
    val now = System.currentTimeMillis()
    // baked-into-a-container-image vintage: past the age-out horizon
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      s"0.25 0.06 ${now - Bench.CalMaxAgeMs - 1000}".getBytes("UTF-8"))
    assert(Bench.readCal(path, now).isEmpty)
    // fresh stamp accepted
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      s"0.25 0.06 $now".getBytes("UTF-8"))
    assert(Bench.readCal(path, now) === Some((0.25, 0.06)))
    // legacy stampless two-field file: honored once, stamped on rewrite
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "0.25 0.06".getBytes("UTF-8"))
    assert(Bench.readCal(path, now) === Some((0.25, 0.06)))
    Bench.updateCal(path, Seq(0.30), Seq(0.09))
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(content.trim.split("\\s+").length === 3)
  }

  test("default calibration path is per-user and per-host, not shared /tmp") {
    val p = Bench.defaultCalPath()
    assert(p.startsWith(sys.props("user.home")))
    assert(p.contains(".graft_canary_cal."))
    assert(!p.startsWith("/tmp/"))
  }

  test("primary bench line is emitted BEFORE the isolate pass (kill-mid-isolates survives)") {
    // The r16 failure: the only stdout JSON printed AFTER up to 19
    // cold-JVM isolate re-runs, so a driver timeout mid-isolates lost
    // the round's entire perf artifact. This drives the real main in a
    // child JVM over a 2-query subset, kills it the moment the first
    // [isolate] marker appears on stderr, and requires that stdout
    // ALREADY carries a complete parseable summary line.
    val javaBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "java").toString
    val classes = graft.Bench.getClass.getProtectionDomain
      .getCodeSource.getLocation.getPath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-order-")
    val cmd = Seq(javaBin) ++ addOpens ++
      Seq("-Xmx4g", "-cp", s"$classes:/opt/spark/jars/*", "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(tmp.toFile)
    pb.environment().put("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    pb.environment().put("SPARK_GRAFT_BENCH_SUBSET",
      "s2_scan_project,a3_global_count")
    pb.environment().put("SPARK_GRAFT_BENCH_RUNS", "1")
    pb.environment().put("SPARK_GRAFT_CANARY_CAL", s"$tmp/cal")
    val p = pb.start()
    val outLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val outReader = new Thread(() =>
      try scala.io.Source.fromInputStream(p.getInputStream)
        .getLines().foreach(outLines.add)
      catch { case _: Throwable => () })
    outReader.setDaemon(true); outReader.start()
    val sawIsolate = new java.util.concurrent.CountDownLatch(1)
    val errReader = new Thread(() =>
      try scala.io.Source.fromInputStream(p.getErrorStream)
        .getLines().foreach { l =>
          if (l.contains("[isolate]")) sawIsolate.countDown()
        }
      catch { case _: Throwable => () })
    errReader.setDaemon(true); errReader.start()
    try {
      val marked = sawIsolate.await(8, java.util.concurrent.TimeUnit.MINUTES)
      assert(marked, "bench child never reached the isolate pass")
      // the kill arrives mid-isolates — exactly the r16 driver timeout
      p.destroyForcibly()
      p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
      outReader.join(10000)
      import scala.jdk.CollectionConverters._
      val summary = outLines.asScala.filter(_.contains("\"metric\":\"total\""))
      assert(summary.nonEmpty,
        "no primary summary line on stdout before the isolate pass")
      val line = summary.last
      assert(line.contains("\"n_queries\":2"))
      assert(line.endsWith("}")) // complete, parseable line — not a torso
      assert(!line.contains("\"isolated\"")) // primary form, pre-enrichment
      // the full artifact exists on disk too, written before any child
      val full = new String(java.nio.file.Files.readAllBytes(
        tmp.resolve("bench_full.json")), "UTF-8")
      assert(full.contains("\"metric\":\"total\""))
    } finally {
      p.destroyForcibly()
      ()
    }
  }
}
