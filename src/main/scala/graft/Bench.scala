package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** --add-opens set Spark 4 needs on JDK 17 — mirrored from the sbt
    * fork options so a child JVM sees the same module grants no matter
    * which launcher started the parent. */
  private[graft] val AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** Re-run one query in a FRESH child JVM (min-of-2): shared-JVM
    * medians drift with the cache/JIT/GC neighborhood of whatever ran
    * before them — a cold JVM per query is the only clean
    * round-over-round A/B. Runs regardless of launcher (sbt's
    * in-process classloader included): the classpath is rebuilt from
    * this class's own code location + the Spark jars dir, not from
    * java.class.path. Returns -1.0 on timeout/parse failure. */
  private def isolatedTime(name: String, sfDir: String): Double = {
    val javaBin = java.nio.file.Paths
      .get(sys.props("java.home"), "bin", "java").toString
    val classes = getClass.getProtectionDomain.getCodeSource
      .getLocation.getPath
    val sparkJars = java.nio.file.Paths
      .get(sys.props.getOrElse("graft.spark.jars", "/opt/spark/jars"))
    val cmd = Seq(javaBin) ++ AddOpens ++ Seq(
      s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
      "-cp", s"$classes:$sparkJars/*", "graft.Bench")
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_BENCH_ONLY", name)
    pb.environment().put("SPARK_GRAFT_BENCH_RUNS", "2")
    pb.environment().put("SPARK_GRAFT_BENCH_AGG", "min")
    pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
    pb.redirectErrorStream(false)
    pb.redirectError(ProcessBuilder.Redirect.INHERIT)
    try {
      val p = pb.start()
      // drain stdout BEFORE waitFor — an un-read pipe deadlocks the child
      val out = scala.io.Source.fromInputStream(p.getInputStream)
        .getLines().toVector
      val done = p.waitFor(20, java.util.concurrent.TimeUnit.MINUTES)
      if (!done) { p.destroyForcibly(); return -1.0 }
      val line = out.reverseIterator
        .find(_.contains("\"metric\"")).getOrElse(return -1.0)
      val re = ("\"" + java.util.regex.Pattern.quote(name) +
        "\":(-?[0-9.]+)").r
      re.findFirstMatchIn(line).map(_.group(1).toDouble).getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }
  }

  /** Machine-congestion canary: a FIXED, deterministic, CPU-bound
    * computation (32 threads × 200M LCG steps — no Spark, no I/O, no
    * allocation) timed at suite start and end. Its wall time depends
    * only on how much CPU this machine can actually give the bench,
    * so a congested driver run is SELF-DIAGNOSING: code regressions
    * move query times but not the canary; a busy machine moves both
    * (r9 and r10 each cost a judge re-bench to tell those apart —
    * this closes that adjudication mechanically). min-of-2 so one
    * scheduler hiccup can't fake congestion; `@volatile` sink defeats
    * dead-code elimination. */
  @volatile private var canarySink = 0L

  private def canaryOnce(iters: Long): Double = {
    val threads = 32
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + t
        var acc = 0L
        var i = 0L
        while (i < iters) {
          x = x * 6364136223846793005L + 1442695040888963407L
          acc ^= (x >>> 33)
          i += 1
        }
        canarySink ^= acc
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  private def canary(): Double =
    math.min(canaryOnce(200000000L), canaryOnce(200000000L))

  /** MID-RUN canary: the same fixed computation at 1/4 the work
    * (~70 ms idle), sampled once per QUERY BOUNDARY during the shared
    * sweep — the r14 lesson's fix. The start/end canary pair brackets
    * the suite but is blind to congestion that arrives AND bites
    * between them (r14: load_start 3.93 vs threshold 4.0, then
    * load_end 10.10 and a 57% phantom regression stamped
    * `congested:false`). Boundary samples run while OUR executor
    * threads are parked, so they see EXTERNAL CPU pressure, not
    * self-load — unlike mid-run loadavg, which our own 32-way queries
    * saturate on any healthy run (that number is still recorded, as
    * `load_max_midrun`, for the human reader). */
  private def miniCanary(): Double = canaryOnce(50000000L)

  /** Mid-run congestion verdict from the boundary samples. The
    * baseline is the RUN'S OWN MEDIAN sample (floored by the scaled
    * idle calibration) — measured clean-run distributions here sit in
    * a ~0.076–0.125 s band whose minimum is a lucky tail, so a
    * min-based baseline would flag ordinary GC/scheduler jitter; the
    * median is stable, and congestion covering less than half the
    * suite leaves it clean while the hot stretch flags (congestion
    * covering MORE than half overlaps an endpoint, where the start/end
    * canary pair already gates). Flag only THREE CONSECUTIVE samples
    * above 1.35× baseline (external load persists across adjacent
    * queries; per-query GC noise does not) or any single sample above
    * 2.5× — heavy congestion (the r11/r14 class, loadavg ≈ 10, query
    * times 2–9×) pushes the mini canary well past both. */
  private[graft] def midrunCongested(samples: Seq[Double],
      idleFloor: Double): Boolean = {
    if (samples.size < 3) return false
    val sorted = samples.sorted
    val base = math.max(sorted(sorted.size / 2), idleFloor)
    val hot = samples.map(_ > 1.35 * base)
    hot.sliding(3).exists(_.forall(identity)) ||
      samples.exists(_ > 2.5 * base)
  }

  /** Physically-implausible calibration floors: the full canary is a
    * FIXED 32×200M-step LCG chain (6.4e9 sequential multiply-adds split
    * 32 ways — under 0.02 s would need >10 GHz per core), the mini is a
    * quarter of it. A stored minimum below these is a corrupt/foreign
    * file, not a fast host, and must not permanently tighten the 1.5×
    * congestion gate (every later run would self-label congested with
    * only the env override as recovery). */
  private[graft] val MinPlausibleFullCal = 0.02
  private[graft] val MinPlausibleMiniCal = 0.005

  /** Stored calibrations older than this recalibrate from scratch: the
    * write path refreshes the stamp on every run, so age-out only fires
    * after a month with no benching — a container image baked with a
    * stale file, or hardware that changed underneath it. */
  private[graft] val CalMaxAgeMs = 30L * 24 * 3600 * 1000

  /** Host canary SELF-CALIBRATION (r15 "missing #5"): the minimum
    * full-size and mini canary ever observed on this host, persisted
    * in a tiny file (full_min, mini_min, written_at_ms) — min-ever
    * converges to the true idle after the first uncongested run, so the
    * congestion gate stays calibrated on ANY hardware instead of
    * trusting a hardcoded constant that silently goes stale.
    * Read/update are best-effort (a lost update only delays
    * convergence); implausibly-low and stale entries are rejected
    * (see [[MinPlausibleFullCal]], [[CalMaxAgeMs]]). */
  private[graft] def readCal(path: String,
      nowMs: Long = System.currentTimeMillis()): Option[(Double, Double)] =
    try {
      val parts = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8").trim.split("\\s+")
      if (parts.length >= 2) {
        val f = parts(0).toDouble
        val m = parts(1).toDouble
        // legacy two-field files carry no stamp — treat as fresh once;
        // the next write adds one
        val fresh = parts.length < 3 ||
          (nowMs - parts(2).toLong) <= CalMaxAgeMs
        if (f >= MinPlausibleFullCal && m >= MinPlausibleMiniCal && fresh)
          Some((f, m))
        else None
      } else None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fold this run's observations into the stored minima (atomic
    * tmp+rename, racing benches both land A valid file; the write stamp
    * refreshes so an actively-benched host never ages out). */
  private[graft] def updateCal(path: String, fulls: Seq[Double],
      minis: Seq[Double]): Unit =
    try {
      val prev = readCal(path)
      val f = (fulls ++ prev.map(_._1)).filter(_ >= MinPlausibleFullCal)
      val m = (minis ++ prev.map(_._2)).filter(_ >= MinPlausibleMiniCal)
      if (f.nonEmpty && m.nonEmpty) {
        val tmp = java.nio.file.Paths
          .get(path + ".tmp-" + ProcessHandle.current().pid())
        java.nio.file.Files.write(tmp,
          f"${f.min}%.6f ${m.min}%.6f ${System.currentTimeMillis()}%d"
            .getBytes("UTF-8"))
        java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  /** Default calibration file: per-user (under $HOME, not the
    * world-writable shared /tmp where another user's file — or one
    * baked into a container image — could poison the gate) and per-host
    * (the minimum is hardware-specific; a home dir mounted across
    * machines must not cross-calibrate them). */
  private[graft] def defaultCalPath(): String = {
    val host =
      try java.net.InetAddress.getLocalHost.getHostName
      catch { case scala.util.control.NonFatal(_) => "unknown" }
    sys.props.getOrElse("user.home", "/tmp") +
      "/.graft_canary_cal." + host.replaceAll("[^A-Za-z0-9._-]", "_")
  }

  /** The idle reference the congestion stamp compares against:
    * explicit env override > stored host minimum > the historical
    * bootstrap constant (this container's measured idle, kept only
    * so a first-ever run on a fresh host has A reference). A LOWER
    * stored calibration tightens the stamp (1.5× a smaller idle). */
  private[graft] def effectiveIdleCal(envOverride: Option[String],
      stored: Option[Double], default: Double = 0.263): Double =
    envOverride.map(_.toDouble).orElse(stored).getOrElse(default)

  /** First two /proc/loadavg fields (1- and 5-minute load), or "?". */
  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split(" ").take(2).mkString(" ")
    catch { case _: Throwable => "?" }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // canary + loadavg BEFORE the session spins up (cleanest CPU
    // view); skipped in single-query isolation children — the parent
    // run's pair already brackets the whole suite
    val isChild = sys.env.contains("SPARK_GRAFT_BENCH_ONLY")
    val loadStart = loadavg()
    val canaryStart = if (isChild) -1.0 else canary()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // benchmark JVM hygiene (r17): with the UI off the app-status and
      // SQL listeners still retain per-job/stage/task/execution state up
      // to high default caps (1000 jobs/stages, 100k tasks, 1000 SQL
      // executions) — a 196-query × 4-execution sweep ages the JVM and
      // inflates late queries. Keep only a small live window; nothing
      // reads the history (no UI, no history server).
      .config("spark.ui.retainedJobs", "50")
      .config("spark.ui.retainedStages", "50")
      .config("spark.ui.retainedTasks", "2000")
      .config("spark.sql.ui.retainedExecutions", "10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Per-query warm-up at the smallest SF before timing at the target:
    // the first execution of a plan pays JIT + codegen compilation +
    // classloading, none of which a steady-state cluster job would —
    // measure the plan, not the compiler.
    val warmDir = "/root/testdata/sf0.001"
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Median of 3 timed runs per query: a single run is hostage to JIT
    // recompilation and GC pauses; the median is reproducible within ~10%
    // across bench invocations.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // "median" (default) or "min" — isolated cold-JVM mode uses min-of-2,
    // where the min is the better noise rejector (one JVM, no neighbors;
    // variance is all JIT/GC, and the faster run is closer to steady state)
    val agg = sys.env.getOrElse("SPARK_GRAFT_BENCH_AGG", "median")
    // comma-separated allowlist for single-query isolation runs
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // comma-separated allowlist that does NOT flip child mode: the full
    // parent protocol (canaries, primary-line-before-isolates, isolate
    // pass) runs over a restricted query set — the harness-protocol
    // spec's hook, also handy for targeted A/Bs
    val subset = sys.env.get("SPARK_GRAFT_BENCH_SUBSET")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // per-query-boundary congestion samples (see miniCanary); children
    // skip — their parent's samples bracket them
    val midSamples = scala.collection.mutable.ArrayBuffer.empty[Double]
    val midLoads = scala.collection.mutable.ArrayBuffer.empty[Double]
    def load1(s: String): Double =
      try s.split(" ").head.toDouble catch { case _: Throwable => 0.0 }
    // JIT warm-up for the mini canary's own loop: the first few
    // executions run interpreted/C1 and read ~2x hot (measured), which
    // would poison the early boundary samples
    if (!isChild) { miniCanary(); miniCanary(); () }
    val measured = graft.queries.Registry.all
      .filter(q => q.bench || q.benchBuild.isDefined)
      .filter(q => only.forall(_.contains(q.name)))
      .filter(q => subset.forall(_.contains(q.name))).map { q =>
      if (!isChild) {
        midSamples += miniCanary()
        midLoads += load1(loadavg())
      }
      // Write-heavy queries carry a two-stage benchBuild: the disk setup
      // (temp-dir writes) runs ONCE, untimed; the thunk is the read-side
      // plan that gets the cold-median treatment like everything else.
      // a failed benchBuild SETUP must surface as a sentinel, not as a
      // suspiciously-perfect ~0s no-op median
      var setupFailed = false
      val timed: () => Unit = q.benchBuild match {
        case Some(bb) =>
          try { bb(spark, warmDir)().count() } catch { case _: Throwable => () }
          try { val t = bb(spark, sfDir); () => { t().count(); () } }
          catch { case _: Throwable => setupFailed = true; () => () }
        case None =>
          try { q.build(spark, warmDir).count() } catch { case _: Throwable => () }
          () => { q.build(spark, sfDir).count(); () }
      }
      // a timed run that THROWS must not record its time-to-failure as a
      // plausible-looking number — flag it and emit the same -1.0 sentinel
      // as a failed setup
      var runFailed = false
      val times = (1 to runs).map { _ =>
        // drop persisted intermediates: CacheManager matches identical
        // plans across repeats, which would turn runs 2..n into warm-cache
        // measurements — the median must be a COLD median. clearCache
        // covers persist() only; localCheckpoint blocks (iterative
        // queries' final rounds) live in the RDD registry and would
        // otherwise accumulate across runs and queries.
        //
        // BLOCKING unpersist + a GC nudge (r17 measurement fix): with
        // blocking=false the removal work — and the ContextCleaner
        // backlog of dead shuffle files, broadcasts, and checkpoint
        // blocks, which only drains when driver GC enqueues the weak
        // refs — lands INSIDE the next timed region, so runs 2..n paid
        // the previous run's janitor. Measured on x_dedup_clusters at
        // sf0.1, 6 runs in one JVM: async form 2.80→4.24 s monotone
        // (+0.28 s/run of accumulated residue); runs must be
        // independent cold measurements, not a leak integral. The GC
        // runs BEFORE t0, never inside it.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        if (!sys.env.get("SPARK_GRAFT_BENCH_GC").contains("0")) {
          val g0 = System.nanoTime()
          System.gc()
          if (sys.env.get("SPARK_GRAFT_BENCH_TELEMETRY").contains("1"))
            System.err.println(f"[telemetry] gc_pause=${(System.nanoTime() - g0) / 1e9}%.3f")
        }
        if (sys.env.get("SPARK_GRAFT_BENCH_TELEMETRY").contains("1")) {
          import scala.jdk.CollectionConverters._
          import java.lang.management.{ManagementFactory => mf}
          val gc = mf.getGarbageCollectorMXBeans.asScala
            .map(b => s"${b.getName}=${b.getCollectionCount}/${b.getCollectionTime}ms").mkString(" ")
          val cc = mf.getMemoryPoolMXBeans.asScala
            .filter(_.getName.toLowerCase.contains("code"))
            .map(b => s"${b.getName}=${b.getUsage.getUsed / 1048576}MB").mkString(" ")
          val comp = mf.getCompilationMXBean.getTotalCompilationTime
          val meta = mf.getMemoryPoolMXBeans.asScala
            .filter(_.getName.contains("Metaspace"))
            .map(b => s"${b.getUsage.getUsed / 1048576}MB").mkString(" ")
          val byPrefix = Thread.getAllStackTraces.keySet.asScala.toSeq
            .map(_.getName.replaceAll("[0-9]+$", "N"))
            .groupBy(identity).view.mapValues(_.size).toSeq
            .sortBy(-_._2).take(8)
            .map { case (n, c) => s"$n×$c" }.mkString(" ")
          System.err.println(s"[telemetry] q=${q.name} gc: $gc | code: $cc | compMs=$comp | metaspace: $meta | threads=${Thread.activeCount()} | top: $byPrefix")
        }
        val t0 = System.nanoTime()
        try { timed() } catch { case _: Throwable => runFailed = true }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val stat = if (agg == "min") times.head else times(times.length / 2)
      (q.name,
        if (setupFailed || runFailed) -1.0 else stat,
        if (setupFailed || runFailed) Seq.empty[Double] else times)
    }
    val results = measured.map { case (n, s, _) => n -> s }.toMap
    // -1.0 marks a failed benchBuild setup or a throwing timed run: keep
    // it visible per-query, exclude it from the headline total
    val total = results.values.filter(_ >= 0).sum
    // The driver captures only the tail of this process's output and parses
    // the LAST JSON line out of it. Keep that line comfortably inside the
    // capture window: 3-decimal times, and if the full per-query map would
    // blow the budget, keep the slowest entries (the ones a grader needs)
    // and fold the fast remainder into "other". The complete map is written
    // to bench_full.json alongside for anyone who wants every number.
    def fmt(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def mapJson(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val bySlow = results.toSeq.sortBy(-_._2)

    // Self-isolating pass: after the shared-JVM sweep, the 10 most
    // expensive queries are re-timed one fresh JVM each and reported
    // under "isolated" — INSIDE this main, so the section survives any
    // launcher (the round-5 driver ran the bench through sbt and the
    // bench.sh-side isolation never happened). Children (ONLY set) and
    // SPARK_GRAFT_NO_ISOLATE=1 skip it. The TxTable mutation family is
    // ALWAYS isolated on top of the top-10: its members sit just under
    // the shared-pass cut, so their round-over-round deltas were being
    // adjudicated by inference — a cold-JVM number per round settles
    // them with data.
    // x_decontaminate and x_dedup_containment joined in r10: both are
    // repeat offenders for shared-pass drift (r5 and r9 adjudicated the
    // same excursion by inference) — a cold-JVM number per round
    // settles the next drift with data.
    // x_dedup_minhash_fast joined in r12: it was the one shared-pass
    // number that looked insane under the r11 congestion (34.9 s vs
    // 1.9 s idle) — a cold-JVM number per round ends that class of
    // adjudication for it too.
    // x_dedup_byte_spans (+fast) joined in r13: its r12 "doubling" took
    // an idle re-measure to adjudicate as a loaded-box artifact — a
    // cold-JVM number per round makes the next drift mechanical.
    val alwaysIsolate = Seq("k12_tx_delete_where", "k13_tx_change_feed",
      "k14_deletion_vectors", "k16_tx_merge_clauses", "k17_tx_merge_multikey",
      "x_decontaminate", "x_dedup_containment", "x_dedup_minhash_fast",
      "x_dedup_byte_spans", "x_dedup_byte_spans_fast")
    val isolate = only.isEmpty &&
      !sys.env.get("SPARK_GRAFT_NO_ISOLATE").contains("1")

    // closing canary for the SHARED sweep — taken BEFORE the isolate
    // re-runs, because the primary stdout artifact must exist before any
    // child JVM spawns (r16's driver BENCH artifact was rc=124/parsed:
    // null: up to 19 cold-JVM isolates ran ahead of the only println,
    // a congested night ballooned them past the driver timeout, and the
    // round shipped with NO perf evidence). start≈end≈idle → clean run;
    // both elevated → congested throughout; end ≫ start → congestion
    // arrived mid-suite and late queries are suspect. The isolate pass
    // gets its own closing canary on the enriched second line.
    val loadEnd = loadavg()
    val canaryEnd = if (isChild) -1.0 else canary()
    // Self-labeling (r11's lesson, where the driver ran the suite on a
    // loadavg-10 machine and the artifact needed a judge re-bench to
    // adjudicate): when either canary exceeds 1.5× the recorded idle
    // calibration, the run stamps ITSELF congested — its absolute
    // times are neighborhood-distorted and only the isolated/cold-JVM
    // numbers (and the next idle run) should be compared round-over-
    // round. The calibration SELF-MAINTAINS (r15 lesson): the stored
    // per-host minimum canary is the idle reference, the env override
    // wins when set, and the historical constant only bootstraps a
    // fresh host until its first run lands in the cal file.
    val calPath = sys.env.getOrElse("SPARK_GRAFT_CANARY_CAL",
      defaultCalPath())
    val storedCal = readCal(calPath)
    val idleCal = effectiveIdleCal(sys.env.get("SPARK_GRAFT_CANARY_IDLE"),
      storedCal.map(_._1))
    val calSource =
      if (sys.env.contains("SPARK_GRAFT_CANARY_IDLE")) "env"
      else if (storedCal.isDefined) "file"
      else "default"
    // r12's lesson: MODERATE load is a canary blind spot. loadavg 4.5
    // on a 32-cpu box slows the 32-thread canary only ~1.15× (it still
    // gets ~88% of the CPU) but inflated the 32-way-parallel suite
    // ~1.7× — memory-bandwidth and scheduler-queue contention that a
    // pure CPU-share probe cannot see. OR the label with the 1-minute
    // loadavg AT SUITE START (before the session spins up — external
    // load only; load_end reflects our own just-finished work and must
    // not gate). Threshold ncpus/8 (4.0 here), tunable via env.
    val ncpus = Runtime.getRuntime.availableProcessors()
    val loadThreshold = sys.env.getOrElse("SPARK_GRAFT_LOAD_CONGESTED",
      (ncpus / 8.0).toString).toDouble
    // r14's lesson: congestion that ARRIVES mid-suite slips past both
    // the start canary and the start loadavg — the per-query-boundary
    // samples close that blind spot (three consecutive samples above
    // 1.35x the run's own median, or one above 2.5x — see
    // midrunCongested for the thresholds' rationale)
    val miniIdleFloor = sys.env.get("SPARK_GRAFT_MINI_IDLE")
      .map(_.toDouble).orElse(storedCal.map(_._2))
      .getOrElse(idleCal / 4)
    val midCongested = midrunCongested(midSamples.toSeq, miniIdleFloor)
    // fold this run's observations into the per-host minima (min-ever:
    // a congested run can only leave the calibration unchanged)
    if (!isChild)
      updateCal(calPath, Seq(canaryStart, canaryEnd).filter(_ > 0),
        midSamples.toSeq.filter(_ > 0))
    val congested = !isChild &&
      (math.max(canaryStart, canaryEnd) > 1.5 * idleCal ||
        load1(loadStart) > loadThreshold || midCongested)
    val midJson =
      if (midSamples.isEmpty) ""
      else s""","canary_mid_max":${fmt(midSamples.max)},"canary_mid_min":${fmt(midSamples.min)},"mid_congested":$midCongested,"load_max_midrun":${fmt(midLoads.max)}"""
    val canaryJson = if (isChild) "" else
      s""","canary_start":${fmt(canaryStart)},"canary_end":${fmt(canaryEnd)},"canary_idle":${fmt(idleCal)},"canary_cal_source":"$calSource","congested":$congested$midJson,"load_start":"$loadStart","load_end":"$loadEnd""""

    // Per-query run-level detail for mechanical artifact adjudication:
    // every timed run plus the relative spread (max-min)/median. A query
    // whose shared-JVM spread exceeds ~30% is neighborhood-sensitive —
    // its round-over-round delta is noise unless the isolated number
    // moved too.
    val runsJson = measured.filter(_._3.nonEmpty).map { case (n, _, ts) =>
      "\"" + n + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val spreadJson = measured.filter(_._3.nonEmpty).map { case (n, s, ts) =>
      val spread = if (s > 0) (ts.max - ts.min) / s else 0.0
      "\"" + n + "\":" + fmt(spread)
    }.mkString("{", ",", "}")

    val budget = 800 // chars for the queries map; driver tail is ~2000
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = 2
    bySlow.foreach { case (k, v) =>
      val len = k.length + fmt(v).length + 4
      if (used + len <= budget) { kept += ((k, v)); used += len }
    }
    val omitted = results.size - kept.size
    val qs =
      if (omitted == 0) mapJson(bySlow)
      else mapJson(kept.toSeq :+ ("other" -> (total - kept.map(_._2).sum)))
    // complete per-boundary samples ride only the FULL artifact (the
    // printed line's budget is the driver's 2000-char tail capture)
    val midDetail =
      if (midSamples.isEmpty) ""
      else s""","mid_samples":[${midSamples.map(fmt).mkString(",")}],"mid_loads":[${midLoads.map(fmt).mkString(",")}]"""

    /** The complete artifact line (bench_full.json), parameterized on
      * the enrichment sections that exist only after the isolate pass. */
    def fullLine(isoJson: String): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"queries":${mapJson(bySlow)}$isoJson$canaryJson$midDetail,"runs":$runsJson,"spread":$spreadJson,"sf":"$sfDir"}"""
    def writeFull(isoJson: String): Unit =
      // single-query isolation children must not clobber the main run's
      // complete map — the parent merges their stdout lines instead
      if (only.isEmpty) try {
        val w = new java.io.PrintWriter("bench_full.json")
        try w.println(fullLine(isoJson)) finally w.close()
      } catch { case _: Throwable => () }

    /** The PRINTED stdout line: the kept (slowest) queries plus the
      * always-isolated family's spreads — exactly the set whose
      * round-over-round deltas get adjudicated. The driver parses the
      * LAST JSON line out of a 2000-char tail capture: a line that
      * starts before the window loses its head and fails to parse AT
      * ALL, so the spread section sizes itself to the room the rest of
      * the line leaves under a 1900-char ceiling (complete per-run
      * arrays are in bench_full.json either way). */
    def printedLine(isoJson: String): String = {
      val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"omitted":$omitted,"queries":$qs$isoJson$canaryJson"""
      val tail = s""","runs_detail":"bench_full.json","sf":"$sfDir"}"""
      val spreadByName = measured
        .filter(m => m._3.nonEmpty && m._2 > 0)
        .map { case (n, s, ts) => n -> (ts.max - ts.min) / s }.toMap
      val spreadKeys = (kept.map(_._1) ++ alwaysIsolate).distinct
        .flatMap(n => spreadByName.get(n).map(n -> _))
      val room = 1900 - head.length - tail.length - 12
      val spreadKept = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      var sUsed = 2
      spreadKeys.foreach { case (k, v) =>
        val len = k.length + fmt(v).length + 4
        if (sUsed + len <= room) { spreadKept += ((k, v)); sUsed += len }
      }
      val spreadLine =
        if (spreadKept.isEmpty) ""
        else s""","spread":${mapJson(spreadKept.toSeq)}"""
      head + spreadLine + tail
    }

    // PRIMARY artifact first — written and printed (flushed) BEFORE any
    // isolate child spawns, so a driver timeout mid-isolates can no
    // longer lose the round's perf evidence (the r16 failure). When the
    // isolate pass completes, an ENRICHED second line (isolated map +
    // its own closing canary) supersedes it: the driver parses the LAST
    // JSON line, so a finished run reports the enriched form and a
    // killed run still reports the primary one.
    writeFull("")
    println(printedLine(""))
    System.out.flush()

    if (isolate) {
      spark.stop() // free the parent's executor threads + heap first
      val names = (bySlow.filter(_._2 >= 0).take(10).map(_._1) ++
        alwaysIsolate.filter(n => results.get(n).exists(_ >= 0))).distinct
      // Total wall-clock budget for the whole isolate pass: under
      // congestion the cold JVMs balloon (r15: 13–25 s each plus ~30 s
      // JVM start), and an unbounded pass is what pushed r16 past the
      // driver timeout. Queries past the budget are skipped and
      // counted — a partial isolated map beats a lost run.
      val isoBudgetS = sys.env.getOrElse(
        "SPARK_GRAFT_ISOLATE_BUDGET_S", "1500").toDouble
      val isoStart = System.nanoTime()
      var skipped = 0
      val isolated: Seq[(String, Double)] = names.flatMap { name =>
        if ((System.nanoTime() - isoStart) / 1e9 > isoBudgetS) {
          skipped += 1
          None
        } else {
          System.err.println(s"[isolate] $name")
          Some(name -> isolatedTime(name, sfDir))
        }
      }
      val postIsoCanary = canary()
      updateCal(calPath, Seq(postIsoCanary), Seq.empty)
      val skippedJson =
        if (skipped == 0) "" else s""","isolates_skipped":$skipped"""
      val isoJson =
        if (isolated.isEmpty) skippedJson
        else s""","isolated":${mapJson(isolated)},"canary_post_iso":${fmt(postIsoCanary)}$skippedJson"""
      writeFull(isoJson)
      println(printedLine(isoJson))
      System.out.flush()
    } else spark.stop()
  }
}
