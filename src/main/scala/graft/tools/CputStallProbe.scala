package graft.tools

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.ops.LogStore

/** Stale-horizon sizing probe for [[LogStore.FileConditionalPut]] —
  * the empirical demonstration behind the horizon math in SCALE.md.
  * No Spark; pure filesystem arbitration between two client instances
  * in one JVM (thread-level concurrency is the same code path the
  * cross-process matrix proves; this probe sweeps TIMING).
  *
  * Two stall shapes per multiple of the horizon:
  *  - `slow-put` — the holder's content write takes `mult x horizon`
  *    while its HEARTBEAT thread runs (the realistic huge-PUT /
  *    slow-disk shape): the claim's mtime stays fresh, so the racer
  *    must block on a live claim and then LOSE — the holder wins at
  *    EVERY stall length. Pre-heartbeat, any stall past 1x the
  *    horizon here was the double-put window.
  *  - `frozen-jvm` — the holder stalls BEFORE its heartbeat starts
  *    (emulating a whole-process freeze: STW GC, SIGSTOP, VM pause —
  *    the heartbeat freezes WITH the writer): past the horizon the
  *    claim goes stale, the racer steals and decides the key, and the
  *    resumed holder's token re-check LOSES the put — one winner
  *    either way, entries immutable.
  *
  * Horizon sizing that follows: with the heartbeat, PUT latency is
  * off the table entirely; `staleClaimMs` need only exceed the
  * worst-case WHOLE-PROCESS stall (GC pause / freeze) times ~4/3
  * (the beat interval is horizon/4). The 10-minute default leaves
  * two orders of magnitude over any real GC pause.
  *
  * Run: `sbt "runMain graft.tools.CputStallProbe [horizonMs]"`.
  * Prints one row per (shape, mult); exits nonzero if any run ever
  * sees two winners or a torn key. */
object CputStallProbe {

  def main(args: Array[String]): Unit = {
    val horizon = args.headOption.map(_.toLong).getOrElse(400L)
    println(f"${"shape"}%-10s ${"stall"}%8s ${"holder"}%7s " +
      f"${"racer"}%6s winner_content ok")
    var bad = 0
    for (shape <- Seq("slow-put", "frozen-jvm");
         mult <- Seq(0.5, 1.5, 3.0)) {
      val stall = (mult * horizon).toLong
      val dir = Files.createTempDirectory("graft-cput-probe-").toFile
      val key = new File(dir, "00000000000000000001.json").getAbsolutePath
      val holder = new LogStore.FileConditionalPut(horizon)
      shape match {
        case "slow-put"   => holder.midPutHook = () => Thread.sleep(stall)
        case "frozen-jvm" => holder.afterClaimHook = () => Thread.sleep(stall)
      }
      val racer = new LogStore.FileConditionalPut(horizon)
      @volatile var holderWon = false
      @volatile var racerWon = false
      val h = new Thread(() => holderWon =
        holder.putIfAbsent(key, "holder".getBytes(StandardCharsets.UTF_8)))
      h.start()
      // attempt while the holder is mid-stall AND its claim — absent
      // heartbeats — would already read stale
      Thread.sleep(horizon + horizon / 4)
      val r = new Thread(() => racerWon =
        racer.putIfAbsent(key, "racer".getBytes(StandardCharsets.UTF_8)))
      r.start()
      h.join(60000); r.join(60000)
      val content = new String(
        Files.readAllBytes(new File(key).toPath), StandardCharsets.UTF_8)
      val oneWinner = holderWon ^ racerWon
      val contentOk = (holderWon && content == "holder") ||
        (racerWon && content == "racer")
      val clean = dir.listFiles().map(_.getName).toSet ==
        Set(new File(key).getName)
      if (!(oneWinner && contentOk && clean)) bad += 1
      val ok = oneWinner && contentOk && clean
      println(f"$shape%-10s ${stall + "ms"}%8s $holderWon%7s " +
        f"$racerWon%6s $content%-14s $ok")
    }
    if (bad > 0) { System.err.println(s"$bad bad runs"); sys.exit(1) }
  }
}
