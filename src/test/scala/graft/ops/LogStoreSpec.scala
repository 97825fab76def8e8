package graft.ops

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** The [[LogStore]] contract directly, for each impl: exclusivity under
  * a thread race, atomic full-content visibility, and loss against a
  * pre-existing object. */
class LogStoreSpec extends AnyFunSuite {

  private def stores: Seq[(String, LogStore)] = Seq(
    "hard-link" -> LogStore.HardLink,
    "conditional-write" ->
      new LogStore.ConditionalWrite(LogStore.MockConditionalPut),
    "file-conditional-put" ->
      new LogStore.ConditionalWrite(new LogStore.FileConditionalPut()))

  test("exactly one of 16 racing writers wins a path; content is the winner's") {
    stores.foreach { case (label, store) =>
      val dir = Files.createTempDirectory(s"graft-ls-").toFile
      val target = new File(dir, "00000000000000000007.json")
      val pool = Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      try {
        val wins = Await.result(
          Future.sequence((0 until 16).map { i =>
            Future(store.putIfAbsent(target,
              s"writer-$i".getBytes(StandardCharsets.UTF_8)) -> i)
          }), 60.seconds).filter(_._1)
        assert(wins.size === 1, s"[$label] winners: $wins")
        val content =
          new String(Files.readAllBytes(target.toPath),
            StandardCharsets.UTF_8)
        assert(content === s"writer-${wins.head._2}",
          s"[$label] content torn or from a loser")
        // no temp droppings survive the race
        assert(dir.listFiles().map(_.getName).toSet === Set(target.getName),
          s"[$label] leftover temps")
      } finally pool.shutdown()
    }
  }

  test("a loser that observes false can immediately read the winner's full entry") {
    // the contract's atomic-visibility clause, exercised at the exact
    // moment it matters: the instant putIfAbsent returns false, the
    // winning entry must be fully readable — a mock where the claim
    // publishes before the write-through would hand losers a stale (or
    // absent) head and burn protocol retries on a race production
    // stores don't have
    stores.foreach { case (label, store) =>
      val dir = Files.createTempDirectory(s"graft-ls-").toFile
      val pool = Executors.newFixedThreadPool(8)
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutor(pool)
      try {
        (0 until 20).foreach { round =>
          val target = new File(dir, f"${round}%020d.json")
          val reads = Await.result(
            Future.sequence((0 until 8).map { i =>
              Future {
                val won = store.putIfAbsent(target,
                  s"round-$round-writer-$i".getBytes(StandardCharsets.UTF_8))
                // losers read IMMEDIATELY — no waiting on the winner
                val seen =
                  if (won) None
                  else Some(new String(Files.readAllBytes(target.toPath),
                    StandardCharsets.UTF_8))
                (won, seen)
              }
            }), 60.seconds)
          assert(reads.count(_._1) === 1, s"[$label] round $round winners")
          val winning = new String(Files.readAllBytes(target.toPath),
            StandardCharsets.UTF_8)
          reads.filter(!_._1).foreach { case (_, seen) =>
            assert(seen === Some(winning),
              s"[$label] round $round: a loser saw '$seen', not the winner's entry")
          }
        }
      } finally pool.shutdown()
    }
  }

  test("FileConditionalPut: a stale claim is stolen by exactly one re-arbitrator") {
    val dir = Files.createTempDirectory("graft-ls-steal-").toFile
    val target = new File(dir, "00000000000000000003.json")
    // a dead claimant's orphan: claim exists, key never landed
    Files.write(new File(dir, target.getName + ".claim").toPath,
      "dead".getBytes(StandardCharsets.UTF_8))
    val client = new LogStore.FileConditionalPut(staleClaimMs = 300L)
    Thread.sleep(350L)
    // many writers race the steal: exactly one wins the re-arbitrated
    // key, the rest lose normally, nothing is left but the key
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val wins = Await.result(
        Future.sequence((0 until 8).map { i =>
          Future(client.putIfAbsent(target.getAbsolutePath,
            s"stealer-$i".getBytes(StandardCharsets.UTF_8)) -> i)
        }), 60.seconds).filter(_._1)
      assert(wins.size === 1, s"winners: $wins")
      assert(new String(Files.readAllBytes(target.toPath),
        StandardCharsets.UTF_8) === s"stealer-${wins.head._2}")
      assert(dir.listFiles().map(_.getName).toSet === Set(target.getName),
        "the stolen claim (and temps) must be gone")
    } finally pool.shutdown()
  }

  test("FileConditionalPut: a LIVE claim blocks callers until decided, then loses them") {
    val dir = Files.createTempDirectory("graft-ls-live-").toFile
    val target = new File(dir, "00000000000000000004.json")
    val claim = new File(dir, target.getName + ".claim")
    Files.write(claim.toPath, "live".getBytes(StandardCharsets.UTF_8))
    val client = new LogStore.FileConditionalPut(staleClaimMs = 60000L)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val caller = Future(client.putIfAbsent(target.getAbsolutePath,
        "late".getBytes(StandardCharsets.UTF_8)))
      Thread.sleep(150L)
      assert(!caller.isCompleted,
        "a live claim must block, not return a transient outcome")
      // the claimant finishes its PUT: the blocked caller must LOSE
      val tmp = new File(dir, ".finish-tmp")
      Files.write(tmp.toPath, "winner".getBytes(StandardCharsets.UTF_8))
      Files.move(tmp.toPath, target.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      claim.delete()
      assert(!Await.result(caller, 10.seconds))
      assert(new String(Files.readAllBytes(target.toPath),
        StandardCharsets.UTF_8) === "winner")
    } finally pool.shutdown()
  }

  test("FileConditionalPut: heartbeat keeps a live-but-SLOW holder from being stolen") {
    // the r14 advice's double-put shape: holder's PUT outlasts the
    // stale horizon. With the heartbeat, the claim's mtime stays fresh
    // for the PUT's whole flight, so a racer must BLOCK (live claim)
    // and then lose — never steal, never double-put.
    val dir = Files.createTempDirectory("graft-ls-beat-").toFile
    val target = new File(dir, "00000000000000000005.json")
    val slow = new LogStore.FileConditionalPut(staleClaimMs = 200L)
    slow.midPutHook = () => Thread.sleep(700L) // PUT flight = 3.5 horizons
    val racer = new LogStore.FileConditionalPut(staleClaimMs = 200L)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val holder = Future(slow.putIfAbsent(target.getAbsolutePath,
        "holder".getBytes(StandardCharsets.UTF_8)))
      Thread.sleep(350L) // claim is now older than the horizon sans beats
      val late = Future(racer.putIfAbsent(target.getAbsolutePath,
        "racer".getBytes(StandardCharsets.UTF_8)))
      assert(Await.result(holder, 10.seconds), "the live holder must win")
      assert(!Await.result(late, 10.seconds), "the racer must lose, not steal")
      assert(new String(Files.readAllBytes(target.toPath),
        StandardCharsets.UTF_8) === "holder")
      assert(dir.listFiles().map(_.getName).toSet === Set(target.getName),
        "no claim/temp droppings")
    } finally pool.shutdown()
  }

  test("FileConditionalPut: a whole-JVM-stalled holder is stolen and its token re-check LOSES the put") {
    // the residual window, demonstrated closing correctly: a stall
    // before the heartbeat starts ages the claim like a frozen JVM; a
    // stealer decides the key; the resumed holder's ownership re-check
    // fails, it re-arbitrates, observes the decided key, and returns
    // false — one winner, entries immutable.
    val dir = Files.createTempDirectory("graft-ls-stall-").toFile
    val target = new File(dir, "00000000000000000006.json")
    val stalled = new LogStore.FileConditionalPut(staleClaimMs = 200L)
    stalled.afterClaimHook = () => Thread.sleep(700L)
    val stealer = new LogStore.FileConditionalPut(staleClaimMs = 200L)
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val holder = Future(stalled.putIfAbsent(target.getAbsolutePath,
        "stalled".getBytes(StandardCharsets.UTF_8)))
      Thread.sleep(350L) // claim aged past the horizon, no beats yet
      val thief = Future(stealer.putIfAbsent(target.getAbsolutePath,
        "stealer".getBytes(StandardCharsets.UTF_8)))
      assert(Await.result(thief, 10.seconds), "the stealer must win")
      assert(!Await.result(holder, 10.seconds),
        "the resumed holder must LOSE (token re-check), never double-put")
      assert(new String(Files.readAllBytes(target.toPath),
        StandardCharsets.UTF_8) === "stealer",
        "the decided key must never be renamed over")
      assert(dir.listFiles().map(_.getName).toSet === Set(target.getName),
        "no claim/temp droppings")
    } finally pool.shutdown()
  }

  test("a pre-existing object loses the put, even across store instances") {
    stores.foreach { case (label, store) =>
      val dir = Files.createTempDirectory(s"graft-ls-").toFile
      val target = new File(dir, "00000000000000000001.json")
      Files.write(target.toPath, "already".getBytes(StandardCharsets.UTF_8))
      assert(!store.putIfAbsent(target, "late".getBytes), s"[$label]")
      assert(new String(Files.readAllBytes(target.toPath)) === "already",
        s"[$label] pre-existing content clobbered")
    }
  }
}
