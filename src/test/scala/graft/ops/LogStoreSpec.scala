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
      new LogStore.ConditionalWrite(LogStore.MockConditionalPut))

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
