package graft.ops

import java.io.File
import java.nio.file.{Files, StandardCopyOption}
import java.util.UUID

/** The commit-log CAS primitive behind [[TxTable]], made pluggable.
  *
  * A TxTable commit is "the atomic creation of `_log/<version>.json`":
  * exactly one of N racing writers may materialize a given version, and
  * a reader that sees the path must see the FULL entry (never a torn
  * prefix). Everything else in the protocol — optimistic retry loops,
  * snapshot isolation, vacuum — is built on that one primitive, so the
  * primitive is the only part that changes between storage systems:
  *
  *  - POSIX local / HDFS-like filesystems have an atomic
  *    create-if-absent in the hard-link (or rename-no-replace) syscall
  *    → [[LogStore.HardLink]].
  *  - Object stores (S3-style) have NO atomic filesystem op, but expose
  *    a conditional PUT (`If-None-Match: *` / etag precondition) that
  *    the service arbitrates → [[LogStore.ConditionalWrite]] over a
  *    [[LogStore.ConditionalPutClient]]. This is the same shape as
  *    Delta Lake's pluggable `LogStore` / commit-coordinator seam.
  *
  * Contract for any implementation:
  *   1. EXCLUSIVE: for a given path, `putIfAbsent` returns true for at
  *      most one caller ever (across processes), false for the rest.
  *   2. ATOMIC VISIBILITY: once the path exists to readers, its full
  *      content does; no observable intermediate state.
  *   3. DURABLE ORDER: a writer that observed version v committed may
  *      assume v's entry remains readable (the log is append-only;
  *      entries are never mutated).
  */
trait LogStore {

  /** Materialize `target` with `content` iff nothing exists at that
    * path. True = this caller created it (won the version race). Only a
    * pre-existing object may yield false; any other failure should
    * propagate, so retry loops distinguish "lost the race" from "store
    * is broken". */
  def putIfAbsent(target: File, content: Array[Byte]): Boolean

  /** The stale-claim horizon THIS store's arbitration actually runs
    * with: a live claim holder heartbeats its mtime every horizon/4, so
    * any sweep of claim/temp leftovers must treat files younger than
    * this as potentially live. [[TxTable.cleanupLog]] floors its sweep
    * age here — a store configured with a LARGER horizon (longer
    * heartbeat gaps) would otherwise have its live claims deleted
    * mid-PUT by a sweep floored at the default constant. */
  def staleHorizonMs: Long = LogStore.DefaultStaleClaimMs
}

object LogStore {

  /** [[FileConditionalPut]]'s default stale-claim horizon — shared with
    * [[TxTable.cleanupLog]]'s leftover sweep, which must never delete a
    * `.claim`/`.cput-*` younger than the horizon a LIVE holder's
    * heartbeat is sized against (sweeping a live writer's claim mid-PUT
    * would spuriously fail its commit and narrow the single-winner
    * guarantee to the re-check-to-rename window). */
  val DefaultStaleClaimMs: Long = 600000L

  /** POSIX-filesystem CAS: write the full entry to a temp name in the
    * same directory, hard-link it to the target (the link syscall fails
    * with EEXIST atomically — the filesystem's compare-and-swap), drop
    * the temp. Content is complete before the target path exists, so
    * both contract clauses hold. Correct on local disks and any FS with
    * POSIX link semantics; NOT correct on object stores, which is what
    * [[ConditionalWrite]] is for. */
  object HardLink extends LogStore {
    def putIfAbsent(target: File, content: Array[Byte]): Boolean = {
      val tmp = new File(target.getParentFile, s".tmp-${UUID.randomUUID()}")
      Files.write(tmp.toPath, content)
      try {
        Files.createLink(target.toPath, tmp.toPath)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally tmp.delete()
    }
  }

  /** The object-store commit primitive: one conditional PUT, arbitrated
    * by the store ("create iff key absent" — HTTP `If-None-Match: *`).
    * The PUT is atomic-with-content by service contract, so a winning
    * call satisfies both LogStore clauses by itself. */
  trait ConditionalPutClient {
    /** Atomically create `key` with `content` iff absent; true = created. */
    def putIfAbsent(key: String, content: Array[Byte]): Boolean

    /** The client's configured stale-claim horizon (see
      * [[LogStore.staleHorizonMs]]); clients with no claim protocol of
      * their own keep the default. */
    def staleHorizonMs: Long = LogStore.DefaultStaleClaimMs
  }

  /** [[LogStore]] over a [[ConditionalPutClient]] — the impl a real
    * deployment backs with its store's conditional-write API. The
    * adapter is deliberately trivial: the protocol needs nothing beyond
    * the one primitive. */
  final class ConditionalWrite(client: ConditionalPutClient) extends LogStore {
    def putIfAbsent(target: File, content: Array[Byte]): Boolean =
      client.putIfAbsent(target.getAbsolutePath, content)
    override def staleHorizonMs: Long = client.staleHorizonMs
  }

  /** REAL filesystem-backed [[ConditionalPutClient]] that uses NO hard
    * links — the shape a deployment without POSIX `link()` (or a test
    * of the [[ConditionalWrite]] seam across real processes) runs:
    *
    *  1. CLAIM: `O_EXCL`-create `<key>.claim` holding a unique token
    *     (the kernel arbitrates creation atomically across processes —
    *     this is the conditional-PUT decision, made client-side).
    *  2. PUT: the claim holder writes the full content to a temp file,
    *     fsyncs, re-checks its token still owns the claim, and
    *     atomically renames the temp onto `key`. Readers therefore see
    *     the key with full content or not at all.
    *  3. Losers see the key and return false; a loser that sees only
    *     a LIVE claim blocks until that claim resolves (the key
    *     appears, or the claim vanishes/goes stale) — outcomes are
    *     always decided, never transient.
    *
    * Crash recovery: a holder killed between claim and rename leaves a
    * claim with no key — without recovery that version could never be
    * arbitrated again. A claim older than `staleClaimMs` is STOLEN:
    * the stealer renames it to a graveyard name (rename is atomic, so
    * exactly one stealer wins the steal) and re-enters arbitration.
    *
    * Stolen-while-alive defense, three layers:
    *  1. HEARTBEAT — the holder refreshes its claim's mtime every
    *     `staleClaimMs/4` from a daemon thread for as long as the PUT
    *     is in flight, so a LIVE holder's claim never ages toward the
    *     stale horizon no matter how slow the content write is: PUT
    *     latency is off the horizon-sizing table entirely.
    *  2. TOKEN RE-CHECK — immediately before the rename the holder
    *     re-reads the claim; a stolen claim (token mismatch) aborts
    *     the rename and re-arbitrates.
    *  3. TARGET RE-CHECK — also immediately before the rename: a key
    *     that appeared loses, never renames over a decided entry.
    * What remains is a WHOLE-JVM stall (stop-the-world GC, SIGSTOP,
    * VM freeze — the heartbeat thread stalls with the writer) longer
    * than ~3/4 of the horizon that resumes EXACTLY inside the
    * microseconds between re-check and rename while a stealer has
    * already decided the key — size `staleClaimMs` above the
    * worst-case whole-process stall (the 10-minute default dwarfs any
    * real GC pause; a real object store's server-side conditional PUT
    * has no such window at all, which is exactly why it is the
    * preferred deployment primitive). */
  final class FileConditionalPut(
      staleClaimMs: Long = LogStore.DefaultStaleClaimMs)
      extends ConditionalPutClient {

    /** This client's claims heartbeat against ITS horizon — a leftover
      * sweep must floor at this, not the default constant, or a holder
      * configured with a larger horizon (heartbeats every horizon/4 >
      * default) could have its live claim deleted mid-PUT. */
    override def staleHorizonMs: Long = staleClaimMs

    /** Test seam: fired right after claim acquisition, BEFORE the
      * heartbeat starts — a stall here ages the claim like a whole-JVM
      * freeze would (specs pin that the token re-check then LOSES the
      * put instead of double-putting). */
    private[graft] var afterClaimHook: () => Unit = () => ()

    /** Test seam: fired after the content write, WHILE the heartbeat
      * is running — a stall here models an arbitrarily slow PUT (specs
      * pin that a live holder is never stolen). */
    private[graft] var midPutHook: () => Unit = () => ()

    def putIfAbsent(key: String, content: Array[Byte]): Boolean = {
      val target = new File(key)
      val claim = new File(key + ".claim")
      val token = UUID.randomUUID().toString
      def ownsClaim(): Boolean =
        try new String(Files.readAllBytes(claim.toPath),
          java.nio.charset.StandardCharsets.UTF_8) == token
        catch { case _: Throwable => false }
      while (true) {
        if (target.exists()) return false
        val claimed =
          try {
            val ch = java.nio.channels.FileChannel.open(claim.toPath,
              java.nio.file.StandardOpenOption.CREATE_NEW,
              java.nio.file.StandardOpenOption.WRITE)
            try {
              ch.write(java.nio.ByteBuffer.wrap(
                token.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
              ch.force(true)
            } finally ch.close()
            true
          } catch {
            case _: java.nio.file.FileAlreadyExistsException => false
          }
        if (claimed) {
          // the key may have landed between our entry check and the
          // claim grab (the previous winner renames the key BEFORE
          // deleting its claim, so a fresh claim over a decided key
          // always observes the key here): losing now — not renaming
          // over it — is what keeps entries immutable
          if (target.exists()) { claim.delete(); return false }
          afterClaimHook()
          val tmp = new File(target.getParentFile, s".cput-$token")
          // a PUT that throws must release the claim on its way out —
          // leaking it would stall every writer on this key for the
          // whole stale horizon over one transient IO error. Release
          // only OUR claim (token re-check): a holder stalled past
          // the stale horizon may have been stolen, and deleting the
          // successor's claim would let a third writer double-win.
          def releaseOwnClaim(): Unit =
            try { if (ownsClaim()) { claim.delete(); () } }
            catch { case _: Throwable => () }
          // heartbeat (defense layer 1): keep OUR live claim's mtime
          // fresh for the PUT's whole flight; stops touching the
          // moment the token no longer matches (stolen — the
          // successor's claim must age on its own clock). A TRANSIENT
          // read error is NOT "stolen": concluding theft off one
          // EINTR-class fault would silently stop refreshing for the
          // rest of a long PUT and re-expose a healthy holder to
          // being stolen (liveness — the pre-rename re-check still
          // arbitrates safety). Only a definitive verdict stops the
          // beat: token mismatch, claim-file gone, or the read still
          // failing after a few spaced retries.
          def ownsClaimVerdict(): Boolean = {
            var attempt = 0
            while (attempt < 3) {
              try return new String(Files.readAllBytes(claim.toPath),
                java.nio.charset.StandardCharsets.UTF_8) == token
              catch {
                case _: java.nio.file.NoSuchFileException =>
                  return false // stolen and resolved: the claim is gone
                case _: Throwable =>
                  attempt += 1
                  if (attempt < 3) Thread.sleep(10L)
              }
            }
            false
          }
          val beat = new Thread(() => {
            try {
              var ours = true
              while (ours) {
                Thread.sleep(math.max(1L, staleClaimMs / 4))
                ours = ownsClaimVerdict()
                if (ours)
                  claim.setLastModified(System.currentTimeMillis())
              }
            } catch { case _: InterruptedException => () }
          })
          beat.setDaemon(true)
          beat.start()
          val renamed =
            try {
              try {
                val ch = java.nio.channels.FileChannel.open(tmp.toPath,
                  java.nio.file.StandardOpenOption.CREATE_NEW,
                  java.nio.file.StandardOpenOption.WRITE)
                try {
                  ch.write(java.nio.ByteBuffer.wrap(content))
                  ch.force(true)
                } finally ch.close()
              } catch {
                case e: Throwable =>
                  tmp.delete(); releaseOwnClaim(); throw e
              }
              midPutHook()
              // defense layers 2+3, immediately before the rename: the
              // claim may have been stolen if the whole JVM stalled
              // past the stale horizon — only the current claim holder
              // may rename, and never over a key a stealer already
              // decided (POSIX ATOMIC_MOVE would silently replace it)
              if (!ownsClaim()) {
                tmp.delete(); None // stolen: re-arbitrate
              } else if (target.exists()) {
                tmp.delete(); releaseOwnClaim(); Some(false)
              } else {
                try Files.move(tmp.toPath, target.toPath,
                  StandardCopyOption.ATOMIC_MOVE)
                catch {
                  case e: Throwable =>
                    tmp.delete(); releaseOwnClaim(); throw e
                }
                claim.delete()
                Some(true)
              }
            } finally beat.interrupt()
          renamed match {
            case Some(r) => return r
            case None    => () // loop: re-arbitrate
          }
        } else if (target.exists()) {
          return false // the claimant finished: a normal lost PUT
        } else if (!claim.exists()) {
          // claimant vanished between our create-attempt and now
          // (finished+deleted, or was stolen): re-arbitrate
        } else if (System.currentTimeMillis() - claim.lastModified() >
            staleClaimMs) {
          // stale claim: steal it — the graveyard rename is atomic,
          // so exactly one stealer proceeds to re-arbitrate the key
          val grave = new File(target.getParentFile,
            s".dead-${UUID.randomUUID()}")
          try {
            Files.move(claim.toPath, grave.toPath,
              StandardCopyOption.ATOMIC_MOVE)
            grave.delete()
          } catch { case _: Throwable => () } // lost the steal: loop
        } else {
          // a LIVE writer is mid-PUT on this key: wait for the
          // arbitration to settle (key appears -> normal lost PUT;
          // claim vanishes or goes stale -> re-arbitrate). Blocking
          // here mirrors the mock's semantics — callers' tight retry
          // loops must observe decided outcomes, not transient claims.
          Thread.sleep(1)
        }
      }
      false // unreachable
    }
  }

  /** Offline mock of an object store's conditional PUT, for testing the
    * protocol against [[ConditionalWrite]] without a network: a
    * JVM-global claim map plays the service's atomic key arbitration
    * (the part a real store does server-side), and the winner writes
    * through to the local filesystem via temp-file + atomic rename so
    * log readers (which list real files) see full content or nothing —
    * losers never touch the filesystem at all.
    *
    * The write-through runs INSIDE the per-key `computeIfAbsent`
    * critical section, so a losing racer cannot observe its `false`
    * until the winner's entry is fully on disk — a real store's PUT is
    * atomic-with-content by service contract, and a mock where losers
    * could transiently see "created but unreadable" would let protocol
    * code pass tests against a weaker primitive than production gives
    * it. Claims are keyed by absolute path and retained for the JVM's
    * lifetime: keys are versioned log paths under per-test temp dirs,
    * so the map grows by one small entry per committed version ever
    * tested — the retention is what lets a second store instance in the
    * same JVM still lose key arbitration, mirroring the service's
    * global view. An object already on disk (e.g. from a previous
    * process) also loses the PUT, mirroring `If-None-Match: *`. */
  object MockConditionalPut extends ConditionalPutClient {
    private val claimed =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

    def putIfAbsent(key: String, content: Array[Byte]): Boolean = {
      val target = new File(key)
      var won = false
      // atomic per key: concurrent callers on the same key block until
      // the mapping function (the winner's write-through) completes
      claimed.computeIfAbsent(key, _ => {
        if (!target.exists()) {
          val tmp =
            new File(target.getParentFile, s".put-${UUID.randomUUID()}")
          Files.write(tmp.toPath, content)
          Files.move(tmp.toPath, target.toPath,
            StandardCopyOption.ATOMIC_MOVE)
          won = true
        }
        java.lang.Boolean.TRUE
      })
      won
    }
  }
}
