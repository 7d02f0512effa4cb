package graft.util

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Multi-maintainer loss signal, shared by the bucketed journal store's
  * commit protocol (graft.streaming.StoreCommitProtocol) and the DirSwap
  * stores' maintainer fence ([[MaintainerLease]]): the loser has published
  * NOTHING — re-read the store and retry after the winner finishes (or its
  * lease expires). Defined in util so both layers throw the same type.
  */
final class ConcurrentStoreWriteException(msg: String)
    extends RuntimeException(msg)

/** Maintainer fencing for the DirSwap stores — the journal store's
  * lease/claim protocol (graft.streaming.StreamingReplicator.claimEpoch,
  * round 8) reapplied at the STORE grain, so two concurrent maintainers
  * cannot race a compaction's build-then-swap-then-sweep sequence: the
  * second claimant fails fast with [[ConcurrentStoreWriteException]]
  * having read and published nothing. The reference serializes exactly
  * this class of mutation with its CassandraSync locks
  * (cassandra/src/main/scala/com/evolution/kafka/journal/cassandra/CassandraSync.scala:13-60);
  * here the lock is built from the same two filesystem primitives as the
  * commit protocol — atomic create-if-absent (CREATE_NEW) for the claim,
  * atomic rename for the expired-lease break (two breakers cannot both
  * win the rename) — and renewal heartbeats are CREATE_NEW side-files so
  * they never race a breaker's tombstone. Same storage contract too:
  * POSIX/HDFS/NFS yes, S3-class object stores no (use a conditional-PUT
  * binding there — the StoreCommitProtocol seam discussion applies
  * verbatim).
  *
  * Scope: one claim per store ROOT covers every member directory and all
  * of a compactor's back-to-back [[DirSwap.swap]]s, which is the unit
  * that must be atomic with respect to a rival maintainer (a per-swap
  * fence would let two maintainers each win some of a multi-member
  * compaction). Readers and layer-keyed appenders are NOT fenced — the
  * swap's generation retention already protects in-flight readers, and
  * append-vs-compaction interleaving is governed by `protectLayersAbove`
  * (see graft.Maintenance).
  *
  * Reentrant per thread: a maintainer composition (Maintenance.maintainAll
  * driving a store compactor that itself claims) holds one real claim per
  * store root; nested enters on the same thread are free.
  */
object MaintainerLease {

  /** Claim honored for this long past its last stamp before a rival may
    * presume the holder dead and break the lease — the journal store's
    * DefaultLeaseMs mirrored. Tunable via
    * `-Dgraft.maintainer.lease.ms=` (tests shrink it to race the break).
    */
  def defaultLeaseMs: Long =
    sys.props
      .get("graft.maintainer.lease.ms")
      .flatMap(_.toLongOption)
      .getOrElse(10L * 60 * 1000)

  private val ClaimName = "maintainer.claim"

  private def claimFile(root: Path): Path = root.resolve(ClaimName)

  private def freshToken(): String =
    s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}/" +
      s"${Thread.currentThread().getId} ${System.currentTimeMillis()}"

  /** Newest renewal stamp carrying the CURRENT holder's token (a
    * superseded holder's renewals no longer match and are ignored).
    */
  private def newestRenewal(root: Path, holderToken: String): Long = {
    if (!Files.isDirectory(root)) return Long.MinValue
    val s = Files.list(root)
    try
      s.iterator()
        .asScala
        .filter(_.getFileName.toString.startsWith(s"$ClaimName.r-"))
        .flatMap { p =>
          try {
            val content = new String(Files.readAllBytes(p), "UTF-8")
            if (content.startsWith(holderToken + " renew "))
              content.split(" ").lastOption.flatMap(_.toLongOption)
            else None
          } catch { case _: java.io.IOException => None }
        }
        .foldLeft(Long.MinValue)(math.max)
    finally s.close()
  }

  /** Takes the maintainer claim on `root` (atomic CREATE_NEW of
    * `maintainer.claim`, content: writer id + wall millis). A live rival
    * claim → [[ConcurrentStoreWriteException]], before anything is read
    * or written. An expired claim is broken by an atomic rename to a
    * unique tombstone — of two breakers at most one rename succeeds —
    * then re-created.
    */
  def claim(root: Path, leaseMs: Long = defaultLeaseMs): String = {
    Files.createDirectories(root)
    val cf = claimFile(root)
    val me = freshToken()
    def tryCreate(): Boolean =
      try {
        Files.write(
          cf,
          me.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW
        )
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    if (!tryCreate()) {
      val holder =
        try Some(new String(Files.readAllBytes(cf), "UTF-8"))
        catch { case _: java.io.IOException => None } // being written: live
      val stampedAt = holder
        .map { h =>
          val base =
            try h.trim.split(" ").last.toLong
            catch { case _: Exception => Long.MaxValue }
          math.max(base, newestRenewal(root, h))
        }
        .getOrElse(Long.MaxValue)
      val expired = System.currentTimeMillis() - stampedAt > leaseMs
      val broke = expired && {
        val tomb = root.resolve(s"$ClaimName.broken-${System.nanoTime()}")
        try {
          Files.move(cf, tomb)
          // the rename is atomic but unconditional: verify we tombstoned
          // the claim we JUDGED expired, not a fresh claim a faster
          // breaker re-issued between our read and our move (two slow
          // breakers must not both win). On a mismatch, restore the
          // displaced claim; if its slot was re-taken meanwhile the
          // displaced holder fences itself at its next verify/renew — a
          // crash-scale residual, never a dual win here.
          val moved = new String(Files.readAllBytes(tomb), "UTF-8")
          if (holder.contains(moved)) true
          else {
            try Files.move(tomb, cf)
            catch { case _: java.nio.file.FileAlreadyExistsException => () }
            false
          }
        } catch { case _: java.nio.file.NoSuchFileException => false }
      }
      if (!(broke && tryCreate()))
        throw new ConcurrentStoreWriteException(
          s"store $root is claimed by a live maintainer — concurrent " +
            "maintenance detected; retry after it finishes or its lease expires"
        )
    }
    me
  }

  /** Heartbeat for long compactions: a CREATE_NEW side-file stamping the
    * holder's token, verified against the base claim AFTER it lands (a
    * fenced holder learns immediately, and the side-file cannot race a
    * breaker's tombstone rename).
    */
  def renew(root: Path, token: String): Unit = {
    Files.write(
      root.resolve(s"$ClaimName.r-${System.nanoTime()}"),
      s"$token renew ${System.currentTimeMillis()}".getBytes("UTF-8"),
      java.nio.file.StandardOpenOption.CREATE_NEW
    )
    verify(root, token)
  }

  /** Asserts this maintainer still holds the claim — call before the
    * publish step of a long maintenance job. Same residual window as the
    * journal protocol's verifyClaim: a breaker landing between this check
    * and the swap's pointer rename is a crash-scale event, converged by
    * the swap's own atomicity + the next repair.
    */
  def verify(root: Path, token: String): Unit = {
    val held =
      try new String(Files.readAllBytes(claimFile(root)), "UTF-8") == token
      catch { case _: java.io.IOException => false }
    if (!held)
      throw new ConcurrentStoreWriteException(
        s"maintainer claim on $root was lease-broken while this " +
          "maintainer stalled — publishing nothing; retry the maintenance"
      )
  }

  /** Releases the claim ONLY if it still carries `token` (a fenced holder
    * must never remove a breaker's re-issued claim); the holder's renewal
    * side-files and spent tombstones go with it.
    */
  def release(root: Path, token: String): Unit = {
    val cf = claimFile(root)
    try {
      if (new String(Files.readAllBytes(cf), "UTF-8") == token) {
        Files.deleteIfExists(cf): Unit
        val s = Files.list(root)
        try
          s.iterator()
            .asScala
            .filter { p =>
              val n = p.getFileName.toString
              n.startsWith(s"$ClaimName.r-") ||
              n.startsWith(s"$ClaimName.broken-")
            }
            .foreach(p => Files.deleteIfExists(p): Unit)
        finally s.close()
      }
    } catch { case _: java.io.IOException => () } // already gone
  }

  private val held = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Runs `body` under the store's maintainer claim: claim → body →
    * release (release in a finally — a failed compaction must not wedge
    * the store until lease expiry). Reentrant per thread, so composed
    * maintainers (maintainAll → compactor) hold ONE real claim.
    *
    * A daemon HEARTBEAT renews the lease every leaseMs/3 while the body
    * runs, so a legitimately long compaction (a 100 TB store can fold
    * longer than any reasonable lease) is never presumed dead and
    * lease-broken mid-swap — the renewal keeps the expiry check reading
    * a fresh stamp. If a renewal finds the lease already broken (this
    * maintainer stalled PAST the lease before the heartbeat ran — e.g. a
    * driver GC pause longer than leaseMs), the heartbeat stops and the
    * fencing falls back to the documented residual window.
    */
  def withMaintainer[A](root: Path, leaseMs: Long = defaultLeaseMs)(
      body: => A
  ): A = {
    val key = root.toAbsolutePath.normalize.toString
    if (held.get().contains(key)) body
    else {
      val token = claim(root, leaseMs)
      held.set(held.get() + key)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val heartbeat = new Thread(
        () =>
          try {
            var fenced = false
            while (!stop.get() && !fenced) {
              Thread.sleep(math.max(1L, leaseMs / 3))
              if (!stop.get())
                try renew(root, token)
                catch {
                  // fenced (lease broken while we stalled): done for good
                  case _: ConcurrentStoreWriteException => fenced = true
                  // transient IO (a filesystem hiccup must not silently
                  // kill the heartbeat and lose the fence): retry next beat
                  case scala.util.control.NonFatal(_) => ()
                }
            }
          } catch {
            case _: InterruptedException => () // released — job over
          },
        s"graft-maintainer-heartbeat-$key"
      )
      heartbeat.setDaemon(true)
      heartbeat.start()
      try body
      finally {
        stop.set(true)
        heartbeat.interrupt()
        heartbeat.join(1000L)
        held.set(held.get() - key)
        release(root, token)
      }
    }
  }
}
