package graft.util

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
  * (cassandra/src/main/scala/com/evolution/kafka/journal/cassandra/CassandraSync.scala:13-60).
  *
  * The protocol is written against the [[LeaseStore]] primitives
  * (create-if-absent, read, compare-and-replace, compare-and-delete) and
  * has multiple bindings with the fencing laws run against all of them
  * (LeaseSpec — the commit protocol's two-implementation treatment):
  * [[FsLeaseStore]] (claim file + the [[BlobIo]] conditional layer —
  * construction-grade file-locked CAS on plain paths and `file://`,
  * rename-emulated on HDFS, by the root's scheme), [[MemLeaseStore]] and
  * `FsLeaseStore(root, new MemBlob)` (pure conditional-PUT CAS — the
  * S3-class object-store shape, where an If-Match conditional PUT
  * replaces the rename; the MemBlob run forces the adversarial
  * interleavings through its hook). Breaking an expired lease and
  * releasing a held one are each ONE conditional primitive, so neither
  * can displace a rival's re-issued claim. Renewal heartbeats are
  * create-new side-entries, so they never race a breaker's CAS.
  *
  * Scope: one claim per store ROOT covers every member directory and all
  * of a compactor's back-to-back [[DirSwap.swap]]s, which is the unit
  * that must be atomic with respect to a rival maintainer (a per-swap
  * fence would let two maintainers each win some of a multi-member
  * compaction). Readers and layer-keyed appenders are NOT fenced — the
  * swap's generation retention already protects in-flight readers, and
  * append-vs-compaction interleaving is governed by `protectLayersAbove`
  * (see graft.Maintenance). Full REBUILDS (the write* store writers,
  * which retract and rewrite every swapped member) take the same claim,
  * so a rebuild cannot race a fenced compaction's swaps.
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

  private def freshToken(): String =
    s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}/" +
      s"${Thread.currentThread().getId} ${System.currentTimeMillis()}"

  /** Newest renewal stamp carrying the CURRENT holder's token (a
    * superseded holder's renewals no longer match and are ignored).
    */
  private def newestRenewal(store: LeaseStore, holderToken: String): Long =
    store
      .listContents(s"$ClaimName.r-")
      .flatMap { content =>
        if (content.startsWith(holderToken + " renew "))
          content.split(" ").lastOption.flatMap(_.toLongOption)
        else None
      }
      .foldLeft(Long.MinValue)(math.max)

  /** When the holder's claim was last stamped: the claim content's own
    * trailing millis, OR — when that stamp is corrupt (a crash left a
    * truncated/empty claim) — the entry's mtime, so a corrupt claim still
    * lease-expires instead of wedging all maintenance on the store until
    * someone deletes it by hand. Long.MaxValue ("live, never expires") is
    * reserved for the transient cases: the entry unreadable mid-write, or
    * a binding with no mtime to fall back on.
    */
  private def stampOf(store: LeaseStore, holder: String): Long = {
    val parsed = holder.trim.split(" ").lastOption.flatMap(_.toLongOption)
    val base = parsed
      .orElse(store.mtimeMs(ClaimName))
      .getOrElse(Long.MaxValue)
    math.max(base, newestRenewal(store, holder))
  }

  /** Takes the maintainer claim in `store` (atomic create-if-absent,
    * content: writer id + wall millis). A live rival claim →
    * [[ConcurrentStoreWriteException]], before anything is read or
    * written. An expired claim is broken by ONE compare-and-replace of
    * the exact content judged expired — two breakers cannot both win,
    * and a fresh claim re-issued in between no longer matches and is
    * never displaced.
    */
  def claimIn(
      store: LeaseStore,
      what: String,
      leaseMs: Long = defaultLeaseMs
  ): String = {
    val me = freshToken()
    if (!store.createIfAbsent(ClaimName, me)) {
      val holder = store.read(ClaimName) // None = being written: live
      val stampedAt = holder.map(stampOf(store, _)).getOrElse(Long.MaxValue)
      val expired = System.currentTimeMillis() - stampedAt > leaseMs
      val broke =
        expired && holder.exists(h => store.replaceIf(ClaimName, h, me))
      if (!broke)
        throw new ConcurrentStoreWriteException(
          s"store $what is claimed by a live maintainer — concurrent " +
            "maintenance detected; retry after it finishes or its lease expires"
        )
    }
    me
  }

  /** Heartbeat for long compactions: a create-new side-entry stamping the
    * holder's token, verified against the base claim AFTER it lands (a
    * fenced holder learns immediately, and the side-entry cannot race a
    * breaker's claim CAS).
    */
  def renewIn(store: LeaseStore, what: String, token: String): Unit = {
    store.putNew(
      s"$ClaimName.r-${System.nanoTime()}",
      s"$token renew ${System.currentTimeMillis()}"
    )
    verifyIn(store, what, token)
  }

  /** Asserts this maintainer still holds the claim — call before the
    * publish step of a long maintenance job. Same residual window as the
    * journal protocol's verifyClaim: a breaker landing between this check
    * and the swap's pointer rename is a crash-scale event, converged by
    * the swap's own atomicity + the next repair.
    */
  def verifyIn(store: LeaseStore, what: String, token: String): Unit =
    if (!store.read(ClaimName).contains(token))
      throw new ConcurrentStoreWriteException(
        s"maintainer claim on $what was lease-broken while this " +
          "maintainer stalled — publishing nothing; retry the maintenance"
      )

  /** Releases the claim ONLY if it still carries `token`: one
    * compare-and-delete, so a release landing after a stall (a rival
    * broke the lease and re-claimed between our last renewal and this
    * call) cannot delete the rival's live claim — the round-12
    * read-then-delete window, closed by the conditional primitive. The
    * holder's renewal side-entries and spent tombstones go with it.
    */
  def releaseIn(store: LeaseStore, token: String): Unit =
    if (store.deleteIf(ClaimName, token)) {
      store.deleteAll(s"$ClaimName.r-")
      store.deleteAll(s"$ClaimName.broken-")
    }

  // ---- the root-bound surface every DirSwap store compactor uses ----
  // (string locations: URI roots bind through Hadoop FileSystem, plain
  // paths through java.nio — FsLeaseStore dispatches by scheme)

  private def storeFor(root: String): LeaseStore = new FsLeaseStore(root)

  def claim(root: String, leaseMs: Long = defaultLeaseMs): String =
    claimIn(storeFor(root), root, leaseMs)

  def renew(root: String, token: String): Unit =
    renewIn(storeFor(root), root, token)

  def verify(root: String, token: String): Unit =
    verifyIn(storeFor(root), root, token)

  def release(root: String, token: String): Unit =
    releaseIn(storeFor(root), token)

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
  def withMaintainer[A](root: String, leaseMs: Long = defaultLeaseMs)(
      body: => A
  ): A = {
    // the reentrancy key must be canonical so a compactor addressing the
    // store as "dir" and a composed maintainer addressing it absolutely
    // hold ONE claim; URI roots are already canonical
    val key =
      if (Loc.hasScheme(root)) root.stripSuffix("/")
      else java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString
    if (held.get().contains(key)) body
    else {
      val store = storeFor(root)
      Blob.mkdirs(root)
      val token = claimIn(store, key, leaseMs)
      held.set(held.get() + key)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val heartbeat = new Thread(
        () =>
          try {
            var fenced = false
            while (!stop.get() && !fenced) {
              Thread.sleep(math.max(1L, leaseMs / 3))
              if (!stop.get())
                try renewIn(store, key, token)
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
        releaseIn(store, token)
      }
    }
  }
}
