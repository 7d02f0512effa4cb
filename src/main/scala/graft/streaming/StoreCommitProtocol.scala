package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.util.{Blob, Loc}

/** The store's multi-writer commit protocol as an explicit seam.
  *
  * [[StreamingReplicator.applyBatch]] serializes concurrent writers with
  * exactly six protocol operations — claim / renew / verify / release a
  * lease on the next epoch, commit a staged generation via an epoch CAS,
  * and resolve the single committed current generation. EVERYTHING else in
  * the replicator (merge semantics, touched-partition data writes, crash
  * convergence) is storage-agnostic. This trait is those six operations,
  * so a deployment can swap the concurrency substrate without touching the
  * replication logic.
  *
  * == Storage contract of the default implementation ==
  *
  * [[FsCommitProtocol]] (the default) builds the guarantees from exactly
  * three primitives of the [[graft.util.Blob]] conditional layer, and is
  * correct ONLY where they are atomic:
  *
  *   - '''atomic rename that fails when the source is gone'''
  *     (`Blob.move`): the epoch CAS — only one writer can move
  *     `current-<E>` aside.
  *   - '''atomic create-if-absent''' (`CREATE_NEW`): claim files, renewal
  *     side-files, the virgin-store `_WRITER` fence.
  *   - '''compare-and-swap on a claim's content'''
  *     (`Blob.putIfMatch`/`deleteIfMatch`): the lease break and the
  *     conditional release — construction-grade where the backend has a
  *     real CAS (plain paths and `file://` via the file-locked nio CAS, a
  *     conditional-PUT object-store binding), rename-EMULATED on HDFS
  *     (pre-read-guarded displace-verify-restore; crash-scale residual,
  *     fenced at the holder's next verify).
  *
  * POSIX filesystems, HDFS, and NFS provide the first two. '''S3-class
  * object stores provide NEITHER rename nor exclusive-create''' on plain
  * keys — "rename" is copy+delete (non-atomic, and both halves visible
  * mid-flight), and an unconditional PUT last-writer-wins. Running
  * [[FsCommitProtocol]] against an object store mounted as a filesystem
  * silently loses the epoch and virgin-store fences: two writers can
  * each believe they committed the same epoch. Bind the conditional
  * primitives to the store's real conditional PUTs instead (the
  * [[graft.util.MemBlob]] law target is that binding's exact shape).
  *
  * An object-store deployment implements this trait with the store's own
  * conditional primitives instead: claim/renew as conditional PUT
  * (`If-None-Match: *`), the epoch CAS as a conditional PUT of a single
  * `current` pointer object guarded by its expected generation (ETag /
  * `If-Match`), resolution as a read of that pointer. Equivalently, a
  * transactional table format (Delta, Iceberg) IS this trait — its
  * optimistic-concurrency commit is `commitGeneration`, its snapshot read
  * is `resolveCurrent` — and also closes the residual lease-fencing window
  * documented on [[StreamingReplicator.verifyClaim]]. Neither jar ships in
  * this environment, so the binding stays a seam; the reference gets the
  * same guarantees from Cassandra LWT locks
  * (cassandra/src/main/scala/com/evolution/kafka/journal/cassandra/CassandraSync.scala).
  *
  * Every implementation must preserve the protocol laws the ReplicatorSpec
  * races pin on the default: at most one live claim per epoch; a broken
  * lease fences the old holder's subsequent verify/commit; at most one
  * writer's commit succeeds per epoch (the loser sees
  * [[ConcurrentStoreWriteException]] and publishes nothing); a reader
  * resolving at any instant sees exactly one fully-committed generation.
  */
trait StoreCommitProtocol {

  /** Takes the lease-style claim on `epoch`; returns the writer token the
    * other operations authenticate with. Must throw
    * [[ConcurrentStoreWriteException]] while a live (unexpired) claim by
    * another writer exists.
    */
  def claimEpoch(root: String, epoch: Long, leaseMs: Long): String

  /** Extends the holder's lease (heartbeat); must fail — fencing the
    * holder — if the claim was broken in the meantime.
    */
  def renewClaim(root: String, epoch: Long, token: String): Unit

  /** Asserts this writer still holds the claim; called immediately before
    * every shared-table mutation. Must throw
    * [[ConcurrentStoreWriteException]] if the lease was broken.
    */
  def verifyClaim(root: String, epoch: Long, token: String): Unit

  /** Releases the claim iff it still carries `token` (a holder must never
    * remove a lease-breaker's re-issued claim).
    */
  def releaseClaim(root: String, epoch: Long, token: String): Unit

  /** Stages `pointer2` as generation `basedOnEpoch + 1` and adopts it via
    * the epoch CAS. Must publish nothing and throw
    * [[ConcurrentStoreWriteException]] if another writer advanced the
    * store first.
    */
  def commitGeneration(
      root: String,
      basedOnEpoch: Long,
      pointer2: DataFrame,
      writerToken: String
  ): Unit

  /** Resolves the committed current generation (path, epoch), repairing
    * crash leftovers if the storage requires it. Epoch 0 = virgin store.
    */
  def resolveCurrent(storeDir: String): (String, Long)
}

/** The conditional-put implementation — the OBJECT-STORE shape of the
  * protocol, proving the seam portable: every fence is built from exactly
  * the two primitives an S3-class store offers on a single key, modeled by
  * an in-memory CAS map (a real binding swaps the map operations for
  * conditional PUTs; nothing else changes):
  *
  *   - '''put-if-absent''' (`If-None-Match: *`): taking a claim, the
  *     virgin-store epoch-0→1 commit.
  *   - '''compare-and-swap on the current value''' (ETag / `If-Match`):
  *     breaking an expired lease (guarded by the exact observed claim, so
  *     two breakers cannot both win), renewing a lease, and the epoch CAS
  *     itself — the `current` POINTER key swings from generation E to E+1
  *     only if it still holds E.
  *
  * Data stays on the filesystem under UNIQUELY-NAMED staged directories
  * (`mgen-<epoch>-<nanos>`) that are never contended — exactly how an
  * object-store deployment stages under unique keys and publishes by
  * swinging the pointer; an orphaned staging (dead writer) is never
  * referenced and is garbage, not a correctness hazard (a real store
  * reaps it with a lifecycle rule, like S3 aborts stale multipart
  * uploads). Because publication is a single pointer CAS there is no
  * committed-but-unadopted state and no crash-repair path — the
  * transactional-table-format argument from the trait doc, demonstrated.
  *
  * One instance models ONE store (the map is per-instance state, as an
  * endpoint's keyspace is per-store): concurrent writers of a store must
  * share the instance, and the claim/pointer keys are namespaced by root
  * so one instance can serve many stores.
  */
final class MemCommitProtocol extends StoreCommitProtocol {
  import StreamingReplicator.ConcurrentStoreWriteException

  private case class Claim(token: String, stamp: Long)
  // `prev` = the staged dir superseded by THIS generation's commit: it is
  // deleted by the NEXT commit (one full commit cycle of grace), not by
  // this one — a reader that resolved the old epoch keeps its listed
  // pointer2 files until a further commit supersedes them, the DirSwap
  // grace model applied to the protocol's data staging (the pointer CAS
  // itself never contends on data paths)
  private case class Gen(path: String, epoch: Long, prev: Option[String])

  private val claims =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Claim]()
  private val current =
    new java.util.concurrent.ConcurrentHashMap[String, Gen]()

  private def freshToken(): String =
    s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}/" +
      s"${Thread.currentThread().getId}-${System.nanoTime()}"

  def claimEpoch(root: String, epoch: Long, leaseMs: Long): String = {
    val key = (root, epoch)
    val now = System.currentTimeMillis()
    val mine = Claim(freshToken(), now)
    val prev = claims.putIfAbsent(key, mine) // If-None-Match: *
    if (prev == null) mine.token
    else {
      val expired = now - prev.stamp > leaseMs
      // break = CAS guarded by the exact observed claim (If-Match): of
      // two concurrent breakers at most one replace succeeds
      if (expired && claims.replace(key, prev, mine)) mine.token
      else
        throw new ConcurrentStoreWriteException(
          s"epoch $epoch is claimed by a live writer — concurrent " +
            "replication detected; retry after it commits or its lease expires"
        )
    }
  }

  def renewClaim(root: String, epoch: Long, token: String): Unit = {
    val key = (root, epoch)
    val held = claims.get(key)
    val renewed = held != null && held.token == token &&
      claims.replace(key, held, held.copy(stamp = System.currentTimeMillis()))
    if (!renewed)
      throw new ConcurrentStoreWriteException(
        s"claim on epoch $epoch was lease-broken while this writer " +
          "stalled — publishing nothing; the batch redelivers"
      )
  }

  def verifyClaim(root: String, epoch: Long, token: String): Unit = {
    val held = claims.get((root, epoch))
    if (held == null || held.token != token)
      throw new ConcurrentStoreWriteException(
        s"claim on epoch $epoch was lease-broken while this writer " +
          "stalled — publishing nothing; the batch redelivers"
      )
  }

  def releaseClaim(root: String, epoch: Long, token: String): Unit = {
    // remove iff still ours: a fenced holder must never evict the
    // breaker's re-issued claim
    claims.computeIfPresent(
      (root, epoch),
      (_, c) => if (c.token == token) null else c
    ): Unit
  }

  def commitGeneration(
      root: String,
      basedOnEpoch: Long,
      pointer2: DataFrame,
      writerToken: String
  ): Unit = {
    require(
      writerToken.nonEmpty,
      "writerToken must identify the committing writer"
    )
    val nextEpoch = basedOnEpoch + 1
    val staged = Loc.join(root, s"mgen-$nextEpoch-${System.nanoTime()}")
    pointer2.write
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(Loc.join(staged, "pointer2"))
    val key = root
    val won =
      if (basedOnEpoch == 0L)
        // virgin store: If-None-Match — exactly one epoch-1 publisher;
        // a loser learns immediately (no _WRITER-tag disambiguation
        // needed: the pointer swing is the only publication event)
        current.putIfAbsent(key, Gen(staged, 1L, None)) == null
      else
        current.get(key) match {
          case g if g != null && g.epoch == basedOnEpoch =>
            val ok = current.replace(
              key,
              g,
              Gen(staged, nextEpoch, Some(g.path))
            )
            // sweep the generation superseded TWO commits ago — the one
            // this commit supersedes (g.path) is retained for in-flight
            // readers of epoch `basedOnEpoch` and falls due next commit
            if (ok)
              g.prev.foreach(p => Blob.deleteTree(p))
            ok
          case _ => false
        }
    if (!won) {
      Blob.deleteTree(staged)
      throw new ConcurrentStoreWriteException(
        s"epoch $basedOnEpoch already superseded — another writer " +
          "committed first; re-read the store and retry"
      )
    }
    // claims at or below the adopted epoch are spent
    claims
      .keySet()
      .removeIf(k => k._1 == root && k._2 <= nextEpoch): Unit
  }

  def resolveCurrent(storeDir: String): (String, Long) = {
    current.get(storeDir) match {
      case null => (Loc.join(storeDir, "current-0"), 0L) // virgin
      case g    => (g.path, g.epoch)
    }
  }
}

/** The filesystem implementation — the module-level functions on
  * [[StreamingReplicator]], unchanged, behind the seam. See the trait doc
  * for the atomic-rename + CREATE_NEW storage contract this relies on.
  */
object FsCommitProtocol extends StoreCommitProtocol {
  def claimEpoch(root: String, epoch: Long, leaseMs: Long): String =
    StreamingReplicator.claimEpoch(root, epoch, leaseMs)
  def renewClaim(root: String, epoch: Long, token: String): Unit =
    StreamingReplicator.renewClaim(root, epoch, token)
  def verifyClaim(root: String, epoch: Long, token: String): Unit =
    StreamingReplicator.verifyClaim(root, epoch, token)
  def releaseClaim(root: String, epoch: Long, token: String): Unit =
    StreamingReplicator.releaseClaim(root, epoch, token)
  def commitGeneration(
      root: String,
      basedOnEpoch: Long,
      pointer2: DataFrame,
      writerToken: String
  ): Unit =
    StreamingReplicator.commitGeneration(root, basedOnEpoch, pointer2, writerToken)
  def resolveCurrent(storeDir: String): (String, Long) =
    StreamingReplicator.resolveCurrent(storeDir)
}
