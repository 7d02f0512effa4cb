package graft.streaming

import java.nio.file.Path

import org.apache.spark.sql.DataFrame

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
  * two filesystem primitives, and is correct ONLY where both are atomic:
  *
  *   - '''atomic rename that fails when the source is gone'''
  *     (`Files.move`): the epoch CAS — only one writer can move
  *     `current-<E>` aside — and the lease break (tombstone rename).
  *   - '''atomic create-if-absent''' (`CREATE_NEW`): claim files, renewal
  *     side-files, the virgin-store `_WRITER` fence.
  *
  * POSIX filesystems, HDFS, and NFS provide both. '''S3-class object
  * stores provide NEITHER''' on plain keys — "rename" is copy+delete
  * (non-atomic, and both halves visible mid-flight), and an unconditional
  * PUT last-writer-wins. Running [[FsCommitProtocol]] against an object
  * store mounted as a filesystem silently loses BOTH fences: two writers
  * can each believe they committed the same epoch. Do not do it.
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
  def claimEpoch(root: Path, epoch: Long, leaseMs: Long): String

  /** Extends the holder's lease (heartbeat); must fail — fencing the
    * holder — if the claim was broken in the meantime.
    */
  def renewClaim(root: Path, epoch: Long, token: String): Unit

  /** Asserts this writer still holds the claim; called immediately before
    * every shared-table mutation. Must throw
    * [[ConcurrentStoreWriteException]] if the lease was broken.
    */
  def verifyClaim(root: Path, epoch: Long, token: String): Unit

  /** Releases the claim iff it still carries `token` (a holder must never
    * remove a lease-breaker's re-issued claim).
    */
  def releaseClaim(root: Path, epoch: Long, token: String): Unit

  /** Stages `pointer2` as generation `basedOnEpoch + 1` and adopts it via
    * the epoch CAS. Must publish nothing and throw
    * [[ConcurrentStoreWriteException]] if another writer advanced the
    * store first.
    */
  def commitGeneration(
      root: Path,
      basedOnEpoch: Long,
      pointer2: DataFrame,
      writerToken: String
  ): Unit

  /** Resolves the committed current generation (path, epoch), repairing
    * crash leftovers if the storage requires it. Epoch 0 = virgin store.
    */
  def resolveCurrent(storeDir: String): (Path, Long)
}

/** The filesystem implementation — the module-level functions on
  * [[StreamingReplicator]], unchanged, behind the seam. See the trait doc
  * for the atomic-rename + CREATE_NEW storage contract this relies on.
  */
object FsCommitProtocol extends StoreCommitProtocol {
  def claimEpoch(root: Path, epoch: Long, leaseMs: Long): String =
    StreamingReplicator.claimEpoch(root, epoch, leaseMs)
  def renewClaim(root: Path, epoch: Long, token: String): Unit =
    StreamingReplicator.renewClaim(root, epoch, token)
  def verifyClaim(root: Path, epoch: Long, token: String): Unit =
    StreamingReplicator.verifyClaim(root, epoch, token)
  def releaseClaim(root: Path, epoch: Long, token: String): Unit =
    StreamingReplicator.releaseClaim(root, epoch, token)
  def commitGeneration(
      root: Path,
      basedOnEpoch: Long,
      pointer2: DataFrame,
      writerToken: String
  ): Unit =
    StreamingReplicator.commitGeneration(root, basedOnEpoch, pointer2, writerToken)
  def resolveCurrent(storeDir: String): (Path, Long) =
    StreamingReplicator.resolveCurrent(storeDir)
}
