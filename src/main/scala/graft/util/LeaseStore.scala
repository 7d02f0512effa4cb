package graft.util

/** The storage primitives [[MaintainerLease]] is built from — extracted so
  * the lease gets the same two-implementation treatment as the journal
  * store's commit protocol (graft.streaming.StoreCommitProtocol /
  * MemCommitProtocol): the fencing laws run implementation-generically,
  * and an S3-class object-store deployment binds the three conditional
  * primitives to conditional PUT (If-None-Match / If-Match) instead of
  * POSIX rename — [[MemLeaseStore]] IS that binding's semantics, in
  * memory, so the law spec exercises the conditional-PUT shape today.
  *
  * The reference serializes the same mutation class with a CQL lock table
  * (cassandra/src/main/scala/com/evolution/kafka/journal/cassandra/CassandraSync.scala:13-60
  * — INSERT IF NOT EXISTS + TTL); these five primitives are that lock
  * table's contract over any store with atomic create/compare-and-swap.
  */
trait LeaseStore {

  /** Atomic create-if-absent. True = this caller created the entry. */
  def createIfAbsent(key: String, content: String): Boolean

  /** Entry content; None when absent OR transiently unreadable — the
    * expiry check treats None as "live" (fail the claim, retry later),
    * the conservative direction.
    */
  def read(key: String): Option[String]

  /** Atomic compare-and-replace: succeeds iff the entry currently holds
    * exactly `expect`. The lease-break primitive — two breakers cannot
    * both win, and a fresh claim re-issued between a breaker's read and
    * its break is never displaced (its content no longer matches).
    */
  def replaceIf(key: String, expect: String, content: String): Boolean

  /** Atomic compare-and-delete: succeeds iff the entry currently holds
    * exactly `expect`. The release primitive — a release landing after a
    * stall cannot remove a rival's re-issued claim (the round-12 verdict's
    * read-then-delete window, closed by making the delete conditional).
    */
  def deleteIf(key: String, expect: String): Boolean

  /** Unconditional create of a UNIQUE key (renewal side-entries — keys
    * carry a nanotime, so they never collide and never overwrite).
    */
  def putNew(key: String, content: String): Unit

  /** Contents of every entry whose key starts with `prefix` (renewal
    * scan); unreadable entries are skipped.
    */
  def listContents(prefix: String): Seq[String]

  /** Removes every entry whose key starts with `prefix` (release
    * cleanup of renewals and spent tombstones).
    */
  def deleteAll(prefix: String): Unit

  /** Last-modified wall millis of an entry, when the binding records one
    * — the expiry fallback for a claim whose stamp is corrupt (a crash
    * mid-write must still lease-expire, not wedge maintenance forever).
    * None when absent or the binding has no mtime.
    */
  def mtimeMs(key: String): Option[Long]
}

/** Filesystem binding over a string root (plain path or URI — the
  * backend dispatches by scheme, see [[Blob]]): entries are files under
  * `root`; every conditional primitive delegates to the [[BlobIo]]
  * conditional layer — atomic `CREATE_NEW` for create-if-absent, and the
  * blob CAS ([[BlobIo.putIfMatch]]/[[BlobIo.deleteIfMatch]]) for
  * compare-and-replace/-delete. Where the backend's CAS is
  * construction-grade ([[BlobIo.casByConstruction]]: plain paths and
  * `file://` via the file-locked nio CAS, [[MemBlob]]'s map computes, a
  * future object-store If-Match binding) the round-15 displace-verify-
  * restore race class is gone BY CONSTRUCTION — the slot is never
  * vacated between read and swap. Elsewhere (HDFS) the blob layer
  * emulates with the pre-read-guarded rename dance, whose residual is
  * crash-scale and fenced at the holder's next verify.
  *
  * Pass `io` explicitly to bind a specific backend (the law spec runs
  * the whole protocol over [[MemBlob]] with its adversarial-schedule
  * hook); the single-argument constructor dispatches by the root's
  * scheme as every production caller does.
  */
final class FsLeaseStore(root: String, io: BlobIo) extends LeaseStore {

  def this(root: String) = this(root, Blob.backend(root))

  private def p(key: String): String = Loc.join(root, key)

  override def createIfAbsent(key: String, content: String): Boolean = {
    io.mkdirs(root)
    io.createNew(p(key), content.getBytes("UTF-8"))
  }

  override def read(key: String): Option[String] =
    try Some(new String(io.readBytes(p(key)), "UTF-8"))
    catch { case _: java.io.IOException => None }

  override def replaceIf(key: String, expect: String, content: String): Boolean =
    io.putIfMatch(p(key), expect.getBytes("UTF-8"), content.getBytes("UTF-8"))

  override def deleteIf(key: String, expect: String): Boolean =
    io.deleteIfMatch(p(key), expect.getBytes("UTF-8"))

  override def putNew(key: String, content: String): Unit = {
    io.mkdirs(root)
    if (!io.createNew(p(key), content.getBytes("UTF-8")))
      throw new java.io.IOException(s"unique key ${p(key)} already exists")
  }

  override def listContents(prefix: String): Seq[String] =
    io.children(root)
      .filter(Loc.name(_).startsWith(prefix))
      .flatMap { f =>
        try Some(new String(io.readBytes(f), "UTF-8"))
        catch { case _: java.io.IOException => None }
      }

  override def deleteAll(prefix: String): Unit =
    io.children(root)
      .filter(Loc.name(_).startsWith(prefix))
      .foreach(io.deleteIfExists)

  override def mtimeMs(key: String): Option[Long] = {
    val age = io.ageMs(p(key))
    if (age < 0) None else Some(System.currentTimeMillis() - age)
  }
}

/** In-memory conditional-PUT binding: every primitive is a single
  * compare-and-swap on a concurrent map — the exact shape an S3-class
  * binding has with If-None-Match (create) and If-Match (replace/delete)
  * conditional PUTs, with no rename anywhere. Running the fencing laws
  * against this implementation is what proves the lease PROTOCOL (not
  * just the POSIX binding) is race-free.
  */
final class MemLeaseStore extends LeaseStore {

  // (content, mtime millis); all mutations go through the map's own
  // atomic compute/putIfAbsent — no external lock
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()

  override def createIfAbsent(key: String, content: String): Boolean =
    entries.putIfAbsent(key, (content, System.currentTimeMillis())) == null

  override def read(key: String): Option[String] =
    Option(entries.get(key)).map(_._1)

  override def replaceIf(key: String, expect: String, content: String): Boolean = {
    val won = new java.util.concurrent.atomic.AtomicBoolean(false)
    entries.computeIfPresent(
      key,
      (_, cur) =>
        if (cur._1 == expect) {
          won.set(true)
          (content, System.currentTimeMillis())
        } else cur
    )
    won.get()
  }

  override def deleteIf(key: String, expect: String): Boolean = {
    val won = new java.util.concurrent.atomic.AtomicBoolean(false)
    entries.computeIfPresent(
      key,
      (_, cur) =>
        if (cur._1 == expect) { won.set(true); null }
        else cur
    )
    won.get()
  }

  override def putNew(key: String, content: String): Unit =
    entries.putIfAbsent(key, (content, System.currentTimeMillis())): Unit

  override def listContents(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    entries.entrySet().asScala.toSeq.collect {
      case e if e.getKey.startsWith(prefix) => e.getValue._1
    }
  }

  override def deleteAll(prefix: String): Unit =
    entries.keySet().removeIf(_.startsWith(prefix)): Unit

  override def mtimeMs(key: String): Option[Long] =
    Option(entries.get(key)).map(_._2)
}
