package graft.util

import java.nio.file.{Files, Path, StandardCopyOption}

/** The storage primitives behind [[DirSwap]]'s CONTROL PLANE — the same
  * two-implementation treatment [[LeaseStore]] gave the maintainer lease
  * and StoreCommitProtocol gave the journal store: the generation-swap
  * protocol (pointer read/publish, prefix listing, sweep, age, drop)
  * expressed over five primitives so its laws can run against both the
  * POSIX binding and an object-store-shaped one.
  *
  * The DATA plane is deliberately OUTSIDE the seam: [[DirSwap.swap]]'s
  * `write(genDir)` callback writes parquet through Spark's own
  * filesystem connectors, which already speak object stores — what an
  * S3-class deployment needs from THIS seam is only the protocol's
  * control operations, and each maps directly:
  *
  *   - [[readBytes]]/[[exists]] → GET / HEAD on the pointer object
  *   - [[publishPointer]] → PUT of a small object. POSIX needs
  *     tmp + atomic rename to replace-atomically; object-store PUT is
  *     already atomic per object (readers see old or new bytes, never
  *     torn). Last-writer-wins suffices because every mutator runs under
  *     the store's [[MaintainerLease]] (fenced since round 12) — the
  *     pointer CAS that multi-writer adoption needs lives in the journal
  *     store's commit protocol, not here.
  *   - [[children]] → LIST with the root prefix (one level)
  *   - [[deleteTree]] → batch delete under the prefix
  *   - [[ageMs]] → the generation marker's last-modified stamp (object
  *     stores stamp every object; a "directory" ages as its newest
  *     object under the prefix — the binding decides)
  */
trait DirStore {
  def exists(p: Path): Boolean
  def readBytes(p: Path): Array[Byte]
  /** Publish `bytes` at `p`, atomically replacing any previous content. */
  def publishPointer(p: Path, bytes: Array[Byte]): Unit
  /** Immediate children of `root` (empty if absent). */
  def children(root: Path): Seq[Path]
  def deleteTree(p: Path): Unit
  /** Milliseconds since `p` was last modified; NEGATIVE when the stamp
    * cannot be read (vanished or unreadable mid-sweep: another party's
    * problem — an unknown age never "ages out" into a sweep; retaining
    * one more cycle is always safe, deleting early is not).
    */
  def ageMs(p: Path): Long
  /** Create an (empty) directory entry — the law specs' stand-in for the
    * data plane's generation write; production writes go through Spark.
    */
  def mkdirs(p: Path): Unit
}

/** The local/HDFS/NFS binding — rename-based atomic pointer publish. */
object PosixDirStore extends DirStore {
  def exists(p: Path): Boolean = Files.exists(p)
  def readBytes(p: Path): Array[Byte] = Files.readAllBytes(p)
  def publishPointer(p: Path, bytes: Array[Byte]): Unit = {
    val tmp = p.resolveSibling(s"${p.getFileName}.tmp-${System.nanoTime()}")
    Files.write(tmp, bytes)
    Files.move(
      tmp,
      p,
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING
    ): Unit
  }
  def children(root: Path): Seq[Path] = {
    if (!Files.exists(root)) return Seq.empty
    val s = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
    } finally s.close()
  }
  def deleteTree(p: Path): Unit = Fs.deleteRecursively(p)
  def ageMs(p: Path): Long =
    try
      math.max(
        0L,
        System.currentTimeMillis() - Files.getLastModifiedTime(p).toMillis
      )
    catch { case _: java.io.IOException => -1L }
  def mkdirs(p: Path): Unit = { Files.createDirectories(p): Unit }
}

/** In-memory conditional-PUT-shaped binding — the object-store analogue
  * (flat key space, per-object atomic PUT, prefix listing, stamped
  * objects), used by the protocol law specs to prove [[DirSwap]] needs
  * nothing POSIX-specific. A test clock makes age-based sweeping
  * deterministic without sleeping.
  *
  * TEST-ONLY by constraint, not just intent: `children`/`deleteTree`/
  * `ageMs` scan every key (O(total objects) per call) and `exists`
  * conflates a key with any prefix-descendant — fine for law specs over
  * tens of objects, unsuitable as a real store binding. A production
  * object-store binding must index keys by prefix (the store's own LIST
  * API does) and distinguish object-exists from prefix-exists.
  */
final class MemDirStore extends DirStore {
  import scala.collection.concurrent.TrieMap
  // key → (bytes or null for a bare directory entry, stamp)
  private val objects = TrieMap.empty[String, (Array[Byte], Long)]
  @volatile private var clockMs: Long = 0L
  def advanceClock(ms: Long): Unit = clockMs += ms
  private def key(p: Path): String = p.toString

  def exists(p: Path): Boolean = {
    val k = key(p)
    objects.contains(k) || objects.keysIterator.exists(_.startsWith(k + "/"))
  }
  def readBytes(p: Path): Array[Byte] =
    objects
      .getOrElse(key(p), throw new java.io.IOException(s"no object ${key(p)}"))
      ._1
  def publishPointer(p: Path, bytes: Array[Byte]): Unit = {
    objects.put(key(p), (bytes, clockMs)): Unit // per-object PUT is atomic
  }
  def children(root: Path): Seq[Path] = {
    val prefix = key(root) + "/"
    objects.keysIterator
      .filter(_.startsWith(prefix))
      .map(k => k.drop(prefix.length).takeWhile(_ != '/'))
      .toSeq
      .distinct
      .map(root.resolve)
  }
  def deleteTree(p: Path): Unit = {
    val k = key(p)
    objects.remove(k): Unit
    objects.keysIterator.filter(_.startsWith(k + "/")).toSeq
      .foreach(objects.remove(_): Unit)
  }
  def ageMs(p: Path): Long = {
    val k = key(p)
    val stamps = (objects.get(k).map(_._2).iterator ++
      objects.iterator.collect {
        case (ok, (_, ts)) if ok.startsWith(k + "/") => ts
      }).toSeq
    if (stamps.isEmpty) -1L else clockMs - stamps.max
  }
  def mkdirs(p: Path): Unit = {
    // a marker object stands in for the directory (object stores have no
    // directories; Spark writers leave data objects that play this role)
    objects.put(key(p) + "/.dir", (Array.emptyByteArray, clockMs)): Unit
  }
}
