package graft.util

/** The storage primitives behind [[DirSwap]]'s CONTROL PLANE — the same
  * two-implementation treatment [[LeaseStore]] gave the maintainer lease
  * and StoreCommitProtocol gave the journal store: the generation-swap
  * protocol (pointer read/publish, prefix listing, sweep, age, drop)
  * expressed over five primitives so its laws can run against the POSIX
  * binding, the Hadoop `FileSystem` binding (HDFS/S3-class URIs — where a
  * 100 TB deployment's data lives), and an in-memory object-store-shaped
  * one.
  *
  * Locations are STRINGS — plain paths or URIs; `java.nio.file.Path`
  * cannot represent `s3a://…` (see [[Loc]]). The DATA plane is
  * deliberately OUTSIDE the seam: [[DirSwap.swap]]'s `write(genDir)`
  * callback writes parquet through Spark's own filesystem connectors,
  * which already speak every scheme — what a deployment needs from THIS
  * seam is only the protocol's control operations, and each maps
  * directly:
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
  def exists(loc: String): Boolean
  def readBytes(loc: String): Array[Byte]
  /** Publish `bytes` at `loc`, atomically replacing any previous content. */
  def publishPointer(loc: String, bytes: Array[Byte]): Unit
  /** Immediate children of `root` as full locations (empty if absent). */
  def children(root: String): Seq[String]
  def deleteTree(loc: String): Unit
  /** Milliseconds since `loc` was last modified; NEGATIVE when the stamp
    * cannot be read (vanished or unreadable mid-sweep: another party's
    * problem — an unknown age never "ages out" into a sweep; retaining
    * one more cycle is always safe, deleting early is not).
    */
  def ageMs(loc: String): Long
  /** Create an (empty) directory entry — the law specs' stand-in for the
    * data plane's generation write; production writes go through Spark.
    */
  def mkdirs(loc: String): Unit
}

/** The swap protocol's control plane over a [[BlobIo]] backend — both
  * filesystem bindings are this class with the backend swapped.
  */
sealed class IoDirStore(io: BlobIo) extends DirStore {
  def exists(loc: String): Boolean = io.exists(loc)
  def readBytes(loc: String): Array[Byte] = io.readBytes(loc)
  def publishPointer(loc: String, bytes: Array[Byte]): Unit =
    io.publishAtomic(loc, bytes)
  def children(root: String): Seq[String] = io.children(root)
  def deleteTree(loc: String): Unit = io.deleteTree(loc)
  def ageMs(loc: String): Long = io.ageMs(loc)
  def mkdirs(loc: String): Unit = io.mkdirs(loc)
}

/** The local/NFS binding — rename-based atomic pointer publish over
  * `java.nio` (plain paths).
  */
object PosixDirStore extends IoDirStore(NioBlob)

/** The Hadoop `FileSystem` binding — URI-schemed roots (`hdfs://`,
  * `s3a://`, `file://`): maintained stores live where the data plane
  * lives. Pointer publish is tmp + `FileContext` OVERWRITE rename
  * (atomic on HDFS) with a single-object-PUT fallback where the scheme
  * registers no AbstractFileSystem (atomic per object on S3-class
  * stores) — see [[HadoopBlob.publishAtomic]].
  */
object HadoopDirStore extends IoDirStore(HadoopBlob)

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

  def exists(loc: String): Boolean =
    objects.contains(loc) || objects.keysIterator.exists(_.startsWith(loc + "/"))
  def readBytes(loc: String): Array[Byte] =
    objects
      .getOrElse(loc, throw new java.io.IOException(s"no object $loc"))
      ._1
  def publishPointer(loc: String, bytes: Array[Byte]): Unit = {
    objects.put(loc, (bytes, clockMs)): Unit // per-object PUT is atomic
  }
  def children(root: String): Seq[String] = {
    val prefix = root + "/"
    objects.keysIterator
      .filter(_.startsWith(prefix))
      .map(k => k.drop(prefix.length).takeWhile(_ != '/'))
      .toSeq
      .distinct
      .map(Loc.join(root, _))
  }
  def deleteTree(loc: String): Unit = {
    objects.remove(loc): Unit
    objects.keysIterator.filter(_.startsWith(loc + "/")).toSeq
      .foreach(objects.remove(_): Unit)
  }
  def ageMs(loc: String): Long = {
    val stamps = (objects.get(loc).map(_._2).iterator ++
      objects.iterator.collect {
        case (ok, (_, ts)) if ok.startsWith(loc + "/") => ts
      }).toSeq
    if (stamps.isEmpty) -1L else clockMs - stamps.max
  }
  def mkdirs(loc: String): Unit = {
    // a marker object stands in for the directory (object stores have no
    // directories; Spark writers leave data objects that play this role)
    objects.put(loc + "/.dir", (Array.emptyByteArray, clockMs)): Unit
  }
}
