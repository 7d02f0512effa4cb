package graft.util

import java.io.ByteArrayOutputStream

/** String-location path algebra for the store control planes.
  *
  * Every maintained store (inverted index, LM counts, IVF vectors, span
  * windows, head cache, snapshots, bucketed journal) names its root as a
  * STRING — a plain POSIX path in the local deployments, or a URI
  * (`hdfs://…`, `s3a://…`, `file://…`) where a 100 TB deployment's data
  * lives. `java.nio.file.Path` cannot represent the URI form (`Paths.get`
  * collapses the `//`), so the control-plane seams ([[DirStore]],
  * [[LeaseStore]], graft.streaming.StoreCommitProtocol) operate on string
  * locations and pick their IO backend by scheme: [[Loc.hasScheme]] →
  * Hadoop `FileSystem` (the abstraction Spark itself writes the data
  * plane through), otherwise `java.nio` (cheaper syscalls, no Hadoop
  * client warm-up, and byte-identical to the historical behavior every
  * protocol race spec pins).
  */
object Loc {

  /** True when `loc` is URI-schemed (`scheme://…`) — route through the
    * Hadoop backend. Plain POSIX paths never contain `://`.
    */
  def hasScheme(loc: String): Boolean = {
    val i = loc.indexOf("://")
    i > 0 && loc.substring(0, i).forall(c => c.isLetterOrDigit || "+.-".contains(c))
  }

  /** `root/child` with exactly one separator. */
  def join(root: String, child: String): String =
    s"${root.stripSuffix("/")}/$child"

  /** Final path segment (the `Path.getFileName` analogue). */
  def name(loc: String): String = {
    val s = loc.stripSuffix("/")
    s.substring(s.lastIndexOf('/') + 1)
  }
}

/** The byte/listing primitives the control planes need, over string
  * locations — two backends ([[NioBlob]], [[HadoopBlob]]); [[Blob]]
  * dispatches by scheme. The DATA plane (parquet) always goes through
  * Spark's own connectors and never touches this.
  */
trait BlobIo {
  def exists(loc: String): Boolean
  /** Throws `java.io.IOException` when absent/unreadable. */
  def readBytes(loc: String): Array[Byte]
  /** Overwrite-in-place (NOT atomic — use [[publishAtomic]] for pointers
    * readers resolve concurrently); creates parent directories.
    */
  def writeBytes(loc: String, bytes: Array[Byte]): Unit
  /** Atomic create-if-absent. True = this caller created it. */
  def createNew(loc: String, bytes: Array[Byte]): Boolean
  /** Atomic rename. False when the source is gone or the destination
    * exists (the caller disambiguates with [[exists]] probes — the
    * protocol CAS usages name unique destinations, so `false` there
    * always means "source already taken by the other racer").
    */
  def move(src: String, dst: String): Boolean
  /** Atomically publish `bytes` at `loc`, replacing any previous content:
    * readers see wholly-old or wholly-new bytes, never torn.
    */
  def publishAtomic(loc: String, bytes: Array[Byte]): Unit
  /** Immediate children as FULL locations (empty when absent). */
  def children(root: String): Seq[String]
  def deleteTree(loc: String): Unit
  def deleteIfExists(loc: String): Unit
  def mkdirs(loc: String): Unit
  /** Atomic compare-and-replace: succeeds iff `loc` currently holds
    * exactly `expect`, in which case the content becomes `bytes`. False
    * when absent or the content differs. The lease-break / epoch-pointer
    * primitive: of two racers guarding on the same observed content at
    * most one wins, and — on bindings where [[casByConstruction]] is true
    * — the slot is NEVER vacated in between (no displace window at all).
    */
  def putIfMatch(loc: String, expect: Array[Byte], bytes: Array[Byte]): Boolean
  /** Atomic compare-and-delete: succeeds iff `loc` currently holds
    * exactly `expect`. The conditional-release primitive.
    */
  def deleteIfMatch(loc: String, expect: Array[Byte]): Boolean
  /** True when [[createNew]]/[[putIfMatch]]/[[deleteIfMatch]] at `loc` are
    * each arbitrated by a SINGLE storage operation (a true compare-and-
    * swap), so the at-most-one-winner guarantees hold by construction.
    * False where the binding can only EMULATE them with the displace-
    * verify-restore rename dance, whose residual race is crash-scale but
    * nonzero (see [[HadoopBlob]]).
    */
  def casByConstruction(loc: String): Boolean
  /** Milliseconds since last modification; NEGATIVE when unreadable
    * (vanished mid-sweep — an unknown age never "ages out").
    */
  def ageMs(loc: String): Long
  /** Recursive count of `*.parquet` data files (0 when absent). */
  def countParquetFiles(loc: String): Long
  /** True iff at least one `*.parquet` file exists under `loc`. */
  def hasParquet(loc: String): Boolean
}

object Blob {
  def backend(loc: String): BlobIo =
    if (Loc.hasScheme(loc)) HadoopBlob else NioBlob

  def exists(loc: String): Boolean = backend(loc).exists(loc)
  def readBytes(loc: String): Array[Byte] = backend(loc).readBytes(loc)
  def writeBytes(loc: String, bytes: Array[Byte]): Unit =
    backend(loc).writeBytes(loc, bytes)
  def createNew(loc: String, bytes: Array[Byte]): Boolean =
    backend(loc).createNew(loc, bytes)
  def move(src: String, dst: String): Boolean = backend(src).move(src, dst)
  def putIfMatch(loc: String, expect: Array[Byte], bytes: Array[Byte]): Boolean =
    backend(loc).putIfMatch(loc, expect, bytes)
  def deleteIfMatch(loc: String, expect: Array[Byte]): Boolean =
    backend(loc).deleteIfMatch(loc, expect)
  def casByConstruction(loc: String): Boolean =
    backend(loc).casByConstruction(loc)
  def publishAtomic(loc: String, bytes: Array[Byte]): Unit =
    backend(loc).publishAtomic(loc, bytes)
  def children(root: String): Seq[String] = backend(root).children(root)
  def deleteTree(loc: String): Unit = backend(loc).deleteTree(loc)
  def deleteIfExists(loc: String): Unit = backend(loc).deleteIfExists(loc)
  def mkdirs(loc: String): Unit = backend(loc).mkdirs(loc)
  def ageMs(loc: String): Long = backend(loc).ageMs(loc)
  def countParquetFiles(loc: String): Long =
    backend(loc).countParquetFiles(loc)
  def hasParquet(loc: String): Boolean = backend(loc).hasParquet(loc)
}

/** `java.nio` backend — plain paths; behavior identical to the historical
  * Path-typed implementations the protocol race specs pin.
  */
object NioBlob extends BlobIo {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}

  private def p(loc: String): Path = Paths.get(loc)

  def exists(loc: String): Boolean = Files.exists(p(loc))

  def readBytes(loc: String): Array[Byte] = Files.readAllBytes(p(loc))

  def writeBytes(loc: String, bytes: Array[Byte]): Unit = {
    val t = p(loc)
    if (t.getParent != null) Files.createDirectories(t.getParent)
    Files.write(t, bytes): Unit
  }

  def createNew(loc: String, bytes: Array[Byte]): Boolean =
    try {
      Files.write(p(loc), bytes, StandardOpenOption.CREATE_NEW)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }

  def move(src: String, dst: String): Boolean =
    try { Files.move(p(src), p(dst)); true }
    catch {
      // ONLY the CAS-loss signals map to false (source taken, destination
      // occupied); every other FileSystemException — AccessDenied, quota,
      // generic IO — PROPAGATES, so a storage failure surfaces as a
      // storage failure instead of masquerading as a concurrency loss
      // that callers answer by deleting their staged work (round-15
      // advice: adoptGeneration interpreted a swallowed AccessDenied as
      // "another writer committed first")
      case _: java.nio.file.NoSuchFileException         => false
      case _: java.nio.file.FileAlreadyExistsException  => false
      case _: java.nio.file.DirectoryNotEmptyException  => false
    }

  /** Per-lock-file monitors: the same-JVM half of the CAS mutual
    * exclusion (an OS [[java.nio.channels.FileLock]] is held per PROCESS;
    * two threads of one JVM locking the same file would throw
    * `OverlappingFileLockException`, so in-process writers serialize on
    * this monitor first).
    */
  private val casMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Runs `body` holding the CAS mutex for `loc`'s directory: a JVM
    * monitor (same-process writers) + an exclusive OS file lock on a
    * `.graft-cas.lck` sibling (cross-process writers). Advisory — but
    * every conditional mutator routes through here, so within a
    * deployment the read-compare-publish sequence linearizes; and the
    * publish itself is [[publishAtomic]], so non-locking readers still
    * never observe torn content. POSIX and NFSv4 honor the lock; this is
    * what makes the plain-path binding's conditional primitives
    * construction-grade rather than emulated.
    */
  private def underCasLock[A](loc: String)(body: => A): A = {
    val target = p(loc).toAbsolutePath
    val parent = Option(target.getParent).getOrElse(target.getRoot)
    Files.createDirectories(parent)
    val lockPath = parent.resolve(".graft-cas.lck")
    val monitor =
      casMonitors.computeIfAbsent(lockPath.toString, _ => new Object)
    monitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(
        lockPath,
        StandardOpenOption.CREATE,
        StandardOpenOption.WRITE
      )
      try {
        val fl = ch.lock()
        try body
        finally fl.release()
      } finally ch.close()
    }
  }

  def casByConstruction(loc: String): Boolean = true

  def putIfMatch(loc: String, expect: Array[Byte], bytes: Array[Byte]): Boolean =
    underCasLock(loc) {
      val cur =
        try Files.readAllBytes(p(loc))
        catch { case _: java.io.IOException => null }
      if (cur == null || !java.util.Arrays.equals(cur, expect)) false
      else { publishAtomic(loc, bytes); true }
    }

  def deleteIfMatch(loc: String, expect: Array[Byte]): Boolean =
    underCasLock(loc) {
      val cur =
        try Files.readAllBytes(p(loc))
        catch { case _: java.io.IOException => null }
      if (cur == null || !java.util.Arrays.equals(cur, expect)) false
      else Files.deleteIfExists(p(loc))
    }

  def publishAtomic(loc: String, bytes: Array[Byte]): Unit = {
    val t = p(loc)
    val tmp = t.resolveSibling(s"${t.getFileName}.tmp-${System.nanoTime()}")
    Files.write(tmp, bytes)
    Files.move(
      tmp,
      t,
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING
    ): Unit
  }

  def children(root: String): Seq[String] = {
    val r = p(root)
    if (!Files.exists(r)) return Seq.empty
    val s = Files.list(r)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator()
        .asScala
        .map(c => Loc.join(root, c.getFileName.toString))
        .toSeq
    } finally s.close()
  }

  def deleteTree(loc: String): Unit = Fs.deleteRecursively(p(loc))

  def deleteIfExists(loc: String): Unit =
    try Files.deleteIfExists(p(loc)): Unit
    catch { case _: java.io.IOException => () }

  def mkdirs(loc: String): Unit = { Files.createDirectories(p(loc)): Unit }

  def ageMs(loc: String): Long =
    try
      math.max(
        0L,
        System.currentTimeMillis() - Files.getLastModifiedTime(p(loc)).toMillis
      )
    catch { case _: java.io.IOException => -1L }

  def countParquetFiles(loc: String): Long = {
    val r = p(loc)
    if (!Files.exists(r)) return 0L
    var walk: java.util.stream.Stream[Path] = null
    try {
      walk = Files.walk(r)
      walk.filter(_.toString.endsWith(".parquet")).count()
    } finally if (walk != null) walk.close()
  }

  def hasParquet(loc: String): Boolean = {
    val r = p(loc)
    Files.exists(r) && {
      var walk: java.util.stream.Stream[Path] = null
      try {
        walk = Files.walk(r)
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.exists(_.toString.endsWith(".parquet"))
      } finally if (walk != null) walk.close()
    }
  }
}

/** Hadoop `FileSystem` backend — URI-schemed locations (`hdfs://`,
  * `s3a://`, `file://`, …): the SAME abstraction Spark reads and writes
  * the parquet data plane through, so a maintained store's control plane
  * (pointers, claims, generation listings, schema sidecars) now lives
  * wherever its data lives. The Hadoop configuration comes from the
  * active Spark session when one exists (so `fs.*` tuning and credentials
  * apply to the control plane too).
  *
  * Atomicity per operation class:
  *   - [[createNew]] / [[putIfMatch]] / [[deleteIfMatch]] at a `file://`
  *     root DELEGATE to [[NioBlob]] on the local path: `fs.create(p,
  *     overwrite = false)` on `RawLocalFileSystem` is exists-check-then-
  *     create (NOT atomic), while `java.nio` `CREATE_NEW` and the
  *     file-locked CAS are — so the local-URI binding keeps the same
  *     construction-grade claims as the plain-path one (round-15 advice).
  *   - [[createNew]] elsewhere: `create(overwrite = false)` — atomic on
  *     HDFS (the namenode arbitrates); object stores without conditional
  *     PUT weaken this.
  *   - [[putIfMatch]]/[[deleteIfMatch]] elsewhere: EMULATED with the
  *     pre-read-guarded displace-verify-restore rename dance
  *     ([[casByConstruction]] = false there): correct up to a triple
  *     interleaving (content changes between the guard read and the
  *     displacing rename — crash-scale, converged by the protocols'
  *     verify fences). A store with true conditional PUT (S3
  *     If-None-Match/If-Match, GCS generation preconditions, Azure
  *     etags) should bind these natively — [[MemBlob]] IS that binding's
  *     semantics and the law target proving the protocols need nothing
  *     more than these primitives.
  *   - [[move]]: `FileSystem.rename` — atomic on HDFS; of two racers
  *     renaming one source, at most one wins.
  *   - [[publishAtomic]]: tmp + `FileContext.rename(OVERWRITE)` (atomic
  *     replace on HDFS/local); where the scheme registers no
  *     `AbstractFileSystem` (s3a by default) it falls back to
  *     `create(overwrite = true)` — a single-object PUT, which on
  *     S3-class stores IS atomic per object (readers see old or new
  *     bytes, never torn), precisely the case the fallback serves.
  */
object HadoopBlob extends BlobIo {
  import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path => HPath}

  private def conf() =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def fsOf(loc: String): (FileSystem, HPath) = {
    val p = new HPath(loc)
    (p.getFileSystem(conf()), p)
  }

  def exists(loc: String): Boolean = {
    val (fs, p) = fsOf(loc)
    fs.exists(p)
  }

  def readBytes(loc: String): Array[Byte] = {
    val (fs, p) = fsOf(loc)
    val in = fs.open(p)
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  def writeBytes(loc: String, bytes: Array[Byte]): Unit = {
    val (fs, p) = fsOf(loc)
    val out = fs.create(p, true)
    try out.write(bytes)
    finally out.close()
  }

  /** `file://` URIs resolve to a local path — route the conditional
    * primitives through [[NioBlob]] there (see the class doc).
    */
  private def localPathOf(loc: String): Option[String] = {
    val uri = new HPath(loc).toUri
    if (uri.getScheme == "file") Option(uri.getPath) else None
  }

  def createNew(loc: String, bytes: Array[Byte]): Boolean =
    localPathOf(loc) match {
      case Some(lp) => NioBlob.createNew(lp, bytes)
      case None =>
        val (fs, p) = fsOf(loc)
        try {
          val out = fs.create(p, false)
          try out.write(bytes)
          finally out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.nio.file.FileAlreadyExistsException        => false
        }
    }

  def casByConstruction(loc: String): Boolean = localPathOf(loc).isDefined

  def putIfMatch(loc: String, expect: Array[Byte], bytes: Array[Byte]): Boolean =
    localPathOf(loc) match {
      case Some(lp) => NioBlob.putIfMatch(lp, expect, bytes)
      case None     => putIfMatchViaRename(loc, expect, bytes)
    }

  def deleteIfMatch(loc: String, expect: Array[Byte]): Boolean =
    localPathOf(loc) match {
      case Some(lp) => NioBlob.deleteIfMatch(lp, expect)
      case None     => deleteIfMatchViaRename(loc, expect)
    }

  /** The displace-verify-restore EMULATION of compare-and-replace over
    * atomic rename (schemes with no native CAS — HDFS): pre-read guard
    * (no displacement unless the content already matches), displace to a
    * unique tombstone (of two racers at most one rename wins), verify the
    * displaced content, complete or restore. Residual: the content
    * changing between the guard read and the rename mismatches the
    * verify, and the restore briefly vacates a re-taken slot — a triple
    * interleaving, crash-scale, fenced by the protocols' next verify.
    * `private[graft]` so the law spec exercises this path explicitly even
    * at a `file://` root (where the public entry points delegate to the
    * construction-grade nio CAS instead).
    */
  private[graft] def putIfMatchViaRename(
      loc: String,
      expect: Array[Byte],
      bytes: Array[Byte]
  ): Boolean =
    casViaRename(loc, expect) { tomb =>
      // the slot is empty between the displacing rename and this create;
      // a rival taking it first means we lost — never displace the rival
      val won = createNew(loc, bytes)
      deleteIfExists(tomb) // spent either way (displaced content is stale)
      won
    }

  private[graft] def deleteIfMatchViaRename(
      loc: String,
      expect: Array[Byte]
  ): Boolean =
    casViaRename(loc, expect) { tomb =>
      deleteIfExists(tomb)
      true
    }

  private def casViaRename(loc: String, expect: Array[Byte])(
      complete: String => Boolean
  ): Boolean = {
    val tomb = s"$loc.broken-${System.nanoTime()}"
    try {
      val now =
        try readBytes(loc)
        catch { case _: java.io.IOException => null }
      if (now == null || !java.util.Arrays.equals(now, expect)) return false
      if (!move(loc, tomb)) return false
      val moved = readBytes(tomb)
      if (java.util.Arrays.equals(moved, expect)) complete(tomb)
      else {
        move(tomb, loc): Unit // slot re-taken meanwhile → leave it
        false
      }
    } catch {
      case _: java.io.IOException => false
    }
  }

  def move(src: String, dst: String): Boolean = {
    val (fs, s) = fsOf(src)
    val d = new HPath(dst)
    try {
      // Hadoop rename(src, existingDir) moves src INTO the directory
      // instead of failing like POSIX — the CAS semantics require
      // destination-exists to be a loss, so probe first…
      if (fs.exists(d)) return false
      if (!fs.rename(s, d)) return false
      // …and undo the nest if the destination appeared concurrently
      // between the probe and the rename (none of the protocol layouts
      // contain a child named like the directory itself, so nesting is
      // unambiguous evidence of the race)
      val nested = new HPath(d, s.getName)
      if (fs.exists(nested) && !nested.equals(d)) {
        // if the un-nest rename ALSO fails, delete the leftover: the
        // source was ours to lose (move returns false = CAS loss), and a
        // bounded loss beats a permanent stray nested inside the rival's
        // destination that nothing ever lists or sweeps (round-15 advice)
        if (!fs.rename(nested, s)) fs.delete(nested, true): Unit
        false
      } else true
    } catch { case _: java.io.IOException => false }
  }

  def publishAtomic(loc: String, bytes: Array[Byte]): Unit = {
    val (fs, p) = fsOf(loc)
    val tmp = new HPath(s"$loc.tmp-${System.nanoTime()}")
    try {
      val fc = FileContext.getFileContext(p.toUri, conf())
      val out = fs.create(tmp, true)
      try out.write(bytes)
      finally out.close()
      fc.rename(tmp, p, Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no AbstractFileSystem for the scheme (s3a-class): single-object
        // PUT is atomic there — write direct, clean the unused tmp
        fs.delete(tmp, false): Unit
        writeBytes(loc, bytes)
    }
  }

  def children(root: String): Seq[String] = {
    val (fs, p) = fsOf(root)
    try fs.listStatus(p).toSeq.map(st => Loc.join(root, st.getPath.getName))
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  def deleteTree(loc: String): Unit = {
    val (fs, p) = fsOf(loc)
    try fs.delete(p, true): Unit
    catch { case _: java.io.IOException => () }
  }

  def deleteIfExists(loc: String): Unit = {
    val (fs, p) = fsOf(loc)
    try fs.delete(p, false): Unit
    catch { case _: java.io.IOException => () }
  }

  def mkdirs(loc: String): Unit = {
    val (fs, p) = fsOf(loc)
    fs.mkdirs(p): Unit
  }

  def ageMs(loc: String): Long = {
    val (fs, p) = fsOf(loc)
    try {
      val st = fs.getFileStatus(p)
      // object stores stamp objects, not "directories" (a prefix may
      // report mtime 0): a directory ages as its newest direct child
      val newest =
        if (st.isDirectory) {
          val kids =
            try fs.listStatus(p).map(_.getModificationTime)
            catch { case _: java.io.IOException => Array.empty[Long] }
          (kids :+ st.getModificationTime).max
        } else st.getModificationTime
      math.max(0L, System.currentTimeMillis() - newest)
    } catch { case _: java.io.IOException => -1L }
  }

  def countParquetFiles(loc: String): Long = {
    val (fs, p) = fsOf(loc)
    try {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    } catch { case _: java.io.FileNotFoundException => 0L }
  }

  def hasParquet(loc: String): Boolean = {
    val (fs, p) = fsOf(loc)
    try {
      val it = fs.listFiles(p, true)
      var found = false
      while (!found && it.hasNext)
        found = it.next().getPath.getName.endsWith(".parquet")
      found
    } catch { case _: java.io.FileNotFoundException => false }
  }
}

/** In-memory conditional-PUT binding: every conditional primitive is ONE
  * compare-and-swap on a concurrent map — exactly the semantics an
  * S3-class object store offers with If-None-Match (create) and If-Match
  * (replace/delete) conditional PUTs, with no rename anywhere. Running the
  * lease/commit fencing laws against this binding is what proves the
  * PROTOCOLS need nothing beyond these primitives — a real object-store
  * binding swaps the map computes for conditional HTTP PUTs and changes
  * nothing else. The reference gets the same arbitration from Cassandra
  * LWT (cassandra/src/main/scala/com/evolution/kafka/journal/cassandra/CassandraSync.scala:13-60).
  *
  * [[beforeCas]] is the law-spec hook: it fires at the top of each
  * compare-and-swap primitive ([[putIfMatch]]/[[deleteIfMatch]]), letting
  * a spec FORCE the adversarial schedule
  * (a rival mutation landing exactly between a protocol's read and its
  * CAS — the triple interleaving the rename emulation can lose). The CAS
  * itself remains a single map compute, which is what the at-most-one-
  * winner law then shows to hold by construction.
  */
final class MemBlob extends BlobIo {
  import scala.jdk.CollectionConverters._

  @volatile var beforeCas: String => Unit = _ => ()

  // (content, mtime millis); all mutations go through the map's own
  // atomic compute/putIfAbsent — no external lock
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Byte], Long)]()

  private def now(): Long = System.currentTimeMillis()

  def exists(loc: String): Boolean = {
    val k = loc.stripSuffix("/")
    entries.containsKey(k) || entries.keySet.asScala.exists(_.startsWith(k + "/"))
  }

  def readBytes(loc: String): Array[Byte] =
    Option(entries.get(loc)).map(_._1).getOrElse(
      throw new java.io.IOException(s"$loc absent")
    )

  def writeBytes(loc: String, bytes: Array[Byte]): Unit =
    entries.put(loc, (bytes, now())): Unit

  def createNew(loc: String, bytes: Array[Byte]): Boolean =
    entries.putIfAbsent(loc, (bytes, now())) == null

  def move(src: String, dst: String): Boolean = {
    val s = src.stripSuffix("/"); val d = dst.stripSuffix("/")
    if (exists(d)) return false
    entries.remove(s) match {
      case null =>
        // directory move: relocate every key under the prefix
        val kids = entries.keySet.asScala.filter(_.startsWith(s + "/")).toSeq
        if (kids.isEmpty) false
        else {
          kids.foreach { k =>
            val v = entries.remove(k)
            if (v != null) entries.put(d + k.stripPrefix(s), v): Unit
          }
          true
        }
      case v =>
        if (entries.putIfAbsent(d, v) == null) true
        else { entries.putIfAbsent(s, v); false } // destination taken → restore
    }
  }

  def putIfMatch(loc: String, expect: Array[Byte], bytes: Array[Byte]): Boolean = {
    beforeCas(loc)
    val won = new java.util.concurrent.atomic.AtomicBoolean(false)
    entries.computeIfPresent(
      loc,
      (_, cur) =>
        if (java.util.Arrays.equals(cur._1, expect)) {
          won.set(true)
          (bytes, now())
        } else cur
    )
    won.get()
  }

  def deleteIfMatch(loc: String, expect: Array[Byte]): Boolean = {
    beforeCas(loc)
    val won = new java.util.concurrent.atomic.AtomicBoolean(false)
    entries.computeIfPresent(
      loc,
      (_, cur) =>
        if (java.util.Arrays.equals(cur._1, expect)) { won.set(true); null }
        else cur
    )
    won.get()
  }

  def casByConstruction(loc: String): Boolean = true

  def publishAtomic(loc: String, bytes: Array[Byte]): Unit = writeBytes(loc, bytes)

  def children(root: String): Seq[String] = {
    val pfx = root.stripSuffix("/") + "/"
    entries.keySet.asScala.toSeq
      .collect { case k if k.startsWith(pfx) =>
        pfx + k.stripPrefix(pfx).takeWhile(_ != '/')
      }
      .distinct
  }

  def deleteTree(loc: String): Unit = {
    val k = loc.stripSuffix("/")
    entries.remove(k)
    entries.keySet.removeIf(_.startsWith(k + "/")): Unit
  }

  def deleteIfExists(loc: String): Unit = entries.remove(loc): Unit

  def mkdirs(loc: String): Unit = () // directories are implicit

  def ageMs(loc: String): Long =
    Option(entries.get(loc)).map(v => math.max(0L, now() - v._2)).getOrElse(-1L)

  def countParquetFiles(loc: String): Long = {
    val pfx = loc.stripSuffix("/") + "/"
    entries.keySet.asScala.count(k => k.startsWith(pfx) && k.endsWith(".parquet")).toLong
  }

  def hasParquet(loc: String): Boolean = countParquetFiles(loc) > 0
}
