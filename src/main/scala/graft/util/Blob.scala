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
      case _: java.nio.file.NoSuchFileException        => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.nio.file.FileSystemException        => false
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
  *   - [[createNew]]: `create(overwrite = false)` — atomic on HDFS (the
  *     namenode arbitrates); object stores without conditional PUT weaken
  *     this, which is exactly why the lease/commit protocols also ship
  *     conditional-PUT-shaped bindings (MemLeaseStore / MemCommitProtocol
  *     document that shape).
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

  def createNew(loc: String, bytes: Array[Byte]): Boolean = {
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
        fs.rename(nested, s): Unit
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
