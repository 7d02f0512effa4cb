package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Shared filesystem helpers for the store/index maintenance paths.
  *
  * [[deleteRecursively]] is CONCURRENCY-TOLERANT by contract: the
  * multi-writer store lets any resolver sweep spent `old-*`/`gen-*`
  * directories, so two sweepers (or a sweeper and the adopting writer)
  * can race on the same tree — a path that vanishes mid-walk means the
  * other party already did the work, not an error. Five call sites used
  * to carry private copies of this helper (one of them walk-based and
  * crash-prone under exactly that race); this is the single shared
  * definition.
  */
object Fs {

  /** Best-effort recursive delete; silently succeeds if the tree (or any
    * entry of it) is concurrently deleted by another process.
    */
  def deleteRecursively(p: Path): Unit = {
    var walk: java.util.stream.Stream[Path] = null
    try {
      walk = Files.walk(p)
      walk.sorted(Comparator.reverseOrder[Path]()).forEach { f =>
        try Files.deleteIfExists(f): Unit
        catch {
          // another sweeper emptied/removed it first, or re-created a
          // child under it mid-race: either way not this sweep's problem
          case _: java.nio.file.NoSuchFileException      => ()
          case _: java.nio.file.DirectoryNotEmptyException => ()
        }
      }
    } catch {
      case _: java.nio.file.NoSuchFileException => ()
      case e: java.io.UncheckedIOException
          if e.getCause.isInstanceOf[java.nio.file.NoSuchFileException] =>
        ()
    } finally if (walk != null) walk.close() // the walker holds OPEN
    // directory streams; leaking them on the tolerated race path would
    // bleed fds in a long-lived streaming loop
  }

  def deleteRecursively(f: java.io.File): Unit =
    deleteRecursively(f.toPath)

  /** String-location form: scheme dispatch via [[Blob]] (URI roots go
    * through Hadoop `FileSystem`, plain paths through `java.nio`).
    */
  def deleteRecursively(loc: String): Unit = Blob.deleteTree(loc)

  /** Parquet data-file count under a store directory — THE listing API
    * every health/debt report rides (retrieval index, LM model, and the
    * unified [[graft.util.StoreHealth]] surface all call this one
    * definition). Locations are strings: a URI-schemed root lists through
    * Hadoop `FileSystem` (the store's own paged LIST on object stores), a
    * plain path through one recursive `java.nio` walk — the reports
    * themselves never touch a filesystem API. A missing directory reports
    * 0 (an optional store member, e.g. a frequency-only index's absent
    * `positions`).
    */
  def countParquetFiles(loc: String): Long = Blob.countParquetFiles(loc)

  def countParquetFiles(p: Path): Long = countParquetFiles(p.toString)

  /** True iff at least one parquet data file exists under `loc`. */
  def hasParquet(loc: String): Boolean = Blob.hasParquet(loc)
}
