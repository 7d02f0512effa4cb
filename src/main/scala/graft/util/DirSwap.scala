package graft.util

import java.nio.file.{Files, Path}

/** The build-then-swap maintenance primitive shared by the persisted
  * stores' compaction jobs (span index, inverted index, LM counts, IVF
  * vectors): a compacted replacement is written COMPLETELY under a
  * uniquely-named sibling (`<name>.compact-<nanos>`, carrying Spark's
  * `_SUCCESS` marker), then adopted by two renames (live →
  * `<name>.old-<nanos>`, compact → live). Readers between the renames hit
  * [[repair]], which every consumer calls first: if the live directory is
  * missing it adopts the newest COMPLETE compacted copy (it holds the
  * full merged set by construction, having been written before the swap
  * began) or, absent one, rolls the newest moved-aside original back.
  * nanoTime suffixes are compared NUMERICALLY — a lexicographic sort
  * misorders across digit counts / JVM restarts and could adopt a stale
  * copy.
  *
  * Concurrency contract: ONE maintainer ([[swap]]) and any number of
  * readers ([[repair]]). A reader's repair therefore never deletes
  * sibling copies while the live directory exists — a complete
  * `.compact-` sibling with live present may be an in-flight swap's
  * about-to-publish replacement, and sweeping it would fail the swap
  * between its renames. Stale leftovers (from a crash during the
  * replacement write) are swept by the MAINTAINER at the start of the
  * next [[swap]], where single-maintainership makes the sweep safe; a
  * reader sweeps only what its own adoption made stale. Adoption itself
  * is rename-guarded: two concurrent repairs (or a repair racing the
  * swap's publishing rename) resolve by whoever's move wins — the loser
  * observes the live directory present and proceeds.
  */
object DirSwap {

  private def listPrefixed(root: Path, prefix: String): Seq[Path] = {
    if (!Files.exists(root)) return Seq.empty
    val s = Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(prefix))
        .toSeq
        .sortBy(p =>
          p.getFileName.toString
            .stripPrefix(prefix)
            .toLongOption
            .getOrElse(Long.MinValue)
        )
    } finally s.close()
  }

  /** Writes a replacement for `root/name` via `write(tmpDir)` and swaps it
    * live. `write` must leave a `_SUCCESS` marker (any Spark parquet write
    * does) — [[repair]] uses it to distinguish a complete replacement from
    * a partial one. Single maintainer per store; tolerant of a concurrent
    * READER adopting the replacement mid-swap (that adoption IS the
    * publication).
    */
  def swap(root: Path, name: String)(write: Path => Unit): Unit = {
    // maintainer-side full repair: adopt if a prior swap crashed, then
    // sweep ALL stale siblings — safe here and only here (no other swap
    // can be in flight)
    repair(root, name)
    (listPrefixed(root, s"$name.compact-") ++ listPrefixed(root, s"$name.old-"))
      .foreach(Fs.deleteRecursively)
    val tmp = root.resolve(s"$name.compact-${System.nanoTime()}")
    write(tmp)
    val old = root.resolve(s"$name.old-${System.nanoTime()}")
    Files.move(root.resolve(name), old)
    try Files.move(tmp, root.resolve(name))
    catch {
      // a concurrent reader's repair adopted our complete copy between
      // the renames — the replacement is live; nothing left to publish
      case _: java.nio.file.NoSuchFileException
          if Files.exists(root.resolve(name)) =>
        ()
      case _: java.nio.file.FileAlreadyExistsException
          if Files.exists(root.resolve(name)) =>
        ()
    }
    Fs.deleteRecursively(old)
  }

  /** Crash repair for a [[swap]] interrupted between its two renames; see
    * the object doc. Idempotent and reader-safe: adopts only when the
    * live directory is MISSING, tolerates a concurrent adopter winning
    * the rename, and sweeps only the siblings its own adoption made
    * stale — never an in-flight swap's replacement.
    */
  def repair(root: Path, name: String): Unit = {
    val live = root.resolve(name)
    if (!Files.exists(live)) {
      val complete = listPrefixed(root, s"$name.compact-")
        .filter(p => Files.exists(p.resolve("_SUCCESS")))
      val fallback = listPrefixed(root, s"$name.old-")
      val adopted = (complete.lastOption orElse fallback.lastOption).exists {
        chosen =>
          try { Files.move(chosen, live); true }
          catch {
            // another repair (or the swap itself) published first — the
            // live directory exists, which is all adoption is for
            case _: java.nio.file.NoSuchFileException
                if Files.exists(live) =>
              false
            case _: java.nio.file.FileAlreadyExistsException
                if Files.exists(live) =>
              false
          }
      }
      if (adopted)
        (listPrefixed(root, s"$name.compact-") ++
          listPrefixed(root, s"$name.old-")).foreach(Fs.deleteRecursively)
    }
  }
}
