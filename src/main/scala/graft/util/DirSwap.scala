package graft.util

import java.nio.file.{Files, Path}

/** The build-then-swap maintenance primitive shared by the persisted
  * stores' compaction jobs (span index, inverted index, LM counts): a
  * compacted replacement is written COMPLETELY under a uniquely-named
  * sibling (`<name>.compact-<nanos>`, carrying Spark's `_SUCCESS` marker),
  * then adopted by two renames (live → `<name>.old-<nanos>`, compact →
  * live). Readers between the renames hit [[repair]], which every consumer
  * calls first: if the live directory is missing it adopts the newest
  * COMPLETE compacted copy (it holds the full merged set by construction,
  * having been written before the swap began) or, absent one, rolls the
  * newest moved-aside original back; stale leftovers are then swept.
  * nanoTime suffixes are compared NUMERICALLY — a lexicographic sort
  * misorders across digit counts / JVM restarts and could adopt a stale
  * copy. Single-maintainer posture, like the appends themselves (the
  * multi-writer journal store runs its maintenance through the commit
  * protocol instead).
  */
object DirSwap {

  /** Writes a replacement for `root/name` via `write(tmpDir)` and swaps it
    * live. `write` must leave a `_SUCCESS` marker (any Spark parquet write
    * does) — [[repair]] uses it to distinguish a complete replacement from
    * a partial one.
    */
  def swap(root: Path, name: String)(write: Path => Unit): Unit = {
    repair(root, name)
    val tmp = root.resolve(s"$name.compact-${System.nanoTime()}")
    write(tmp)
    val old = root.resolve(s"$name.old-${System.nanoTime()}")
    Files.move(root.resolve(name), old)
    Files.move(tmp, root.resolve(name))
    Fs.deleteRecursively(old)
  }

  /** Crash repair for a [[swap]] interrupted between its two renames; see
    * the object doc. Idempotent; called by every consumer of a swapped
    * directory so a crashed maintenance job can never brick readers.
    */
  def repair(root: Path, name: String): Unit = {
    def listPrefixed(prefix: String): Seq[Path] = {
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
    val live = root.resolve(name)
    if (!Files.exists(live)) {
      val complete = listPrefixed(s"$name.compact-")
        .filter(p => Files.exists(p.resolve("_SUCCESS")))
      val fallback = listPrefixed(s"$name.old-")
      (complete.lastOption orElse fallback.lastOption).foreach { chosen =>
        Files.move(chosen, live)
      }
    }
    (listPrefixed(s"$name.compact-") ++ listPrefixed(s"$name.old-"))
      .foreach(Fs.deleteRecursively)
  }
}
