package graft

/** Shared filesystem helpers for the store-maintenance specs. */
object TestFs {

  /** Ages every `<name>.gen-*` directory (and the plain `<name>` dir) of a
    * generation-swapped store to epoch 0, so the next
    * [[graft.util.DirSwap.swap]]'s wall-clock grace window does not retain
    * them. Sweep tests use this instead of disabling the grace — the
    * default code path (retain {current, previous} ∪ young, sweep the
    * aged rest) is what runs in production and what the asserts pin.
    */
  def ageOutGenerations(root: String, name: String): Unit =
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty)
      .filter(f =>
        f.getName.startsWith(s"$name.gen-") || f.getName == name
      )
      .foreach(aged =>
        java.nio.file.Files.setLastModifiedTime(
          aged.toPath,
          java.nio.file.attribute.FileTime.fromMillis(0L)
        )
      )
}
