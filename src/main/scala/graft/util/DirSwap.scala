package graft.util

/** Generation-swapped directories — the maintenance primitive behind the
  * persisted model stores' compaction (inverted index, LM counts, IVF
  * vectors): the journal store's epoch-generation discipline applied to a
  * single directory.
  *
  * A compacted replacement is written COMPLETELY under a uniquely-named
  * generation (`<name>.gen-<nanos>`), then PUBLISHED by atomically
  * replacing a small pointer file (`<name>.current`, containing the
  * generation's directory name) — POSIX rename-over-existing is atomic,
  * object-store PUT is atomic per object, so readers resolve either the
  * old or the new generation, never a torn state. Data directories are
  * NEVER renamed or mutated after publication, which is what makes
  * concurrent readers safe: a Spark job that listed the previous
  * generation's files keeps reading them — [[DirSwapOver.swap]] retains
  * the current AND the immediately-previous generation and sweeps only
  * older ones, so an in-flight read outlives the swap that superseded it
  * (one full maintenance cycle of grace; the rename-based alternative
  * invalidates listed paths mid-read, the FAILED_READ_FILE race). A store
  * starts as the plain `root/name` directory (generation zero — what the
  * builders write); the pointer appears at the first swap.
  *
  * Crash model: a crash while writing a generation leaves an orphan
  * directory no pointer references — reads are unaffected and the next
  * swap sweeps it; a crash around the pointer publish leaves the
  * pointer wholly old or wholly new (the publish is atomic) plus at most
  * a stale pointer-tmp file, likewise swept. There is no window with no
  * live data and nothing for readers to repair — [[resolve]] is the
  * whole consumer contract. Single maintainer per store — ENFORCED by
  * [[MaintainerLease]] since round 12; readers unlimited.
  *
  * Storage binding: locations are STRINGS (plain paths or URIs — see
  * [[Loc]]) and the protocol's control plane runs over the [[DirStore]]
  * primitives. The companion dispatches by scheme: URI-schemed roots
  * (`hdfs://`, `s3a://`, `file://`) go through [[HadoopDirStore]] — the
  * same filesystem abstraction the generation's parquet data is written
  * through, so a maintained store lives wholly where a 100 TB
  * deployment's data lives — and plain paths through [[PosixDirStore]].
  * [[DirSwap.over]] builds the protocol on any explicit binding
  * ([[MemDirStore]] is the in-memory conditional-PUT form the law spec
  * drives).
  */
final class DirSwapOver(store: DirStore) {

  private def pointer(root: String, name: String): String =
    Loc.join(root, s"$name.current")

  /** The directory consumers should read/append for `root/name`: the
    * pointed-to generation, or the plain directory before any swap.
    */
  def resolve(root: String, name: String): String = {
    val p = pointer(root, name)
    if (store.exists(p))
      Loc.join(root, new String(store.readBytes(p), "UTF-8").trim)
    else Loc.join(root, name)
  }

  private def listPrefixed(root: String, prefix: String): Seq[String] =
    store
      .children(root)
      .filter(Loc.name(_).startsWith(prefix))

  /** Writes a replacement for `root/name` (read side: [[resolve]]) into a
    * fresh generation via `write(genDir)` and publishes it by the atomic
    * pointer swap. Retains the superseded generation for in-flight
    * readers; sweeps everything older, plus orphan generations and
    * pointer tmps from crashed swaps. Single maintainer.
    */
  def swap(root: String, name: String)(write: String => Unit): Unit = {
    val prev = resolve(root, name)
    val gen = Loc.join(root, s"$name.gen-${System.nanoTime()}")
    write(gen)
    store.publishPointer(
      pointer(root, name),
      Loc.name(gen).getBytes("UTF-8")
    )
    // GC: keep {new current, immediately-previous} PLUS anything younger
    // than the wall-clock grace window (slow in-flight readers outlive
    // even back-to-back swaps); sweep older generations, the plain dir
    // once it is two generations stale AND aged out, and crashed-swap
    // leftovers (orphan gens, pointer tmps)
    val keep = Set(Loc.name(gen), Loc.name(prev))
    val grace = DirSwap.graceMs
    (listPrefixed(root, s"$name.gen-") :+ Loc.join(root, name))
      .filter(store.exists)
      .filterNot(p => keep.contains(Loc.name(p)))
      .filter(store.ageMs(_) >= grace) // an unreadable/vanished stamp
      //   reads NEGATIVE and is retained — deleting on unknown age could
      //   cut a live reader's grace short; keeping one more cycle is free
      .foreach(store.deleteTree)
    listPrefixed(root, s"$name.current.tmp-").foreach(store.deleteTree)
  }

  /** Removes `root/name` ENTIRELY — pointer, every generation, pointer
    * tmps, and the plain generation-zero directory. A maintainer-only
    * operation for rebuilds that change a store's shape (e.g. rebuilding
    * an inverted index without positions must not leave the old
    * positional payload for appends to extend): where [[swap]] replaces
    * content, `drop` retracts the member's existence. No grace window —
    * a rebuild is an offline operation by contract, and since round 12
    * the rebuild writers take the store's maintainer claim.
    */
  def drop(root: String, name: String): Unit = {
    (listPrefixed(root, s"$name.gen-") ++
      listPrefixed(root, s"$name.current") :+ Loc.join(root, name))
      .filter(store.exists)
      .foreach(store.deleteTree)
  }

  /** Consumer-side maintenance hook, kept for the store APIs' contract:
    * with generation indirection there is nothing to adopt or roll back —
    * the pointer is atomic and data directories are immutable once
    * published — so this only validates the pointer (a damaged pointer
    * naming a missing directory fails fast here rather than deep inside a
    * scan). Deliberately non-destructive: readers must never delete — a
    * generation that looks stale to one thread may be mid-read in
    * another; all sweeping belongs to the single maintainer's [[swap]].
    */
  def repair(root: String, name: String): Unit = {
    val p = pointer(root, name)
    if (store.exists(p)) {
      val target = resolve(root, name)
      require(
        store.exists(target),
        s"store pointer $p names a missing generation $target — the store " +
          "was damaged outside the swap protocol"
      )
    }
  }
}

object DirSwap {

  /** Minimum age (directory mtime) a superseded generation must reach
    * before [[DirSwapOver.swap]] sweeps it. The {current, previous} pair
    * alone gives "one maintenance cycle of grace" — but back-to-back
    * swaps (the inverted-index compactor runs three per call; a streaming
    * loop can compact on successive micro-batches) can make that one
    * cycle an arbitrarily short wall-clock window, deleting a generation
    * a slow in-flight reader is still scanning. Age-based retention
    * bounds the grace in WALL-CLOCK terms instead: anything younger than
    * this survives the sweep regardless of how many swaps superseded it,
    * so a reader is safe for at least `graceMs` from the moment its
    * generation was written. Tunable per deployment (longest expected
    * scan) via `-Dgraft.dirswap.grace.ms=`; tests exercise the sweep by
    * aging generation mtimes out of the window instead of shrinking it
    * (TestFs.ageOutGenerations backdates the directory mtimes; the Mem
    * binding advances its own clock).
    *
    * Disk-retention multiplier: every swap inside the grace window
    * retains its full superseded generation, so a hot compaction loop
    * (e.g. a streaming ingest with `compactEvery = 1`) holds up to
    * (swaps per grace window) complete store copies on disk at once.
    * Size the window to the longest expected scan, not longer — or slow
    * the compaction cadence; the debt thresholds in
    * [[graft.util.StoreHealth]] exist precisely so compaction does not
    * run per-batch.
    */
  def graceMs: Long =
    sys.props.get("graft.dirswap.grace.ms").flatMap(_.toLongOption)
      .getOrElse(10L * 60 * 1000)

  /** The swap protocol over an explicit storage binding. */
  def over(store: DirStore): DirSwapOver = new DirSwapOver(store)

  private val posix = new DirSwapOver(PosixDirStore)
  private val hadoop = new DirSwapOver(HadoopDirStore)

  /** Scheme dispatch: URI roots run over Hadoop `FileSystem`, plain
    * paths over `java.nio` — one protocol, the binding the root implies.
    */
  private def forRoot(root: String): DirSwapOver =
    if (Loc.hasScheme(root)) hadoop else posix

  def resolve(root: String, name: String): String =
    forRoot(root).resolve(root, name)

  def swap(root: String, name: String)(write: String => Unit): Unit =
    forRoot(root).swap(root, name)(write)

  def drop(root: String, name: String): Unit = forRoot(root).drop(root, name)

  def repair(root: String, name: String): Unit =
    forRoot(root).repair(root, name)
}
