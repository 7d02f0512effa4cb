package graft

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

import graft.util.{DirStore, DirSwap, MemDirStore, PosixDirStore}

/** The generation-swap protocol's laws, run IMPLEMENTATION-GENERICALLY
  * against both [[PosixDirStore]] (rename-based pointer publish — the
  * binding every store uses here) and [[MemDirStore]] (the in-memory
  * conditional-PUT/object-store shape) — the same dual-binding treatment
  * the commit protocol and the maintainer lease already have, closing
  * the last control-plane seam whose S3-class story was a doc pointer
  * rather than code.
  *
  * `ageOut` abstracts how a binding's clock moves past the grace window
  * (POSIX: backdate mtimes, the TestFs convention; Mem: advance its test
  * clock) — the laws themselves are binding-independent.
  */
class DirSwapStoreSpec extends AnyFunSuite {

  private def withPosix(f: (DirStore, Path, Path => Unit) => Unit): Unit = {
    val root = Files.createTempDirectory("graft-dirswap-posix")
    val backdate: Path => Unit = p =>
      Files.setLastModifiedTime(
        p,
        FileTime.fromMillis(
          System.currentTimeMillis() - DirSwap.graceMs - 60000L
        )
      ): Unit
    f(PosixDirStore, root, backdate)
  }

  private def withMem(f: (DirStore, Path, Path => Unit) => Unit): Unit = {
    val store = new MemDirStore
    val root = java.nio.file.Paths.get("/mem/graft-dirswap")
    // the Mem clock ages the WHOLE store; the keep-set (current +
    // previous) is what protects live generations — exactly the
    // protocol's own guarantee, so the laws read the same
    f(store, root, _ => store.advanceClock(DirSwap.graceMs + 60000L))
  }

  private def bindings = Seq(
    ("posix", withPosix _),
    ("mem-object-store", withMem _)
  )

  for ((tag, bind) <- bindings) {

    test(s"[$tag] plain directory resolves before any swap; first swap publishes atomically and retains it") {
      bind { (store, root, _) =>
        val ds = DirSwap.over(store)
        store.mkdirs(root.resolve("m"))
        assert(ds.resolve(root, "m") == root.resolve("m"))
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g1 = ds.resolve(root, "m")
        assert(g1.getFileName.toString.startsWith("m.gen-"))
        assert(store.exists(g1))
        // generation zero survives the first swap (it is the previous)
        assert(store.exists(root.resolve("m")))
      }
    }

    test(s"[$tag] sweep keeps {current, previous} and age-gates the rest; crashed-swap leftovers are collected") {
      bind { (store, root, ageOut) =>
        val ds = DirSwap.over(store)
        store.mkdirs(root.resolve("m"))
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g1 = ds.resolve(root, "m")
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g2 = ds.resolve(root, "m")
        // within the grace window nothing superseded is deleted
        assert(store.exists(g1) && store.exists(root.resolve("m")))
        // crashed-swap debris: an orphan generation nobody points to and
        // a stale pointer tmp
        val orphan = root.resolve("m.gen-0000orphan")
        store.mkdirs(orphan)
        store.publishPointer(
          root.resolve("m.current.tmp-5"),
          "junk".getBytes("UTF-8")
        )
        ageOut(g1)
        ageOut(root.resolve("m"))
        ageOut(orphan)
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g3 = ds.resolve(root, "m")
        assert(store.exists(g3) && store.exists(g2), "current+previous kept")
        assert(!store.exists(g1), "aged-out superseded generation swept")
        assert(!store.exists(root.resolve("m")), "aged-out generation zero swept")
        assert(!store.exists(orphan), "orphan generation swept")
        assert(
          !store.exists(root.resolve("m.current.tmp-5")),
          "stale pointer tmp swept"
        )
      }
    }

    test(s"[$tag] a fresh superseded generation survives back-to-back swaps (wall-clock grace)") {
      bind { (store, root, _) =>
        val ds = DirSwap.over(store)
        store.mkdirs(root.resolve("m"))
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g1 = ds.resolve(root, "m")
        // three rapid swaps: g1 leaves the {current, previous} pair but
        // is YOUNG — the age gate must retain it for in-flight readers
        ds.swap(root, "m")(g => store.mkdirs(g))
        ds.swap(root, "m")(g => store.mkdirs(g))
        ds.swap(root, "m")(g => store.mkdirs(g))
        assert(store.exists(g1), "young generation swept despite grace")
      }
    }

    test(s"[$tag] drop retracts the member entirely; repair fails fast on a damaged pointer") {
      bind { (store, root, _) =>
        val ds = DirSwap.over(store)
        store.mkdirs(root.resolve("m"))
        ds.swap(root, "m")(g => store.mkdirs(g))
        ds.drop(root, "m")
        assert(!store.exists(root.resolve("m.current")))
        assert(ds.resolve(root, "m") == root.resolve("m")) // back to gen zero
        assert(store.children(root).isEmpty || store
          .children(root)
          .forall(!_.getFileName.toString.startsWith("m.")))
        // a pointer naming a missing generation is damage, not repair work
        store.publishPointer(
          root.resolve("m.current"),
          "m.gen-nonexistent".getBytes("UTF-8")
        )
        intercept[IllegalArgumentException](ds.repair(root, "m"))
      }
    }
  }
}
