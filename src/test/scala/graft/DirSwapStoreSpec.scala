package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.FileTime

import org.scalatest.funsuite.AnyFunSuite

import graft.util.{DirStore, DirSwap, HadoopDirStore, Loc, MemDirStore, PosixDirStore}

/** The generation-swap protocol's laws, run IMPLEMENTATION-GENERICALLY
  * against [[PosixDirStore]] (rename-based pointer publish over
  * `java.nio`), [[HadoopDirStore]] driven at a `file://` URI root (every
  * primitive through Hadoop `FileSystem` — the binding an HDFS/S3-class
  * store root exercises; `java.nio` cannot even represent those URIs),
  * and [[MemDirStore]] (the in-memory conditional-PUT/object-store
  * shape) — the same multi-binding treatment the commit protocol and the
  * maintainer lease already have.
  *
  * `ageOut` abstracts how a binding's clock moves past the grace window
  * (filesystems: backdate mtimes, the TestFs convention; Mem: advance its
  * test clock) — the laws themselves are binding-independent.
  */
class DirSwapStoreSpec extends AnyFunSuite {

  private def backdate(local: String): Unit =
    Files.setLastModifiedTime(
      Paths.get(local),
      FileTime.fromMillis(
        System.currentTimeMillis() - DirSwap.graceMs - 60000L
      )
    ): Unit

  private def withPosix(f: (DirStore, String, String => Unit) => Unit): Unit = {
    val root = Files.createTempDirectory("graft-dirswap-posix").toString
    f(PosixDirStore, root, backdate)
  }

  private def withHadoop(f: (DirStore, String, String => Unit) => Unit): Unit = {
    val local = Files.createTempDirectory("graft-dirswap-hadoop")
    // URI-schemed root: every store primitive runs through the Hadoop
    // FileSystem binding; aging strips the scheme to backdate the
    // underlying local files (the spec's stand-in for time passing)
    f(
      HadoopDirStore,
      s"file://$local",
      loc => backdate(loc.stripPrefix("file://"))
    )
  }

  private def withMem(f: (DirStore, String, String => Unit) => Unit): Unit = {
    val store = new MemDirStore
    val root = "/mem/graft-dirswap"
    // the Mem clock ages the WHOLE store; the keep-set (current +
    // previous) is what protects live generations — exactly the
    // protocol's own guarantee, so the laws read the same
    f(store, root, _ => store.advanceClock(DirSwap.graceMs + 60000L))
  }

  private def bindings = Seq(
    ("posix", withPosix _),
    ("hadoop-file-uri", withHadoop _),
    ("mem-object-store", withMem _)
  )

  for ((tag, bind) <- bindings) {

    test(s"[$tag] plain directory resolves before any swap; first swap publishes atomically and retains it") {
      bind { (store, root, _) =>
        val ds = DirSwap.over(store)
        store.mkdirs(Loc.join(root, "m"))
        assert(ds.resolve(root, "m") == Loc.join(root, "m"))
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g1 = ds.resolve(root, "m")
        assert(Loc.name(g1).startsWith("m.gen-"))
        assert(store.exists(g1))
        // generation zero survives the first swap (it is the previous)
        assert(store.exists(Loc.join(root, "m")))
      }
    }

    test(s"[$tag] sweep keeps {current, previous} and age-gates the rest; crashed-swap leftovers are collected") {
      bind { (store, root, ageOut) =>
        val ds = DirSwap.over(store)
        store.mkdirs(Loc.join(root, "m"))
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g1 = ds.resolve(root, "m")
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g2 = ds.resolve(root, "m")
        // within the grace window nothing superseded is deleted
        assert(store.exists(g1) && store.exists(Loc.join(root, "m")))
        // crashed-swap debris: an orphan generation nobody points to and
        // a stale pointer tmp
        val orphan = Loc.join(root, "m.gen-0000orphan")
        store.mkdirs(orphan)
        store.publishPointer(
          Loc.join(root, "m.current.tmp-5"),
          "junk".getBytes("UTF-8")
        )
        ageOut(g1)
        ageOut(Loc.join(root, "m"))
        ageOut(orphan)
        ds.swap(root, "m")(g => store.mkdirs(g))
        val g3 = ds.resolve(root, "m")
        assert(store.exists(g3) && store.exists(g2), "current+previous kept")
        assert(!store.exists(g1), "aged-out superseded generation swept")
        assert(!store.exists(Loc.join(root, "m")), "aged-out generation zero swept")
        assert(!store.exists(orphan), "orphan generation swept")
        assert(
          !store.exists(Loc.join(root, "m.current.tmp-5")),
          "stale pointer tmp swept"
        )
      }
    }

    test(s"[$tag] a fresh superseded generation survives back-to-back swaps (wall-clock grace)") {
      bind { (store, root, _) =>
        val ds = DirSwap.over(store)
        store.mkdirs(Loc.join(root, "m"))
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
        store.mkdirs(Loc.join(root, "m"))
        ds.swap(root, "m")(g => store.mkdirs(g))
        ds.drop(root, "m")
        assert(!store.exists(Loc.join(root, "m.current")))
        assert(ds.resolve(root, "m") == Loc.join(root, "m")) // back to gen zero
        assert(store.children(root).forall(!Loc.name(_).startsWith("m.")))
        // a pointer naming a missing generation is damage, not repair work
        store.publishPointer(
          Loc.join(root, "m.current"),
          "m.gen-nonexistent".getBytes("UTF-8")
        )
        intercept[IllegalArgumentException](ds.repair(root, "m"))
      }
    }
  }

  test("scheme dispatch: the DirSwap companion serves a file:// URI root end-to-end") {
    // not an explicit binding: the companion itself must route a
    // URI-schemed root through the Hadoop store (Paths.get would corrupt
    // the scheme) — the production entry every store's resolve uses
    val root = s"file://${Files.createTempDirectory("graft-dirswap-dispatch")}"
    graft.util.Blob.mkdirs(Loc.join(root, "m"))
    DirSwap.swap(root, "m") { g =>
      graft.util.Blob.writeBytes(Loc.join(g, "data.txt"), "v1".getBytes("UTF-8"))
    }
    val live = DirSwap.resolve(root, "m")
    assert(live.startsWith("file://"), s"resolved location $live lost its scheme")
    assert(Loc.name(live).startsWith("m.gen-"))
    assert(new String(graft.util.Blob.readBytes(Loc.join(live, "data.txt")), "UTF-8") == "v1")
    DirSwap.repair(root, "m") // pointer names a live generation
  }
}
