package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.util.DirSwap

/** Laws of the generation-swap maintenance primitive itself — in
  * particular the round-10 advice item: back-to-back swaps must NOT
  * shrink the slow-reader grace to an arbitrarily small wall-clock
  * window. Retention = {current, previous} ∪ {younger than graceMs}.
  */
class DirSwapSpec extends AnyFunSuite {

  private def freshStore(): java.nio.file.Path = {
    val root = Files.createTempDirectory("graft-dirswap")
    Files.createDirectories(root.resolve("s"))
    Files.write(root.resolve("s").resolve("a.txt"), "0".getBytes("UTF-8"))
    root
  }

  private def swapN(root: java.nio.file.Path, n: Int): Unit =
    DirSwap.swap(root.toString, "s") { g =>
      val gp = java.nio.file.Paths.get(g)
      Files.createDirectories(gp)
      Files.write(gp.resolve("a.txt"), n.toString.getBytes("UTF-8")): Unit
    }

  private def gens(root: java.nio.file.Path): Seq[String] =
    Option(root.toFile.listFiles())
      .getOrElse(Array.empty)
      .map(_.getName)
      .filter(_.startsWith("s.gen-"))
      .toSeq

  private def liveContent(root: java.nio.file.Path): String =
    new String(
      Files.readAllBytes(
        java.nio.file.Paths.get(DirSwap.resolve(root.toString, "s"))
          .resolve("a.txt")),
      "UTF-8"
    )

  test(
    "back-to-back swaps retain every young superseded generation " +
      "(wall-clock slow-reader grace), and sweep them once aged"
  ) {
    val root = freshStore()
    // three consecutive swaps, the compactInvertedIndex-per-call shape:
    // with {current, previous}-only retention, swap 3 would delete swap
    // 1's generation milliseconds after it was superseded
    swapN(root, 1); swapN(root, 2); swapN(root, 3)
    assert(gens(root).size == 3, "all young superseded generations retained")
    assert(
      Files.exists(root.resolve("s")),
      "young generation-zero (plain dir) retained"
    )
    assert(liveContent(root) == "3")

    // a reader that listed ANY generation written within the grace window
    // still finds its files — the retained dirs are never renamed/mutated
    val stale = gens(root).sorted.head
    assert(Files.exists(root.resolve(stale).resolve("a.txt")))

    // once aged out, the next swap sweeps down to {current, previous}
    TestFs.ageOutGenerations(root.toString, "s")
    swapN(root, 4)
    assert(gens(root).size == 2, "aged generations swept to current+previous")
    assert(!Files.exists(root.resolve("s")), "aged plain dir swept")
    assert(liveContent(root) == "4")
  }

  test("crash leftovers: aged orphan generations and pointer tmps swept, young orphans retained") {
    val root = freshStore()
    swapN(root, 1)
    // young orphan (a crash mid-write that JUST happened): retained — the
    // writer might still be alive, or a reader might hold a stale pointer
    Files.createDirectories(root.resolve("s.gen-young-orphan"))
    // aged orphan + stale pointer tmp (a long-dead crash): swept
    Files.createDirectories(root.resolve("s.gen-000aged"))
    Files.setLastModifiedTime(
      root.resolve("s.gen-000aged"),
      java.nio.file.attribute.FileTime.fromMillis(0L)
    )
    Files.write(
      root.resolve("s.current.tmp-999"),
      "s.gen-000aged".getBytes("UTF-8")
    )
    swapN(root, 2)
    assert(Files.exists(root.resolve("s.gen-young-orphan")))
    assert(!Files.exists(root.resolve("s.gen-000aged")))
    assert(!Files.exists(root.resolve("s.current.tmp-999")))
    assert(liveContent(root) == "2")
  }

  test("drop retracts a member entirely: plain dir, generations, pointer, tmps") {
    val root = freshStore()
    swapN(root, 1)
    swapN(root, 2) // pointer + ≥2 generations + the plain dir
    Files.write(
      root.resolve("s.current.tmp-777"),
      "orphan".getBytes("UTF-8")
    )
    DirSwap.drop(root.toString, "s")
    val leftovers = Option(root.toFile.listFiles())
      .getOrElse(Array.empty)
      .map(_.getName)
      .filter(_.startsWith("s"))
      .toSeq
    assert(leftovers.isEmpty, s"leftovers after drop: $leftovers")
    // a fresh build after the drop starts from generation zero
    Files.createDirectories(root.resolve("s"))
    Files.write(root.resolve("s").resolve("a.txt"), "9".getBytes("UTF-8"))
    assert(liveContent(root) == "9")
  }
}
