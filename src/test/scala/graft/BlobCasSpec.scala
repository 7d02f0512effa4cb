package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.util.{Blob, BlobIo, HadoopBlob, MemBlob, NioBlob}

/** Laws of the [[BlobIo]] conditional layer — `putIfMatch` /
  * `deleteIfMatch` / `createNew` — run against every binding:
  *
  *   - `nio` (plain path): the file-locked construction-grade CAS.
  *   - `hadoop-file-uri`: the Hadoop backend at a `file://` root, whose
  *     conditional primitives DELEGATE to the nio CAS (round-15 advice —
  *     `RawLocalFileSystem.create(overwrite=false)` is check-then-create,
  *     not atomic).
  *   - `hadoop-emulated`: the displace-verify-restore rename EMULATION
  *     (the HDFS shape) exercised explicitly at a `file://` root via the
  *     package-private entry points.
  *   - `mem`: [[MemBlob]] — the conditional-PUT object-store shape; one
  *     map compute per primitive.
  *
  * A binding passing these is deployable under the lease/commit fences
  * unchanged; `casByConstruction` documents which grade it gets.
  */
class BlobCasSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  /** (name, io, fresh-entry-location factory) */
  private def bindings(): Seq[(String, BlobIo, () => String)] = {
    val nioRoot = Files.createTempDirectory("graft-blobcas").toString
    val hRoot = s"file://${Files.createTempDirectory("graft-blobcas-h")}"
    val eRoot = s"file://${Files.createTempDirectory("graft-blobcas-e")}"
    val mem = new MemBlob
    var n = 0
    def fresh(root: String): () => String = () => { n += 1; s"$root/e$n" }
    // the emulation façade: same BlobIo surface, conditional ops routed
    // through the rename dance so the law run covers the HDFS shape
    val emulated: BlobIo = new BlobIo {
      def exists(loc: String) = HadoopBlob.exists(loc)
      def readBytes(loc: String) = HadoopBlob.readBytes(loc)
      def writeBytes(loc: String, bytes: Array[Byte]) = HadoopBlob.writeBytes(loc, bytes)
      def createNew(loc: String, bytes: Array[Byte]) = HadoopBlob.createNew(loc, bytes)
      def move(src: String, dst: String) = HadoopBlob.move(src, dst)
      def publishAtomic(loc: String, bytes: Array[Byte]) = HadoopBlob.publishAtomic(loc, bytes)
      def children(root: String) = HadoopBlob.children(root)
      def deleteTree(loc: String) = HadoopBlob.deleteTree(loc)
      def deleteIfExists(loc: String) = HadoopBlob.deleteIfExists(loc)
      def mkdirs(loc: String) = HadoopBlob.mkdirs(loc)
      def ageMs(loc: String) = HadoopBlob.ageMs(loc)
      def countParquetFiles(loc: String) = HadoopBlob.countParquetFiles(loc)
      def hasParquet(loc: String) = HadoopBlob.hasParquet(loc)
      def casByConstruction(loc: String) = false
      def putIfMatch(loc: String, expect: Array[Byte], bytes: Array[Byte]) =
        HadoopBlob.putIfMatchViaRename(loc, expect, bytes)
      def deleteIfMatch(loc: String, expect: Array[Byte]) =
        HadoopBlob.deleteIfMatchViaRename(loc, expect)
    }
    Seq(
      ("nio", NioBlob, fresh(nioRoot)),
      ("hadoop-file-uri", HadoopBlob, fresh(hRoot)),
      ("hadoop-emulated", emulated, fresh(eRoot)),
      ("mem", mem, fresh("mem-root"))
    )
  }

  test("putIfMatch on an absent entry is false and creates nothing") {
    bindings().foreach { case (name, io, fresh) =>
      val loc = fresh()
      assert(!io.putIfMatch(loc, b("x"), b("y")), name)
      assert(!io.exists(loc), s"$name: a failed CAS must not create the entry")
    }
  }

  test("putIfMatch succeeds iff the content matches exactly; content swings atomically") {
    bindings().foreach { case (name, io, fresh) =>
      val loc = fresh()
      assert(io.createNew(loc, b("v1")), name)
      assert(!io.putIfMatch(loc, b("other"), b("v2")), s"$name: mismatch must lose")
      assert(new String(io.readBytes(loc), "UTF-8") == "v1",
        s"$name: a losing CAS must leave the content untouched")
      assert(io.putIfMatch(loc, b("v1"), b("v2")), s"$name: match must win")
      assert(new String(io.readBytes(loc), "UTF-8") == "v2", name)
      // the spent expectation can never win again (ABA-free by content)
      assert(!io.putIfMatch(loc, b("v1"), b("v3")), name)
    }
  }

  test("deleteIfMatch is conditional: mismatch leaves the entry, match removes it") {
    bindings().foreach { case (name, io, fresh) =>
      val loc = fresh()
      assert(io.createNew(loc, b("keep")), name)
      assert(!io.deleteIfMatch(loc, b("other")), name)
      assert(io.exists(loc), s"$name: a losing conditional delete must not remove")
      assert(io.deleteIfMatch(loc, b("keep")), name)
      assert(!io.exists(loc), name)
      assert(!io.deleteIfMatch(loc, b("keep")), s"$name: absent → false")
    }
  }

  test("createNew is exclusive: of N concurrent creators exactly one wins") {
    bindings().foreach { case (name, io, fresh) =>
      val loc = fresh()
      val gate = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val threads = (1 to 8).map { i =>
        new Thread(() => {
          gate.await()
          if (io.createNew(loc, b(s"creator-$i"))) wins.incrementAndGet(): Unit
        })
      }
      threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
      assert(wins.get() == 1, s"$name: exactly one exclusive create must win")
    }
  }

  test("N racing putIfMatch on one expectation: exactly one wins and its bytes land") {
    bindings().foreach { case (name, io, fresh) =>
      val loc = fresh()
      assert(io.createNew(loc, b("base")), name)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val winners = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (1 to 8).map { i =>
        new Thread(() => {
          gate.await()
          if (io.putIfMatch(loc, b("base"), b(s"racer-$i")))
            winners.add(s"racer-$i"): Unit
        })
      }
      threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
      val ws = winners.toArray(Array.empty[String])
      assert(ws.length == 1, s"$name: exactly one CAS must win, got ${ws.toSeq}")
      assert(new String(io.readBytes(loc), "UTF-8") == ws.head,
        s"$name: the winner's bytes must be the final content")
    }
  }

  test("racing putIfMatch vs deleteIfMatch on one expectation: exactly one wins; the store stays consistent") {
    bindings().foreach { case (name, io, fresh) =>
      val loc = fresh()
      assert(io.createNew(loc, b("base")), name)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val wins = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val put = new Thread(() => {
        gate.await()
        if (io.putIfMatch(loc, b("base"), b("replaced"))) wins.add("put"): Unit
      })
      val del = new Thread(() => {
        gate.await()
        if (io.deleteIfMatch(loc, b("base"))) wins.add("del"): Unit
      })
      Seq(put, del).foreach(_.start()); gate.countDown(); Seq(put, del).foreach(_.join())
      val ws = wins.toArray(Array.empty[String])
      assert(ws.length == 1, s"$name: exactly one conditional op must win, got ${ws.toSeq}")
      ws.head match {
        case "put" =>
          assert(new String(io.readBytes(loc), "UTF-8") == "replaced", name)
        case "del" =>
          assert(!io.exists(loc), name)
      }
    }
  }

  test("casByConstruction grades the bindings honestly; scheme dispatch routes file:// conditionals through the nio CAS") {
    assert(NioBlob.casByConstruction("/tmp/x"))
    assert(HadoopBlob.casByConstruction("file:///tmp/x"),
      "file:// delegates to the construction-grade nio CAS")
    assert(!HadoopBlob.casByConstruction("hdfs://nn/x"),
      "remote schemes get the rename emulation and must say so")
    assert((new MemBlob).casByConstruction("k"))
    // the public Blob façade dispatches by scheme
    assert(Blob.casByConstruction(Files.createTempDirectory("graft-cas-d").toString))
    // file:// createNew is CREATE_NEW-atomic via the delegation: the
    // created entry is readable through BOTH backends' views of the path
    val d = Files.createTempDirectory("graft-cas-f")
    val uri = s"file://$d/probe"
    assert(HadoopBlob.createNew(uri, b("one")))
    assert(!HadoopBlob.createNew(uri, b("two")))
    assert(new String(NioBlob.readBytes(s"$d/probe"), "UTF-8") == "one")
  }
}
