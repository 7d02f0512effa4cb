package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{ActionRow, Batch}
import graft.journal.Batch.{Appends, Compacted, Delete, Purge}

/** Table-driven compaction spec, mirroring the shape coverage of the
  * reference's BatchSpec (replicator/src/test/.../BatchSpec.scala).
  */
class BatchSpec extends AnyFunSuite {

  private def app(off: Long, seq: Long) =
    ActionRow("t", 0, off, "k", "append", seq, 0L)
  private def del(off: Long, to: Long) =
    ActionRow("t", 0, off, "k", "delete", 0L, to)
  private def pur(off: Long) = ActionRow("t", 0, off, "k", "purge", 0L, 0L)
  private def mrk(off: Long) = ActionRow("t", 0, off, "k", "mark", 0L, 0L)

  private def check(rows: Seq[ActionRow], want: List[Compacted]): Unit =
    assert(Batch.of(rows) == want, rows.toString)

  test("single and merged appends (offset = youngest)") {
    check(Seq(app(1, 1)), List(Appends(1, List((1, 1)))))
    check(
      Seq(app(1, 1), app(2, 2), app(5, 3)),
      List(Appends(5, List((1, 1), (2, 2), (3, 5))))
    )
  }

  test("marks are dropped everywhere") {
    check(Seq(mrk(1)), Nil)
    check(
      Seq(mrk(1), app(2, 1), mrk(3)),
      List(Appends(2, List((1, 2))))
    )
  }

  test("append then delete: covered appends dropped, order preserved") {
    // delete does not cover seq 2 -> both batches, appends first
    check(
      Seq(app(1, 1), app(2, 2), del(3, 1)),
      List(Appends(2, List((2, 2))), Delete(3, 1))
    )
    // delete covers everything appended -> the LAST append still survives
    // compaction (reference keeps it so the head row carries the seqNr:
    // Batch.scala "all append(s), except last, are dropped"); the covered
    // rows are then excluded at apply time by the seq_nr > delete_to filter
    check(
      Seq(app(1, 1), app(2, 2), del(3, 2)),
      List(Appends(2, List((2, 2))), Delete(3, 2))
    )
  }

  test("deletes: widest wins; covering replace keeps the older offset") {
    check(Seq(del(1, 2), del(2, 5)), List(Delete(2, 5)))
    check(Seq(del(1, 5), del(2, 2)), List(Delete(1, 5)))
    check(Seq(del(1, 3), del(2, 3)), List(Delete(1, 3)))
  }

  test("purge swallows everything older; later actions survive") {
    check(Seq(app(1, 1), app(2, 2), pur(3)), List(Purge(3)))
    check(
      Seq(app(1, 1), pur(2), app(3, 5)),
      List(Purge(2), Appends(3, List((5, 3))))
    )
    check(Seq(pur(1), pur(2)), List(Purge(2)))
    check(
      Seq(del(1, 4), pur(2), del(3, 1)),
      List(Purge(2), Delete(3, 1))
    )
  }

  test("interleaved shape preserves apply order") {
    check(
      Seq(app(1, 1), del(2, 3), app(3, 4), del(4, 2)),
      List(
        Appends(1, List((1, 1))),
        Delete(2, 3),
        Appends(3, List((4, 3))),
        Delete(4, 2)
      )
    )
  }

  test("append after delete starts a fresh appends batch") {
    check(
      Seq(del(1, 7), app(2, 8), app(3, 9)),
      List(Delete(1, 7), Appends(3, List((8, 2), (9, 3))))
    )
  }

  test("compaction agrees with the relational survivors on final state") {
    // surviving seqNrs from the compacted batches == JournalOps.survivors
    // semantics: appends minus purge cut minus deletes
    val shapes = Seq(
      Seq(app(1, 1), app(2, 2), del(3, 1), app(4, 3)),
      Seq(app(1, 1), pur(2), app(3, 5), del(4, 5)),
      Seq(app(1, 2), del(2, 2), app(3, 3), del(4, 3), app(5, 4), mrk(6)),
      Seq(del(1, 2), app(2, 3), pur(3))
    )
    for (s <- shapes) {
      val batches = Batch.of(s)
      // replay the compacted batches in order
      var dt = 0L
      var surv = Vector.empty[Long]
      batches.foreach {
        case Purge(_)      => surv = Vector.empty; dt = 0L
        case Delete(_, to) => dt = math.max(dt, to); surv = surv.filter(_ > dt)
        case Appends(_, rs) => surv = surv ++ rs.map(_._1).filter(_ > dt)
      }
      // model: purge cut then max delete
      val lastPurge = s.lastIndexWhere(_.action == "purge")
      val after = s.drop(lastPurge + 1)
      val mdt = after.collect { case r if r.action == "delete" => r.deleteTo }
        .maxOption.getOrElse(0L)
      val want = after.collect {
        case r if r.action == "append" && r.seqNr > mdt => r.seqNr
      }
      assert(surv.sorted == want.sorted, s.toString)
    }
  }
}
