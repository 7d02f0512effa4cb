package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{ActionRow, HeadInfo}
import graft.journal.HeadInfo._

/** Model tests for the HeadInfo fold, mirroring the reference's
  * HeadInfoSpec semantics (journal/src/test/.../HeadInfoSpec.scala) plus the
  * Semigroup/fold consistency law (HeadInfo.scala:127-150).
  */
class HeadInfoSpec extends AnyFunSuite {

  private def append(off: Long, seq: Long) =
    ActionRow("t", 0, off, "k", "append", seq, 0L)
  private def delete(off: Long, to: Long) =
    ActionRow("t", 0, off, "k", "delete", 0L, to)
  private def purge(off: Long) = ActionRow("t", 0, off, "k", "purge", 0L, 0L)
  private def mark(off: Long) = ActionRow("t", 0, off, "k", "mark", 0L, 0L)

  test("empty fold is Empty") {
    assert(fold(Nil) == Empty)
  }

  test("append extends seqNr, keeps first offset") {
    assert(fold(Seq(append(5, 1), append(6, 2), append(9, 3))) ==
      Append(5, 3, None))
  }

  test("delete raises deleteTo, clamped to seen seqNr") {
    assert(fold(Seq(append(1, 1), append(2, 2), delete(3, 10))) ==
      Append(1, 2, Some(2)))
    assert(fold(Seq(append(1, 1), append(2, 2), delete(3, 1))) ==
      Append(1, 2, Some(1)))
  }

  test("delete with no appends is standalone Delete") {
    assert(fold(Seq(delete(3, 4), delete(5, 2))) == Delete(4))
  }

  test("purge resets everything") {
    assert(fold(Seq(append(1, 1), delete(2, 1), purge(3))) == Purge)
    assert(fold(Seq(append(1, 1), purge(2), append(3, 5))) ==
      Append(3, 5, None))
  }

  test("mark is a no-op") {
    assert(fold(Seq(mark(1), append(2, 1), mark(3))) == Append(2, 1, None))
  }

  test("append after delete keeps deleteTo") {
    assert(fold(Seq(delete(1, 7), append(2, 8))) == Append(2, 8, Some(7)))
  }

  test("combine(fold(a), fold(b)) == fold(a ++ b) on ordered splits") {
    // Like the reference's Semigroup (HeadInfo.scala:127-150), the merged
    // state cannot represent "purged then appended" — so the law holds for
    // any split of a sequence whose purges are not followed by appends
    // within the same right-hand chunk. These shapes cover all remaining
    // state transitions.
    val shapes: Seq[Seq[ActionRow]] = Seq(
      Seq(append(1, 1), append(2, 2), delete(3, 1), append(4, 3)),
      Seq(mark(1), delete(2, 3), append(3, 4), purge(4)),
      Seq(append(1, 1), purge(2)),
      Seq(delete(1, 2), delete(2, 5), mark(3)),
      Seq(append(1, 2), delete(2, 2), append(3, 3), delete(4, 3),
        append(5, 4), mark(6))
    )
    for (s <- shapes; cut <- 0 to s.length) {
      val (a, b) = s.splitAt(cut)
      assert(
        combine(fold(a), fold(b)) == fold(s),
        s"split at $cut of $s"
      )
    }
  }

  test("purge dominates any prior state on combine") {
    assert(combine(Append(1, 5, Some(2)), Purge) == Purge)
    assert(combine(Delete(3), Purge) == Purge)
    assert(combine(Empty, Purge) == Purge)
  }
}
