package graft.journal

/** A3 — typed action-log compaction: collapse one journal's micro-batch of
  * actions into the minimal ordered list of effective sink operations
  * (reference replicator/.../Batch.scala:27-177). Reproduced behavior:
  *
  *   - processed youngest → oldest; output is oldest-first
  *   - marks dropped
  *   - everything older than a purge dropped; consecutive purges collapse
  *   - consecutive appends merge into one Appends batch whose offset is the
  *     YOUNGEST member's offset (records kept oldest-first)
  *   - appends fully covered by a younger delete are dropped
  *   - a delete covered by a younger delete is dropped; a delete covering
  *     the adjacent younger delete replaces it, keeping the OLDER offset
  *   - offset order of emitted batches preserves the log's apply order
  *
  * Used by the per-key replication path; the relational merge
  * ([[Replicate.mergeBatch]]) applies the same effective result
  * set-orientedly. BatchSpec pins the table of shapes.
  */
object Batch {

  sealed trait Compacted { def offset: Long }

  /** seq/offset pairs oldest-first; `offset` is the youngest record's. */
  final case class Appends(offset: Long, records: List[(Long, Long)])
      extends Compacted
  final case class Delete(offset: Long, to: Long) extends Compacted
  final case class Purge(offset: Long) extends Compacted

  /** `rows` must be one journal's actions in ascending offset order. */
  def of(rows: Seq[ActionRow]): List[Compacted] = {
    def oldestDelete(batches: List[Compacted]): Option[Delete] =
      batches.collectFirst { case d: Delete => d }

    rows.reverseIterator.foldLeft(List.empty[Compacted]) { (batches, row) =>
      row.action match {
        case "mark" => batches

        case "purge" =>
          batches.headOption match {
            case Some(_: Purge) => batches
            case _              => Purge(row.koffset) :: batches
          }

        case "delete" =>
          batches.headOption match {
            case Some(_: Purge) => batches
            case None           => Delete(row.koffset, row.deleteTo) :: batches
            case Some(_: Appends) =>
              val covered =
                oldestDelete(batches).exists(_.to >= row.deleteTo)
              if (covered) batches
              else Delete(row.koffset, row.deleteTo) :: batches
            case Some(next: Delete) =>
              if (row.deleteTo < next.to) batches
              else Delete(row.koffset, row.deleteTo) :: batches.tail
          }

        case _ => // append
          batches.headOption match {
            case Some(_: Purge) => batches
            case Some(next: Appends) =>
              val covered =
                oldestDelete(batches).exists(_.to >= row.seqNr)
              if (covered) batches
              else
                Appends(
                  next.offset,
                  (row.seqNr, row.koffset) :: next.records
                ) :: batches.tail
            case _ =>
              Appends(
                row.koffset,
                List((row.seqNr, row.koffset))
              ) :: batches
          }
      }
    }
  }
}
