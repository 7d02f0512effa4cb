package graft.journal

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed HeadInfo fold — the per-journal summary of a log tail, reproduced
  * from the reference's state machine
  * (journal/src/main/scala/com/evolution/kafka/journal/HeadInfo.scala:27-277):
  *
  *   - Append extends `seqNr`, keeps the FIRST append offset, keeps deleteTo
  *   - Delete raises `deleteTo` (never above the seen seqNr — the clamp
  *     happens on apply, HeadInfo.scala:222-236)
  *   - Purge resets the state to Purge
  *   - Mark is a no-op
  *
  * The fold is order-sensitive (log order per partition), so the typed
  * runner sorts each journal's actions by offset inside its group before
  * folding — one journal's actions per task, bounded by journal size, the
  * same locality the reference's per-key replication fold has
  * (replicator/.../ReplicateRecords.scala:166-172).
  *
  * The declarative/codegen formulation used by the SQL-facing queries lives
  * in [[JournalOps.headInfo]]; this typed one backs the streaming plane and
  * the model specs, and [[HeadInfo.combine]] mirrors the reference's
  * Semigroup (HeadInfo.scala:127-150) for merging consecutive partial folds.
  */
sealed trait HeadInfo extends Product with Serializable

object HeadInfo {
  case object Empty extends HeadInfo
  case object Purge extends HeadInfo
  final case class Delete(deleteTo: Long) extends HeadInfo
  final case class Append(offset: Long, seqNr: Long, deleteTo: Option[Long])
      extends HeadInfo

  /** One step of the fold: apply an action (header-only view) to the state. */
  def step(state: HeadInfo, action: ActionRow): HeadInfo =
    action.action match {
      case "append" =>
        state match {
          case Append(o, s, d) =>
            Append(o, math.max(s, action.seqNr), d)
          case Delete(d) =>
            // reference clamps the carried deleteTo below the first appended
            // seqNr (HeadInfo.scala `deleteToOf`: min(range.from.prev, d))
            Append(
              action.koffset,
              action.seqNr,
              if (action.seqNr > 1) Some(math.min(d, action.seqNr - 1)) else None
            )
          case Empty | Purge =>
            Append(action.koffset, action.seqNr, None)
        }
      case "delete" =>
        val to = action.deleteTo
        state match {
          case Append(o, s, d) =>
            // clamp: cannot delete beyond what was appended here
            val dd = math.min(to, s)
            Append(o, s, Some(d.fold(dd)(math.max(_, dd))))
          case Delete(d)     => Delete(math.max(d, to))
          case Empty | Purge => Delete(to)
        }
      case "purge" => Purge
      case _       => state // mark
    }

  /** Order-preserving merge of two consecutive partial folds — the
    * reference's Semigroup (HeadInfo.scala:129-150): `b` folds actions that
    * come strictly after `a`'s.
    */
  def combine(a: HeadInfo, b: HeadInfo): HeadInfo = b match {
    case Empty => a
    case Purge => Purge
    case Delete(d2) =>
      a match {
        case Append(o, s, d) =>
          val dd = math.min(d2, s)
          Append(o, s, Some(d.fold(dd)(math.max(_, dd))))
        case Delete(d1)    => Delete(math.max(d1, d2))
        case Empty | Purge => Delete(d2)
      }
    case Append(o2, s2, d2) =>
      a match {
        case Append(o1, s1, d1) =>
          val d = (d1, d2) match {
            case (Some(x), Some(y)) => Some(math.max(x, y))
            case (x, y)             => x.orElse(y)
          }
          Append(o1, math.max(s1, s2), d)
        case Delete(d1) =>
          Append(o2, s2, Some(d2.fold(d1)(math.max(_, d1))))
        case Empty | Purge => Append(o2, s2, d2)
      }
  }

  def fold(actions: Iterable[ActionRow]): HeadInfo =
    actions.foldLeft(Empty: HeadInfo)(step)

  /** Flat result row for the Dataset API. */
  final case class Result(
      topic: String,
      id: String,
      kind: String,
      offset: Option[Long],
      seqNr: Option[Long],
      deleteTo: Option[Long]
  )

  def toResult(topic: String, id: String, h: HeadInfo): Result = h match {
    case Empty => Result(topic, id, "empty", None, None, None)
    case Purge => Result(topic, id, "purge", None, None, None)
    case Delete(d) => Result(topic, id, "delete", None, None, Some(d))
    case Append(o, s, d) => Result(topic, id, "append", Some(o), Some(s), d)
  }

  /** Skew-safe variant: partial folds per (journal, offset-chunk) merged in
    * chunk order — the job the reference's Semigroup exists for
    * (HeadInfo.scala:127-150: PartitionCache merges partial per-offset-range
    * entries). A single hot journal no longer serializes into one task: its
    * chunks fold in parallel and only the (few) partial states meet in the
    * final per-key reduce.
    *
    * Each partial carries a `sawPurge` flag: the bare Semigroup cannot
    * represent "purged then appended" inside the right chunk (its Append
    * merge would keep the stale left state), so a purged chunk REPLACES the
    * accumulated state instead of merging — making the chunked fold exact,
    * not approximate.
    */
  def perJournalSalted(
      spark: SparkSession,
      actions: Dataset[ActionRow],
      chunkSize: Long = 1000L
  ): Dataset[Result] = {
    import spark.implicits._
    actions
      .groupByKey(a => (a.topic, a.id, a.koffset / chunkSize))
      .mapGroups { (key: (String, String, Long), rows: Iterator[ActionRow]) =>
        val sorted = rows.toArray.sortBy(_.koffset)
        val sawPurge = sorted.exists(_.action == "purge")
        (key._1, key._2, key._3, sawPurge,
          pack(sorted.foldLeft(Empty: HeadInfo)(step)))
      }
      .groupByKey { case (topic, id, _, _, _) => (topic, id) }
      .mapGroups {
        (key: (String, String),
         parts: Iterator[(String, String, Long, Boolean, (String, Long, Long, Long))]) =>
          val ordered = parts.toArray.sortBy(_._3)
          val merged = ordered.foldLeft(Empty: HeadInfo) {
            case (acc, (_, _, _, purged, packed)) =>
              val head = unpack(packed)
              if (purged) head else combine(acc, head)
          }
          toResult(key._1, key._2, merged)
      }
  }

  /** Flat encodable form of a HeadInfo (for shuffling partials; also the
    * persisted-row shape of the streaming head cache's partial folds).
    */
  private[graft] def pack(h: HeadInfo): (String, Long, Long, Long) = h match {
    case Empty           => ("e", 0L, 0L, -1L)
    case Purge           => ("p", 0L, 0L, -1L)
    case Delete(d)       => ("d", 0L, 0L, d)
    case Append(o, s, d) => ("a", o, s, d.getOrElse(-1L))
  }

  private[graft] def unpack(t: (String, Long, Long, Long)): HeadInfo =
    t._1 match {
      case "e" => Empty
      case "p" => Purge
      case "d" => Delete(t._4)
      case _   => Append(t._2, t._3, if (t._4 >= 0) Some(t._4) else None)
    }

  /** Runs the fold per journal over a Dataset of action rows. Each group is
    * one journal's tail — sorted by offset in-memory (bounded by tail size,
    * which replication lag keeps small; the reference holds the same rows in
    * its PartitionCache, journal/.../PartitionCache.scala:21-93).
    */
  def perJournal(
      spark: SparkSession,
      actions: Dataset[ActionRow]
  ): Dataset[Result] = {
    import spark.implicits._
    actions
      .groupByKey(a => (a.topic, a.id))
      .mapGroups { (key: (String, String), rows: Iterator[ActionRow]) =>
        val sorted = rows.toArray.sortBy(_.koffset)
        toResult(key._1, key._2, sorted.foldLeft(Empty: HeadInfo)(step))
      }
  }
}

/** Header-only view of an action record — what the HeadCache parses without
  * touching payloads (reference ConsRecordToActionHeader, HeadCache.scala).
  */
final case class ActionRow(
    topic: String,
    part_no: Int,
    koffset: Long,
    id: String,
    action: String,
    seqNr: Long,
    deleteTo: Long
)
