package graft.journal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S10 — snapshot store semantics (reference snapshot/.../SnapshotStore
  * .scala:11-62, SnapshotSelectionCriteria.scala:12-17): save keyed by
  * (id, topic, buffer_nr), load = highest-seqNr snapshot matching a
  * criteria box, delete = drop matches.
  *
  * The snapshot fixture: every surviving append whose seq_nr % 10 == 0 is a
  * snapshot of its journal at that point (buffer_nr = seq_nr / 10).
  */
object Snapshots {

  final case class Criteria(
      maxSeqNr: Long = Long.MaxValue,
      minSeqNr: Long = 0L,
      maxTimestamp: Option[String] = None,
      minTimestamp: Option[String] = None
  )

  /** The snapshot table derived from an action log. */
  def table(actions: DataFrame): DataFrame =
    JournalOps
      .survivors(actions)
      .filter(col("seq_nr") % 10 === 0)
      .select(
        col("topic"),
        col("id"),
        (col("seq_nr") / 10).cast("int").as("buffer_nr"),
        col("seq_nr"),
        col("koffset"),
        col("ts"),
        col("payload")
      )

  private def matches(c: Criteria) = {
    val seqBox =
      col("seq_nr") <= c.maxSeqNr && col("seq_nr") >= c.minSeqNr
    val tsMax = c.maxTimestamp
      .map(t => col("ts") <= lit(t).cast("timestamp"))
      .getOrElse(lit(true))
    val tsMin = c.minTimestamp
      .map(t => col("ts") >= lit(t).cast("timestamp"))
      .getOrElse(lit(true))
    seqBox && tsMax && tsMin
  }

  /** load: per journal, the highest-seqNr snapshot inside the criteria box
    * (reference picks max-seqNr match, SnapshotStore.scala:26-34).
    */
  def load(actions: DataFrame, c: Criteria): DataFrame = {
    val pick = Window.partitionBy("topic", "id").orderBy(col("seq_nr").desc)
    table(actions)
      .filter(matches(c))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select("topic", "id", "buffer_nr", "seq_nr", "koffset", "payload")
      .orderBy("topic", "id")
  }

  /** delete-by-criteria: remaining snapshots after dropping matches. */
  def deleteBy(actions: DataFrame, c: Criteria): DataFrame =
    table(actions)
      .filter(!matches(c))
      .select("topic", "id", "buffer_nr", "seq_nr")
      .orderBy("topic", "id", "seq_nr")
}
