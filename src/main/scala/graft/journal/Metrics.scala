package graft.journal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A8 — operational meters (reference PartitionCache.scala:82-93 meters,
  * *Metrics.scala summaries) via Spark's `observe` API: named aggregates
  * computed inline with the query (no second scan), delivered to
  * QueryExecutionListener / StreamingQueryListener.
  */
object Metrics {

  val name = "graft_journal_metrics"

  /** Attach replay meters to any journal read: row count, journal count,
    * max seq_nr — the numbers the reference exposes per recovery.
    */
  def observed(journalRead: DataFrame): DataFrame =
    journalRead.observe(
      name,
      count(lit(1)).as("rows"),
      approx_count_distinct("id").as("n_journals"),
      max("seq_nr").as("max_seq_nr")
    )
}
