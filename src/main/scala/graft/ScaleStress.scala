package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.journal.{JournalOps, Replay, Replicate}
import graft.model.ActionLog

/** Scale-stress harness: amplifies the sf0.1 events table `factor`× (shifted
  * event_ids keep per-key ordering; shifted user_ids widen the key space),
  * then runs the core journal pipeline. Used to verify the plans hold when
  * rows grow 20× beyond bench scale — same shapes, no new shuffles, no
  * driver-side collection.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleStress 20"
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    val spark = GraftSession.local("graft-scale-stress")
    spark.sparkContext.setLogLevel("WARN")

    val base = ActionLog.normalizedEvents(spark, "/root/testdata/sf0.1")
    val amplified = (0 until factor)
      .map { i =>
        base.select(
          (col("event_id") + i.toLong * 100000000L).as("event_id"),
          col("ts"),
          (col("user_id") + (i % 5).toLong * 10000L).as("user_id"),
          col("event_type"),
          col("value"),
          col("props")
        )
      }
      .reduce(_ unionByName _)
    val dir = s"/tmp/graft_scale_$factor"
    amplified.write.mode("overwrite").parquet(s"$dir/events.parquet")

    def time[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    val a = ActionLog.fromEvents(spark, dir).persist()
    time("derive+count")(a.count())
    time("journal_scan")(JournalOps.journalScan(a).count())
    time("merged_read")(Replay.mergedRead(a).count())
    time("metajournal")(JournalOps.metajournal(a).count())
    time("head_info")(
      JournalOps.headInfo(a, JournalOps.defaultWatermark(a)).count())
    time("batch_compaction")(JournalOps.batchCompaction(a).count())
    // aggregate over the computed columns so Catalyst cannot prune them
    def force(df: org.apache.spark.sql.DataFrame) =
      df.agg(
        sum(coalesce(col("dt"), lit(0L))),
        sum(col("after_purge").cast("long"))
      ).head()
    time("annotate_window")(force(JournalOps.annotate(a)))
    time("annotate_agg")(force(JournalOps.annotateAgg(a)))
    time("replicate_store")({
      val s = Replicate.compute(a)
      s.journal.count() + s.metajournal.count() + s.pointer2.count()
    })
    spark.stop()
  }
}
