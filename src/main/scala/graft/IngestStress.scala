package graft

import org.apache.spark.sql.functions._

import graft.model.ActionLog
import graft.streaming.StreamingReplicator

/** Ingest-scaling harness for the incremental streaming sink: applies N
  * equal micro-batches of the sf0.1 action log through
  * [[StreamingReplicator.applyBatch]] and prints per-batch wall seconds.
  *
  * The claim under test is O(batch), not O(store): per-batch time must
  * stay roughly FLAT as the accumulated store grows (the pre-incremental
  * sink re-read and re-wrote the whole store each batch, so its per-batch
  * time grew linearly with batch index).
  *
  *   sbt "runMain graft.IngestStress 8"
  */
object IngestStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val spark = GraftSession.local("graft-ingest-stress")
    spark.sparkContext.setLogLevel("WARN")

    val a = ActionLog.fromEvents(spark, "/root/testdata/sf0.1").cache()
    val mx = a.agg(max("event_id")).head().getLong(0)
    val step = mx / n + 1
    val dir = s"/tmp/graft_ingest_$n-${System.nanoTime()}"

    val times = (0 until n).map { i =>
      val batch = a.filter(
        col("event_id") >= i * step && col("event_id") < (i + 1) * step
      )
      val t0 = System.nanoTime()
      StreamingReplicator.applyBatch(spark, dir, batch)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ingest] batch $i%2d: $sec%.2f s")
      sec
    }
    val firstHalf = times.take(n / 2).sum / (n / 2)
    val secondHalf = times.drop(n / 2).sum / (n - n / 2)
    println(
      f"[ingest] avg first half ${firstHalf}%.2f s, second half " +
        f"${secondHalf}%.2f s, ratio ${secondHalf / firstHalf}%.2f " +
        "(O(batch) => ~1.0; O(store) => grows with batch index)"
    )
    val store = StreamingReplicator.readStore(spark, dir)
    println(s"[ingest] final journal rows: ${store.journal.count()}")
    spark.stop()
  }
}
