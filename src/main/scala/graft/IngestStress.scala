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
  *
  * `heads` mode stresses the HEAD tables specifically: every batch
  * appends to thousands of FRESH journals (one head row each), confined
  * to one `(topic, bucket)` partition per batch — the metajournal grows
  * by `perBatch` keys every batch while per-batch time must stay flat
  * (the pre-bucketed head sink rewrote all accumulated heads per batch,
  * O(keys); the bucketed sink rewrites only the touched bucket's heads).
  *
  *   sbt "runMain graft.IngestStress 8 heads"
  */
object IngestStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    if (args.lift(1).contains("heads")) { headStress(n); return }
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

    // maintenance leg: after N batches the hot partitions hold up to N
    // files each; compaction must be bounded by the hot-partition volume
    // (and a second run must find nothing to do)
    val t0 = System.nanoTime()
    val compacted = StreamingReplicator.compactStore(spark, dir, maxFiles = 1)
    val cSec = (System.nanoTime() - t0) / 1e9
    println(
      f"[ingest] compaction: $cSec%.2f s, partitions " +
        s"${compacted("journal")} journal / ${compacted("metajournal")} meta"
    )
    val again = StreamingReplicator.compactStore(spark, dir, maxFiles = 1)
    println(s"[ingest] recompaction (must be 0): ${again.values.sum}")
    val after = StreamingReplicator.readStore(spark, dir)
    println(s"[ingest] post-compaction journal rows: ${after.journal.count()}")
    spark.stop()
  }

  /** Head-table scaling: N batches × `perBatch` fresh journals each, all
    * of batch i landing in bucket i % DefaultBuckets. Flat per-batch time
    * while the metajournal grows linearly proves the head rewrite is
    * O(touched buckets), not O(accumulated keys).
    */
  private def headStress(n: Int, perBatch: Int = 20000): Unit = {
    import org.apache.spark.sql.functions._
    import graft.journal.Replicate
    val spark = GraftSession.local("graft-head-stress")
    spark.sparkContext.setLogLevel("WARN")
    val dir = s"/tmp/graft_heads_$n-${System.nanoTime()}"

    val times = (0 until n).map { i =>
      val bucket = i % Replicate.DefaultBuckets
      // oversample candidate ids, keep the ones hashing into this batch's
      // bucket; koffset strictly advances across batches (offset guard)
      val batch = spark.range(perBatch.toLong * Replicate.DefaultBuckets * 2)
        .select(concat(lit(s"h$i-"), col("id")).as("id"), col("id").as("j"))
        .filter(Replicate.bucketOf(col("id")) === bucket)
        .limit(perBatch)
        .select(
          lit("heads").as("topic"),
          lit(0).as("part_no"),
          (lit(i.toLong) * perBatch * 200 + col("j")).as("koffset"),
          col("id"),
          lit("append").as("action"),
          lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"),
          lit(1L).as("seq_nr"),
          lit(null).cast("long").as("delete_to"),
          lit(1.0).as("payload"),
          lit(null).cast("string").as("payload_type"),
          lit(null).cast("string").as("payload_txt"),
          lit(null).cast("binary").as("payload_bin"),
          lit(null).cast("string").as("tags_csv"),
          lit("stress").as("origin"),
          lit("1.0.0").as("version"),
          lit(null).cast("string").as("metadata")
        )
      val t0 = System.nanoTime()
      StreamingReplicator.applyBatch(spark, dir, batch)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[heads] batch $i%2d: $sec%.2f s (bucket $bucket)")
      sec
    }
    val firstHalf = times.take(n / 2).sum / (n / 2)
    val secondHalf = times.drop(n / 2).sum / (n - n / 2)
    println(
      f"[heads] avg first half ${firstHalf}%.2f s, second half " +
        f"${secondHalf}%.2f s, ratio ${secondHalf / firstHalf}%.2f " +
        "(O(touched buckets) => ~1.0; O(keys) => grows with batch index)"
    )
    val heads = StreamingReplicator.readStore(spark, dir).metajournal.count()
    println(s"[heads] final metajournal rows: $heads (expect ${n.toLong * perBatch})")
    spark.stop()
  }
}
