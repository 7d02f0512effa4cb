package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.journal.Replicate

/** The replicator as a Structured Streaming job (reference
  * replicator/.../TopicReplicator.scala, ConsumeTopic.scala): a stream of
  * action records is folded into the eventual store via `foreachBatch`,
  * which gives the reference's commit-after-write ordering (T1) for free —
  * offsets checkpoint only after the batch's store writes succeed.
  *
  * Source: file stream here (the container has no Kafka broker); swapping
  * in `readStream.format("kafka")` changes ONLY [[streamFrom]] — the merge
  * body is source-agnostic. Sink: plain parquet read-modify-write with an
  * atomic directory swap per micro-batch; on Delta/Iceberg the same logical
  * plan is a transactional MERGE INTO (the 100 TB deployment shape —
  * documented as SURVEY §7.4 risk 1).
  *
  * Exactly-once (T2) = at-least-once delivery (checkpoint replay) +
  * idempotent merge ([[Replicate.mergeBatch]]'s pointer2 offset guard):
  * a redelivered micro-batch is a no-op. Poison records stall the query
  * (exception propagates, T4's stall-don't-skip) rather than being dropped.
  */
object StreamingReplicator {

  /** Applies one micro-batch to the store directory (read-modify-write +
    * directory swap). Also the test seam: batches can be fed directly.
    *
    * Crash safety: a generation is only adoptable once its `_COMMITTED`
    * marker exists, and the marker is written strictly before the swap
    * moves begin. [[recoverCurrent]] makes every crash window recoverable —
    * a missing `current/` never silently bootstraps an empty store (which
    * would let the pointer2 offset guard discard all previously replicated
    * state, breaking the exactly-once claim).
    */
  def applyBatch(spark: SparkSession, storeDir: String, batch: DataFrame): Unit = {
    val cur = recoverCurrent(storeDir)
    val store =
      if (Files.exists(cur)) Replicate.read(spark, cur.toString)
      else Replicate.empty(spark, batch)

    val merged = Replicate.mergeBatch(store, batch)

    // write to a fresh generation dir (reads the old files), mark it
    // committed, then swap
    val next = Paths.get(storeDir, s"gen-${System.nanoTime()}")
    merged.journal.write.mode(SaveMode.Overwrite)
      .parquet(next.resolve("journal").toString)
    merged.metajournal.write.mode(SaveMode.Overwrite)
      .parquet(next.resolve("metajournal").toString)
    merged.pointer2.write.mode(SaveMode.Overwrite)
      .parquet(next.resolve("pointer2").toString)
    Files.createFile(next.resolve(Committed))

    val old = if (Files.exists(cur)) {
      val o = Paths.get(storeDir, s"old-${System.nanoTime()}")
      Files.move(cur, o)
      Some(o)
    } else None
    Files.move(next, cur)
    old.foreach(deleteRecursively)
  }

  private val Committed = "_COMMITTED"

  /** Resolves (and if necessary repairs) the store's `current/` directory.
    *
    * Crash windows of [[applyBatch]] and their recovery:
    *   - during the generation write (no marker yet): `current/` intact —
    *     the stale `gen-*` is garbage, swept here
    *   - after the marker but before `move(current, old)`: `current/`
    *     intact; the committed-but-unadopted `gen-*` is superseded garbage
    *   - between `move(current, old)` and `move(gen, current)`: no
    *     `current/`; the newest COMMITTED `gen-*` is adopted (the `old-*`
    *     twin is swept)
    *   - after `move(gen, current)` but before the old delete: `current/`
    *     intact; the `old-*` leftover is swept
    */
  def recoverCurrent(storeDir: String): Path = {
    val root = Paths.get(storeDir)
    val cur = root.resolve("current")
    if (!Files.exists(root)) return cur

    def dirs(prefix: String): Seq[Path] = {
      val s = Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith(prefix))
          .toSeq
          .sortBy(_.getFileName.toString.stripPrefix(prefix).toLong)
      } finally s.close()
    }

    if (!Files.exists(cur)) {
      val committed = dirs("gen-").filter(g => Files.exists(g.resolve(Committed)))
      committed.lastOption match {
        case Some(g) => Files.move(g, cur)
        case None =>
          // no committed generation: only reachable if markers were removed
          // externally; the newest old-* still holds the pre-batch store
          dirs("old-").lastOption.foreach(o => Files.move(o, cur))
      }
    }
    // sweep superseded generations and leftovers
    (dirs("gen-") ++ dirs("old-")).foreach(deleteRecursively)
    cur
  }

  private def deleteRecursively(p: Path): Unit =
    Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f =>
      Files.deleteIfExists(f): Unit
    )

  /** Runs the replicator over a stream of KAFKA-SHAPED records (key /
    * value bytes / `journal.action` header — the exact columns
    * `readStream.format("kafka")` yields): decodes each micro-batch with
    * [[graft.sources.KafkaWire.fromWire]] and merges. This is the
    * production entry point; the file stream stands in for the broker.
    */
  def streamFromWire(
      spark: SparkSession,
      inputDir: String,
      storeDir: String,
      checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType
  ): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(
          batch.sparkSession,
          storeDir,
          graft.sources.KafkaWire.fromWire(batch)
        )
      }
      .start()
  }

  /** Runs the replicator over a parquet file stream of action records.
    * `Trigger.AvailableNow` drains what exists and stops — the batch-ingest
    * mode; pass a processing-time trigger for a long-running tail.
    */
  def streamFrom(
      spark: SparkSession,
      inputDir: String,
      storeDir: String,
      checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType
  ): StreamingQuery = {
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch.sparkSession, storeDir, batch)
      }
      .start()
  }
}
