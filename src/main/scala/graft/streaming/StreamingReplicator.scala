package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.jdk.CollectionConverters._

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
  * body is source-agnostic. Sink: `(topic, bucket)`-partitioned parquet
  * journal AND metajournal mutated INCREMENTALLY (only the batch's touched
  * partitions are read and rewritten — O(batch), not O(store)) plus the
  * tiny pointer2 table behind an atomic generation swap; on Delta/Iceberg
  * the same logical plan is a transactional MERGE INTO (the 100 TB
  * deployment shape — documented as SURVEY §7.4 risk 1).
  *
  * Exactly-once (T2) = at-least-once delivery (checkpoint replay) +
  * idempotent merge ([[Replicate.mergeBatch]]'s pointer2 offset guard):
  * a redelivered micro-batch is a no-op. Poison records stall the query
  * (exception propagates, T4's stall-don't-skip) rather than being dropped.
  */
object StreamingReplicator {

  /** Applies one micro-batch to the store — O(batch), not O(store). Also
    * the test seam: batches can be fed directly.
    *
    * Layout: the journal AND the metajournal live at `storeDir/journal` /
    * `storeDir/metajournal`, both partitioned by `(topic, bucket)`
    * ([[Replicate.bucketOf]] — one journal's event rows and its single
    * head row always share a partition key). A batch reads ONLY the
    * partitions of the journals it touches (partition pruning on the
    * collected touched set) and rewrites ONLY those via dynamic partition
    * overwrite — untouched partition files are never opened or rewritten,
    * so per-batch cost scales with the batch's key locality, not the
    * accumulated store. At 10⁸–10⁹ journals the metajournal is itself a
    * large table (the reference upserts exactly the touched keys,
    * ReplicatedCassandra.scala:186-260); bucketing bounds each batch's
    * head rewrite to the touched buckets' heads — the bucket count
    * ([[Replicate.DefaultBuckets]], reference Segments.default=10000) is
    * the granularity knob, and on Delta/Iceberg the same logical plan is
    * an exact per-key MERGE INTO. Only pointer2 (one row per Kafka
    * partition — genuinely tiny) stays whole behind the committed-
    * generation swap.
    *
    * Crash safety: the pointer2 write (inside the generation swap, last)
    * is the commit point. Any crash before it leaves the old pointer2, so
    * the checkpointed batch is REDELIVERED and the merge re-applies — the
    * journal partition rewrite is content-idempotent (appends dedup on
    * (topic,id,seq_nr), deletes/purges are monotone) and so is the
    * metajournal's ([[Replicate.mergeBatch]]'s head combine is monotone
    * max/least/coalesce per column; purge-then-recreate reproduces the
    * identical recreated row), so half-written partitions converge. A
    * missing `current/` never silently bootstraps an empty store
    * ([[recoverCurrent]]) — that would let the offset guard discard all
    * previously replicated state, breaking exactly-once.
    *
    * Isolation contract (SINGLE WRITER assumed — the reference's
    * equivalent lock is CassandraSync; two concurrent appliers would race
    * the rename pair): a reader resolving the store through
    * [[recoverCurrent]] at ANY point of the swap sees exactly one
    * committed generation — the old one until `current/` is moved aside,
    * the new one after — never an uncommitted, partial, or mixed
    * pointer2 (ReplicatorSpec walks every intermediate on-disk state).
    * On Delta/Iceberg this paragraph is the table format's snapshot
    * isolation; here it is the pair of atomic directory renames around
    * the `_COMMITTED` marker.
    */
  def applyBatch(spark: SparkSession, storeDir: String, batch: DataFrame): Unit = {
    import org.apache.spark.sql.functions.col
    val cur = recoverCurrent(storeDir)
    val journalDir = Paths.get(storeDir, "journal")
    val metaDir = Paths.get(storeDir, "metajournal")
    val batchC = batch.cache()
    try {
      val touched = batchC
        .select(col("topic"), Replicate.bucketOf(col("id")).as("bucket"))
        .distinct()
        .collect()
        .map(r => (r.getString(0), r.getInt(1)))
      if (touched.isEmpty) return

      val bootstrap = Replicate.empty(spark, batchC)
      val store = Replicate.Store(
        journal = readTouched(spark, journalDir, touched, bootstrap.journal),
        metajournal = readTouched(spark, metaDir, touched, bootstrap.metajournal),
        pointer2 =
          if (Files.exists(cur))
            spark.read.parquet(cur.resolve("pointer2").toString)
          else bootstrap.pointer2
      )

      val merged = Replicate.mergeBatch(store, batchC)

      overwriteTouched(merged.journal, journalDir,
        Paths.get(storeDir, "journal_schema.json"), touched)
      overwriteTouched(merged.metajournal, metaDir,
        Paths.get(storeDir, "metajournal_schema.json"), touched)

      // pointer2: fresh committed generation, then swap (commit point)
      val next = Paths.get(storeDir, s"gen-${System.nanoTime()}")
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
    } finally batchC.unpersist(false)
  }

  /** Touched-partition subset of a `(topic, bucket)`-partitioned table —
    * partition pruning on the collected touched set; the `bucket` column
    * is physical layout only and dropped from the logical rows. Guards on
    * actual parquet content, not directory existence: after a purge
    * empties EVERY bucket only _SUCCESS remains and a bare read would
    * fail schema inference, wedging the stream.
    */
  private def readTouched(
      spark: SparkSession,
      dir: Path,
      touched: Array[(String, Int)],
      bootstrap: DataFrame
  ): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (hasParquet(dir)) {
      val pred = touched
        .map { case (t, b) => col("topic") === t && col("bucket") === b }
        .reduce(_ || _)
      spark.read.parquet(dir.toString).filter(pred).drop("bucket")
    } else bootstrap
  }

  /** Replaces ONLY the touched `(topic, bucket)` partitions of a table
    * with the merged rows. Materializes first (localCheckpoint) — the
    * merged plan reads from `dir` and Spark refuses to overwrite a path
    * it is reading from. The schema sidecar lets [[readStore]] serve an
    * empty table when every partition has been purged away (no parquet
    * files left to infer from).
    */
  private def overwriteTouched(
      merged: DataFrame,
      dir: Path,
      schemaPath: Path,
      touched: Array[(String, Int)]
  ): Unit = {
    import org.apache.spark.sql.functions.col
    if (!Files.exists(schemaPath)) {
      Files.createDirectories(schemaPath.getParent)
      Files.write(schemaPath, merged.schema.json.getBytes("UTF-8"))
    }
    val m = merged
      .withColumn("bucket", Replicate.bucketOf(col("id")))
      .localCheckpoint(true)
    m.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("topic", "bucket")
      .parquet(dir.toString)
    // dynamic overwrite cannot emit an EMPTY partition: a touched
    // partition whose journals were all purged keeps its stale dir —
    // drop those explicitly (re-running after a crash converges: the
    // redelivered purge deletes again)
    val nonEmpty = m
      .select("topic", "bucket").distinct().collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    touched.filterNot(nonEmpty).foreach { case (t, b) =>
      val part = dir.resolve(s"topic=$t").resolve(s"bucket=$b")
      if (Files.exists(part)) deleteRecursively(part)
    }
    // checkpoint blocks die with the batch, not with a later GC cycle
    // (Dataset.unpersist is a no-op for checkpointed frames)
    graft.pipeline.Eager.releaseCheckpoint(m)
  }

  /** Store MAINTENANCE: compact the small files incremental ingest
    * accumulates. Every micro-batch's dynamic partition overwrite rewrites
    * each touched `(topic, bucket)` partition as fresh file(s), so a hot
    * bucket ingesting across many batches collects many small parquet
    * files — the canonical operational failure of incremental sinks at
    * 100 TB (namenode/listing metadata pressure, seek-bound scans). The
    * reference's Cassandra compacts SSTables for exactly this reason; a
    * parquet store needs the job run explicitly (on Delta/Iceberg this is
    * OPTIMIZE / rewrite_data_files).
    *
    * Only partitions whose file count exceeds `maxFiles` are touched:
    * their rows are read back (partition-pruned), re-sorted on the
    * replay key, and rewritten via the SAME dynamic-partition-overwrite
    * path ingest uses — one file per partition afterwards, row-identical
    * data, untouched partitions never opened (spec'd byte-identical).
    * Safe to run between batches; a crash mid-compaction leaves standard
    * dynamic-overwrite semantics (the partition has either old or new
    * files, both row-identical). Returns per-table compacted-partition
    * counts (zero = already compact; idempotent).
    */
  def compactStore(
      spark: SparkSession,
      storeDir: String,
      maxFiles: Int = 4
  ): Map[String, Int] = {
    import org.apache.spark.sql.functions.col
    Seq("journal", "metajournal").map { table =>
      val dir = Paths.get(storeDir, table)
      // Files.list streams hold a directory handle until closed — drain
      // each eagerly or repeated maintenance runs leak file descriptors
      def children(p: Path): Seq[Path] = {
        val s = Files.list(p)
        try s.iterator().asScala.toSeq
        finally s.close()
      }
      val over: Seq[(String, Int)] =
        if (!Files.exists(dir)) Seq.empty
        else {
          val parts = children(dir)
            .filter(p => p.getFileName.toString.startsWith("topic="))
            .flatMap { t =>
              children(t)
                .filter(p => p.getFileName.toString.startsWith("bucket="))
            }
          parts.flatMap { p =>
            val nFiles = children(p).count { f =>
              val n = f.getFileName.toString
              n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
            }
            if (nFiles > maxFiles) {
              val topic = p.getParent.getFileName.toString.stripPrefix("topic=")
              val bucket =
                p.getFileName.toString.stripPrefix("bucket=").toInt
              Some((topic, bucket))
            } else None
          }
        }
      if (over.nonEmpty) {
        val pred = over
          .map { case (t, b) => col("topic") === t && col("bucket") === b }
          .reduce(_ || _)
        val cp = spark.read
          .parquet(dir.toString)
          .filter(pred)
          .localCheckpoint(true)
        // one task owns all rows of a partition value => one output file
        cp.repartition(col("topic"), col("bucket"))
          .sortWithinPartitions("id")
          .write
          .mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("topic", "bucket")
          .parquet(dir.toString)
        graft.pipeline.Eager.releaseCheckpoint(cp)
      }
      table -> over.size
    }.toMap
  }

  /** Assembles the store from its on-disk layout (bucketed journal +
    * current head-table generation), repairing crash leftovers first.
    */
  /** True iff the directory exists and holds at least one parquet file. */
  private def hasParquet(dir: Path): Boolean =
    Files.exists(dir) && {
      val s = Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
      } finally s.close()
    }

  def readStore(spark: SparkSession, storeDir: String): Replicate.Store = {
    val cur = recoverCurrent(storeDir)
    def bucketed(name: String): DataFrame = {
      val dir = Paths.get(storeDir, name)
      if (hasParquet(dir))
        spark.read.parquet(dir.toString).drop("bucket")
      else {
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(new String(
            Files.readAllBytes(Paths.get(storeDir, s"${name}_schema.json")),
            "UTF-8"))
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    }
    Replicate.Store(
      journal = bucketed("journal"),
      metajournal = bucketed("metajournal"),
      pointer2 = spark.read.parquet(cur.resolve("pointer2").toString)
    )
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
