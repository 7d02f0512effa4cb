package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{JournalOps, Replay, Snapshots}
import graft.model.ActionLog
import graft.streaming.StreamingSnapshots

/** Laws of the snapshot maintenance plane (the s10 plane's k14):
  *
  *   - firing clears the debt: after [[Snapshots.applySnapshots]] no
  *     journal is recommended, and journals the maintainer did NOT touch
  *     recover row-identically (recover before ≡ after for them);
  *   - bounded recovery: the replay suffix through the applied snapshots
  *     is exactly the merged read above each journal's snapshot — fired
  *     journals' suffix is EMPTY (snapshot at the pointer);
  *   - the streaming loop maintains the same invariant continuously:
  *     after a chunked run, merged pointers ≡ the A2 pointer, every
  *     journal's debt ≤ threshold, T1 redelivery is a no-op, and
  *     compaction (ring retention included) leaves recovery identical.
  */
class SnapshotMaintenanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-snapmaint-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def actions = ActionLog.fromEvents(spark, sfDir)

  private def fixtureSnaps(a: DataFrame): DataFrame =
    Snapshots.table(a).select("topic", "id", "seq_nr", "koffset", "ts", "payload")

  test("applySnapshots clears every recommendation; untouched journals recover row-identically") {
    val a = actions.cache()
    val threshold = 5L // max fixture debt at sf0.001 is 9
    val before = fixtureSnaps(a).cache()
    val debt = Snapshots.snapshotDebt(a, before, threshold).cache()
    val dueIds =
      debt.filter(col("snapshot_recommended")).select("topic", "id").cache()
    assert(dueIds.count() > 0, "fixture must exercise the fire path")

    val after = Snapshots.applySnapshots(a, before, threshold).cache()
    // 1. no recommendation survives the apply
    assert(
      Snapshots
        .snapshotDebt(a, after, threshold)
        .filter(col("snapshot_recommended"))
        .count() == 0
    )
    // 2. fired journals: snapshot AT the pointer, replay suffix empty
    val suffix = Replay
      .mergedRead(a)
      .select("topic", "id", "seq_nr")
      .join(
        after.groupBy("topic", "id").agg(max("seq_nr").as("snap_seq")),
        Seq("topic", "id")
      )
      .filter(col("seq_nr") > col("snap_seq"))
    assert(
      suffix.join(dueIds, Seq("topic", "id")).count() == 0,
      "a journal snapshotted at its pointer must have an empty replay suffix"
    )
    // 3. untouched journals recover row-identically before/after
    def recoverRows(snaps: DataFrame): DataFrame =
      Snapshots
        .recoveryWith(a, snaps.select("topic", "id", "seq_nr", "koffset", "payload"))
        .join(dueIds, Seq("topic", "id"), "left_anti")
    assert(recoverRows(after).exceptAll(recoverRows(before)).count() == 0)
    assert(recoverRows(before).exceptAll(recoverRows(after)).count() == 0)
    Seq(before, debt, dueIds, after).foreach(_.unpersist(false))
    a.unpersist(false)
  }

  test("recoveryWith: the event leg is exactly the merged read above each journal's snapshot") {
    val a = actions.cache()
    val snaps = Snapshots
      .applySnapshots(a, fixtureSnaps(a), 25L)
      .select("topic", "id", "seq_nr", "koffset", "payload")
      .cache()
    val rec = Snapshots.recoveryWith(a, snaps)
    val eventLeg = rec
      .filter(col("src") === "event")
      .select("topic", "id", "seq_nr", "koffset", "payload")
    val latest = snaps.groupBy("topic", "id").agg(max("seq_nr").as("snap_seq"))
    val want = Replay
      .mergedRead(a)
      .select("topic", "id", "seq_nr", "koffset", "payload")
      .join(latest, Seq("topic", "id"), "left")
      .filter(col("snap_seq").isNull || col("seq_nr") > col("snap_seq"))
      .drop("snap_seq")
    assert(eventLeg.exceptAll(want).count() == 0)
    assert(want.exceptAll(eventLeg).count() == 0)
    snaps.unpersist(false)
    a.unpersist(false)
  }

  test("streaming loop: pointers exact, debt bounded, redelivery no-op, compaction recovery-identical with ring retention") {
    val a = actions.cache()
    val threshold = 10L
    val n = 4
    val maxOff = a.agg(max("koffset")).head().getLong(0)
    val step = maxOff / n + 1
    val tmp = Files.createTempDirectory("graft-snapmaint").toString
    def chunk(i: Int): DataFrame =
      a.filter(col("koffset") >= i * step && col("koffset") < (i + 1) * step)
    (0 until n).foreach(i =>
      StreamingSnapshots.appendMaintenanceBatch(
        spark,
        chunk(i),
        tmp,
        threshold,
        layer = i + 1L
      )
    )

    // merged pointer state ≡ the A2 pointer over the whole log
    val ptr = StreamingSnapshots
      .mergedPointers(spark, tmp)
      .filter(col("ptr") >= 0)
      .select(col("topic"), col("id"), col("ptr").as("seq_nr"))
    val want = JournalOps.pointer(a).select("topic", "id", "seq_nr")
    assert(ptr.exceptAll(want).count() == 0)
    assert(want.exceptAll(ptr).count() == 0)

    // the maintained invariant: nobody's debt exceeds the threshold
    val stored = StreamingSnapshots.storedSnapshots(spark, tmp)
    assert(stored.count() > 0, "the loop must have fired")
    assert(
      Snapshots
        .snapshotDebt(a, stored, threshold)
        .filter(col("snapshot_recommended"))
        .count() == 0,
      "the loop must keep every journal's debt at or below the threshold"
    )

    def recoverRows(): Seq[String] =
      Snapshots
        .recoveryWith(
          a,
          StreamingSnapshots
            .storedSnapshots(spark, tmp)
            .select("topic", "id", "seq_nr", "koffset", "payload")
        )
        .collect()
        .map(_.mkString("|"))
        .sorted
        .toSeq
    val before = recoverRows()

    // T1 redelivery of the last batch: a layer rewrite, not a double-fire
    StreamingSnapshots.appendMaintenanceBatch(
      spark,
      chunk(n - 1),
      tmp,
      threshold,
      layer = n.toLong
    )
    assert(recoverRows() == before, "redelivered batch must be a no-op")

    // compaction with ring retention: recovery identical (the latest
    // snapshot per journal survives the ring by construction)
    StreamingSnapshots.compactSnapshotStore(spark, tmp, bufferSize = 2)
    assert(recoverRows() == before, "compaction must not change recovery")
    val raw = spark.read.parquet(
      graft.util.DirSwap
        .resolve(tmp, "snaps")
        .toString
    )
    assert(raw.select("layer").distinct().count() == 1, "layers folded")
    val overRing = raw
      .groupBy("topic", "id")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 2)
    assert(overRing.count() == 0, "ring retention must cap snapshots per journal")

    // post-compaction batches keep working (the store stays appendable)
    StreamingSnapshots.appendMaintenanceBatch(
      spark,
      chunk(n - 1),
      tmp,
      threshold,
      layer = n + 1L
    )
    assert(recoverRows() == before)
    a.unpersist(false)
  }

  test("streaming maintenanceStream over a file source maintains the bounded-debt invariant") {
    val a = actions.cache()
    val threshold = 10L
    val tmp = Files.createTempDirectory("graft-snapstream").toString
    val inDir = s"$tmp/in"
    val storeDir = s"$tmp/store"
    val n = 3
    val maxOff = a.agg(max("koffset")).head().getLong(0)
    val step = maxOff / n + 1
    (0 until n).foreach { i =>
      a.filter(col("koffset") >= i * step && col("koffset") < (i + 1) * step)
        .coalesce(1)
        .write
        .parquet(s"$inDir/chunk_$i")
    }
    val stream = spark.readStream
      .schema(a.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$inDir/chunk_*")
    val q = StreamingSnapshots.maintenanceStream(
      stream,
      storeDir,
      s"$tmp/ck",
      threshold = threshold,
      compactEvery = 2
    )
    q.awaitTermination(120000)
    val stored = StreamingSnapshots.storedSnapshots(spark, storeDir)
    assert(stored.count() > 0)
    assert(
      Snapshots
        .snapshotDebt(a, stored, threshold)
        .filter(col("snapshot_recommended"))
        .count() == 0
    )
    a.unpersist(false)
  }
}
