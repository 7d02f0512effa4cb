package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{JournalOps, Replicate}
import graft.model.ActionLog
import graft.streaming.StreamingReplicator

/** Replication-pipeline specs: chunked merge == whole-log compute
  * (the reference's eventual-consistency law, EventualJournalSpec), and
  * idempotence under redelivery (T2), in both direct-merge and Structured
  * Streaming (file source, AvailableNow) forms.
  */
class ReplicatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-replicator-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def actions = ActionLog.fromEvents(spark, sfDir)

  private def chunks(a: DataFrame, n: Int): Seq[DataFrame] = {
    val mx = a.agg(max("event_id")).head().getLong(0)
    val step = mx / n + 1
    (0 until n).map { i =>
      a.filter(
        col("event_id") >= i * step && col("event_id") < (i + 1) * step
      )
    }
  }

  private def assertStoreEquals(got: Replicate.Store, want: Replicate.Store): Unit = {
    for (
      (g, w, name) <- Seq(
        (got.journal, want.journal, "journal"),
        (got.metajournal, want.metajournal, "metajournal"),
        (got.pointer2, want.pointer2, "pointer2")
      )
    ) {
      val cols = w.columns.sorted.map(col)
      val gs = g.select(cols.toIndexedSeq: _*)
      val ws = w.select(cols.toIndexedSeq: _*)
      assert(gs.exceptAll(ws).count() == 0, s"$name: extra rows")
      assert(ws.exceptAll(gs).count() == 0, s"$name: missing rows")
    }
  }

  test("chunked mergeBatch equals whole-log compute") {
    val a = actions.cache()
    val whole = Replicate.compute(a)
    val merged = chunks(a, 4).foldLeft(Replicate.empty(spark, a)) {
      (st, ch) => Replicate.mergeBatch(st, ch)
    }
    assertStoreEquals(merged, whole)
    a.unpersist()
  }

  test("redelivered batch is a no-op (offset-guard idempotence)") {
    val a = actions.cache()
    val cs = chunks(a, 3)
    val once = cs.foldLeft(Replicate.empty(spark, a))(Replicate.mergeBatch)
    // redeliver chunk 1 and 2 after the full run
    val again = Replicate.mergeBatch(Replicate.mergeBatch(once, cs(1)), cs(2))
    assertStoreEquals(again, Replicate.compute(a))
    a.unpersist()
  }

  test("streaming resumes from checkpoint and ingests only new files") {
    val a = actions.cache()
    val tmp = Files.createTempDirectory("graft-stream-resume").toString
    val inDir = s"$tmp/in"
    val storeDir = s"$tmp/store"
    val ckDir = s"$tmp/ck"
    val cs = chunks(a, 3)
    val schema = a.schema
    // first run: chunks 0 and 1
    cs.take(2).zipWithIndex.foreach { case (c, i) =>
      c.coalesce(1).write.parquet(s"$inDir/chunk_$i")
    }
    val q1 = StreamingReplicator.streamFrom(
      spark, s"$inDir/chunk_*", storeDir, ckDir, schema)
    q1.awaitTermination(120000)
    // second run, same checkpoint: only chunk 2 is new
    cs(2).coalesce(1).write.parquet(s"$inDir/chunk_2")
    val q2 = StreamingReplicator.streamFrom(
      spark, s"$inDir/chunk_*", storeDir, ckDir, schema)
    q2.awaitTermination(120000)
    val got = Replicate.read(spark, s"$storeDir/current")
    assertStoreEquals(got, Replicate.compute(a))
    a.unpersist()
  }

  test("wire-format streaming ingestion materializes the same store") {
    val a = actions.cache()
    val tmp = Files.createTempDirectory("graft-wire-stream").toString
    val wire = graft.sources.KafkaWire.toWire(a)
    wire.coalesce(1).write.parquet(s"$tmp/in/w0")
    val q = StreamingReplicator.streamFromWire(
      spark, s"$tmp/in/w*", s"$tmp/store", s"$tmp/ck", wire.schema)
    q.awaitTermination(120000)
    val got = Replicate.read(spark, s"$tmp/store/current")
    // wire roundtrip drops event_id/props; compare store tables except the
    // props-derived columns are unaffected (journal/pointer2/metajournal
    // don't read props)
    assertStoreEquals(got, Replicate.compute(a))
    a.unpersist()
  }

  test("structured-streaming replicator materializes the same store") {
    val a = actions.cache()
    val tmp = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$tmp/in"
    val storeDir = s"$tmp/store"
    val ckDir = s"$tmp/ck"
    // write the log as 3 chunk files into the stream source dir
    chunks(a, 3).zipWithIndex.foreach { case (c, i) =>
      c.coalesce(1).write.parquet(s"$inDir/chunk_$i")
    }
    val schema = a.schema
    // stream each chunk dir in order (file source picks up all; AvailableNow
    // drains in bounded micro-batches)
    val q = StreamingReplicator.streamFrom(
      spark, s"$inDir/chunk_*", storeDir, ckDir, schema)
    q.awaitTermination(120000)
    val got = Replicate.read(spark, s"$storeDir/current")
    assertStoreEquals(got, Replicate.compute(a))
    a.unpersist()
  }
}
