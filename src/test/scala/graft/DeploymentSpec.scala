package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{JournalOps, Replay, Replicate, Snapshots}
import graft.model.ActionLog
import graft.streaming.{Deployment, StreamingSnapshots}

/** The ONE-deployment integration law: a single action stream wired
  * through replicator + head cache (watermark from the replicator's own
  * pointer2) + snapshot maintenance + store maintenance — the reference's
  * Replicator.make composition — must, after N chunk ticks, satisfy every
  * loop's own law AT ONCE from the one wiring:
  *
  *   - replay ≡ whole-log (the replicated store is exact);
  *   - cache ≡ fold (the maintained heads equal the whole-log A1 fold at
  *     the cache's replication-lagged watermark), and the GATED replay
  *     through those heads is row-identical to the ungated read;
  *   - snapshots bound debt (no journal's replay suffix exceeds the
  *     threshold against the maintained snapshot store);
  *   - healthAll clears (the tick's maintainAll keeps every registry
  *     store below its debt threshold).
  */
class DeploymentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-deployment-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def assertSame(got: DataFrame, want: DataFrame, clue: String): Unit = {
    assert(got.exceptAll(want).count() == 0, s"$clue: extra rows")
    assert(want.exceptAll(got).count() == 0, s"$clue: missing rows")
  }

  test("one wiring drives all four loops: replay exact, cache ≡ fold + gated read identical, debt bounded, health clear") {
    val a = ActionLog.fromEvents(spark, sfDir).cache()
    val n = 4
    val threshold = 10L
    // PER-PARTITION proportional chunks (offset-ordered): every partition
    // replicates at the same fractional pace, so the cache's final
    // watermark sits at ~3/4 of every partition — strictly below the
    // read's 0.8 staleness bound, the gate law's precondition
    val bounds = a
      .groupBy("topic", "part_no")
      .agg((max("koffset") + 1L).as("cnt"))
    def chunk(i: Int): DataFrame =
      a.join(broadcast(bounds), Seq("topic", "part_no"))
        .filter(
          col("koffset") >= expr(s"(cnt * $i) DIV $n") &&
            col("koffset") < expr(s"(cnt * ${i + 1}) DIV $n")
        )
        .drop("cnt")

    val tmp = Files.createTempDirectory("graft-deploy").toString
    val inDir = s"$tmp/in"
    val dep = Deployment(
      s"$tmp/dep",
      snapshotThreshold = threshold,
      compactOverLayers = 2L
    )
    val schema = a.schema
    val healths = (0 until n).map { i =>
      chunk(i).coalesce(1).write.parquet(s"$inDir/chunk_$i")
      dep.tick(spark, s"$inDir/chunk_*", schema)
    }

    // 1. replay ≡ whole-log: the replicated store is the batch derivation
    val store = dep.readStore(spark)
    val want = Replicate.compute(a)
    def aligned(df: DataFrame, ref: DataFrame): DataFrame =
      df.select(ref.columns.sorted.map(col).toIndexedSeq: _*)
    assertSame(
      aligned(store.journal, want.journal),
      aligned(want.journal, want.journal),
      "journal"
    )
    assertSame(
      aligned(store.pointer2, want.pointer2),
      aligned(want.pointer2, want.pointer2),
      "pointer2"
    )

    // 2a. cache ≡ fold: the maintained heads equal the whole-log A1 fold
    // at the cache's watermark — pointer2 as of the LAST head batch,
    // i.e. after n-1 chunks (the cache fronts replication by one tick)
    val prefixWm = JournalOps
      .pointer2(
        a.join(broadcast(bounds), Seq("topic", "part_no"))
          .filter(col("koffset") < expr(s"(cnt * ${n - 1}) DIV $n"))
      )
      .select(col("topic"), col("part_no"), (col("next_offset") - 1L).as("wm"))
    val headCols = Seq("topic", "id", "kind", "head_offset", "head_seq_nr")
    assertSame(
      dep.readHeads(spark).select(headCols.map(col): _*),
      JournalOps.headInfo(a, prefixWm).select(headCols.map(col): _*),
      "cache vs whole-log fold"
    )

    // 2b. the gated read through the maintained cache is row-identical
    val outCols = Seq("topic", "id", "seq_nr", "koffset", "payload")
    assertSame(
      Replay.mergedReadGated(a, dep.readHeads(spark)).select(outCols.map(col): _*),
      Replay.mergedRead(a).select(outCols.map(col): _*),
      "gated replay"
    )

    // 2c. the CLIENT surface over the deployment's cache: readCached ≡
    // read for both an evicted journal (served wholly by the eventual
    // leg at the cache's watermark) and a cached one
    val journal = graft.api.Journal(spark, a)
    val headKeys = dep
      .readHeads(spark)
      .select("topic", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val allIds = JournalOps
      .ids(a)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    val apiProbes =
      allIds.filterNot(headKeys.contains).take(2) ++ headKeys.take(2)
    assert(apiProbes.nonEmpty)
    apiProbes.foreach { case (t, i) =>
      val got = journal
        .readCached(t, i, dep.headDir)
        .select("seq_nr")
        .collect()
        .map(_.getLong(0))
        .sorted
        .toSeq
      val ref = journal
        .read(t, i)
        .select("seq_nr")
        .collect()
        .map(_.getLong(0))
        .sorted
        .toSeq
      assert(got == ref, s"readCached ≡ read over the deployment cache ($t, $i)")
    }

    // 3. snapshots bound debt: nobody's replay suffix exceeds threshold
    val stored = dep.storedSnapshots(spark)
    assert(stored.count() > 0, "the snapshot loop must have fired")
    assert(
      Snapshots
        .snapshotDebt(a, stored, threshold)
        .filter(col("snapshot_recommended"))
        .count() == 0,
      "debt bounded by the maintenance loop"
    )
    // and recovery through the maintained store replays exactly
    val rec = Snapshots.recoveryWith(
      a,
      stored.select("topic", "id", "seq_nr", "koffset", "payload")
    )
    assert(rec.count() > 0)
    // 3b. the FULL client recovery over the deployment's OWN stores —
    // snapshot floor from its snapshot loop + cache-gated tail from its
    // head loop (recoverCached composes both accelerators; both laws
    // must hold simultaneously from this one wiring)
    def recRows(df: DataFrame): Seq[(String, Long)] =
      df.select("src", "seq_nr")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy(t => (t._1, t._2))
        .toSeq
    apiProbes.foreach { case (t, i) =>
      assert(
        recRows(journal.recoverCached(t, i, stored, dep.headDir)) ==
          recRows(journal.recoverThrough(stored, t, i)),
        s"recoverCached ≡ recoverThrough over the deployment stores ($t, $i)"
      )
    }

    // 4. the tick's maintainAll kept the stores maintained: the final
    // health report recommends nothing, and at least one tick compacted
    val lastHealth = graft.Maintenance.healthAll(spark, dep.registry).collect()
    assert(lastHealth.nonEmpty)
    assert(
      lastHealth.forall(!_.getAs[Boolean]("compact_recommended")),
      s"health must be clear after the final tick: ${lastHealth.mkString("; ")}"
    )
    assert(
      healths.exists(_.collect().exists(_.getAs[Boolean]("compacted"))),
      "the composition must have driven at least one compaction"
    )

    a.unpersist(false)
  }
}
