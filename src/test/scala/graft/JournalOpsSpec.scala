package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{ActionRow, HeadInfo, JournalOps, Replay}
import graft.model.ActionLog

/** Spark-level invariants of the journal operators over the sf0.001
  * testdata. The byte-exact oracle is the driver's DuckDB gate
  * (scripts/localverify.py locally); these specs pin the *relational
  * identities* between operators instead.
  */
class JournalOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // the driver testdata stores naive (isAdjustedToUTC=false) micros;
      // read them as TIMESTAMP so epoch extraction matches the DuckDB oracle
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def actions = ActionLog.fromEvents(spark, sfDir)

  test("action log is a deterministic derivation with dense offsets") {
    val a = actions.cache()
    assert(a.count() == 1000)
    // koffset dense per (topic, part_no)
    import org.apache.spark.sql.functions._
    val bad = a
      .groupBy("topic", "part_no")
      .agg(max("koffset").as("mx"), count(lit(1)).as("cnt"))
      .filter(col("mx") =!= col("cnt") - 1)
      .count()
    assert(bad == 0)
    // appends carry seq_nr; others don't
    assert(a.filter("action = 'append' AND seq_nr IS NULL").count() == 0)
    assert(a.filter("action <> 'append' AND seq_nr IS NOT NULL").count() == 0)
    assert(a.filter("action = 'delete' AND delete_to IS NULL").count() == 0)
    a.unpersist()
  }

  test("expiry merge: UpdateExpiry sets, DeleteExpiry clears (C3)") {
    val sp = spark
    import sp.implicits._
    // one journal, three appends: set 10 days -> set 20 days -> clear
    def row(k: Long, seq: Long, meta: String) =
      ("t1", 0, k, "x", "append",
        java.sql.Timestamp.valueOf(s"2024-01-0${k + 1} 00:00:00"),
        Some(seq), Option.empty[Long], Some(1.0), meta, "o", "1.0.0")
    def log(rows: Seq[(String, Int, Long, String, String,
        java.sql.Timestamp, Option[Long], Option[Long], Option[Double],
        String, String, String)]) =
      rows.toDF("topic", "part_no", "koffset", "id", "action", "ts",
        "seq_nr", "delete_to", "payload", "metadata", "origin", "version")

    val set = log(Seq(
      row(0, 1, """{"expireAfter":"10 days"}"""),
      row(1, 2, """{"expireAfter":"20 days"}""")
    ))
    val m1 = JournalOps.metajournal(set)
      .select("expire_after_days", "expire_on").head()
    // the LAST append wins, counting from ITS timestamp (2024-01-02 + 20)
    assert(m1.getInt(0) == 20)
    assert(m1.getDate(1).toString == "2024-01-22")

    val cleared = log(Seq(
      row(0, 1, """{"expireAfter":"10 days"}"""),
      row(1, 2, """{"expireAfter":"20 days"}"""),
      row(2, 3, "{}") // DeleteExpiry: no expireAfter in the last append
    ))
    val m2 = JournalOps.metajournal(cleared)
      .select("expire_after_days", "expire_on").head()
    assert(m2.isNullAt(0) && m2.isNullAt(1))
  }

  test("F5 strict mode raises on duplicate seq_nr in the replicated prefix") {
    val sp = spark
    import sp.implicits._
    // koffsets 0..3 all land below the 0.8 watermark cut except the max —
    // the duplicate pair (seq_nr 2 at koffsets 1 and 2) is in the
    // replicated prefix, which is corruption, not redelivery
    val dup = Seq(
      ("t1", 0, 0L, "x", "append", ts("2024-01-01"), Some(1L),
        Option.empty[Long], Some(1.0)),
      ("t1", 0, 1L, "x", "append", ts("2024-01-02"), Some(2L),
        Option.empty[Long], Some(2.0)),
      ("t1", 0, 2L, "x", "append", ts("2024-01-03"), Some(2L),
        Option.empty[Long], Some(2.5)),
      ("t1", 0, 3L, "x", "append", ts("2024-01-04"), Some(3L),
        Option.empty[Long], Some(3.0)),
      ("t1", 0, 4L, "x", "append", ts("2024-01-05"), Some(4L),
        Option.empty[Long], Some(4.0))
    ).toDF("topic", "part_no", "koffset", "id", "action", "ts",
      "seq_nr", "delete_to", "payload")

    // lax mode: silently dedups — first-offset copy wins (F4)
    val lax = Replay.mergedRead(dup).collect()
    assert(lax.count(_.getLong(2) == 2L) == 1)

    // strict mode: the duplicate raises the integrity error
    val err = intercept[Exception] {
      Replay.mergedRead(dup, strictUniqueness = true).collect()
    }
    def rootMessages(t: Throwable): List[String] =
      if (t == null) Nil
      else Option(t.getMessage).toList ++ rootMessages(t.getCause)
    assert(rootMessages(err).exists(_.contains("Data integrity violated")))
  }

  private def ts(d: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(s"$d 00:00:00")

  test("merged two-source read equals whole-log replay (J1 identity)") {
    val whole = JournalOps.journalScan(actions)
    // mergedRead additionally carries the typed-payload/envelope columns;
    // the identity is over the replay contract columns
    val merged = Replay
      .mergedRead(actions)
      .select("topic", "id", "seq_nr", "koffset", "ts", "payload")
    assert(merged.exceptAll(whole).count() == 0)
    assert(whole.exceptAll(merged).count() == 0)
  }

  test("duplicated-delivery replay equals clean replay (F4 dedup)") {
    val clean = JournalOps
      .journalScan(actions)
      .select("topic", "id", "seq_nr", "koffset", "payload")
    val deduped = Replay.dedupReplay(actions)
    assert(deduped.exceptAll(clean).count() == 0)
    assert(clean.exceptAll(deduped).count() == 0)
  }

  test("snapshot recovery equals snapshot plus the replay suffix, per journal") {
    val a = actions.cache()
    // independent in-memory reconstruction from the FULL replay: the
    // latest snapshot is the highest surviving seq_nr % 10 == 0 event;
    // recovery must be that row (src=snapshot) + the strict suffix
    val replay = Replay
      .mergedRead(a)
      .select("topic", "id", "seq_nr", "koffset", "payload")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    val expect = replay
      .groupBy(t => (t._1, t._2))
      .toSeq
      .flatMap { case ((topic, id), evs) =>
        val sorted = evs.sortBy(_._3)
        val snapSeq = sorted.map(_._3).filter(_ % 10 == 0).maxOption
        snapSeq match {
          case None =>
            sorted.map(e => (topic, id, "event", e._3, e._4, e._5))
          case Some(s) =>
            val sn = sorted.find(_._3 == s).get
            (topic, id, "snapshot", sn._3, sn._4, sn._5) +:
              sorted.filter(_._3 > s).map(e => (topic, id, "event", e._3, e._4, e._5))
        }
      }
      .sortBy(t => (t._1, t._2, t._4))
    val got = graft.journal.Snapshots
      .recovery(a)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toSeq
    assert(got.nonEmpty)
    assert(got.count(_._3 == "snapshot") > 0)
    assert(got == expect)
    a.unpersist(false)
  }

  test("api recover: one-journal recovery; no-snapshot journals recover as full read") {
    val a = actions.cache()
    val journal = graft.api.Journal(spark, a)
    // a journal WITH a snapshot: its recover must equal the all-journal
    // recovery filtered to the key
    val snapped = graft.journal.Snapshots
      .recovery(a)
      .filter(org.apache.spark.sql.functions.col("src") === "snapshot")
      .select("topic", "id")
      .head()
    val (t0, i0) = (snapped.getString(0), snapped.getString(1))
    val one = journal
      .recover(t0, i0)
      .collect()
      .map(r => (r.getString(2), r.getLong(3)))
      .toSeq
    val whole = graft.journal.Snapshots
      .recovery(a)
      .filter(
        org.apache.spark.sql.functions.col("topic") === t0 &&
          org.apache.spark.sql.functions.col("id") === i0
      )
      .collect()
      .map(r => (r.getString(2), r.getLong(3)))
      .toSeq
    assert(one == whole)
    assert(one.head._1 == "snapshot")
    // recovery reads strictly less than the full read when snapshotted
    val full = journal.read(t0, i0).count()
    assert(one.size.toLong <= full)
    a.unpersist(false)
  }

  test("api recoverThrough: recovery via the MAINTAINED snapshot store, suffix bounded by the loop's threshold") {
    import org.apache.spark.sql.functions._
    val a = actions.cache()
    val journal = graft.api.Journal(spark, a)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-api-recover")
      .toString
    val threshold = 5L
    graft.streaming.StreamingSnapshots
      .appendMaintenanceBatch(spark, a, tmp, threshold, layer = 1L)
    val stored =
      graft.streaming.StreamingSnapshots.storedSnapshots(spark, tmp).cache()
    assert(stored.count() > 0)
    val probe = stored.select("topic", "id").head()
    val (t0, i0) = (probe.getString(0), probe.getString(1))
    val rec = journal.recoverThrough(stored, t0, i0).collect()
    assert(rec.head.getString(2) == "snapshot")
    // the event suffix is exactly the read above the stored snapshot,
    // and its length respects the maintenance loop's debt bound
    val snapSeq = rec.head.getLong(3)
    val suffix = rec.filter(_.getString(2) == "event").map(_.getLong(3)).toSeq
    val want = journal
      .read(t0, i0)
      .filter(col("seq_nr") > snapSeq)
      .collect()
      .map(_.getAs[Long]("seq_nr"))
      .toSeq
    assert(suffix == want)
    assert(suffix.size <= threshold)
    stored.unpersist(false)
    a.unpersist(false)
  }

  test("api recoverCached: snapshot floor + cache-gated tail composed equals recoverThrough, incl. the evicted path") {
    import org.apache.spark.sql.functions._
    val a = actions.cache()
    val journal = graft.api.Journal(spark, a)
    // the maintained snapshot store (the recoverThrough fixture)
    val snapDir = java.nio.file.Files
      .createTempDirectory("graft-api-reccached-snaps")
      .toString
    graft.streaming.StreamingSnapshots
      .appendMaintenanceBatch(spark, a, snapDir, threshold = 5L, layer = 1L)
    val stored = graft.streaming.StreamingSnapshots
      .storedSnapshots(spark, snapDir)
      .cache()
    assert(stored.count() > 0)
    // the maintained head cache at a HOT 3/4-style watermark, so most
    // journals are EVICTED (the path the round-12 vacuity lesson demands
    // be probed, not assumed): their event leg must come entirely from
    // the eventual side of the gated read
    val cacheDir = java.nio.file.Files
      .createTempDirectory("graft-api-reccached-head")
      .toString
    val wmHot = a
      .groupBy("topic", "part_no")
      .agg((max("koffset") - 2L).as("wm"))
    graft.streaming.StreamingHeadCache.appendBatch(spark, a, cacheDir, wmHot, 1L)
    val cached = graft.streaming.StreamingHeadCache
      .readHeads(spark, cacheDir)
      .select("topic", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val snappedKeys = stored
      .select("topic", "id")
      .distinct()
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    val allKeys = JournalOps
      .ids(a)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    // probe matrix: {evicted, still-cached} × {snapshotted, bare}
    val evictedSnapped = snappedKeys.filterNot(cached.contains).take(3)
    val cachedSnapped = snappedKeys.filter(cached.contains).take(3)
    // the maintenance threshold snapshots every journal of this fixture,
    // so the no-snapshot path is probed with a log-absent key (both
    // surfaces must agree on empty) alongside any bare journal that exists
    val someTopic = a.select("topic").head().getString(0)
    val bare = allKeys.filterNot(snappedKeys.toSet.contains).take(3) :+
      ((someTopic, "no-such-journal"))
    assert(evictedSnapped.nonEmpty, "need an evicted snapshotted journal")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.select("src", "seq_nr")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .sortBy(t => (t._1, t._2))
        .toSeq
    (evictedSnapped ++ cachedSnapped ++ bare).foreach { case (t, i) =>
      assert(
        rows(journal.recoverCached(t, i, stored, cacheDir)) ==
          rows(journal.recoverThrough(stored, t, i)),
        s"recoverCached ≡ recoverThrough for ($t, $i)"
      )
    }
    // non-vacuous: the evicted snapshotted probe actually exercises BOTH
    // accelerators — a snapshot row leads, and an event suffix follows
    evictedSnapped.headOption.foreach { case (t, i) =>
      val r = rows(journal.recoverCached(t, i, stored, cacheDir))
      assert(r.exists(_._1 == "snapshot"), s"($t,$i) must recover via snapshot")
    }
    stored.unpersist(false)
    a.unpersist(false)
  }

  test("api readCached/pointerCached: the client consults the maintained head cache; identical to the ungated surface") {
    import org.apache.spark.sql.functions._
    val a = actions.cache()
    val journal = graft.api.Journal(spark, a)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-api-headcache")
      .toString
    // maintain the cache over the chunked log at the read's own watermark
    // (the j1b/t6b lifecycle shape)
    val wm = JournalOps.defaultWatermark(a)
    val maxOff = a.agg(max("koffset")).head().getLong(0)
    val nChunks = 4
    val step = maxOff / nChunks + 1
    (0 until nChunks).foreach { i =>
      val chunk = a.filter(
        col("koffset") >= i * step && col("koffset") < (i + 1) * step
      )
      graft.streaming.StreamingHeadCache
        .appendBatch(spark, chunk, tmp, wm, layer = i + 1L)
    }
    val heads =
      graft.streaming.StreamingHeadCache.readHeads(spark, tmp).cache()
    def keyOf(kind: String): Option[(String, String)] =
      heads
        .filter(col("kind") === kind)
        .select("topic", "id")
        .collect()
        .headOption
        .map(r => (r.getString(0), r.getString(1)))
    assert(keyOf("append").nonEmpty, "fixture must have an append head")
    // one probe per cached head kind, plus one journal ABSENT from the
    // cache (fully replicated — the fallback path)
    val cachedKeys = heads
      .select("topic", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val absent = JournalOps
      .ids(a)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .find(!cachedKeys.contains(_))
    val someTopic = a.select("topic").head().getString(0)
    val probes =
      Seq("append", "delete", "purge", "empty").flatMap(keyOf(_)) ++
        absent ++ // a fully-replicated journal, when the fixture has one
        Seq((someTopic, "no-such-journal")) // cache-absent, log-absent
    def seqs(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("seq_nr").collect().map(_.getLong(0)).sorted.toSeq
    probes.foreach { case (t, i) =>
      assert(
        seqs(journal.readCached(t, i, tmp)) == seqs(journal.read(t, i)),
        s"readCached ≡ read for ($t, $i)"
      )
      assert(
        seqs(journal.pointerCached(t, i, tmp)) == seqs(journal.pointer(t, i)),
        s"pointerCached ≡ pointer for ($t, $i)"
      )
    }
    // the append fast path answers from the CACHE row itself
    keyOf("append").foreach { case (t, i) =>
      val fromCache = heads
        .filter(col("topic") === t && col("id") === i)
        .head()
        .getAs[Long]("head_seq_nr")
      assert(journal.pointerCached(t, i, tmp).head().getLong(0) == fromCache)
    }
    heads.unpersist(false)

    // the EVICTED-journal path, non-vacuously (the round-12 review bug:
    // a boundary below the cache's watermark silently dropped an evicted
    // journal's rows between the marks): a cache maintained at a 3/4
    // watermark evicts every journal fully replicated by then — their
    // reads must be served completely by the eventual leg
    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft-api-headcache-evict")
      .toString
    val wmHot = a
      .groupBy("topic", "part_no")
      // nearly caught up: only each partition's last three offsets remain
      // unreplicated, so almost every journal is evicted while the cache
      // (and its entries member) stays non-empty
      .agg((max("koffset") - 2L).as("wm"))
    graft.streaming.StreamingHeadCache.appendBatch(spark, a, tmp2, wmHot, 1L)
    val heads2 =
      graft.streaming.StreamingHeadCache.readHeads(spark, tmp2).cache()
    val cached2 = heads2
      .select("topic", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    val evicted = JournalOps
      .ids(a)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filterNot(cached2.contains)
      .take(5)
      .toSeq
    assert(evicted.nonEmpty, "the 3/4 watermark must evict some journals")
    val stillCached = cached2.take(3).toSeq
    (evicted ++ stillCached).foreach { case (t, i) =>
      assert(
        seqs(journal.readCached(t, i, tmp2)) == seqs(journal.read(t, i)),
        s"readCached ≡ read for ($t, $i) under the 3/4-watermark cache"
      )
      assert(
        seqs(journal.pointerCached(t, i, tmp2)) == seqs(journal.pointer(t, i)),
        s"pointerCached ≡ pointer for ($t, $i) under the 3/4-watermark cache"
      )
    }
    heads2.unpersist(false)
    a.unpersist(false)
  }

  test("api readCached under a STALE cache: appends past the consumed end_offset are enforced into the read, not lost") {
    import org.apache.spark.sql.functions._
    val a = actions.cache()
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-api-headcache-stale")
      .toString
    // the cache drains the full log at a hot watermark (evicting almost
    // every journal), then the LOG GROWS: appends land after the drain,
    // at offsets the cache never consumed — the between-ticks window the
    // round-12 advice flagged
    val wmHot = a
      .groupBy("topic", "part_no")
      .agg((max("koffset") - 2L).as("wm"))
    graft.streaming.StreamingHeadCache.appendBatch(spark, a, tmp, wmHot, 1L)
    val cached = graft.streaming.StreamingHeadCache
      .readHeads(spark, tmp)
      .select("topic", "id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    // an EVICTED journal (absent from the cache): under the unenforced
    // gate its tail would be skipped entirely
    val (t0, i0) = a
      .filter(col("action") === "append")
      .select("topic", "id")
      .distinct()
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .find(!cached.contains(_))
      .get
    val pn = a
      .filter(col("topic") === t0 && col("id") === i0)
      .select("part_no")
      .head()
      .getInt(0)
    val partMax = a
      .filter(col("topic") === t0 && col("part_no") === pn)
      .agg(max("koffset"))
      .head()
      .getLong(0)
    val maxSeq = a
      .filter(
        col("topic") === t0 && col("id") === i0 && col("action") === "append"
      )
      .agg(max("seq_nr"))
      .head()
      .getLong(0)
    val lastRow = a
      .filter(
        col("topic") === t0 && col("id") === i0 && col("action") === "append"
      )
      .orderBy(col("koffset").desc)
      .limit(1)
      .cache()
    val extra = (1 to 3)
      .map(k =>
        lastRow
          .withColumn("koffset", lit(partMax + k))
          .withColumn("seq_nr", lit(maxSeq + k))
      )
      .reduce(_.unionByName(_))
    val log2 = a.unionByName(extra)
    val j2 = graft.api.Journal(spark, log2)
    def seqs(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("seq_nr").collect().map(_.getLong(0)).sorted.toSeq
    // non-vacuity: the new rows really sit at/past the cache's consumed
    // end offset for this partition
    val endOff = graft.streaming.StreamingHeadCache
      .watermark(spark, tmp)
      .filter(col("topic") === t0 && col("part_no") === pn)
      .select("end_offset")
      .head()
      .getLong(0)
    assert(partMax + 1 >= endOff, "fixture must place the appends past end_offset")
    // the enforced gate: readCached ≡ read, fresh rows included
    val got = seqs(j2.readCached(t0, i0, tmp))
    assert(got == seqs(j2.read(t0, i0)))
    assert(
      (1 to 3).forall(k => got.contains(maxSeq + k)),
      "the stale journal's fresh appends must survive the gated read"
    )
    // the documented failure mode at a deliberately violated bound: a
    // wm-ONLY frame (no end_offset — staleness unenforceable) trusts the
    // stale cache and DROPS the fresh rows; this is what the enforcement
    // closes, asserted rather than assumed
    val wmOnly = graft.streaming.StreamingHeadCache
      .watermark(spark, tmp)
      .select("topic", "part_no", "wm")
    val keyed = log2.filter(col("topic") === t0 && col("id") === i0)
    val headsKeyed = graft.streaming.StreamingHeadCache
      .readHeads(spark, tmp)
      .filter(col("topic") === t0 && col("id") === i0)
    val unenforced =
      seqs(graft.journal.Replay.mergedReadAtWatermark(keyed, headsKeyed, wmOnly))
    assert(
      !unenforced.contains(maxSeq + 1),
      "without end_offset the violated bound loses rows — the mode the enforcement exists for"
    )
    lastRow.unpersist(false)
    a.unpersist(false)
  }

  test("pointer equals max seq_nr of the journal scan where one exists") {
    import org.apache.spark.sql.functions._
    val fromScan = JournalOps
      .journalScan(actions)
      .groupBy("topic", "id")
      .agg(max("seq_nr").as("seq_nr"))
    // pointer also covers journals whose survivors were all deleted but not
    // purged (delete does not reset the pointer) — so scan-derived pointers
    // are a subset
    val ptr = JournalOps.pointer(actions)
    assert(fromScan.exceptAll(ptr).count() == 0)
  }

  test("metajournal seq_nr >= pointer's and >= delete_to (widening)") {
    import org.apache.spark.sql.functions._
    val meta = JournalOps.metajournal(actions)
    assert(
      meta.filter(col("delete_to") > col("seq_nr")).count() == 0
    )
    val joined = JournalOps
      .pointer(actions)
      .withColumnRenamed("seq_nr", "ptr")
      .join(meta, Seq("topic", "id"))
    assert(joined.filter(col("ptr") > col("seq_nr")).count() == 0)
  }

  test("aggregate-join annotate equals window annotate") {
    val a = actions.cache()
    val cols = Seq("topic", "id", "koffset", "action", "lp", "dt",
      "after_purge").map(org.apache.spark.sql.functions.col)
    val viaWindow = JournalOps.annotate(a).select(cols: _*)
    val viaAgg = JournalOps.annotateAgg(a).select(cols: _*)
    assert(viaWindow.exceptAll(viaAgg).count() == 0)
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
    a.unpersist()
  }

  test("salted chunked HeadInfo fold equals the sequential fold") {
    implicit val enc: org.apache.spark.sql.Encoder[ActionRow] =
      org.apache.spark.sql.Encoders.product[ActionRow]
    import org.apache.spark.sql.functions._
    val rows = actions
      .select(
        col("topic"), col("part_no"), col("koffset"), col("id"),
        col("action"),
        coalesce(col("seq_nr"), lit(0L)).as("seqNr"),
        coalesce(col("delete_to"), lit(0L)).as("deleteTo")
      )
      .as[ActionRow]
    val seq = HeadInfo.perJournal(spark, rows).toDF()
    // tiny chunks force purge/append boundaries across chunks
    val salted = HeadInfo.perJournalSalted(spark, rows, chunkSize = 8L).toDF()
    assert(salted.exceptAll(seq).count() == 0)
    assert(seq.exceptAll(salted).count() == 0)
  }

  test("typed HeadInfo fold agrees with the declarative window formulation") {
    implicit val enc: org.apache.spark.sql.Encoder[ActionRow] =
      org.apache.spark.sql.Encoders.product[ActionRow]
    import org.apache.spark.sql.functions._
    val a = actions
    val wm = JournalOps.defaultWatermark(a)
    val declarative = JournalOps
      .headInfo(a, wm)
      .select("topic", "id", "kind", "head_offset", "head_seq_nr")

    val tailRows = a
      .join(wm, Seq("topic", "part_no"))
      .filter(col("koffset") > col("wm"))
      .select(
        col("topic"),
        col("part_no"),
        col("koffset"),
        col("id"),
        col("action"),
        coalesce(col("seq_nr"), lit(0L)).as("seqNr"),
        coalesce(col("delete_to"), lit(0L)).as("deleteTo")
      )
      .as[ActionRow]
    val typed = HeadInfo
      .perJournal(spark, tailRows)
      .toDF()
      .select(
        col("topic"),
        col("id"),
        col("kind"),
        col("offset").as("head_offset"),
        col("seqNr").as("head_seq_nr")
      )
    assert(typed.exceptAll(declarative).count() == 0)
    assert(declarative.exceptAll(typed).count() == 0)
  }
}
