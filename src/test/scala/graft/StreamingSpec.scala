package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.ActionLog
import graft.streaming.StreamingAnalytics
import graft.streaming.StreamingAnalytics.Ev

/** Streaming/batch unification specs: the streaming plans produce the same
  * results as their batch equivalents when the stream is drained.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-streaming-test")
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

  test("watermarked windowed counts: stream-drain equals batch") {
    val ev = ActionLog.normalizedEvents(spark, sfDir).cache()
    val tmp = Files.createTempDirectory("graft-wc").toString
    ev.coalesce(2).write.parquet(s"$tmp/in")

    val stream = spark.readStream.schema(ev.schema).parquet(s"$tmp/in")
    val q = StreamingAnalytics
      .windowedCounts(stream)
      .writeStream
      .format("memory")
      .queryName("wc_stream")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // append-mode emits only windows sealed by the watermark; batch side
    // restricted to the same horizon
    val got = spark.table("wc_stream")
    val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
    val batch = StreamingAnalytics
      .windowedCounts(ev)
      .filter(
        col("w_start") + expr("INTERVAL 6 HOURS") + expr("INTERVAL 30 MINUTES")
          <= lit(maxTs)
      )
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() == 0)
    ev.unpersist()
  }

  test("stateful sessionization: streamed micro-batches equal batch pass") {
    val sp = spark
    import sp.implicits._
    val ev = ActionLog
      .normalizedEvents(spark, sfDir)
      .select("user_id", "event_id", "ts", "value")
      .as[Ev]
      .cache()

    val batch = StreamingAnalytics.sessionizeComplete(spark, ev)

    // run the stateful variant in one batch job (flatMapGroupsWithState on
    // a batch Dataset = single group pass); closed sessions must be a
    // prefix of the batch result, and re-adding the open sessions from
    // state is exactly the complete set — here we check the closed ones
    val closed = StreamingAnalytics.sessionizeStateful(spark, ev).toDF()
    assert(closed.count() > 0)
    assert(closed.exceptAll(batch).count() == 0)

    // and the complete pass matches the declarative window formulation
    // used by the oracle-checked w2_sessionize query
    val declarative = graft.analytics.Analytics
      .sessionize(spark, sfDir)
      .select(
        col("user_id"),
        col("session_id"),
        col("n_events"),
        col("duration_us")
      )
    val complete = batch.select("user_id", "session_id", "n_events", "duration_us")
    assert(complete.exceptAll(declarative).count() == 0)
    assert(declarative.exceptAll(complete).count() == 0)
    ev.unpersist()
  }

  test("stream-stream interval join: windowed candidates equal the batch join") {
    val sp = spark
    import sp.implicits._
    val ev = ActionLog.normalizedEvents(spark, sfDir).cache()
    val tmp = Files.createTempDirectory("graft-ssjoin").toString
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("p_ts")
      )
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user"),
        col("event_id").as("click_id"),
        col("ts").as("c_ts")
      )
    purchases.coalesce(2).write.parquet(s"$tmp/p")
    clicks.coalesce(2).write.parquet(s"$tmp/c")

    val q = StreamingAnalytics
      .attributionCandidates(
        spark.readStream.schema(purchases.schema).parquet(s"$tmp/p"),
        spark.readStream.schema(clicks.schema).parquet(s"$tmp/c")
      )
      .writeStream
      .format("memory")
      .queryName("attr_cand")
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("attr_cand")
    val want = StreamingAnalytics.attributionCandidates(purchases,
      clicks.toDF("c_user", "click_id", "c_ts"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    ev.unpersist()
  }

  test("streaming attribution over ordered chunks equals the batch as-of join") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamingAnalytics.AttrEv

    val evs = ActionLog
      .normalizedEvents(spark, sfDir)
      .select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("tsUs"),
        col("value").cast("double").as("value")
      )
      .as[AttrEv]
      .collect()
      .sortBy(_.tsUs)
    // event-time-ordered chunks: the stream's delivery contract
    val chunks = evs.grouped(math.max(evs.length / 4, 1)).toSeq

    val ms = MemoryStream[AttrEv]
    val q = StreamingAnalytics
      .attributionStateful(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("attr_stream")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      // click redelivery: replaying old clicks must produce no output and
      // never regress the state (monotone guard) — purchase redelivery is
      // the documented at-least-once edge, not replayed here (crash
      // recovery rolls state back with offsets, so batch replay is exact)
      ms.addData(chunks.last.filter(_.event_type == "click"))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark
      .table("attr_stream")
      .select(
        "user_id", "purchase_id", "purchase_us", "purchase_value",
        "click_id", "click_us", "lag_us"
      )
    val want = graft.analytics.Analytics.asofAttribution(spark, sfDir)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test(
    "watermarked as-of over DISORDERED chunks equals the batch as-of join"
  ) {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamingAsOf.AsofEv

    val evs = ActionLog
      .normalizedEvents(spark, sfDir)
      .select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        col("ts"),
        col("value").cast("double").as("value")
      )
      .as[AsofEv]
      .collect()
      .sortBy(e => e.ts.getTime)
    // chunk in global event-time order (so nothing falls below the
    // watermark), then SHUFFLE each chunk: within-batch disorder is the
    // case attributionStateful's order contract forbids and this
    // operator must absorb
    val rnd = new scala.util.Random(41)
    val chunks = evs
      .grouped(math.max(evs.length / 5, 1))
      .map(c => rnd.shuffle(c.toSeq))
      .toSeq
    val maxTs = evs.map(_.ts.getTime).max

    val ms = MemoryStream[AsofEv]
    val q = graft.streaming.StreamingAsOf
      .asofWatermarked(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("asof_wm")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      // sentinel rounds: push the watermark past every real purchase so
      // the final pendings flush (second round lets the advanced
      // watermark take effect in a batch)
      Seq(1L, 2L).foreach { k =>
        ms.addData(
          AsofEv(-1L, -k, "click",
            new java.sql.Timestamp(maxTs + k * 86400000L), 0.0)
        )
        q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark
      .table("asof_wm")
      .filter(col("user_id") =!= -1L)
      .select(
        "user_id", "purchase_id", "purchase_us", "purchase_value",
        "click_id", "click_us", "lag_us"
      )
    val want = graft.analytics.Analytics.asofAttribution(spark, sfDir)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    // LEFT-OUTER emission, explicitly: purchases with no click at-or-
    // before them are emitted with null click columns once the watermark
    // proves no match can arrive — the same rows the batch LEFT as-of
    // yields (the exceptAll pair above already implies it; this pins the
    // outer path non-vacuously)
    val gotOuter = got.filter(col("click_id").isNull).count()
    assert(gotOuter == want.filter(col("click_id").isNull).count())
    assert(gotOuter > 0,
      "fixture must exercise the outer path (some purchase precedes " +
        "every click of its user)")
  }

  private val horizonUs = 86400000000L // the w6 attribution horizon (24 h)
  private val binUs = 6L * 3600L * 1000000L

  private def tsOf(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L),
        Math.floorMod(us, 1000000L) * 1000L
      )
    )

  final case class Pt(c_user: Long, click_id: Long, c_ts: java.sql.Timestamp)
  final case class Iv(
      p_user: Long,
      purchase_id: Long,
      win_lo: java.sql.Timestamp,
      win_hi: java.sql.Timestamp
  )

  test("streaming range join over chunks equals the batch w6 binned join") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ev = ActionLog.normalizedEvents(spark, sfDir).cache()
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(
        col("user_id"),
        col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us")
      )
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        (unix_micros(col("ts")) - lit(horizonUs)).as("win_lo"),
        unix_micros(col("ts")).as("win_hi")
      )
    val pts = clicks
      .collect()
      .map(r => Pt(r.getLong(0), r.getLong(1), tsOf(r.getLong(2))))
      .sortBy(_.c_ts.getTime)
    val ivs = purchases
      .collect()
      .map(r => Iv(r.getLong(0), r.getLong(1), tsOf(r.getLong(2)), tsOf(r.getLong(3))))
      .sortBy(_.win_lo.getTime)
    val maxUs = (pts.map(p => p.c_ts.getTime * 1000L) ++
      ivs.map(i => i.win_hi.getTime * 1000L)).max
    val dayUs = 86400000000L
    // each side in ITS OWN event-time order (the per-partition delivery
    // contract, T4), cut into 4 chunks — the law is that the cut points
    // don't matter
    val pChunks = pts.grouped(math.max(pts.length / 4, 1)).toSeq
    val iChunks = ivs.grouped(math.max(ivs.length / 4, 1)).toSeq

    def runMode(mode: String): DataFrame = {
      val msP = MemoryStream[Pt]
      val msI = MemoryStream[Iv]
      val joined = graft.streaming.StreamingRangeJoin.streamJoinRange(
        msP.toDF().withColumnRenamed("c_user", "p_user_pt"),
        msI.toDF(),
        pointKey = Seq("p_user_pt"),
        intervalKey = Seq("p_user"),
        pointTime = "c_ts",
        lo = "win_lo",
        hi = "win_hi",
        maxSpan = "24 hours",
        watermark = "30 minutes",
        mode = mode
      )
      val q = joined.writeStream
        .format("memory")
        .queryName(s"srj_$mode")
        .outputMode("append")
        .start()
      try {
        pChunks.zipAll(iChunks, Array.empty[Pt], Array.empty[Iv]).foreach {
          case (pc, ic) =>
            msP.addData(pc.toSeq)
            msI.addData(ic.toSeq)
            q.processAllAvailable()
        }
        // two sentinel rounds push the watermark past every real row so
        // left-outer's provably-unmatched nulls flush (the second round
        // makes the advanced watermark take effect in a batch)
        Seq(1L, 2L).foreach { k =>
          msP.addData(Pt(-1L, -k, tsOf(maxUs + k * dayUs)))
          msI.addData(
            Iv(-1L, -k, tsOf(maxUs + k * dayUs), tsOf(maxUs + k * dayUs + 1000L))
          )
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(s"srj_$mode").filter(col("p_user_pt") =!= -1L)
    }

    // INNER ≡ the oracle-checked w6 plan (binned batch range join)
    val gotInner = runMode("inner").select(
      col("p_user_pt").as("user_id"),
      col("purchase_id"),
      col("click_id"),
      unix_micros(col("c_ts")).as("click_us"),
      (unix_micros(col("win_hi")) - unix_micros(col("c_ts"))).as("lag_us")
    )
    val wantInner = graft.analytics.Analytics
      .intervalCandidates(spark, sfDir)
      .select("user_id", "purchase_id", "click_id", "click_us", "lag_us")
    assert(gotInner.count() > 0)
    assert(gotInner.exceptAll(wantInner).count() == 0)
    assert(wantInner.exceptAll(gotInner).count() == 0)

    // LEFTOUTER ≡ batch leftouter joinRange: every click exactly once per
    // match, or once with null purchase columns
    val gotOuter = runMode("leftouter").select(
      col("p_user_pt").as("user_id"),
      col("click_id"),
      col("purchase_id")
    )
    val wantOuter = graft.analytics.RangeJoin
      .joinRange(
        clicks,
        purchases,
        Seq("user_id"),
        pointTime = "click_us",
        lo = "win_lo",
        hi = "win_hi",
        binWidth = binUs,
        mode = "leftouter"
      )
      .select("user_id", "click_id", "purchase_id")
    assert(gotOuter.exceptAll(wantOuter).count() == 0)
    assert(wantOuter.exceptAll(gotOuter).count() == 0)

    // LEFTSEMI ≡ the distinct matched points of the inner form (the
    // in-flight decontamination gate)
    val gotSemi = runMode("leftsemi")
      .select(col("p_user_pt").as("user_id"), col("click_id"))
    val wantSemi = wantInner.select("user_id", "click_id").distinct()
    assert(gotSemi.exceptAll(wantSemi).count() == 0)
    assert(wantSemi.exceptAll(gotSemi).count() == 0)
    ev.unpersist()
  }

  test("streaming funnel over ordered chunks equals the batch w9 funnel") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.StreamingAnalytics.FunnelEv

    val evs = ActionLog
      .normalizedEvents(spark, sfDir)
      .select(
        col("user_id"),
        col("event_id"),
        col("event_type"),
        unix_micros(col("ts")).as("tsUs")
      )
      .as[FunnelEv]
      .collect()
      .sortBy(_.tsUs)
    val chunks = evs.grouped(math.max(evs.length / 4, 1)).toSeq

    val ms = MemoryStream[FunnelEv]
    val q = StreamingAnalytics
      .funnelStateful(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("funnel_stream")
      .outputMode("append")
      .start()
    try
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()

    // stage-advance emissions: at most one row per (user, stage),
    // monotone stages; reconstructed per-user stage timestamps equal
    // the batch funnel exactly
    val rows = spark
      .table("funnel_stream")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.groupBy(t => (t._1, t._2)).values.forall(_.length == 1))
    val got = rows
      .groupBy(_._1)
      .map { case (u, xs) =>
        val m = xs.map(t => t._2 -> t._3).toMap
        u -> (m.get(1L), m.get(2L), m.get(3L), m.keys.maxOption.getOrElse(0L))
      }
    val want = graft.analytics.Analytics
      .funnel(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4)))
      .filter(_._2._4 > 0L) // stage-0 users emit nothing on the stream
      .toMap
    assert(got == want)
  }

  test("w10 streaming twin: chunked retention increments fold to the batch cohort report") {
    import graft.streaming.StreamingAnalytics.RetEv
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ss = spark
    import ss.implicits._
    val evs = ActionLog
      .normalizedEvents(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs"))
      .as[RetEv]
      .collect()
      .sortBy(_.tsUs)
    val chunks = evs.grouped(math.max(evs.length / 4, 1)).toSeq

    val ms = MemoryStream[RetEv]
    val q = StreamingAnalytics
      .retentionStateful(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("retention_stream")
      .outputMode("append")
      .start()
    try
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()

    val incs = spark.table("retention_stream")
    // each (user, week) emits exactly once across all chunks
    assert(
      incs.groupBy("user_id", "cohort_week", "week_offset").count()
        .filter(col("count") > 1).count() == 0
    )
    val got = StreamingAnalytics
      .retentionFromIncrements(incs)
      .collect()
      .map(_.mkString("|"))
      .toSeq
    val want = graft.analytics.Analytics
      .retentionCohorts(spark, sfDir)
      .collect()
      .map(_.mkString("|"))
      .toSeq
    assert(got == want)
  }
}
