package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming analytics over the event stream: the
  * readStream → transform → writeStream plane with event-time semantics.
  *
  *   - [[windowedCounts]]: tumbling event-time windows + watermark — late
  *     data beyond the watermark is dropped, state is bounded by
  *     (watermark horizon / window) per key.
  *   - [[sessionizeStateful]]: gap-based sessions via
  *     `flatMapGroupsWithState` with an event-time timeout — the custom
  *     per-key state machine the reference keeps in its Replicator caches
  *     (CacheOf.scala), expressed as Spark-managed state.
  *
  * Both are verified against their batch equivalents in StreamingSpec —
  * the streaming/batch unification that makes the engine's semantics
  * trigger-independent.
  */
object StreamingAnalytics {

  /** Tumbling windowed counts with watermark; works on a streaming OR batch
    * DataFrame (same plan — Spark unifies them).
    */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "6 hours",
      watermark: String = "30 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total")
      )
      .select(
        col("window.start").as("w_start"),
        col("event_type"),
        col("n"),
        col("total")
      )

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(
      sessionId: Long,
      lastTsUs: Long,
      n: Long,
      startUs: Long
  )
  final case class SessionOut(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      duration_us: Long
  )

  /** Per-user gap sessionization as a stateful stream: closes a session
    * when the gap exceeds `gapUs` (or on state timeout at end of stream).
    * Within a micro-batch the iterator is not ordered — events are sorted
    * by event_id per group, which is exact under AvailableNow/batch and a
    * bounded-disorder approximation on a live stream (the watermark bounds
    * the disorder, reference relies on Kafka's per-partition order, T4).
    */
  def sessionizeStateful(
      spark: SparkSession,
      events: Dataset[Ev],
      gapUs: Long = 30L * 60 * 1000 * 1000
  ): Dataset[SessionOut] = {
    import spark.implicits._

    def tsUs(t: Timestamp): Long =
      t.getTime / 1000L * 1000000L + t.getNanos / 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
        val sorted = evs.toArray.sortBy(_.event_id)
        var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
        val out = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          val t = tsUs(e.ts)
          if (st.n == 0L) {
            st = SessionState(st.sessionId + 1, t, 1L, t)
          } else if (t - st.lastTsUs > gapUs) {
            out += SessionOut(user, st.sessionId, st.n, st.lastTsUs - st.startUs)
            st = SessionState(st.sessionId + 1, t, 1L, t)
          } else {
            st = st.copy(lastTsUs = t, n = st.n + 1)
          }
        }
        if (st.n > 0) state.update(st) else state.remove()
        out.result().iterator
      }
  }

  final case class FunnelEv(
      user_id: Long,
      event_id: Long,
      event_type: String,
      tsUs: Long
  )
  final case class FunnelState(viewUs: Long, clickUs: Long, purchaseUs: Long)
  final case class FunnelOut(user_id: Long, stage: Long, stage_us: Long)

  /** W9's streaming form — per-user funnel progression as O(1) state
    * (three stage timestamps, −1 = unreached): a stage-advance row
    * (user, stage, its event-time micros) is EMITTED the moment a user
    * crosses a stage, the alerting shape a product pipeline wants.
    * Within a micro-batch the group's rows are processed in
    * (tsUs, event_id) order — exact under in-order delivery, the
    * sessionizeStateful bounded-disorder posture on a live stream. The
    * strictly-after semantics match the batch operator exactly
    * (StreamingSpec law: final stages over chunked delivery ≡
    * [[graft.analytics.Analytics.funnel]] row-for-row).
    */
  def funnelStateful(
      spark: SparkSession,
      events: Dataset[FunnelEv]
  ): Dataset[FunnelOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (user: Long, evs: Iterator[FunnelEv], state: GroupState[FunnelState]) =>
        val sorted = evs.toArray.sortBy(e => (e.tsUs, e.event_id))
        var st = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
        val out = Seq.newBuilder[FunnelOut]
        sorted.foreach { e =>
          e.event_type match {
            case "view" if st.viewUs < 0L =>
              st = st.copy(viewUs = e.tsUs)
              out += FunnelOut(user, 1L, e.tsUs)
            case "click"
                if st.viewUs >= 0L && st.clickUs < 0L && e.tsUs > st.viewUs =>
              st = st.copy(clickUs = e.tsUs)
              out += FunnelOut(user, 2L, e.tsUs)
            case "purchase"
                if st.clickUs >= 0L && st.purchaseUs < 0L &&
                  e.tsUs > st.clickUs =>
              st = st.copy(purchaseUs = e.tsUs)
              out += FunnelOut(user, 3L, e.tsUs)
            case _ => ()
          }
        }
        state.update(st)
        out.result().iterator
      }
  }

  final case class RetEv(user_id: Long, tsUs: Long)
  final case class RetState(cohortWeek: Long, offsets: Seq[Long])
  final case class RetOut(user_id: Long, cohort_week: Long, week_offset: Long)

  /** W10's streaming form — retention cohorts maintained as per-user
    * state: (cohort week, set of active week offsets), with an increment
    * row (user, cohort_week, week_offset) EMITTED exactly when the user
    * is first active in a week — the events a live retention dashboard
    * consumes. State is O(active weeks) per user — offsets, not events —
    * and the same week never re-emits (the set is the dedup).
    *
    * The cohort is the FIRST week seen, which equals the batch operator's
    * `min(week)` under per-user event-time order across batches (the
    * attributionStateful/T4 delivery contract; within a batch rows sort
    * by time). Source redelivery across committed batches re-emits
    * at-least-once — increments carry user_id so one keep-first dedup by
    * (user, cohort, offset) restores exactness, which is precisely what
    * [[retentionFromIncrements]] does before aggregating.
    *
    * Law (StreamingSpec): chunked event-time delivery, increments folded
    * by [[retentionFromIncrements]] ≡ the batch
    * [[graft.analytics.Analytics.retentionCohorts]] row-for-row.
    */
  def retentionStateful(
      spark: SparkSession,
      events: Dataset[RetEv]
  ): Dataset[RetOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetState, RetOut](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (user: Long, evs: Iterator[RetEv], state: GroupState[RetState]) =>
        // the batch operator's week grain: unix_micros DIV one week
        val weeks =
          evs.map(e => Math.floorDiv(e.tsUs, 604800000000L)).toArray.sorted.distinct
        if (weeks.isEmpty) Iterator.empty
        else {
          var st = state.getOption.getOrElse(RetState(weeks.head, Seq.empty))
          val seen = scala.collection.mutable.Set(st.offsets: _*)
          val out = Seq.newBuilder[RetOut]
          weeks.foreach { w =>
            val off = w - st.cohortWeek
            // off < 0 only under cross-batch disorder, which the delivery
            // contract excludes; dropped rather than silently mis-binned
            if (off >= 0 && !seen.contains(off)) {
              seen += off
              out += RetOut(user, st.cohortWeek, off)
            }
          }
          st = st.copy(offsets = seen.toSeq.sorted)
          state.update(st)
          out.result().iterator
        }
      }
  }

  /** Folds emitted retention increments into the w10 report: keep-first
    * dedup by (user, cohort, offset) — the at-least-once repair — then
    * the batch operator's aggregation (cohort size = the offset-0 count,
    * every user's first week by construction).
    */
  def retentionFromIncrements(increments: DataFrame): DataFrame = {
    val uniq = increments
      .select("user_id", "cohort_week", "week_offset")
      .distinct()
    // the size leg re-keys its column: both legs read the same source
    // (under a memory-sink view a plain self-join fails attribute
    // deduplication), and the rename sidesteps it without a re-plan
    val sizes = uniq
      .filter(col("week_offset") === 0L)
      .select(col("cohort_week").as("cw"))
      .groupBy("cw")
      .agg(count(lit(1)).as("cohort_size"))
    uniq
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .join(sizes, col("cohort_week") === col("cw"))
      .drop("cw")
      .select(
        col("cohort_week"),
        col("week_offset"),
        col("n_users"),
        col("cohort_size"),
        expr("n_users * 1000000 DIV cohort_size").as("retained_ppm")
      )
      .orderBy("cohort_week", "week_offset")
  }

  final case class AttrEv(
      user_id: Long,
      event_id: Long,
      event_type: String,
      tsUs: Long,
      value: Double
  )
  final case class ClickState(clickId: Long, clickUs: Long)
  final case class AttrOut(
      user_id: Long,
      purchase_id: Long,
      purchase_us: Long,
      purchase_value: Double,
      click_id: Option[Long],
      click_us: Option[Long],
      lag_us: Option[Long]
  )

  /** Streaming last-touch attribution — the continuous form of the batch
    * as-of join ([[graft.analytics.AsOf.joinAsOf]] / w5): each purchase is
    * emitted with the latest click by the same user at or before it.
    *
    * State is O(1) per user (the single latest click), the minimal state
    * any as-of stream needs — contrast the batch plan, which sees all rows
    * and needs none. Within a micro-batch rows are processed in
    * (tsUs, type) order with clicks before purchases at equal instants,
    * matching the batch operator's inclusive (>=) tie semantics. Across
    * batches the stream must deliver per-user rows in event-time order
    * (Kafka per-partition order keyed by user, the reference's T4
    * assumption); the monotone state guard makes redelivered CLICKS
    * harmless — a redelivered older click never regresses the state — and
    * the emit-time guard (`clickUs <= purchase`) keeps a disordered or
    * replayed purchase from attributing to a click later than itself.
    * Crash recovery is exact (state rolls back with the source offsets —
    * Spark's checkpoint contract, T2); a purchase REDELIVERED BY THE
    * SOURCE across committed batches re-emits at-least-once with its
    * attribution possibly degraded to null if a later click superseded
    * the state — downstream keep-first dedup by purchase_id restores
    * exactly-once (the single-latest-click state cannot reconstruct
    * history; that is the O(1)-state tradeoff, stated rather than hidden).
    *
    * `ttl` bounds state over an open-ended user space: real attribution
    * windows are finite (a 30-day-old click should not win anyway), so a
    * processing-time timeout evicts idle users without changing semantics
    * inside the window — same policy as the StreamingDedup operators.
    */
  def attributionStateful(
      spark: SparkSession,
      events: Dataset[AttrEv],
      ttl: Option[java.time.Duration] = None
  ): Dataset[AttrOut] = {
    import spark.implicits._
    events
      .filter(e => e.event_type == "purchase" || e.event_type == "click")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ClickState, AttrOut](
        OutputMode.Append(),
        ttl
          .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
          .getOrElse(GroupStateTimeout.NoTimeout())
      ) { (user: Long, evs: Iterator[AttrEv], state: GroupState[ClickState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
        // clicks sort before purchases at equal tsUs: inclusive semantics
        val sorted = evs.toArray.sortBy(e => (e.tsUs, e.event_type != "click"))
        var st = state.getOption.orNull
        val out = Seq.newBuilder[AttrOut]
        sorted.foreach { e =>
          if (e.event_type == "click") {
            if (st == null || e.tsUs >= st.clickUs)
              st = ClickState(e.event_id, e.tsUs)
          } else {
            // emit guard: never attribute a click later than the purchase
            val attr = Option(st).filter(_.clickUs <= e.tsUs)
            out += AttrOut(
              user,
              e.event_id,
              e.tsUs,
              e.value,
              attr.map(_.clickId),
              attr.map(_.clickUs),
              attr.map(s => e.tsUs - s.clickUs)
            )
          }
        }
        if (st != null) {
          state.update(st)
          ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
        }
        out.result().iterator
        }
      }
  }

  /** Windowed attribution CANDIDATES via Spark's native stream-stream
    * interval join — the engine's third attribution form, and the one
    * that uses Spark's built-in join-state machinery rather than custom
    * `flatMapGroupsWithState`:
    *
    *   - [[graft.analytics.AsOf.joinAsOf]] — batch, picks THE latest click
    *   - [[attributionStateful]] — streaming, O(1) custom state, latest
    *   - this — streaming, emits EVERY click within the lookback window
    *     per purchase (the multi-touch candidate set a downstream
    *     attribution model weighs), state bounded by the WATERMARK: rows
    *     outside `lookback + watermark` are evicted by Spark itself.
    *
    * Both sides must carry event-time columns; the time-range condition
    * (`p_ts - lookback <= c_ts < p_ts`, half-open like batch w6 so the
    * two candidate surfaces share one tie semantics) is what lets Spark
    * bound the
    * join state — an unconstrained stream-stream join would buffer
    * forever. Inner join: purchases with no in-window click drop (the
    * candidate-set consumer outer-joins against purchases if it needs
    * the zero-candidate rows).
    */
  def attributionCandidates(
      purchases: DataFrame,
      clicks: DataFrame,
      lookback: String = "1 hour",
      watermark: String = "30 minutes"
  ): DataFrame =
    purchases
      .withWatermark("p_ts", watermark)
      .join(
        clicks.withWatermark("c_ts", watermark),
        expr(
          s"user_id = c_user AND " +
            // half-open upper bound — the SAME tie semantics as the batch
            // w6 interval join (click strictly before the purchase), so
            // the two candidate surfaces agree on boundary rows
            s"c_ts >= p_ts - INTERVAL $lookback AND c_ts < p_ts"
        )
      )
      .select(
        col("user_id"),
        col("purchase_id"),
        unix_micros(col("p_ts")).as("purchase_us"),
        col("click_id"),
        unix_micros(col("c_ts")).as("click_us"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("lag_us")
      )

  /** Flush helper for tests: emits the still-open session per user from the
    * final state (batch mode has no timeout tick to close them).
    */
  def sessionizeComplete(
      spark: SparkSession,
      events: Dataset[Ev],
      gapUs: Long = 30L * 60 * 1000 * 1000
  ): DataFrame = {
    import spark.implicits._
    // batch shortcut: run the same state machine per key in one pass
    events
      .groupByKey(_.user_id)
      .flatMapGroups { (user: Long, evs: Iterator[Ev]) =>
        val sorted = evs.toArray.sortBy(_.event_id)
        var sid = 0L
        var n = 0L
        var startUs = 0L
        var lastUs = Long.MinValue
        val out = Seq.newBuilder[SessionOut]
        sorted.foreach { e =>
          val t = e.ts.getTime / 1000L * 1000000L + e.ts.getNanos / 1000L
          if (n == 0L) { sid += 1; n = 1; startUs = t; lastUs = t }
          else if (t - lastUs > gapUs) {
            out += SessionOut(user, sid, n, lastUs - startUs)
            sid += 1; n = 1; startUs = t; lastUs = t
          } else { n += 1; lastUs = t }
        }
        if (n > 0) out += SessionOut(user, sid, n, lastUs - startUs)
        out.result().iterator
      }
      .toDF()
  }
}
