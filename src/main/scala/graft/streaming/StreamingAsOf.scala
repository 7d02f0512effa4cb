package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingAnalytics.AttrOut

/** Watermark-correct streaming as-of join (w8) — the disorder-tolerant
  * continuous form of [[graft.analytics.AsOf.joinAsOf]] (w5), completing
  * the as-of trio:
  *
  *   - [[graft.analytics.AsOf.joinAsOf]] — batch: sees all rows, needs no
  *     delivery assumptions.
  *   - [[StreamingAnalytics.attributionStateful]] — streaming, O(1) state,
  *     but ASSUMES per-key event-time order across micro-batches (the
  *     Kafka per-partition contract, T4); out-of-order delivery silently
  *     degrades matches.
  *   - this — streaming, assumes only the WATERMARK: rows may arrive in
  *     any order within the lateness allowance, and every emitted row is
  *     FINAL — a left row (purchase) is held until the watermark proves no
  *     right row (click) at-or-before it can still arrive, then emitted
  *     exactly once with the true latest-right match. Emission is the
  *     same finality rule Spark's own append-mode windowed aggregates use.
  *
  * State per key is provably bounded WITHOUT a lookback horizon:
  *   - pending left rows with event time still above the watermark
  *     (in-flight only — each is emitted and dropped once the watermark
  *     passes it, via event-time timeout when no new data arrives);
  *   - right rows above the watermark (in-flight only, same bound);
  *   - ONE consolidated right row — the latest at-or-below the watermark.
  *     Everything older can only ever be dominated by it, because every
  *     pending or future left row's time exceeds the watermark. This is
  *     what gives the batch operator's UNBOUNDED lookback in O(1) state —
  *     the reason the batch form needs no horizon and this form needs no
  *     `maxSpan`, where the interval join ([[StreamingRangeJoin]]) must
  *     declare one.
  *
  * Inclusive (>=) tie semantics match the batch default: a right row at
  * exactly the left row's instant wins (the strict `wm > t` emit guard
  * covers it — at `wm == t` a same-instant right may still arrive, so the
  * left is not yet final). Duplicate right rows at one (key, time) break
  * ties by max id, mirroring the batch operator's max-payload tiebreak.
  *
  * Chunking ≡ batch-w5 law (including shuffled-within-chunk delivery) in
  * StreamingSpec; redelivered rows below the watermark are dropped by
  * Spark before they reach the state function, so source redelivery of
  * already-final rows is a no-op by construction rather than by guard.
  */
object StreamingAsOf {

  final case class AsofEv(
      user_id: Long,
      event_id: Long,
      event_type: String, // "click" = right side, "purchase" = left side
      ts: Timestamp,
      value: Double
  )
  final case class RightRow(id: Long, tUs: Long)
  final case class LeftRow(id: Long, tUs: Long, value: Double)
  final case class AsofWmState(
      pending: List[LeftRow],
      rights: List[RightRow],
      latest: Option[RightRow]
  )

  private def us(t: Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  private def maxR(a: RightRow, b: RightRow): RightRow =
    if (a.tUs > b.tUs || (a.tUs == b.tUs && a.id >= b.id)) a else b

  def asofWatermarked(
      spark: SparkSession,
      events: Dataset[AsofEv],
      watermark: String = "30 minutes"
  ): Dataset[AttrOut] = {
    import spark.implicits._
    events
      .filter(e => e.event_type == "purchase" || e.event_type == "click")
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofWmState, AttrOut](
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()
      ) { (user: Long, evs: Iterator[AsofEv], state: GroupState[AsofWmState]) =>
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        var pending = List.empty[LeftRow]
        var rights = List.empty[RightRow]
        var latest = Option.empty[RightRow]
        state.getOption.foreach { st =>
          pending = st.pending; rights = st.rights; latest = st.latest
        }
        evs.foreach { e =>
          if (e.event_type == "click")
            rights ::= RightRow(e.event_id, us(e.ts))
          else pending ::= LeftRow(e.event_id, us(e.ts), e.value)
        }
        // a left row is FINAL once the watermark strictly passes it: any
        // row still arriving has ts >= wm > t, so no better right exists
        val (ripe, wait) = pending.partition(_.tUs < wmUs)
        val out = ripe
          .sortBy(p => (p.tUs, p.id))
          .map { p =>
            val m = (rights.iterator.filter(_.tUs <= p.tUs) ++
              latest.iterator.filter(_.tUs <= p.tUs))
              .reduceOption(maxR)
            AttrOut(
              user,
              p.id,
              p.tUs,
              p.value,
              m.map(_.id),
              m.map(_.tUs),
              m.map(r => p.tUs - r.tUs)
            )
          }
        // consolidate: of the rights at-or-below the watermark only the
        // max can ever match again (every live left row is above the wm)
        val (oldR, liveR) = rights.partition(_.tUs < wmUs)
        val latest2 = (latest.toList ++ oldR).reduceOption(maxR)
        if (wait.isEmpty && liveR.isEmpty && latest2.isEmpty) state.remove()
        else {
          state.update(AsofWmState(wait, liveR, latest2))
          // flush guarantee when the key goes quiet: wake at the earliest
          // pending left's instant (+1ms makes it strictly past the wm)
          if (wait.nonEmpty)
            state.setTimeoutTimestamp(wait.map(_.tUs).min / 1000L + 1L)
        }
        out.iterator
      }
  }
}
