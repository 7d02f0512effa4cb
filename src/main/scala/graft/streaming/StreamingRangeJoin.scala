package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming range (interval) join — the continuous form of
  * [[graft.analytics.RangeJoin.joinRange]] (w6/w7): every (point,
  * interval) pair with equal keys and `lo <= t < hi`, over two unbounded
  * streams.
  *
  * The batch operator manufactures a (key, bin) equality because a raw
  * inequality join would plan as BroadcastNestedLoopJoin. A stream-stream
  * join doesn't need the bins: Spark extracts the key equality into a
  * StreamingSymmetricHashJoin — both sides shuffle on the keys, exactly
  * like the batch equi-join — and the *state bound* does the job the bins
  * did. What it needs instead is a watermark on both sides and a
  * two-sided event-time band in the join condition. `lo <= t < hi` alone
  * only bounds one direction (an interval's matches start at `lo`), so an
  * interval row could otherwise wait forever for future points and every
  * point forever for a straggler interval. Declaring `maxSpan` — an upper
  * bound on interval length, which real windows have (attribution
  * horizons, session caps) — closes the band: `t < hi <= lo + maxSpan`
  * gives `lo <= t <= lo + maxSpan`, which Spark's condition analysis
  * turns into state eviction for BOTH sides (an interval is dropped once
  * the point watermark passes `lo + maxSpan`; a point once the interval
  * watermark passes its time). State per key is therefore
  * O(rows inside watermark + maxSpan), the same horizon the batch
  * operator scans — nothing is ever all-pairs, and AQE-era skew handling
  * is replaced by the state store's per-key layout (hot keys cost state,
  * not a cross product).
  *
  * Modes mirror the batch surface where Spark's streaming join supports
  * them: `inner` (all qualifying pairs, emitted as soon as both rows have
  * arrived), `leftouter` (every point; null interval payload once the
  * watermark proves no interval can still match — the candidate surface
  * with zero-candidate rows), `leftsemi` (points contained in at least
  * one interval — the in-flight decontamination gate). The batch `anti`
  * mode has no streaming counterpart in Spark's join machinery; its
  * streaming analog is `leftouter` + a downstream null filter, stated
  * here rather than papered over.
  *
  * Times are TimestampType here (watermarks require it) where the batch
  * operator uses BIGINT micros; the chunking ≡ batch law in
  * StreamingSpec bridges the two with `timestamp_micros`/`unix_micros`
  * and proves chunk-boundary independence against the w6 plan itself.
  */
object StreamingRangeJoin {

  /** `maxSpan` is a SQL interval body (e.g. `"24 hours"`) that must bound
    * `hi - lo` for every interval row; rows violating it are dropped by
    * the derived conjunct (their tail beyond `lo + maxSpan` never
    * matches) — declare it generously but finitely. `watermark` is the
    * late-data allowance applied to both sides.
    */
  def streamJoinRange(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: Seq[String],
      intervalKey: Seq[String],
      pointTime: String,
      lo: String,
      hi: String,
      maxSpan: String,
      watermark: String = "30 minutes",
      halfOpen: Boolean = true,
      mode: String = "inner"
  ): DataFrame = {
    require(pointKey.nonEmpty && pointKey.size == intervalKey.size,
      "pointKey/intervalKey must be non-empty and aligned")
    require(Set("inner", "leftouter", "leftsemi").contains(mode),
      s"unsupported streaming mode: $mode (batch-only: anti)")
    val clashes = points.columns.toSeq.intersect(intervals.columns.toSeq)
    require(clashes.isEmpty,
      s"streaming join sides must not share column names: ${clashes.mkString(",")}")

    val p = points.withWatermark(pointTime, watermark)
    val i = intervals.withWatermark(lo, watermark)
    val keyEq: Column = pointKey
      .zip(intervalKey)
      .map { case (a, b) => col(s"`$a`") === col(s"`$b`") }
      .reduce(_ && _)
    val t = col(s"`$pointTime`")
    val upper = if (halfOpen) t < col(s"`$hi`") else t <= col(s"`$hi`")
    // the derived band conjunct: redundant given hi <= lo + maxSpan, but
    // it is what lets Spark bound state on both sides
    val band = t <= col(s"`$lo`") + expr(s"INTERVAL $maxSpan")
    val joinType = mode match {
      case "inner"     => "inner"
      case "leftouter" => "left_outer"
      case "leftsemi"  => "left_semi"
    }
    p.join(i, keyEq && t >= col(s"`$lo`") && upper && band, joinType)
  }
}
