package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — every (point, interval) pair with equal keys and
  * `lo <= t < hi` (half-open) or `lo <= t <= hi` (closed).
  *
  * Spark has no native range-join operator. The two naive encodings both
  * break at scale: a pure inequality condition plans as
  * BroadcastNestedLoopJoin (the build side must fit in executor memory and
  * every point is compared against every interval), and an equi-join on the
  * key alone applies the range predicate only AFTER materializing all
  * same-key pairs — quadratic in the rows of a hot key. The scale-safe plan
  * manufactures a tighter equality: quantize time into fixed-width bins,
  * replicate each interval to every bin it covers, map each point to its
  * single bin, hash-join on (key, bin), then refine with the exact
  * predicate.
  *
  * A qualifying pair meets in EXACTLY one bin — the point's — so the output
  * needs no dedup pass. Cost: one shuffle of points (1 row each) and
  * intervals (`ceil(span/binWidth)+1` rows each) on (key, bin); Catalyst
  * treats it as an ordinary equi-join, so broadcast (small interval side)
  * and AQE skew-split apply unchanged. `binWidth` tunes replication against
  * bin selectivity — set it near the typical interval span so intervals
  * replicate to O(1) bins while a bin pairs each point with only the
  * intervals that could match it.
  *
  * Times and bounds are BIGINT (unix micros by convention elsewhere in this
  * surface). Bin ids use floor division computed in exact integer
  * arithmetic (`(t - ((t % w + w) % w)) / w`) so negative times land in the
  * correct bin — `CAST(FLOOR(t / w))` would round through a double and
  * corrupt micro-precision ids beyond 2^53.
  *
  * Degenerate intervals match nothing: `hi < lo` is dropped before binning
  * (see the null guard), `hi == lo` under half-open bins but refines to
  * nothing — both exactly the predicate's answer. A pathological interval
  * spanning `k` bins replicates `k` times; callers bound `k` by choice of
  * `binWidth` (the replication is per-interval and explicit — nothing is
  * ever all-pairs).
  */
object RangeJoin {

  /** Exact integer floor division — stays in BIGINT end to end. The
    * numerator is t minus its positive remainder, so it divides exactly and
    * `DIV`'s truncation direction never matters.
    */
  private def floorDiv(name: String, w: Long): Column =
    expr(s"(`$name` - ((`$name` % $w) + $w) % $w) DIV $w")

  /** `mode`: "inner" (all matching pairs), "leftouter" (every point
    * survives; interval columns null when no window contains it), "anti"
    * (points contained in NO interval — the orphan/decontamination
    * shape). The outer/anti forms ride the same binned equality: the
    * range predicate moves INTO the join condition (a post-join filter
    * would eat the null rows), and since a point owns exactly one bin, a
    * qualifying pair is still tested exactly once — no dedup, and
    * left-outer emits exactly one null row for an unmatched point.
    */
  def joinRange(
      points: DataFrame,
      intervals: DataFrame,
      key: Seq[String],
      pointTime: String,
      lo: String,
      hi: String,
      binWidth: Long,
      halfOpen: Boolean = true,
      mode: String = "inner"
  ): DataFrame = {
    require(key.nonEmpty, "range join needs at least one key column")
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(
      Set("inner", "leftouter", "anti").contains(mode),
      s"unsupported mode: $mode"
    )
    val clashes = points.columns.toSeq
      .filterNot(key.contains)
      .intersect(intervals.columns.toSeq.filterNot(key.contains))
    require(
      clashes.isEmpty,
      s"point/interval payload columns clash: ${clashes.mkString(",")}"
    )
    // withColumn would silently OVERWRITE a caller's __bin on either side
    require(
      !points.columns.contains("__bin") && !intervals.columns.contains("__bin"),
      "inputs must not carry a __bin column (internal bin key)"
    )

    val p = points.withColumn("__bin", floorDiv(pointTime, binWidth))
    // hi < lo can match nothing, but unguarded `sequence` would DESCEND
    // through every bin between them; null short-circuits (explode drops
    // the row, which IS the predicate's answer for an empty interval)
    val i = intervals
      .withColumn(
        "__bin",
        explode(
          when(
            col(hi) >= col(lo),
            sequence(floorDiv(lo, binWidth), floorDiv(hi, binWidth))
          )
        )
      )
    val refine =
      if (halfOpen) col(pointTime) >= col(lo) && col(pointTime) < col(hi)
      else col(pointTime) >= col(lo) && col(pointTime) <= col(hi)
    mode match {
      case "inner" =>
        p.join(i, key :+ "__bin", "inner").filter(refine).drop("__bin")
      case _ =>
        val pa = p.as("p")
        val ia = i.as("i")
        val cond = (key :+ "__bin")
          .map(c => col(s"p.`$c`") === col(s"i.`$c`"))
          .reduce(_ && _) &&
          {
            val t = col(s"p.`$pointTime`")
            val bound =
              if (halfOpen) t < col(s"i.`$hi`") else t <= col(s"i.`$hi`")
            t >= col(s"i.`$lo`") && bound
          }
        if (mode == "anti")
          pa.join(ia, cond, "left_anti").drop("__bin")
        else {
          val iPayload =
            intervals.columns.toSeq.filterNot(c => key.contains(c))
          pa.join(ia, cond, "left_outer")
            .select(
              key.map(c => col(s"p.`$c`").as(c)) ++
                points.columns.toSeq
                  .filterNot(key.contains)
                  .map(c => col(s"p.`$c`").as(c)) ++
                iPayload.map(c => col(s"i.`$c`").as(c)): _*
            )
        }
    }
  }
}
