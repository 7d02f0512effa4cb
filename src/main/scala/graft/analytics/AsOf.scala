package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row at or
  * before the left row's time, per join key.
  *
  * Spark has no native ASOF join operator (DuckDB and pandas `merge_asof`
  * do). The naive encodings both fail at scale: an inequality-condition
  * join plans as BroadcastNestedLoopJoin (quadratic, and the build side
  * must fit in memory), and a windowed self-join after a range bucketing
  * needs a bucket-width guess. The scale-safe Spark-first plan is
  * union + ordered running window:
  *
  *   1. tag left rows side=1, right rows side=0, align schemas
  *      (payloads ride in one struct column per side), union
  *   2. one shuffle: partition by key, sort by (time, side) — right
  *      sorts before left at equal times, so inclusive (>=) semantics
  *      fall out of the sort order
  *   3. `last(right_payload, ignoreNulls)` over rows unbounded-preceding
  *      carries the latest right payload into every left row
  *   4. keep side=1, unpack both structs
  *
  * Cost is a single hash shuffle on the key plus one sort — identical to
  * any keyed window; no join explosion, no range heuristics. Skewed keys
  * are ordinary window skew (AQE/salting apply as usual).
  *
  * `inclusive=false` gives strict (<) semantics: left rows sort BEFORE
  * right rows at equal times, so a same-instant right row is not visible.
  *
  * Left-outer shape: every left row survives; right payload columns are
  * null when no right row precedes it.
  */
object AsOf {

  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String,
      inclusive: Boolean = true
  ): DataFrame = {
    require(key.nonEmpty, "as-of join needs at least one key column")
    val lPayload = left.columns.filterNot(c => key.contains(c)).toSeq
    val rPayload = right.columns.filterNot(c => key.contains(c)).toSeq
    // trades/quotes usually share the time column NAME — support that by
    // suffixing the right time column in the output; any other collision
    // is a genuine ambiguity the caller must resolve
    val rOutNames = rPayload.map(c =>
      if (c == rightTime && lPayload.contains(c)) s"${c}_right" else c
    )
    val clashes = lPayload.intersect(rOutNames)
    require(
      clashes.isEmpty,
      s"left/right payload columns clash: ${clashes.mkString(",")}"
    )

    val lStruct = struct(lPayload.map(col): _*)
    val rStruct = struct(rPayload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    // right rows first (side 0) at equal times = inclusive >=; flipping the
    // side tags makes the window stop just short of same-instant rights
    val (lSide, rSide) = if (inclusive) (1, 0) else (0, 1)
    val l2 = left.select(
      key.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(lSide).as("__side"),
        lStruct.as("__l"),
        lit(null).cast(rType).as("__r")
      ): _*
    )
    val r2 = right.select(
      key.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(rSide).as("__side"),
        lit(null).cast(lType).as("__l"),
        rStruct.as("__r")
      ): _*
    )

    // The trailing __r key is a deterministic tiebreak: with DUPLICATE
    // right rows at the same (key, rightTime), (__t, __side) alone leaves
    // their relative order to the (unstable) shuffle layout, and last()
    // would match a layout-dependent payload. Ordering the ties by the
    // payload struct itself (lexicographic; nulls — the left rows — sort
    // first within their side) makes the match the MAX payload among the
    // tied right rows, on every run. Rows tied on all three keys are
    // byte-identical, so any pick is the same pick.
    val w = Window
      .partitionBy(key.map(col): _*)
      .orderBy(col("__t"), col("__side"), col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val keyCols: Seq[Column] = key.map(col)
    l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lit(lSide))
      .select(
        keyCols ++
          lPayload.map(c => col(s"__l.`$c`").as(c)) ++
          rPayload.zip(rOutNames).map { case (c, out) =>
            col(s"__m.`$c`").as(out)
          }: _*
      )
  }
}
