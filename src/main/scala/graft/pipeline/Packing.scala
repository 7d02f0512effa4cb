package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** P17 — sequence packing: map every document to its token-offset range in
  * the concatenated training stream, and to the fixed-size sequence
  * windows it spans (the GPT-style pack-then-chunk layout). A training job
  * consumes this as the doc → (first_window, last_window) manifest; the
  * window count is the corpus's total step budget.
  *
  * The naive formulation is a GLOBAL running sum — `Window.orderBy`
  * without partitioning, which moves the whole corpus into ONE partition
  * (the classic Spark scale trap). This implementation is the two-level
  * prefix sum instead:
  *
  *   1. contiguous id-range buckets (`doc_id DIV bucketSize`) aggregate
  *      their token totals — map-side combined, one bounded shuffle
  *   2. bucket offsets = running sum over the AGGREGATED bucket rows —
  *      the only ordered window, and its size is GRANULARITY-CONTROLLED
  *      (see below), not corpus-controlled
  *   3. each doc's start = its bucket's offset + the within-bucket
  *      running sum (keyed window, fully parallel)
  *
  * Granularity scales with the corpus: by default (`bucketSize = 0`) the
  * bucket width is derived from the doc_id RANGE (which, unlike the row
  * count, bounds the bucket-table size at any id density) so the bucket
  * table stays ~[[Packing.TargetBucketRows]] rows (10⁴–10⁵ band) at ANY
  * corpus size —
  * at 10⁹ docs the single-task ordered window sorts ~3×10⁴ 16-byte rows,
  * not 10⁷ as a fixed width would give. The bucket-offset join is
  * broadcast only while the bucket table is provably small
  * ([[Packing.BroadcastBucketLimit]]); an explicit tiny width on a huge
  * corpus falls back to a shuffle join instead of a multi-GB broadcast.
  * Exactness is granularity-INDEPENDENT (bucketing by contiguous ranges
  * makes the two-level composition exact, not approximate): the oracle
  * runs the one-level global cumsum in DuckDB, and MixQuantileSpec
  * re-checks the law at two non-default granularities.
  */
object Packing {

  /** Target size of the bucket-offset table — the one ordered window runs
    * over ~this many 16-byte rows whatever the corpus count.
    */
  val TargetBucketRows = 32768L

  /** Above this many bucket rows the offsets join stops hinting broadcast
    * (≈64 MB of (bkt, bkt_off) pairs) and lets the planner shuffle-join.
    */
  val BroadcastBucketLimit = 1L << 22

  private def ceilDiv(a: Long, b: Long): Long = (a + b - 1L) / b

  /** Running sum over the aggregated bucket rows + offsets join, with the
    * broadcast hint dropped once the bucket table outgrows
    * [[BroadcastBucketLimit]].
    */
  private def withBucketOffsets(d: DataFrame, bucketRows: Long): DataFrame = {
    val bktOffsets = d
      .groupBy("bkt")
      .agg(sum("n_toks").as("bt"))
      .withColumn(
        "bkt_off",
        coalesce(
          sum("bt").over(
            Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
          ),
          lit(0L)
        )
      )
      .select("bkt", "bkt_off")
    if (bucketRows <= BroadcastBucketLimit)
      d.join(broadcast(bktOffsets), Seq("bkt"))
    else d.join(bktOffsets, Seq("bkt"))
  }

  def tokenWindows(
      spark: SparkSession,
      dir: String,
      windowTokens: Long = 512L,
      bucketSize: Long = 0L
  ): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Size the bucket width from the ID RANGE, not the row count: the
    // bucket table has one row per distinct `doc_id DIV bs` value, which
    // the row count only bounds when ids are dense — a sparse id space
    // (hashed ids, or the keep-set of an upstream curation filter) would
    // blow a count-derived width past both the target band and the
    // broadcast guard. max(doc_id)+1 bounds the bucket count at
    // TargetBucketRows for ANY density (footer-stats max, one cheap
    // single-column pass at worst).
    val idSpan = docs
      .agg(coalesce(max("doc_id"), lit(-1L)).as("m"))
      .head()
      .getLong(0) + 1L
    val bs =
      if (bucketSize > 0L) bucketSize
      else math.max(64L, ceilDiv(math.max(idSpan, 1L), TargetBucketRows))
    val d = docs
      .select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_toks")
      )
      .withColumn("bkt", expr(s"doc_id DIV $bs"))

    val inBkt = Window
      .partitionBy("bkt")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withBucketOffsets(d, ceilDiv(math.max(idSpan, 1L), bs))
      .withColumn(
        "start_tok",
        col("bkt_off") + coalesce(sum("n_toks").over(inBkt), lit(0L))
      )
      .select(
        col("doc_id"),
        col("n_toks"),
        col("start_tok"),
        expr(s"start_tok DIV $windowTokens").as("first_window"),
        expr(s"(start_tok + n_toks - 1) DIV $windowTokens").as("last_window"),
        (expr(s"(start_tok + n_toks - 1) DIV $windowTokens") -
          expr(s"start_tok DIV $windowTokens") + lit(1L)).as("n_windows")
      )
      .orderBy("doc_id")
  }

  /** P21 — SHUFFLED sequence packing: the p17 manifest under a
    * deterministic hash permutation of the corpus (training pipelines
    * pack a shuffled doc order, not doc_id order — adjacent ids are
    * usually same-source/same-crawl, and a window spanning doc
    * boundaries should mix sources). The permutation is the finalized
    * hash gate (reproducible across layouts/retries; reshuffling =
    * changing `salt`), and the scalable prefix sum generalizes: the
    * two-level trick needs buckets CONTIGUOUS IN THE ORDER, so buckets
    * quantize the gate value itself (`pri DIV (granularity/nBuckets)` —
    * monotone in the sort order (pri, doc_id)) instead of the doc_id
    * range. Same shape as p17 otherwise: bucket totals aggregate
    * map-side, the ONE ordered window runs over bucket rows, per-doc
    * starts come from a keyed window. The gate is uniform, so buckets
    * balance regardless of corpus id layout — and `nBuckets = 0` (the
    * default) scales the count with the corpus exactly like p17's width
    * derivation, capped by the gate granularity.
    */
  def shuffledTokenWindows(
      spark: SparkSession,
      dir: String,
      windowTokens: Long = 512L,
      nBuckets: Long = 0L,
      salt: String = "graft-pack"
  ): DataFrame = {
    val granularity = 1000000L
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val nb =
      if (nBuckets > 0L) math.min(nBuckets, granularity)
      else math.min(granularity, math.max(64L, ceilDiv(n, TargetBucketRows)))
    val d = docs
      .select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_toks")
      )
      .withColumn(
        "pri",
        graft.pipeline.Sampling
          .gate(salt, lit("doc"), col("doc_id"), granularity)
      )
      .withColumn("bkt", expr(s"pri DIV ${granularity / nb}"))

    val inBkt = Window
      .partitionBy("bkt")
      .orderBy("pri", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    withBucketOffsets(d, nb)
      .withColumn(
        "start_tok",
        col("bkt_off") + coalesce(sum("n_toks").over(inBkt), lit(0L))
      )
      .select(
        col("doc_id"),
        col("pri"),
        col("n_toks"),
        col("start_tok"),
        expr(s"start_tok DIV $windowTokens").as("first_window"),
        expr(s"(start_tok + n_toks - 1) DIV $windowTokens").as("last_window")
      )
      .orderBy("doc_id")
  }
}
