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
  *   2. bucket offsets = running sum over the AGGREGATED bucket rows
  *      (corpus/bucketSize rows of 16 bytes — the only ordered window,
  *      at 10⁹ docs that is ~10⁷ tiny rows; a third level folds it again
  *      if ever needed)
  *   3. each doc's start = its bucket's offset + the within-bucket
  *      running sum (keyed window, fully parallel)
  *
  * Exactness vs the global cumsum is the oracle's check (DuckDB runs the
  * one-level form directly — bucketing by CONTIGUOUS ranges makes the
  * two-level composition exact, not approximate).
  */
object Packing {

  def tokenWindows(
      spark: SparkSession,
      dir: String,
      windowTokens: Long = 512L,
      bucketSize: Long = 64L
  ): DataFrame = {
    val d = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_toks")
      )
      .withColumn("bkt", expr(s"doc_id DIV $bucketSize"))

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

    val inBkt = Window
      .partitionBy("bkt")
      .orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(bktOffsets), Seq("bkt"))
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
    * balance regardless of corpus id layout.
    */
  def shuffledTokenWindows(
      spark: SparkSession,
      dir: String,
      windowTokens: Long = 512L,
      nBuckets: Long = 64L,
      salt: String = "graft-pack"
  ): DataFrame = {
    val granularity = 1000000L
    val d = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_toks")
      )
      .withColumn(
        "pri",
        graft.pipeline.Sampling
          .gate(salt, lit("doc"), col("doc_id"), granularity)
      )
      .withColumn("bkt", expr(s"pri DIV ${granularity / nBuckets}"))

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

    val inBkt = Window
      .partitionBy("bkt")
      .orderBy("pri", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    d.join(broadcast(bktOffsets), Seq("bkt"))
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
