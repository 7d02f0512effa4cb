package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.Sampling

/** Streaming corpus hygiene: the p9/p10 operators over continuous ingest.
  *
  * Both are STATELESS row transforms, which is the point — a document's
  * contamination ratio depends only on its own text plus the (static,
  * benchmark-sized) eval dictionary, and a row's sampling fate is a pure
  * hash gate — so unlike the dedup plane there is no state store, no
  * timeout policy, and no chunking sensitivity AT ALL: any micro-batch
  * slicing of a corpus emits exactly the batch operator's rows (spec'd).
  * Append output mode, unbounded throughput, trivially exactly-once under
  * redelivery IF the sink dedups by doc_id (rows are deterministic per
  * doc, so redelivery re-emits identical rows, never conflicting ones).
  *
  * The eval dictionary travels as a [[graft.functions.SortedHitCount]]
  * reference object — per-row binary search instead of the batch
  * operator's explode → broadcast-join → re-aggregate, because a
  * streaming aggregation keyed by doc_id would hold every document's
  * group state forever. The dictionary is collected ONCE on the driver:
  * bounded by construction (it is a benchmark suite, megabytes), the
  * same boundedness argument as the replicator's touched-partition set.
  */
object StreamingCuration {

  /** Distinct sorted gram dictionary of an eval corpus — the driver-side
    * artifact handed to [[contaminationScan]]. Distinct runs distributed
    * BEFORE the bounded collect.
    */
  def evalGramDictionary(eval: DataFrame, n: Int = 7): Array[Long] =
    eval
      .select(
        explode(
          array_distinct(
            graft.functions.NgramPolyHash
              .ngramHashes(coalesce(col("text"), lit("")), n)
          )
        ).as("g")
      )
      .distinct()
      .collect() // bounded: a benchmark's gram vocabulary, not the corpus
      .map(_.getLong(0))

  /** Per-document contamination verdicts for a (streaming or batch) frame
    * of (doc_id, text): the same columns the batch p9 emits, computed
    * row-locally. On a batch frame this agrees with
    * `Decontamination.scan` row-for-row (spec'd cross-check).
    */
  def contaminationScan(
      docs: DataFrame,
      dictionary: Array[Long],
      n: Int = 7,
      threshold: Double = 0.5
  ): DataFrame = {
    // null text ≡ empty text, matching the batch operator's coalesce
    val grams: Column =
      array_distinct(
        graft.functions.NgramPolyHash
          .ngramHashes(coalesce(col("text"), lit("")), n)
      )
    docs
      .withColumn("n_grams", size(grams).cast("long"))
      .withColumn(
        "n_hit",
        graft.functions.SortedHitCount.hitCount(grams, dictionary)
      )
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_hit"),
        (col("n_hit").cast("double") / col("n_grams").cast("double")).as("ratio")
      )
      .withColumn("contaminated", col("ratio") >= threshold)
  }

  /** Deterministic weighted sampling of a document stream —
    * [[Sampling.weightedSample]] IS streaming-safe as written (a pure
    * filter on row-local columns), re-exported here so the streaming
    * surface is explicit. Determinism means a retried/redelivered batch
    * re-selects the same rows: the sample stays exactly reproducible
    * under at-least-once delivery.
    */
  def sampleStream(
      docs: DataFrame,
      rates: Map[String, Double],
      by: String = "source",
      salt: String = "graft",
      defaultRate: Double = 1.0
  ): DataFrame =
    Sampling.weightedSample(docs, rates, by, salt, defaultRate)

  /** PII scrubbing of a document stream — [[graft.pipeline.Pii.scan]] is
    * streaming-safe as written (one codegen'd row-local pass, zero state,
    * zero shuffles), re-exported so the streaming hygiene surface is
    * explicit: scrub-on-ingest is where a production pipeline runs it,
    * before anything downstream persists raw text. Row-locality gives the
    * chunking-independence and redelivery-idempotence laws for free
    * (StreamingCurationSpec).
    */
  def piiScanStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.pipeline.Pii.scan(docs, textCol)
}
