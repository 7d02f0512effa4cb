package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** p9 — benchmark decontamination: for every training document, the
  * fraction of its DISTINCT character n-grams that also occur anywhere in
  * a held-out evaluation set. This is the standard pre-training hygiene
  * scan (strip benchmark passages out of the training corpus before they
  * leak into the model) and the cross-corpus counterpart of
  * [[Dedup.ngramJaccardPairs]]: d6 asks "which TRAIN pairs overlap",
  * p9 asks "which train docs overlap the EVAL set at all".
  *
  * Scale shape (the part that must survive 100 TB): the eval side is a
  * benchmark — megabytes, not terabytes — so its distinct gram dictionary
  * is broadcast and the train corpus is touched in ONE pass:
  * per-document distinct grams come from `array_distinct` on the
  * [[graft.functions.NgramPolyHash]] rolling-hash array (map-side, no
  * corpus-wide distinct shuffle), the membership probe is a broadcast
  * left join, and the only shuffle is the per-doc count aggregation —
  * partial-aggregated, one row per (doc, partition) on the wire. Nothing
  * corpus-sized is ever broadcast, collected, or joined shuffle-to-shuffle.
  *
  * The eval set here is carved from the same table by `doc_id % evalMod`
  * (the container has a single corpus); in deployment the eval frame is
  * any (doc_id, text) benchmark table — the operator takes it as a
  * DataFrame and never assumes it shares storage with the train side.
  */
object Decontamination {

  /** Contamination scan of `train` against `eval`: one row per train doc
    * with its distinct-gram count, eval-hit count, hit ratio, and the
    * `contaminated` verdict at `threshold`.
    */
  def scan(
      train: DataFrame,
      eval: DataFrame,
      n: Int = 7,
      threshold: Double = 0.5
  ): DataFrame = {
    // null text ≡ empty text (its single partial gram): without the
    // coalesce, explode of the null gram array silently DROPS the doc
    // from the scan — and from any curation built on it — while the
    // streaming row-local path and the SQL oracle keep it
    def distinctGrams(d: DataFrame): DataFrame =
      d.select(
        col("doc_id"),
        explode(
          array_distinct(
            graft.functions.NgramPolyHash
              .ngramHashes(coalesce(col("text"), lit("")), n)
          )
        ).as("g")
      )
    // benchmark gram dictionary: small by construction -> broadcast
    val evalGrams = distinctGrams(eval).select("g").distinct()
    distinctGrams(train)
      .join(broadcast(evalGrams.withColumn("hit", lit(1L))), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        coalesce(sum("hit"), lit(0L)).as("n_hit")
      )
      .withColumn(
        "ratio",
        col("n_hit").cast("double") / col("n_grams").cast("double")
      )
      .withColumn("contaminated", col("ratio") >= threshold)
  }

  /** d7 — NEAR-duplicate eval leakage: verified minhash near-dup pairs
    * that CROSS the train/eval boundary. [[contaminationScan]] catches
    * verbatim gram containment; this catches the paraphrased/perturbed
    * leak — an eval document whose near-copy (Jaccard ≥ threshold on
    * word shingles) sits in the training set. Reuses the d2 pair
    * pipeline (same banded index, same memo — zero extra corpus passes
    * in a suite that already ran d2) and keeps only pairs with exactly
    * one side in the eval slice; `eval_id`/`train_id` orient each pair.
    */
  def nearDupLeaks(
      spark: SparkSession,
      dir: String,
      evalMod: Int = 50
  ): DataFrame = {
    val pairs = Dedup.minhashPairs(spark, dir)
    val aEval = col("a") % evalMod === 0
    val bEval = col("b") % evalMod === 0
    pairs
      .filter(aEval =!= bEval)
      .select(
        when(aEval, col("a")).otherwise(col("b")).as("eval_id"),
        when(aEval, col("b")).otherwise(col("a")).as("train_id"),
        col("jaccard")
      )
      .orderBy("eval_id", "train_id")
  }

  /** The canonical p9 query: eval set = `doc_id % evalMod == 0` of the
    * documents table, train = the rest; ordered for the oracle compare.
    */
  def contaminationScan(
      spark: SparkSession,
      dir: String,
      n: Int = 7,
      evalMod: Int = 50,
      threshold: Double = 0.5
  ): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    scan(
      d.filter(col("doc_id") % evalMod =!= 0),
      d.filter(col("doc_id") % evalMod === 0),
      n,
      threshold
    ).orderBy("doc_id")
  }

  /** P29 — SURGICAL decontamination: rewrite each training document with
    * every position covered by an eval-overlapping `spanWords`-word
    * window cut out. [[scan]] (p9) SCORES contamination and the curation
    * built on it DROPS whole documents; this is the OLMo-style middle
    * path — a long document that happens to quote one benchmark passage
    * keeps everything except the quoted span. Exactly d12's
    * coverage-removal semantics ([[Dedup.removeDupSpansOf]]) with the
    * dup decision swapped from "occurs in ≥ 2 corpus docs" to "occurs
    * anywhere in the eval set", and it shares d12's stage-2 machinery
    * verbatim so the two rewrite paths cannot drift.
    *
    * Scale shape — strictly LIGHTER than d12: the eval side is a
    * benchmark (megabytes), so its distinct window set is broadcast and
    * the dup decision is a map-side broadcast semi-join; there is NO
    * corpus-wide window-valued shuffle at all. The only exchanges are
    * doc-keyed (coverage window + reassembly groupBy), perfectly
    * parallel per document at any corpus size. `fingerprint = true`
    * broadcasts 16-byte dual poly-hashes instead of window text — the
    * eval dictionary shrinks ~spanWords·avgWordLen/16× and the probe
    * key is fixed-width (same collision posture as d10/d12's
    * fingerprint mode; law-pinned row-identical in PipelineSpec).
    */
  def removeEvalSpans(
      train: DataFrame,
      eval: DataFrame,
      spanWords: Int = 4,
      fingerprint: Boolean = false
  ): DataFrame =
    removeEvalSpansAgainst(
      train,
      preparedEvalWindows(eval, spanWords, fingerprint),
      spanWords
    )

  /** The frozen benchmark window dictionary [[removeEvalSpansAgainst]]
    * probes — computed ONCE per benchmark (cache it for a streaming
    * loop; it is megabytes by construction).
    */
  def preparedEvalWindows(
      eval: DataFrame,
      spanWords: Int = 4,
      fingerprint: Boolean = false
  ): DataFrame =
    Dedup
      .spanWindows(Dedup.tokenized(eval), spanWords, fingerprint)
      .select("win")
      .distinct()

  /** [[removeEvalSpans]] against a pre-built window dictionary (text or
    * fingerprint keyed — the train side keys itself the same way by
    * probing the dictionary's column type). Doc-local given the frozen
    * dictionary, which is what makes the streaming form chunking-
    * independent by construction.
    */
  def removeEvalSpansAgainst(
      train: DataFrame,
      evalWins: DataFrame,
      spanWords: Int = 4
  ): DataFrame = {
    val ws = Dedup.tokenized(train)
    val fingerprint =
      evalWins.schema("win").dataType != org.apache.spark.sql.types.StringType
    // one row per (doc_id, start): spanWindows emits each start once and
    // the eval set is distinct, so the inner join cannot duplicate starts
    val dupStarts = Dedup
      .spanWindows(ws, spanWords, fingerprint)
      .join(broadcast(evalWins), Seq("win"))
      .select("doc_id", "i")
    Dedup.applySpanRemoval(ws, dupStarts, spanWords)
  }

  /** The canonical p29 query: same eval carve as p9 (`doc_id % evalMod
    * == 0`), L = 4 words (non-vacuous on the shipped corpus: the eval
    * slice shares 4-word spans with dozens of train docs; at L = 5 the
    * overlap collapses to the verbatim-dup pair, at L = 3 it touches
    * half the corpus).
    */
  def decontaminationRemoval(
      spark: SparkSession,
      dir: String,
      spanWords: Int = 4,
      evalMod: Int = 50
  ): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    removeEvalSpans(
      d.filter(col("doc_id") % evalMod =!= 0),
      d.filter(col("doc_id") % evalMod === 0),
      spanWords
    )
  }
}
