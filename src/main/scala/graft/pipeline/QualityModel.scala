package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Model-based quality filtering at corpus scale — the inference half of a
  * fastText/CCNet-style quality classifier, expressed Spark-first.
  *
  * Features are the hashing trick over the shared BPE-ish pre-tokens
  * ([[TextAnalysis.bpeTokenCount]]'s segmentation — one token definition
  * across p3/p11/p22): each token maps to one of [[D]] buckets via the
  * portable polynomial hash + multiplicative finalizer (the p10/p11 gate
  * arithmetic under its own salt). The "model" is a deterministic integer
  * weight per bucket — a stand-in for trained weights in this
  * training-lib-free container; swapping in real weights is a 512-entry
  * literal map or a broadcast join, the plan shape doesn't change.
  *
  * The scoring pass is the shape that matters at 100 TB: ONE row-local
  * higher-order-function fold per document (`transform` + `aggregate`
  * over the token array), zero shuffle, zero UDF, whole-stage codegen end
  * to end — inference is embarrassingly parallel and reads a single
  * column. Every quantity is exact BIGINT (weights ∈ [−100, 100], so a
  * billion-token document stays far from overflow) except the final
  * per-token mean, a single exactly-rounded IEEE division both engines
  * agree on — the whole query hash-replays in DuckDB.
  */
object QualityModel {

  private val M = 1000000007L
  private val Fin = 6364136223L

  /** Feature buckets. 512 keeps the demo weight table readable; a real
    * fastText-style model uses 2^20 buckets — same arithmetic, no plan
    * change (the weight stays a derived column, never a lookup table
    * scan).
    */
  val D = 512

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Feature bucket of a token: finalized portable poly hash of the
    * salted token, mod [[D]]. Max intermediate (10^9+6)·Fin < 2^63.
    */
  private def bucketOf(tok: Column): Column =
    pmod(
      pmod(PolyHash.polyHash(concat(lit("graft-qm:"), tok)) * lit(Fin), lit(M)),
      lit(D)
    )

  /** Pseudo-trained weight for bucket `b`, exact-integer and centered on
    * zero: ((b+1)·2654435761 mod 1000003) mod 201 − 100 ∈ [−100, 100].
    */
  private def weightOf(b: Column): Column =
    pmod(pmod((b + lit(1L)) * lit(2654435761L), lit(1000003L)), lit(201L)) -
      lit(100L)

  /** p22 — per-document model score: summed hashed-feature weights over
    * the token stream (term frequency weighting — repeated tokens vote
    * repeatedly, as a linear bag-of-words model does), the per-token mean
    * as the length-normalized "logit", and the keep verdict at a zero
    * threshold.
    */
  def qualityModel(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.bpeTokens(col("text"))
    docs(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        aggregate(
          transform(col("toks"), t => weightOf(bucketOf(t))),
          lit(0L),
          (a, x) => a + x
        ).as("score")
      )
      .withColumn(
        "mean_w",
        when(col("n_toks") === 0, lit(0.0))
          .otherwise(col("score").cast("double") / col("n_toks"))
      )
      .withColumn("keep", col("mean_w") >= 0)
      .orderBy("doc_id")
  }

  /** P35 — bigram-LM familiarity scoring: an add-one-smoothed bigram
    * language model is "trained" (counted) on the HISTORY corpus (the d9
    * boundary split's old 80%) and each arriving document is scored by
    * its mean per-bigram familiarity — the classic perplexity-style
    * quality signal (CCNet's KenLM filter), expressed with an
    * exact-integer surrogate: weight_ppm(a,b) = (10⁶·(c(a,b)+1)) DIV
    * (c(a)+V), the add-one conditional in ppm, monotone in the real
    * probability, no floating log crossing engines. Out-of-vocabulary
    * bigrams get the smoothing floor, exactly as the model assigns them.
    *
    * Scale shape — deliberately the WORD-GRAIN complement of p26's
    * hashed-bucket broadcast profile: the unigram and bigram count
    * tables are vocabulary-sized (not broadcastable at 100 TB), so
    * scoring joins the batch's exploded bigrams AGAINST them on their
    * natural keys — two map-side-combined count aggregations at
    * training, two keyed shuffle joins at scoring, each moving only the
    * batch's bigram rows plus the counts they touch. A deployment
    * persists the count tables and appends to them; here training and
    * scoring compose into one oracle-replayable query.
    */
  def lmFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val boundary = Dedup.incrementalBoundary(spark, dir)
    val d = lmWords(docs(spark, dir))
    val hist = d.filter(col("doc_id") < boundary)
    scoreAgainstCounts(
      uniCounts(hist),
      biCounts(hist),
      d.filter(col("doc_id") >= boundary)
    )
  }

  // ---------------------------------------------------------------------
  // Persisted LM model — the count tables as a stored, appendable model
  // (the CCNet deployment shape the p35 docstring promises): counts are
  // ADDITIVE over disjoint doc batches, so appends write delta layers and
  // readers merge with one groupBy-sum per table — the k13
  // mergeable-raw-layers argument applied to the LM plane. V (vocabulary
  // size) is DERIVED from the merged unigram table (its row count), so it
  // stays exact across any append sequence with nothing extra stored.
  // Layout: `$out/uni` (w, cu) layers; `$out/bi` (a, b2, cb) layers.
  // ---------------------------------------------------------------------

  private def lmWords(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"),
      expr("filter(split(text, ' '), x -> x != '')").as("ws")
    )

  private def uniCounts(h: DataFrame): DataFrame =
    h.select(explode(col("ws")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("cu"))

  private def biCounts(h: DataFrame): DataFrame =
    h.select(explode(TextAnalysis.adjPairs(col("ws"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b2"))
      .agg(count(lit(1)).as("cb"))

  /** The shared scoring kernel: add-one conditionals from the given count
    * tables (vocabulary-sized — shuffle-joined on their natural keys,
    * never broadcast), every batch doc reported (docs with no bigrams
    * score 0). Both the inline p35 and the stored-model path run THIS, so
    * the two can never drift.
    */
  private def scoreAgainstCounts(
      uni: DataFrame,
      bi: DataFrame,
      batch: DataFrame
  ): DataFrame = {
    val vocab = uni.agg(count(lit(1)).as("v"))
    val newb = batch
      .select(col("doc_id"), explode(TextAnalysis.adjPairs(col("ws"))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b2"))
    val scored = newb
      .join(bi, Seq("a", "b2"), "left")
      .join(uni.withColumnRenamed("w", "a"), Seq("a"), "left")
      .crossJoin(broadcast(vocab)) // single-row vocabulary size
      .select(
        col("doc_id"),
        (lit(1000000L) * (coalesce(col("cb"), lit(0L)) + lit(1L)))
          .as("num"),
        (coalesce(col("cu"), lit(0L)) + col("v")).as("den")
      )
      .select(col("doc_id"), expr("num DIV den").as("wgt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("wgt").as("tot"))
    batch
      .select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0, expr("tot DIV n_bigrams"))
          .otherwise(lit(0L))
          .as("score_ppm")
      )
      .orderBy("doc_id")
  }

  /** Persists the LM count tables trained on `hist` (doc_id, text). Both
    * tables are LAYER-keyed from birth (layer 0 the base owned by
    * build/compaction, layer>0 one per training append) — see
    * [[appendToLmModel]] for why.
    */
  def writeLmModelOf(
      spark: SparkSession,
      hist: DataFrame,
      out: String
  ): Unit = graft.util.MaintainerLease.withMaintainer(
    out
  ) {
    // a REBUILD into an existing store supersedes any swapped generation:
    // drop the pointers so the plain directories are live again — under
    // the store's maintainer claim, so the retraction cannot race a
    // fenced compaction's swaps
    val root = out
    Seq("uni", "bi").foreach(n =>
      graft.util.Blob.deleteIfExists(graft.util.Loc.join(root, s"$n.current")))
    val h = lmWords(hist).cache()
    // fill the shared cache once, then the two count members (disjoint
    // directories) write concurrently (guide §2.6)
    h.count(): Unit
    graft.util.Par.run(
      () =>
        uniCounts(h)
          .withColumn("layer", lit(0L))
          .write
          .mode("overwrite")
          .partitionBy("layer")
          .parquet(s"$out/uni"),
      () =>
        biCounts(h)
          .withColumn("layer", lit(0L))
          .write
          .mode("overwrite")
          .partitionBy("layer")
          .parquet(s"$out/bi")
    )
    h.unpersist(false)
  }

  /** Appends a training batch's counts as delta layers — existing layers
    * are never read or rewritten (O(batch) ingest); readers merge by sum.
    * Batches must be disjoint document sets (re-ingesting a doc would
    * double-count, exactly as in the inverted index).
    *
    * Each batch lands under its own `layer` partition via DYNAMIC
    * partition overwrite, so replaying the SAME (batch, layer) REPLACES
    * the layer instead of stacking a second copy — the streaming trainer
    * keys the layer on the micro-batch id and stays exact under T1
    * redelivery (the inverted index's argument, verbatim). Layers must be
    * unique across distinct ingests (default fresh per call) and > 0.
    */
  def appendToLmModel(
      spark: SparkSession,
      batch: DataFrame,
      modelDir: String,
      layer: Long = System.nanoTime()
  ): Unit = {
    require(layer > 0L, "append layers must be > 0; layer 0 is the base")
    repairLmModel(modelDir)
    val root = modelDir
    def live(sub: String): String =
      graft.util.DirSwap.resolve(root, sub)
    val h = lmWords(batch).cache()
    uniCounts(h)
      .withColumn("layer", lit(layer))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("layer")
      .parquet(live("uni"))
    biCounts(h)
      .withColumn("layer", lit(layer))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy("layer")
      .parquet(live("bi"))
    h.unpersist(false)
  }

  /** Scores `batch` (doc_id, text) against the FROZEN stored model — no
    * training at scoring time: the delta layers merge with one
    * groupBy-sum per table, then the identical scoring kernel runs.
    * Row-identical to the inline form over the same history (LmStoreSpec).
    */
  /** Crash repair for an interrupted [[compactLmModel]]; called by every
    * model consumer. Per-directory ([[graft.util.DirSwap]]) — both tables'
    * read views are sum-merges, so compaction commutes per-directory.
    */
  def repairLmModel(modelDir: String): Unit = {
    val root = modelDir
    Seq("uni", "bi").foreach(graft.util.DirSwap.repair(root, _))
  }

  /** Compact the stored LM model in place: every training append writes a
    * delta layer, so a long-lived model accumulates small files and every
    * scoring pass pays the per-layer merge. Folds delta layers into the
    * base layer 0 — each count table to one summed layer in `targetFiles`
    * files — behind a build-then-swap ([[graft.util.DirSwap]]). Scores are
    * row-identical before and after (LmStoreSpec law); single-maintainer
    * posture, run between batches. `protectLayersAbove` keeps
    * possibly-redeliverable layers unfolded, exactly as in
    * [[graft.pipeline.Retrieval.compactInvertedIndex]].
    */
  def compactLmModel(
      spark: SparkSession,
      modelDir: String,
      targetFiles: Int = 8,
      protectLayersAbove: Long = Long.MaxValue
  ): Unit = graft.util.MaintainerLease.withMaintainer(
    modelDir
  ) {
    val root = modelDir
    repairLmModel(modelDir)
    def live(sub: String): String =
      graft.util.DirSwap.resolve(root, sub)
    val folded = when(
      col("layer").cast("long") <= lit(protectLayersAbove),
      lit(0L)
    ).otherwise(col("layer").cast("long"))
    graft.util.DirSwap.swap(root, "uni") { tmp =>
      spark.read
        .parquet(live("uni"))
        .withColumn("layer", folded)
        .groupBy("w", "layer")
        .agg(sum("cu").as("cu"))
        .repartition(targetFiles)
        .write
        .partitionBy("layer")
        .parquet(tmp.toString)
    }
    graft.util.DirSwap.swap(root, "bi") { tmp =>
      spark.read
        .parquet(live("bi"))
        .withColumn("layer", folded)
        .groupBy("a", "b2", "layer")
        .agg(sum("cb").as("cb"))
        .repartition(targetFiles)
        .write
        .partitionBy("layer")
        .parquet(tmp.toString)
    }
  }

  def scoreWithLmModel(
      spark: SparkSession,
      batch: DataFrame,
      modelDir: String
  ): DataFrame = {
    repairLmModel(modelDir)
    val root = modelDir
    def live(sub: String): String =
      graft.util.DirSwap.resolve(root, sub)
    scoreAgainstCounts(
      spark.read
        .parquet(live("uni"))
        .groupBy("w")
        .agg(sum("cu").as("cu")),
      spark.read
        .parquet(live("bi"))
        .groupBy("a", "b2")
        .agg(sum("cb").as("cb")),
      lmWords(batch)
    )
  }

  /** P35b — the stored-model lifecycle as one oracle-replayable query:
    * train on the first half of the history, APPEND the second half as a
    * later training batch, score the arriving docs against the stored
    * model. Merged counts are definitionally the full-history counts, so
    * the result is row-identical to the inline [[lmFamiliarity]] — same
    * oracle (the d9b/p33b pattern); the lifecycle (write → append →
    * merged-layer scoring) is what's under test.
    */
  def lmLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val boundary = Dedup.incrementalBoundary(spark, dir)
    val d = docs(spark, dir).select("doc_id", "text")
    Eager.withTempStore("graft-p35b-model") { tmp =>
      writeLmModelOf(spark, d.filter(col("doc_id") < boundary / 2), tmp)
      appendToLmModel(
        spark,
        d.filter(col("doc_id") >= boundary / 2 && col("doc_id") < boundary),
        tmp
      )
      scoreWithLmModel(spark, d.filter(col("doc_id") >= boundary), tmp)
    }
  }

  /** Model maintenance-debt report — the LM plane's analogue of
    * [[graft.pipeline.Retrieval.retrievalIndexHealth]]: one row of
    * store-layout facts, `compact_recommended` firing when the count
    * tables' delta layers exceed `compactOverLayers`. Layer identities
    * come from the partition column; file counts from one store listing.
    */
  def lmModelHealth(
      spark: SparkSession,
      modelDir: String,
      compactOverLayers: Int = 8
  ): DataFrame = {
    repairLmModel(modelDir)
    val root = modelDir
    def live(sub: String): String =
      graft.util.DirSwap.resolve(root, sub)
    def layersOf(sub: String): Long = spark.read
      .parquet(live(sub))
      .select(col("layer").cast("long"))
      .distinct()
      .count()
    // the single listing API (object-store swap point) — never a local walk
    def filesOf(sub: String): Long =
      graft.util.Fs.countParquetFiles(live(sub))
    val (uniL, biL, uniF, biF) =
      (layersOf("uni"), layersOf("bi"), filesOf("uni"), filesOf("bi"))
    spark
      .range(1)
      .select(
        lit(math.max(uniL, biL)).as("n_layers"),
        lit(uniF).as("n_uni_files"),
        lit(biF).as("n_bi_files"),
        lit(math.max(uniL, biL) > compactOverLayers).as("compact_recommended")
      )
  }

  // ---------------------------------------------------------------------
  // P37 — perplexity-tier sampling, the CCNet curation stage the p35
  // scorer exists to feed: rank the arriving batch by LM familiarity,
  // cut it into head / middle / tail tertiles, and keep each tier at its
  // own rate (head fully, middle half, tail a tenth — CCNet's
  // keep-the-head posture with deterministic integer keep rules so the
  // whole decision replays in DuckDB).
  // ---------------------------------------------------------------------

  /** The shared keep rule: head kept, middle every 2nd doc, tail every
    * 10th — doc_id-keyed (deterministic, join-free), the p19 hashed
    * sampling posture without the hash since doc_ids are uniform here.
    */
  private def keptRule: Column =
    when(
      col("tier") === 1L ||
        (col("tier") === 2L && pmod(col("doc_id"), lit(2L)) === 0L) ||
        (col("tier") === 3L && pmod(col("doc_id"), lit(10L)) === 0L),
      1L
    ).otherwise(0L)

  /** Tertile assignment by GLOBAL rank over the scored batch — the
    * oracle-exact form. The single-partition window is bounded by the
    * ARRIVING batch (p35's day-batch grain), not the corpus; the
    * corpus-scale / streaming form is [[tiersByThreshold]], which needs
    * no sort at all. `scored` is (doc_id, n_bigrams, score_ppm).
    */
  def tiersByRank(scored: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_ppm").desc, col("doc_id"))
    scored
      .withColumn("tier", ntile(3).over(w).cast("long"))
      .withColumn("kept", keptRule)
      .select("doc_id", "n_bigrams", "score_ppm", "tier", "kept")
      .orderBy("doc_id")
  }

  /** Tier assignment against FROZEN score thresholds (head ≥ `tHigh`,
    * middle ≥ `tLow`, tail below) — the 100 TB and streaming shape: a
    * row-local comparison, no global sort, thresholds maintained offline
    * from the history's score distribution (the p23 quantile-sketch job).
    * Chunking-independent by construction (each doc's tier depends only
    * on its own score), which is what the streaming twin's law pins.
    */
  def tiersByThreshold(
      scored: DataFrame,
      tLow: Long,
      tHigh: Long
  ): DataFrame =
    scored
      .withColumn(
        "tier",
        when(col("score_ppm") >= tHigh, 1L)
          .when(col("score_ppm") >= tLow, 2L)
          .otherwise(3L)
      )
      .withColumn("kept", keptRule)
      .select("doc_id", "n_bigrams", "score_ppm", "tier", "kept")

  /** P37 as a registered query: score the arriving split against the
    * history-trained model (p35's kernel verbatim), tier by global rank.
    */
  def perplexityTiers(spark: SparkSession, dir: String): DataFrame =
    tiersByRank(lmFamiliarity(spark, dir))
}
