package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** p10 — deterministic weighted sampling: the data-mixing step of a
  * training pipeline (upsample wiki, downsample crawl) as a PURE FILTER.
  *
  * Each row's fate is a pure function of (salt, stratum, doc_id): keep iff
  * `poly_hash(salt:stratum:doc_id) mod granularity < rate(stratum) ·
  * granularity`. That buys, by construction, everything `rand()`-based
  * sampling loses at cluster scale:
  *
  *   - reproducible: re-running the job, on any cluster layout, with any
  *     partitioning, selects the SAME documents (rand() re-draws per task
  *     attempt; a retried partition samples differently);
  *   - monotone: raising a stratum's rate only ADDS documents (the gate is
  *     `hash < threshold`), so 10%-sample experiments are strict subsets
  *     of the 50% run and ablations nest;
  *   - shuffle-free: a filter on a codegen'd hash of row-local columns —
  *     pushdown-friendly, no repartition, no driver state, O(0) memory.
  *
  * Rates are snapped to integer parts-per-`granularity` on the driver so
  * the gate is exact integer arithmetic (no float-rounding drift between
  * engines — the DuckDB oracle replays the identical integers).
  */
object Sampling {

  /** Multiplicative finalizer: the raw polynomial hash is affine in a
    * key's trailing characters, so dense integer id spaces cluster mod
    * `granularity` (measured: 0.31 achieved at a 0.25 target over 50k
    * sequential ids). Multiplying by a fixed unit mod the prime is a
    * bijection that scrambles that additive structure (0.2496 achieved),
    * and stays exact-BIGINT arithmetic the SQL oracle replays:
    * max product = (10^9+6)·FIN < 2^63.
    */
  private val M = 1000000007L
  private val Fin = 6364136223L

  /** The hash gate in [0, granularity): finalized portable polynomial
    * hash of `salt:stratum:id`, replayable bit-for-bit in plain SQL.
    */
  def gate(salt: String, stratum: Column, id: Column, granularity: Long): Column =
    pmod(
      pmod(
        graft.functions.PolyHash.polyHash(
          concat_ws(":", lit(salt), stratum, id.cast("string"))
        ) * lit(Fin),
        lit(M)
      ),
      lit(granularity)
    )

  /** Weighted sample of `d`, stratified by column `by`: keep each row with
    * probability `rates(stratum)` (strata absent from `rates` default to
    * `defaultRate`). Deterministic in (salt, stratum, doc_id).
    */
  def weightedSample(
      d: DataFrame,
      rates: Map[String, Double],
      by: String = "source",
      salt: String = "graft",
      defaultRate: Double = 1.0,
      granularity: Long = 1000000L
  ): DataFrame = {
    // snap to integer thresholds driver-side: the executors compare longs
    val thresholds: Map[String, Long] =
      rates.map { case (k, v) => k -> math.round(v * granularity) }
    val threshold = coalesce(
      element_at(typedLit(thresholds), col(by)),
      lit(math.round(defaultRate * granularity))
    )
    d.filter(gate(salt, col(by), col("doc_id"), granularity) < threshold)
  }

  /** p11 — deterministic output sharding: the write side of a training
    * pipeline. Every document lands in `shard = finalized-hash(doc_id)
    * mod nShards` — reproducible (re-runs and retries produce the same
    * shard layout), stratum-free (the finalizer makes dense id ranges
    * spread uniformly, so shards balance without a corpus-wide sort or
    * repartition-by-range statistics pass), and composable with p10 (the
    * gate and the shard use different salts, so sampling never biases
    * shard membership). The canonical query emits the per-shard rollup —
    * doc count and summed BPE-ish token count (p3's token definition) —
    * which is also the artifact a training job actually consumes
    * (per-shard token budgets); rollup rows are O(nShards) at any corpus
    * size, and a single map-side-combined shuffle produces them.
    */
  def shardAssignment(
      spark: SparkSession,
      dir: String,
      nShards: Int = 32
  ): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val toks = TextAnalysis.bpeTokenCount(col("text"))
    d.select(
        gate("graft-shard", lit(""), col("doc_id"), nShards.toLong).as("shard"),
        toks.cast("long").as("toks")
      )
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("toks").as("total_tokens")
      )
      .orderBy("shard")
  }

  /** P19 — deterministic train/val/test split: each doc's split is a pure
    * function of (salt, doc_id) via the finalized hash gate — reproducible
    * across cluster layouts, retries and re-runs (a `rand()` split is
    * none of these), disjoint and exhaustive by construction, and
    * independent of the p10 sample gate and the p11 shard salt (different
    * salt ⇒ sampling/sharding never bias split membership — same argument
    * as p11's spec). Default 98/1/1 in gate-space.
    */
  def assignSplits(
      d: DataFrame,
      valPerMille: Long = 10L,
      testPerMille: Long = 10L,
      salt: String = "graft-split"
  ): DataFrame =
    d.withColumn("split", splitOf(col("doc_id"), valPerMille, testPerMille, salt))

  /** The split gate as a column: val/test/train by the finalized hash of
    * `key` — shared by the doc-keyed p19 assignment and the
    * cluster-keyed p30 assignment so the two can never drift.
    */
  def splitOf(
      key: Column,
      valPerMille: Long = 10L,
      testPerMille: Long = 10L,
      salt: String = "graft-split"
  ): Column = {
    val g = gate(salt, lit(""), key, 1000L)
    when(g < valPerMille, "val")
      .when(g < valPerMille + testPerMille, "test")
      .otherwise("train")
  }

  /** The canonical p19 query: split sizes and char mass per (split,
    * source) — the manifest a training job checks before consuming.
    */
  def splitManifest(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    assignSplits(d)
      .groupBy("split", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("total_chars")
      )
      .orderBy("split", "source")
  }

  /** P30 — leakage-free train/eval split: p19's deterministic hash gate
    * keyed by the NEAR-DUP CLUSTER label (d5's connected components over
    * the minhash pairs) instead of the doc_id, so every member of a
    * near-duplicate cluster lands in the SAME split — the train→eval
    * leakage d7 merely DETECTS after the fact is prevented at assignment
    * time. Singleton docs keep label = doc_id, so outside the clustered
    * mass the assignment coincides with p19 bit-for-bit; only clustered
    * docs can move, and `moved` records exactly which did.
    *
    * Scale shape: the label frame carries (doc_id, label) only — d5's
    * star-contraction already bounds that plane — and attaches with one
    * doc_id-keyed join; the gate itself is row-local exact-BIGINT
    * arithmetic on the label, so the whole assignment adds no shuffle
    * beyond the clustering it reuses. The canonical query runs an
    * eval-heavy 40/30/30 gate so cluster reassignment is non-vacuous at
    * spec scale; production uses p19's 98/1/1 defaults unchanged.
    */
  def leakFreeSplit(
      spark: SparkSession,
      dir: String,
      valPerMille: Long = 300L,
      testPerMille: Long = 300L,
      salt: String = "graft-split"
  ): DataFrame = {
    val labels = Dedup
      .components(Dedup.minhashPairs(spark, dir))
      .select(col("doc_id"), col("label"))
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id")
      .join(labels, Seq("doc_id"), "left")
      .withColumn("label", coalesce(col("label"), col("doc_id")))
      .select(
        col("doc_id"),
        col("label"),
        splitOf(col("label"), valPerMille, testPerMille, salt).as("split"),
        splitOf(col("doc_id"), valPerMille, testPerMille, salt)
          .as("split_naive")
      )
      .withColumn("moved", col("split") =!= col("split_naive"))
      .orderBy("doc_id")
  }

  /** P30b — split STABILITY under corpus growth: the lifecycle form of
    * p30. When a new batch arrives, old documents' splits are FROZEN
    * (eval sets must stay stable across crawls — retroactively moving a
    * doc out of eval invalidates every benchmark run against it); each
    * new document either ADOPTS the frozen split of the cluster it joins
    * (any near-dup link to history, exact or near — so a near-copy of a
    * train doc can never enter eval, even across batches) or, if its
    * cluster touches no history, gates on its own cluster label exactly
    * as the batch p30 would.
    *
    * The adoption anchor is deterministic: old ids all precede new ids,
    * so a mixed component's min-id label IS an old doc, and the new
    * members adopt that doc's frozen split. A new doc bridging two old
    * clusters with DIFFERENT frozen splits cannot repair history — the
    * old docs stay pinned — so the residual cross-split linkage is
    * REPORTED per component in `conflict` (the audit a pipeline alarms
    * on) instead of silently rewriting eval membership.
    *
    * Scale shape: one shingle→LSH pass over old ∪ new produces the pair
    * set; the old-only subset is a pure filter of it (candidate
    * generation and Jaccard verification are pair-local, so
    * restricting the corpus commutes with restricting the pairs); both
    * component planes carry (doc_id, label) only; every join is keyed
    * by doc_id or label. In production the old assignment and pair
    * index are read from the store (d9's persisted-index layout), not
    * re-derived — the oracle re-derives so the whole lifecycle replays.
    */
  def leakFreeSplitIncremental(
      spark: SparkSession,
      dir: String,
      valPerMille: Long = 300L,
      testPerMille: Long = 300L,
      salt: String = "graft-split"
  ): DataFrame = {
    val boundary = Dedup.incrementalBoundary(spark, dir)
    val (oldDocs, newDocs) = Dedup.incrementalSplitAt(spark, dir, boundary)
    leakFreeSplitIncrementalFrom(
      boundary,
      oldDocs,
      newDocs,
      Dedup.pairsOf(oldDocs.unionByName(newDocs)),
      valPerMille,
      testPerMille,
      salt
    )
  }

  /** [[leakFreeSplitIncremental]] with the pair plane supplied — the
    * production entry point (a stored pair index instead of a fresh LSH
    * pass) and the stress harness's separation of the quadratic pair
    * producer from the linear assignment layer.
    */
  def leakFreeSplitIncrementalFrom(
      boundary: Long,
      oldDocs: DataFrame,
      newDocs: DataFrame,
      pairs: DataFrame,
      valPerMille: Long = 300L,
      testPerMille: Long = 300L,
      salt: String = "graft-split"
  ): DataFrame = {
    val pairsOld =
      pairs.filter(col("a") < boundary && col("b") < boundary)
    def labelled(ids: DataFrame, p: DataFrame): DataFrame =
      ids
        .join(Dedup.components(p).select("doc_id", "label"), Seq("doc_id"), "left")
        .withColumn("label", coalesce(col("label"), col("doc_id")))
    // frozen history: batch-p30 assignment over the old corpus alone
    val oldAssign = labelled(oldDocs.select("doc_id"), pairsOld)
      .select(
        col("doc_id"),
        col("label"),
        splitOf(col("label"), valPerMille, testPerMille, salt).as("split")
      )
    // full-graph labels for every doc (conflict grain + adoption anchor)
    val fullLab = labelled(
      oldDocs.select("doc_id").unionByName(newDocs.select("doc_id")),
      pairs
    )
    val conflicts = fullLab
      .join(oldAssign.select(col("doc_id"), col("split").as("old_split")), Seq("doc_id"))
      .groupBy("label")
      .agg((countDistinct(col("old_split")) > 1).as("conflict"))
    val anchor = oldAssign
      .select(col("doc_id").as("label"), col("split").as("anchor_split"))
    val newRows = fullLab
      .filter(col("doc_id") >= boundary)
      .join(anchor, Seq("label"), "left")
      .select(
        col("doc_id"),
        col("label"),
        coalesce(
          col("anchor_split"),
          splitOf(col("label"), valPerMille, testPerMille, salt)
        ).as("split"),
        lit(true).as("is_new"),
        col("anchor_split").isNotNull.as("adopted")
      )
    val oldRows = oldAssign
      .select(
        col("doc_id"),
        col("label"),
        col("split"),
        lit(false).as("is_new"),
        lit(false).as("adopted")
      )
    oldRows
      .unionByName(newRows)
      // conflict lives at the FULL-graph component grain for every row
      .join(fullLab.withColumnRenamed("label", "full_label"), Seq("doc_id"))
      .join(
        conflicts.withColumnRenamed("label", "full_label"),
        Seq("full_label"),
        "left"
      )
      .withColumn("conflict", coalesce(col("conflict"), lit(false)))
      .select("doc_id", "label", "split", "is_new", "adopted", "conflict")
      .orderBy("doc_id")
  }

  /** The canonical p10 query: source `srcK` sampled at rate (K mod 5)/4 —
    * 0, 25%, 50%, 75%, 100% — exercising both degenerate gates (0 drops a
    * stratum entirely; 1 keeps it bit-for-bit).
    */
  def weightedSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val sources = d
      .select("source")
      .distinct()
      .collect() // stratum list: bounded by the source vocabulary, tiny
      .map(_.getString(0))
    // testdata sources are shaped `srcN`; anything else (reuse on a real
    // corpus) falls back to keep-all rather than throwing mid-plan
    val SrcN = "src(\\d+)".r
    val rates = sources.map {
      case s @ SrcN(n) => s -> (n.toLong % 5) * 0.25
      case s           => s -> 1.0
    }.toMap
    weightedSample(d, rates)
      .select("doc_id", "source")
      .orderBy("doc_id")
  }

  /** P20 — token-BUDGET data mixing: fill each stratum's token budget with
    * a deterministic document sequence (rate-based mixing — p10 — keeps a
    * fraction of DOCS; training mixes are specified in TOKENS per source,
    * which a rate can only approximate when doc lengths differ across
    * strata).
    *
    * Docs are ordered by the finalized hash gate (tiebreak doc_id), so the
    * fill order is a uniform permutation that is reproducible across
    * cluster layouts, retries and re-runs, and the manifest is MONOTONE in
    * the budget: a bigger budget's take-set strictly extends a smaller
    * one's — ablation runs nest, exactly the p10 guarantee transposed to
    * budgets. The greedy fill keeps every doc whose running total BEFORE
    * it is still under budget: the straddling doc is kept, so a nonzero
    * budget never yields an empty stratum and the fill lands within one
    * doc of the target.
    *
    * Cost: one keyed window (partition by stratum) over pre-aggregated
    * (id, n_toks) rows — token counting happens in the scan projection;
    * no text crosses the shuffle.
    *
    * Input `d` must carry (`doc_id`, `by`, `n_toks`).
    */
  def budgetMix(
      d: DataFrame,
      budgetTokens: Long,
      by: String = "source",
      salt: String = "graft-mix",
      granularity: Long = 1000000L
  ): DataFrame = {
    require(budgetTokens >= 0, s"negative budget: $budgetTokens")
    val w = Window
      .partitionBy(col(by))
      .orderBy(col("__pri"), col("doc_id"))
    d.withColumn("__pri", gate(salt, col(by), col("doc_id"), granularity))
      .withColumn(
        "cum_before",
        coalesce(
          sum("n_toks").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)
        )
      )
      .withColumn("take_rank", row_number().over(w))
      .filter(col("cum_before") < budgetTokens)
      .drop("__pri")
  }

  /** The canonical p20 query: every source filled to the same 800-token
    * budget (the corpus averages ~1.4k tokens per source, so the gate is
    * exercised on both sides — roughly half of each source's mass taken,
    * half cut).
    */
  def budgetMixQuery(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read
      .parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        col("source"),
        TextAnalysis.bpeTokenCount(col("text")).cast("long").as("n_toks")
      )
    budgetMix(d, budgetTokens = 800L)
      .select("source", "doc_id", "take_rank", "n_toks", "cum_before")
      .orderBy("source", "take_rank")
  }

  /** P24 — cluster-balanced corpus sampling: equal-size samples per
    * SEMANTIC cluster, the curation step that rebalances a topically
    * skewed crawl (source-stratified sampling — p10 — can't see topic
    * skew inside one source; SemDeDup-style pipelines follow dedup with
    * exactly this). Composes two exact-integer components so the whole
    * thing — training included — replays bit-for-bit in the oracle:
    *
    *   1. [[Similarity.trainCentroidsExact]] — integer spherical k-means
    *      over the k6 codes (driver state bounded at kCentroids×dim
    *      longs, one partial-aggregated shuffle per iteration);
    *   2. [[Similarity.assignCellsInt]] — row-local frozen-quantizer
    *      assignment, zero shuffle;
    *   3. the finalized hash gate as the within-cluster priority: take
    *      the `perCluster` gate-smallest vectors per cluster. The gate is
    *      the SAME uniform-permutation device as p10/p20 — reproducible
    *      across layouts and retries, nested across budgets (a bigger
    *      `perCluster` take-set extends a smaller one's), and independent
    *      of the sample/shard/split salts.
    *
    * Cost: training passes + ONE (cid)-keyed window whose input is
    * (vec_id, cid, h) rows — no embeddings cross the shuffle, and the
    * rank<=k filter plans as WindowGroupLimit (top-k pushdown), so a
    * cluster's surplus never materializes.
    */
  def clusterBalancedSample(
      spark: SparkSession,
      dir: String,
      perCluster: Int = 40,
      kCentroids: Int = 16,
      iters: Int = 3,
      salt: String = "graft-balance",
      granularity: Long = 1000000L
  ): DataFrame = {
    val codes = Similarity
      .quantized(spark, dir)
      .select(col("vec_id"), col("q8"))
      .cache()
    val centroids = Similarity.trainCentroidsExact(codes, kCentroids, iters)
    val w = Window.partitionBy("cid").orderBy(col("h"), col("vec_id"))
    val out = Similarity
      .assignCellsInt(codes, centroids)
      .select(
        col("cid"),
        col("vec_id"),
        gate(salt, lit(""), col("vec_id"), granularity).as("h")
      )
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= perCluster)
      .select("cid", "rk", "vec_id", "h")
      .orderBy("cid", "rk")
    Eager.materialized(out, codes)
  }

  /** P26 — target-affinity selection: hashed-n-gram importance ranking
    * toward a target domain, the DSIR recipe (Xie et al., "Data Selection
    * for Language Models via Importance Resampling") in integer-exact
    * form. DSIR learns bucketed n-gram importance weights
    * w(b) ∝ P_target(b)/P_raw(b) from a small in-domain set and ranks the
    * raw corpus by the summed weights of each document's tokens; the
    * float log-ratio is replaced here by the monotone integer surrogate
    * `(SCALE·(t_cnt+1)) DIV (r_cnt+1)` (add-one smoothing; SCALE=10⁶) so
    * every weight, score, and the final ranking replay bit-for-bit in the
    * oracle — no float enters any aggregate.
    *
    * Plan shape: ONE token pass builds the B-bucket profile (groupBy on
    * the codegen'd hash bucket, map-side combine collapses each
    * partition to ≤ B rows), the ≤ B-row weight table BROADCASTS back
    * into a second token pass, and the doc rollup is one doc-keyed
    * partial agg. The profile is O(B) driver-side regardless of corpus
    * size; token rows never shuffle (both groupBys combine map-side to
    * their small key spaces). At extreme corpus sizes (t_cnt approaching
    * SCALE⁻¹·2⁶³) shrink SCALE or sample the profile pass — the gate
    * stays monotone either way.
    */
  def targetAffinity(
      spark: SparkSession,
      dir: String,
      targetSource: String = "src18",
      buckets: Long = 8192L,
      topN: Int = 100
  ): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val toks = affinityTokens(d, buckets)
    toks
      .join(broadcast(affinityProfileOf(toks, targetSource)), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum("wgt").as("score"))
      .withColumn("avg_w", expr("score DIV n_tokens"))
      .orderBy(col("avg_w").desc, col("doc_id"))
      .limit(topN)
  }

  /** Exploded (doc_id, source, b) token-bucket rows of a documents frame. */
  /** DSIR's feature space: hashed word UNIGRAMS ∪ BIGRAMS. Each word is
    * char-hashed once ([[graft.functions.PolyHash]]); a bigram is the
    * Horner combine of its two word hashes (base 31 mod 10⁹+7 — the
    * shingle arithmetic of the dedup plane), so the character stream is
    * touched once per word, not once per feature. Both gram kinds reduce
    * mod `buckets` into ONE shared profile, exactly as the paper hashes
    * them into one table. All row-local (two array HOFs + one explode).
    */
  private val AffinityM = 1000000007L

  /** The single definition of the feature space, in two stages that
    * every consumer shares: [[affinityWordHashes]] (one pass over the
    * character stream) is PROJECTED as a named column first, and
    * [[affinityGramsOf]] builds unigrams ∪ bigram Horner combines from
    * that column REFERENCE — the word array is computed once per row, not
    * re-evaluated per slice (HOF subtrees carrying lambda variables are
    * excluded from Spark's subexpression elimination, so an inline
    * single-expression form would split/filter/hash every word 3-4×).
    * The oracle SQL is the one deliberate twin of this arithmetic.
    */
  private def affinityWordHashes(text: Column): Column =
    transform(
      filter(split(text, " "), w => w =!= lit("")),
      w => graft.functions.PolyHash.polyHash(w)
    )

  private def affinityGramsOf(wh: Column): Column = {
    val len = greatest(size(wh) - 1, lit(0))
    concat(
      wh,
      zip_with(
        slice(wh, lit(1), len),
        slice(wh, lit(2), len),
        (a, b) => (a * lit(31L) + b) % lit(AffinityM)
      )
    )
  }

  private def affinityTokens(d: DataFrame, buckets: Long): DataFrame =
    d.select(
      col("doc_id"),
      col("source"),
      affinityWordHashes(col("text")).as("wh")
    ).select(
      col("doc_id"),
      col("source"),
      explode(affinityGramsOf(col("wh"))).as("h")
    ).withColumn("b", pmod(col("h"), lit(buckets)))
      .select("doc_id", "source", "b")

  private def affinityProfileOf(
      toks: DataFrame,
      targetSource: String
  ): DataFrame =
    toks
      .groupBy("b")
      .agg(
        count(lit(1)).as("r_cnt"),
        sum(when(col("source") === targetSource, 1L).otherwise(0L))
          .as("t_cnt")
      )
      .select(
        col("b"),
        expr("(1000000L * (t_cnt + 1L)) DIV (r_cnt + 1L)").as("wgt")
      )

  /** The trained affinity profile as a dense bucket-indexed weight array —
    * the driver-side artifact the streaming scorer carries (B longs,
    * ~64 KB at B=8192; bounded by construction like the eval-gram
    * dictionary). Buckets no token ever hit get the smoothed floor weight
    * `10⁶ DIV (0+1)·…` — i.e. (10⁶·1) DIV 1 with t=r=0 — exactly what the
    * join-based form would have computed had a token hit them.
    */
  def affinityWeights(
      spark: SparkSession,
      d: DataFrame,
      targetSource: String = "src18",
      buckets: Int = 8192
  ): Array[Long] = {
    val w = new Array[Long](buckets)
    java.util.Arrays.fill(w, 1000000L) // (10⁶·(0+1)) DIV (0+1)
    affinityProfileOf(affinityTokens(d, buckets.toLong), targetSource)
      .collect()
      .foreach(r => w(r.getLong(0).toInt) = r.getLong(1))
    w
  }

  /** Row-LOCAL affinity scoring against a frozen weight array: the whole
    * computation is one codegen'd HOF fold over the document's own token
    * array — zero shuffle, zero state — so it applies unchanged to a
    * STREAMING frame (the p26 continuous form; see
    * [[graft.streaming.StreamingCuration.affinityScoreStream]]). Law
    * (PipelineSpec): equal to the join-based scoring on every doc.
    */
  def affinityScoreLocal(d: DataFrame, weights: Array[Long]): DataFrame = {
    val b = weights.length.toLong
    val wlit = lit(weights)
    // single-element transform() as a LET binding: a projected alias gets
    // re-inlined into every reference by CollapseProject (measured: the
    // word array was split+hashed 6× per row), but a lambda variable is
    // bound to its evaluated element exactly ONCE by HOF semantics — so
    // `wh` and the bucket array each compute once per row, guaranteed by
    // construction rather than by optimizer mood
    val scored = element_at(
      transform(
        array(affinityWordHashes(col("text"))),
        wh =>
          element_at(
            transform(
              array(transform(affinityGramsOf(wh), h => pmod(h, lit(b)))),
              bs =>
                struct(
                  size(bs).cast("long").as("n_tokens"),
                  aggregate(
                    bs,
                    lit(0L),
                    (acc, bk) => acc + element_at(wlit, (bk + 1).cast("int"))
                  ).as("score")
                )
            ),
            lit(1)
          )
      ),
      lit(1)
    )
    // inline(array(struct)) = one output row per input row through a
    // Generate node — a project-collapse BARRIER, so the struct (and the
    // whole HOF chain inside it) evaluates exactly once even though two
    // of its fields are consumed downstream
    d.select(col("doc_id"), inline(array(scored)))
      .filter(col("n_tokens") >= 1)
      .withColumn("avg_w", expr("score DIV n_tokens"))
  }

  /** P28 — per-source document caps: the RefinedWeb/C4-style "domain
    * cap" selection step. A handful of sources (in the web-crawl case,
    * domains) dominate any raw corpus; capping each source at its `cap`
    * best documents bounds every source's contribution and is the
    * standard guard against a single boilerplate-heavy domain swamping
    * the mixture. "Best" is a quality rank — score descending with
    * doc_id as the deterministic tie-break — so the survivors are stable
    * across runs and cluster layouts (a `rand()`-ordered cap is
    * neither).
    *
    * Scale shape: ONE shuffle on `source`, and the rank<=cap filter
    * plans as a WindowGroupLimit pushdown (spec-asserted) — each task
    * keeps a cap-sized heap per source group and the surplus rows die
    * map-side before the sort ever materializes, so the cost is
    * O(corpus) scan + O(sources · cap) surviving rows no matter how
    * skewed the per-source counts are. A truly pathological single-hot
    * -source corpus shuffles that source's rows to one task, but the
    * group-limit heap keeps its memory at O(cap); at 100 TB the
    * pre-aggregation form (per-partition top-cap, then global top-cap —
    * the same two-level idiom as p17's packing) drops in unchanged
    * because the rank function is duplicate-insensitive on the
    * (score, doc_id) total order.
    */
  def sourceCapsOf(d: DataFrame, score: Column, cap: Int): DataFrame = {
    val w = Window
      .partitionBy(col("source"))
      .orderBy(col("score").desc, col("doc_id").asc)
    d.select(col("doc_id"), col("source"), score.cast("long").as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= cap)
      .orderBy("source", "rnk")
  }

  /** The canonical p28 query: stored `n_chars` as the quality surrogate
    * (any score column — p1's composite, p22's model score — drops into
    * [[sourceCapsOf]] unchanged), cap = 20 per source.
    */
  def sourceCaps(spark: SparkSession, dir: String, cap: Int = 20): DataFrame =
    sourceCapsOf(
      spark.read.parquet(s"$dir/documents.parquet"),
      col("n_chars"),
      cap
    )

  /** The frozen reference profile p34 drifts against: the history
    * corpus's hashed token distribution in exact ppm — ≤ `buckets` rows
    * (bounded by construction, like p26's weight table), computed once
    * and broadcast into every later batch's report. Feature space is
    * p26's verbatim (unigram ∪ bigram char hashes mod buckets) so the
    * drift monitor and the affinity sampler can never disagree about
    * what a "token" is.
    */
  def frozenProfile(d: DataFrame, buckets: Long = 8192L): DataFrame = {
    val cnt = affinityTokens(d, buckets)
      .groupBy("b")
      .agg(count(lit(1)).as("o_cnt"))
    val tot = cnt.agg(sum("o_cnt").as("o_tot"))
    cnt
      .crossJoin(broadcast(tot)) // single-row total
      .select(col("b"), expr("o_cnt * 1000000 DIV o_tot").as("o_ppm"))
  }

  /** P34 — corpus-distribution drift report: each SOURCE in the arriving
    * batch gets its hashed-token distribution compared to the frozen
    * history profile — total-variation distance in exact ppm plus the
    * single worst bucket shift. This is the TEXT plane's k14: the row an
    * ingestion pipeline alerts on when a source's content changes shape
    * (crawler broke, spam flood, language shift) BEFORE the downstream
    * samplers (p20/p26/p28) silently re-weight garbage.
    *
    * Scale shape: the corpus is touched exactly twice, once per profile
    * (both map-side-combined aggregations to ≤ buckets rows); everything
    * after lives on the bounded (sources × buckets) lattice — built as a
    * union so buckets the batch never emits still contribute their full
    * reference mass, and batch-only buckets their full batch mass (TV
    * needs both tails). All integer (per-bucket ppm, |Δ| sums), so the
    * report hash-replays in DuckDB.
    */
  def driftReportOf(
      newD: DataFrame,
      refPpm: DataFrame,
      buckets: Long = 8192L
  ): DataFrame = {
    val newCnt = affinityTokens(newD, buckets)
      .groupBy("source", "b")
      .agg(count(lit(1)).as("n_cnt"))
      .cache()
    val newTot = newCnt.groupBy("source").agg(sum("n_cnt").as("n_tot"))
    val lattice = newCnt
      .select("source", "b")
      .union(
        newTot.select("source").crossJoin(broadcast(refPpm.select("b")))
      )
      .distinct()
    val out = lattice
      .join(broadcast(newTot), Seq("source"))
      .join(newCnt, Seq("source", "b"), "left")
      .join(broadcast(refPpm), Seq("b"), "left")
      .withColumn(
        "shift",
        expr("coalesce(n_cnt, 0L) * 1000000 DIV n_tot") -
          coalesce(col("o_ppm"), lit(0L))
      )
      .groupBy("source", "n_tot")
      .agg(
        sum(abs(col("shift"))).as("tv2"),
        max(abs(col("shift"))).as("max_shift_ppm")
      )
      .withColumn("tv_ppm", expr("tv2 DIV 2"))
      .select(
        col("source"),
        col("n_tot").as("n_tokens"),
        col("tv_ppm"),
        col("max_shift_ppm")
      )
      .orderBy(col("tv_ppm").desc, col("source"))
    Eager.materialized(out, newCnt)
  }

  /** The canonical p34 query: the d9 boundary split plays history vs
    * arriving batch (old 80% of doc_ids = the frozen profile, new 20% =
    * the monitored batch), per-source drift over the shared 8192-bucket
    * feature space.
    */
  def driftReport(
      spark: SparkSession,
      dir: String,
      buckets: Long = 8192L
  ): DataFrame = {
    val boundary = graft.pipeline.Dedup.incrementalBoundary(spark, dir)
    val d = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
    driftReportOf(
      d.filter(col("doc_id") >= boundary),
      frozenProfile(d.filter(col("doc_id") < boundary), buckets),
      buckets
    )
  }
}
