package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, each designed so
  * the candidate-generation step is a shuffle on a SMALL derived key (hash /
  * band / bucket) rather than an O(n²) comparison:
  *
  *   - exact:   groupBy(md5) — one shuffle of (hash, id), not documents
  *   - minhash: shingle → k minhashes → LSH bands → join within band-buckets
  *   - simhash: 64-bit bit-vote signature → bucket by 16-bit chunks (any
  *              pair within Hamming distance 3 shares one of 4 chunks)
  *   - n-gram Jaccard: exact verification on candidate pairs only
  *
  * At 100 TB the only all-pairs work happens inside LSH buckets, whose
  * expected size is corpus-independent for a fixed similarity threshold;
  * skewed buckets (boilerplate shingles) are handled by AQE skew-join
  * splitting.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Exact dedup: canonical assignment per content hash. Every doc maps to
    * the min doc_id sharing its md5; `is_dup` marks non-canonical copies.
    */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).withColumn("h", md5(col("text")))
    val w = Window.partitionBy("h")
    d.select(
        col("doc_id"),
        col("h"),
        min("doc_id").over(w).as("canonical_id"),
        (count(lit(1)).over(w) > 1).as("in_dup_group")
      )
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "canonical_id", "in_dup_group", "is_dup")
      .orderBy("doc_id")
  }

  /** All hashing in the dedup operators is PORTABLE arithmetic — a
    * polynomial rolling hash mod 1e9+7 over the character stream, affine
    * re-hashes for the minhash permutations, Horner combines for band
    * buckets. Every step is exact BIGINT arithmetic expressible in both
    * Spark and the DuckDB oracle, so d2/d3/d5 are hash-verifiable
    * end-to-end instead of rows-only (xxhash64 had no oracle equivalent).
    * Codegen'd higher-order functions, no UDF.
    */
  private[pipeline] val M = 1000000007L

  /** Polynomial char hash: fold (acc*base + codepoint) % mod — the p5
    * fingerprint idiom, proven byte-equal against DuckDB's list_reduce.
    * Computed by the native [[graft.functions.PolyHash]] expression (one
    * codegen'd pass, no per-character array cells — the declarative
    * split/transform/aggregate form dominated the d2/d3 profiles).
    */
  private[pipeline] def polyHash(
      s: Column,
      base: Long = 31L,
      mod: Long = M
  ): Column =
    graft.functions.PolyHash.polyHash(s, base, mod)

  /** Word 3-gram shingles of a document, hashed to bounded longs
    * immediately (downstream set operations shuffle longs, not strings —
    * the shingle text never leaves the map side). Each WORD is
    * char-hashed once and the shingle is a Horner combine of its n word
    * hashes — the character stream is touched once per word, not once per
    * shingle (a word sits in n shingles). One row per occurrence, NOT
    * deduplicated: MinHash is duplicate-insensitive (min over repeats is
    * the min), so the corpus-wide distinct shuffle is deliberately
    * avoided; Jaccard verification dedups its (small) candidate subset
    * itself.
    */
  def shingles(d: DataFrame, n: Int = 3): DataFrame = {
    val wordHashes = transform(split(col("text"), " "), w => polyHash(w))
    d.select(col("doc_id"), wordHashes.as("wh"))
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(0), greatest(size(col("wh")) - n, lit(0))),
            i =>
              aggregate(
                slice(col("wh"), i + 1, lit(n)),
                lit(0L),
                (acc, x) => (acc * 31L + x) % M
              )
          )
        ).as("shingle")
      )
  }

  /** Character n-gram hashes of a document (one row per occurrence) — the
    * tokenizer-free feature space for [[ngramJaccardPairs]]: every length-n
    * substring, hashed by the portable polynomial fold. No whitespace
    * assumption, so it catches near-dups word shingles miss (unsegmented
    * scripts, markup, concatenated tokens). Texts shorter than n contribute
    * their single partial gram (substr clamps), mirroring the short-doc
    * slice of [[shingles]]. Computed by the native
    * [[graft.functions.NgramPolyHash]] expression — ONE Rabin–Karp rolling
    * pass per document (the declarative
    * `transform(sequence, i -> poly_hash(substr))` form allocated a string
    * per gram and re-folded every character n times; it benchmarked 14×
    * slower than the word-shingle pipeline at sf0.1). The rolling
    * recurrence emits the identical polynomial values, so the DuckDB
    * oracle still replays substr+fold bit-for-bit.
    */
  def charNgrams(d: DataFrame, n: Int = 7): DataFrame =
    d.select(
      col("doc_id"),
      explode(
        graft.functions.NgramPolyHash.ngramHashes(col("text"), n)
      ).as("shingle")
    )

  /** n-gram Jaccard near-dup pairs (d6): exact Jaccard over character
    * n-gram SETS, with candidates from the same banded-minhash index the
    * word-shingle operator uses — direct all-pairs n-gram Jaccard is
    * O(n²) and never runs; the LSH index bounds the exact verification to
    * bucket collisions, so the operator scales exactly like [[minhashPairs]]
    * with a denser (per-character) feature space.
    */
  def ngramJaccardPairs(
      spark: SparkSession,
      dir: String,
      n: Int = 7,
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    // cached: read by the minhash aggregation and the Jaccard verification;
    // released before return (verifyJaccard materializes eagerly)
    val sh = charNgrams(docs(spark, dir), n).cache()
    val cand = minhashCandidates(sh, numPerms, rowsPerBand)
    val verified = verifyJaccard(cand, sh, threshold)
    sh.unpersist(false)
    verified
  }

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * numPerms minhashes from one xxhash64 per (shingle, perm-seed); bands of
    * `rowsPerBand` minhashes hash to a bucket; documents sharing any
    * (band, bucket) become a candidate pair; pairs are verified with exact
    * shingle-set Jaccard and filtered at `threshold`.
    *
    * Every stage is a groupBy/join on derived keys — documents never
    * pairwise-compare outside shared buckets.
    *
    * MEMOIZED per (session, dir, params): d2, d5 (clusters) and p8
    * (curation) all consume the same pair set — without the memo a full
    * suite runs the shingle→minhash→band pipeline three times. The memo
    * holds the eagerly-materialized (small) pair list, not any
    * corpus-scaled intermediate; [[releaseMemo]] drops it for long-lived
    * multi-tenant sessions.
    */
  private val pairMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Int, Double), DataFrame]

  /** Drops memoized pair lists (their blocks are then freed by the
    * ContextCleaner once unreferenced).
    */
  def releaseMemo(): Unit = pairMemo.clear()

  def minhashPairs(
      spark: SparkSession,
      dir: String,
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5
  ): DataFrame =
    pairMemo.getOrElseUpdate(
      (spark, dir, numPerms, rowsPerBand, threshold),
      pairsOf(docs(spark, dir), numPerms, rowsPerBand, threshold)
    )

  /** MinHash+LSH verified pairs over an arbitrary (doc_id, text) frame —
    * [[minhashPairs]] without the corpus binding or the session memo
    * (p30b runs it over the seeded incremental corpus). The result is
    * eagerly materialized; intermediates are released before return.
    */
  def pairsOf(
      d: DataFrame,
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    // cached: read once by the minhash aggregation and once by the
    // Jaccard verification; released before return (Eager.materialized)
    val sh = shingles(d).cache()
    val cand = minhashCandidates(sh, numPerms, rowsPerBand)
    // verifyJaccard materializes its result eagerly, so the cache can
    // be dropped here without re-triggering its upstream
    val verified = verifyJaccard(cand, sh, threshold)
    sh.unpersist(false)
    verified
  }

  /** LSH band index of a shingled corpus: one (doc_id, band, bucket) row
    * per document per band — minhash matrix → Horner band buckets.
    */
  def bandedIndex(
      sh: DataFrame,
      numPerms: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    // minhash matrix: doc × perm -> min over shingles of the p-th affine
    // re-hash (universal-hash family: (a_p·s + b_p) mod M, a_p odd)
    val perms = (0 until numPerms).map { p =>
      min((lit(2L * p + 1) * col("shingle") + lit(7919L * p + 12345L)) % M)
        .as(s"mh_$p")
    }
    val mh = sh.groupBy("doc_id").agg(perms.head, perms.tail: _*)

    // LSH bands: Horner-combine rowsPerBand consecutive minhashes per band
    val numBands = numPerms / rowsPerBand
    val bandCols = (0 until numBands).map { b =>
      struct(
        lit(b).as("band"),
        (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => col(s"mh_$i"))
          .reduceLeft((acc, c) => (acc * 31L + c) % M)
          .as("bucket")
      )
    }
    mh.select(col("doc_id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
  }

  /** MinHash-LSH candidate pairs of a shingled corpus (the stage before
    * Jaccard verification — also the batch law [[graft.streaming.StreamingDedup]]
    * is checked against).
    */
  def minhashCandidates(
      sh: DataFrame,
      numPerms: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    // cached: the self-join below reads the band index on BOTH legs — an
    // uncached plan would run the whole shingle→minhash aggregation twice.
    // Small (numBands rows per doc, no text), so the cache is cheap even
    // when the corpus isn't; released after the join materializes.
    val banded = bandedIndex(sh, numPerms, rowsPerBand).cache()
    val cand = banded
      .as("l")
      .join(
        banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id")
      )
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    Eager.materialized(cand, banded)
  }

  /** Exact shingle-set Jaccard for candidate pairs: |A∩B| via a join on the
    * shingle, |A∪B| = |A| + |B| − |A∩B|.
    *
    * Hybrid strategy on the candidate list (same shape as [[components]]'
    * driver/distributed branch): the pair list's size is MEASURED (cheap —
    * it derives from the small cached band index), and below
    * `broadcastThreshold` pairs the candidate/doc-id legs are broadcast so
    * the corpus-sized shingle set is filtered map-side and never shuffled.
    * Above the threshold (pathological boilerplate corpora) every join
    * falls back to unhinted shuffles on doc_id / the pair key, where AQE
    * handles skew splitting — the candidate list is the only thing ever
    * broadcast, never a corpus-scaled relation.
    */
  def verifyJaccard(
      cand0: DataFrame,
      sh: DataFrame,
      threshold: Double,
      broadcastThreshold: Long = 1L << 20
  ): DataFrame = {
    // read 4× below (size probe, both union legs, intersection); released
    // with the other intermediates at return
    val cand = cand0.cache()
    val candSmall = cand.limit(broadcastThreshold.toInt + 1).count() <=
      broadcastThreshold
    val hint: DataFrame => DataFrame =
      if (candSmall) broadcast(_) else identity
    val docsInPairs = cand
      .select(col("a").as("doc_id"))
      .union(cand.select(col("b").as("doc_id")))
      .distinct()
    val shc = sh
      .join(hint(docsInPairs), Seq("doc_id"), "left_semi")
      .distinct() // set semantics, applied to the candidate subset only
      .cache() // read 3× below (sizes + both intersection legs); candidate-
    //           bounded, so the cache is small even when the corpus isn't —
    //           and released before return (Eager.materialized)
    val sizes = shc.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val inter = shc
      .toDF("a", "shingle")
      .join(hint(cand), "a")
      .join(shc.toDF("b", "shingle"), Seq("b", "shingle"))
    val pairStats = inter.groupBy("a", "b").agg(count(lit(1)).as("n_inter"))
    val verified = pairStats
      .join(sizes.toDF("a", "na"), "a")
      .join(sizes.toDF("b", "nb"), "b")
      .withColumn(
        "jaccard",
        col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter"))
      )
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "n_inter", "na", "nb", "jaccard")
      .orderBy("a", "b")
    Eager.materialized(verified, shc, cand)
  }

  /** Connected components over near-duplicate pairs → cluster (canonical
    * document) assignment — the step that turns pairwise similarity into
    * keep/drop decisions for a training corpus.
    *
    * Distributed path: alternating small-star / large-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — each round re-points high nodes at their neighborhood
    * minimum, converging to per-component stars rooted at the component
    * MIN id in O(log² n) rounds regardless of graph diameter. That
    * diameter independence is the 100 TB property: a corpus of
    * incrementally-shifted near-dups forms a long CHAIN, where min-label
    * propagation needs O(chain length) rounds while star contraction
    * still finishes in a handful. Both star ops are expressed as
    * groupBy-min + equi-join (two keyed shuffles each, map-side partial
    * min) — NOT as collect_list neighborhoods, so a mega-cluster's root
    * never materializes its full neighbor set in one task.
    */
  def components(
      pairs: DataFrame,
      maxIters: Int = 30,
      localThreshold: Long = 1L << 20
  ): DataFrame = {
    // undirected edge list
    val edges = pairs
      .select(col("a"), col("b"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .cache()

    // Hybrid: near-dup graphs are usually far smaller than the corpus (only
    // docs that occur in a pair). Below the threshold a driver-side
    // union-find replaces the iterative join loop — each distributed round
    // costs plan+codegen+shuffle overhead that dwarfs 10^6 edges of work.
    // Above it, fall through to the scale path.
    if (edges.count() <= localThreshold) {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.as[(Long, Long)].collect()
      edges.unpersist(false)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a)
        parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val labels = parent.keys.map(k => (k, find(k))).toSeq
      return labels.toDF("doc_id", "label").orderBy("doc_id")
    }
    // Large-star: every neighbor ABOVE u re-points at min(Γ⁺(u)). Each
    // undirected edge is emitted by exactly its smaller endpoint, so the
    // output is again a plain (larger → smaller-or-equal-min) edge list.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e
        .select(col("a").as("u"), col("b").as("v"))
        .unionByName(e.select(col("b").as("u"), col("a").as("v")))
      val mins = sym
        .groupBy("u")
        .agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym
        .join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    // Small-star: orient edges high→low; every low neighbor AND the high
    // node itself re-point at the neighborhood minimum.
    def smallStar(e: DataFrame): DataFrame = {
      val ori = e.select(
        greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v")
      )
      val mins = ori.groupBy("u").agg(min("v").as("m"))
      ori
        .join(mins, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .unionByName(mins.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct()
    }
    // Iterate with lineage TRUNCATION, not just caching: each round's plan
    // references the previous round's ~6 times, so an uncut logical plan
    // grows 6^rounds and kills the driver during analysis long before any
    // data does. localCheckpoint materializes the round and restarts the
    // lineage from a LogicalRDD — the standard iterative-graph pattern.
    var cur = edges.select(col("a"), col("b")).localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = largeStar(smallStar(cur)).localCheckpoint()
      // star fixpoint = identical edge sets (both sides are distinct'd)
      converged = next.count() == cur.count() &&
        next.exceptAll(cur).isEmpty
      Eager.releaseCheckpoint(cur)
      cur = next
      iter += 1
    }
    // At the star fixpoint every non-root points at its component min;
    // roots label themselves.
    val labels = cur
      .select(col("a").as("doc_id"), col("b").as("label"))
      .unionByName(
        cur.select(col("b").as("doc_id"), col("b").as("label")).distinct()
      )
    val out = Eager.materialized(labels.orderBy("doc_id"), edges)
    Eager.releaseCheckpoint(cur)
    out
  }

  /** End-to-end near-dup clustering: minhash pairs → components → cluster
    * assignment with keep/drop flag (keep = min doc_id of the cluster).
    */
  /** D9 — incremental dedup: a NEW crawl batch against the EXISTING
    * corpus, the daily-ingest shape of d1+d2. The old side is hashed
    * independently of the new side (per-doc minhash depends only on the
    * doc's own shingles), so in production the old band index and shingle
    * sets are PERSISTED tables written by the previous run — each
    * increment hashes only the new batch and joins it against the stored
    * index; nothing corpus-sized is ever recomputed or broadcast.
    *
    * Output: one (new_id, old_id, kind, jaccard) row per cross-boundary
    * match; `exact` (byte-identical text, jaccard trivially 1.0) takes
    * precedence over `near` (band-candidate pairs at set-Jaccard ≥
    * threshold). New-vs-new duplicates are out of scope by design — the
    * previous run's d1/d2 already covers intra-batch dedup.
    */
  def incrementalDedup(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      threshold: Double = 0.5,
      numPerms: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val exact = newDocs
      .select(md5(col("text")).as("h"), col("doc_id").as("new_id"))
      .join(
        oldDocs.select(md5(col("text")).as("h"), col("doc_id").as("old_id")),
        Seq("h")
      )
      .select("new_id", "old_id")
    // cached: band index + Jaccard verification each read the shingle sets;
    // the old leg stands in for the persisted index of the previous run
    val shOld = shingles(oldDocs).cache()
    val shNew = shingles(newDocs).cache()
    val cand = bandedIndex(shOld, numPerms, rowsPerBand)
      .toDF("a", "band", "bucket")
      .join(
        bandedIndex(shNew, numPerms, rowsPerBand)
          .toDF("b", "band_n", "bucket_n"),
        col("band") === col("band_n") && col("bucket") === col("bucket_n")
      )
      .select("a", "b")
      .distinct()
    val near = verifyJaccard(cand, shOld.unionByName(shNew), threshold)
    val nearOnly = near
      .select(col("b").as("new_id"), col("a").as("old_id"), col("jaccard"))
      .join(exact, Seq("new_id", "old_id"), "left_anti")
    val result = exact
      .select(
        col("new_id"),
        col("old_id"),
        lit("exact").as("kind"),
        lit(1.0).as("jaccard")
      )
      .unionByName(
        nearOnly.select(
          col("new_id"),
          col("old_id"),
          lit("near").as("kind"),
          col("jaccard")
        )
      )
      .orderBy("new_id", "old_id")
    // materialize BEFORE unpersisting — an unpersist on the still-lazy
    // result would drop the cache before it ever served a read
    Eager.materialized(result, shOld, shNew)
  }

  /** Persist the dedup index of a corpus — the tables the NEXT
    * [[incrementalDedup]] run consumes instead of re-hashing the corpus:
    * `$out/bands` (doc_id, band, bucket), `$out/shingles`
    * (doc_id, shingle) and `$out/hashes` (doc_id, h) for the exact leg.
    * At 100 TB `bands` is bucketed by (band, bucket) so the candidate
    * join co-locates; shingles are only ever read candidate-bounded
    * (verifyJaccard's left-semi prune reaches the scan).
    */
  def writeDedupIndex(
      spark: SparkSession,
      docs: DataFrame,
      out: String,
      numPerms: Int = 16,
      rowsPerBand: Int = 4
  ): Unit = {
    import spark.implicits._
    val sh = shingles(docs).cache()
    // fill the shared shingle cache once, then overlap the independent
    // member writes (disjoint directories; guide §2.6) — bands and
    // shingles read the cache, hashes/params re-derive from `docs`
    sh.count(): Unit
    graft.util.Par.run(
      () =>
        bandedIndex(sh, numPerms, rowsPerBand).write
          .mode("overwrite")
          .parquet(s"$out/bands"),
      () => sh.write.mode("overwrite").parquet(s"$out/shingles"),
      () =>
        docs
          .select(col("doc_id"), md5(col("text")).as("h"))
          .write
          .mode("overwrite")
          .parquet(s"$out/hashes"),
      // the index is self-describing: the banding parameters ride with it
      // so a reader can never join bands computed under a different fold
      () =>
        Seq((numPerms, rowsPerBand))
          .toDF("num_perms", "rows_per_band")
          .write
          .mode("overwrite")
          .parquet(s"$out/params")
    )
    sh.unpersist(false)
  }

  /** Runtime bloom gate: build a bloom filter over `small`'s keys
    * (bounded — a batch, not a corpus) and prune `big` with a codegen'd
    * [[graft.functions.BloomMightContain]] predicate BEFORE any join.
    * No false negatives, so a gated join is row-identical to the ungated
    * one (law in IndexStoreSpec); false positives only cost superfluous
    * probes at `fpp` rate. At 100 TB this is the difference between
    * shuffling the whole stored index into the equi-join and shuffling
    * ~|batch keys| · (1+fpp) of it — the filter travels to the scan as a
    * task-local object, the stored side dies partition-locally.
    */
  private[graft] def gateByBloom(
      big: DataFrame,
      bigKey: org.apache.spark.sql.Column,
      small: DataFrame,
      smallKey: org.apache.spark.sql.Column,
      fpp: Double = 0.01
  ): DataFrame = {
    val keys = small.select(smallKey.as("k"))
    val n = math.max(keys.count(), 64L)
    val bytes = graft.functions.BloomMightContain.serialize(
      keys.stat.bloomFilter("k", n, fpp)
    )
    big.filter(graft.functions.BloomMightContain.mightContain(bigKey, bytes))
  }

  /** The d9b size switch: engage the bloom gate only when the stored
    * index (hashes + bands rows) clears `minRows`. The counts are
    * parquet footer statistics — no column data is read — so the
    * decision costs O(files) driver-side metadata, not a scan. Exposed
    * for the crossover spec.
    */
  private[graft] def bloomGateEngaged(
      spark: SparkSession,
      indexDir: String,
      minRows: Long
  ): Boolean =
    minRows <= 0L ||
      spark.read.parquet(s"$indexDir/hashes").count() +
      spark.read.parquet(s"$indexDir/bands").count() >= minRows

  /** [[incrementalDedup]] against a PERSISTED index ([[writeDedupIndex]]):
    * the old corpus never re-hashes — its bands/shingles/hashes stream
    * from the stored tables; only the new batch is hashed fresh, under
    * the banding parameters READ FROM THE INDEX (band/bucket values from
    * different folds would equi-join to nothing and silently drop every
    * near-duplicate). Output contract identical to the in-memory form
    * (law-checked in IndexStoreSpec).
    *
    * `bloomGate = true` is the 100 TB read path (d9b): the stored hashes
    * and bands scans are pruned by [[gateByBloom]] runtime filters built
    * from the NEW batch's keys, so the two index joins touch
    * O(batch · (1+fpp)) stored rows instead of the whole index — the
    * batch is always the small side of a daily increment. Row-identical
    * to the ungated form by the no-false-negative law.
    *
    * CROSSOVER (measured, sf0.1): the gate costs a batch-side bloom
    * build + an extra band-set pass (~3 s) that the plain equi-join
    * doesn't pay, so it only WINS when the stored index is ≫ the batch —
    * the daily-increment regime it exists for. Below
    * `bloomMinIndexRows` stored rows (hashes + bands) the gate
    * auto-disengages and the plain join runs — same rows either way, so
    * the switch is plan-only and invisible to the oracle. Force the
    * gated plan regardless of size with `bloomMinIndexRows = 0` (the
    * plan-assert spec does); the default threshold is sized so a plain
    * join over the stored index is still trivially cheap at the point
    * the gate declines.
    */
  def incrementalDedupFromIndex(
      spark: SparkSession,
      indexDir: String,
      newDocs: DataFrame,
      threshold: Double = 0.5,
      bloomGate: Boolean = false,
      fpp: Double = 0.01,
      bloomMinIndexRows: Long = 4L << 20
  ): DataFrame = {
    val gateOn = bloomGate && bloomGateEngaged(spark, indexDir, bloomMinIndexRows)
    val newHashed = newDocs
      .select(md5(col("text")).as("h"), col("doc_id").as("new_id"))
    val storedHashes = {
      val raw = spark.read.parquet(s"$indexDir/hashes")
      if (!gateOn) raw
      else gateByBloom(raw, xxhash64(col("h")), newHashed, xxhash64(col("h")), fpp)
    }
    val exact = newHashed
      .join(storedHashes.select(col("h"), col("doc_id").as("old_id")), Seq("h"))
      .select("new_id", "old_id")
    val params = spark.read.parquet(s"$indexDir/params").head()
    val numPerms = params.getAs[Int]("num_perms")
    val rowsPerBand = params.getAs[Int]("rows_per_band")
    val shNew = shingles(newDocs).cache()
    val newBands = {
      val nb =
        bandedIndex(shNew, numPerms, rowsPerBand).toDF("b", "band_n", "bucket_n")
      // gating reads the band set twice (bloom build + join): cache it
      if (gateOn) nb.cache() else nb
    }
    val storedBands = {
      val raw = spark.read.parquet(s"$indexDir/bands").toDF("a", "band", "bucket")
      if (!gateOn) raw
      else
        gateByBloom(
          raw,
          xxhash64(col("band"), col("bucket")),
          newBands,
          xxhash64(col("band_n"), col("bucket_n")),
          fpp
        )
    }
    val cand = storedBands
      .join(
        newBands,
        col("band") === col("band_n") && col("bucket") === col("bucket_n")
      )
      .select("a", "b")
      .distinct()
    val near = verifyJaccard(
      cand,
      spark.read.parquet(s"$indexDir/shingles").unionByName(shNew),
      threshold
    )
    val nearOnly = near
      .select(col("b").as("new_id"), col("a").as("old_id"), col("jaccard"))
      .join(exact, Seq("new_id", "old_id"), "left_anti")
    val result = exact
      .select(
        col("new_id"),
        col("old_id"),
        lit("exact").as("kind"),
        lit(1.0).as("jaccard")
      )
      .unionByName(
        nearOnly.select(
          col("new_id"),
          col("old_id"),
          lit("near").as("kind"),
          col("jaccard")
        )
      )
      .orderBy("new_id", "old_id")
    Eager.materialized(result, (Seq(shNew) ++ Option.when(gateOn)(newBands)): _*)
  }

  /** The canonical d9b query: the same split and oracle as d9, with the
    * old corpus persisted as a stored index and the stored-side scans
    * pruned by the batch-built runtime blooms — the production daily-
    * increment read path, end to end. The size switch applies: below
    * [[bloomGateEngaged]]'s threshold (every test SF) the gate declines
    * and the plain index join runs — the gated PLAN is pinned by the
    * IndexStoreSpec plan assert with the threshold forced to 0, and the
    * two paths are row-identical by the no-false-negative law, so the
    * oracle sees the same rows whichever side of the crossover runs.
    */
  def incrementalDedupGatedQuery(spark: SparkSession, dir: String): DataFrame = {
    val (oldDocs, newDocs) = incrementalSplit(spark, dir)
    Eager.withTempStore("graft-d9b-index") { tmp =>
      writeDedupIndex(spark, oldDocs, tmp)
      incrementalDedupFromIndex(spark, tmp, newDocs, bloomGate = true)
    }
  }

  /** The id boundary of [[incrementalSplit]]: ids below it play the old
    * corpus. Exposed so consumers (d9's split, p30b's frozen-history
    * lookup) share one derivation.
    */
  def incrementalBoundary(spark: SparkSession, dir: String): Long = {
    val maxId =
      docs(spark, dir).agg(max("doc_id")).head().getLong(0)
    require(
      maxId < 1000000L,
      "seed id offset collides with corpus doc_ids" // same guard as
    ) // Similarity.seededCorpus: a silent collision would corrupt BOTH
    //   the query and its oracle identically and pass the gate wrong
    (maxId + 1L) * 4L / 5L
  }

  /** The canonical d9 corpus split: the top 20% of doc_ids play the new
    * batch, seeded with verbatim copies of ten old docs (fresh ids +1e6)
    * so the exact leg has non-vacuous ground truth — the corpus has no
    * byte-identical cross-id text of its own. Shared by the query and the
    * persisted-index law spec so the two can never drift apart.
    */
  def incrementalSplit(
      spark: SparkSession,
      dir: String
  ): (DataFrame, DataFrame) =
    incrementalSplitAt(spark, dir, incrementalBoundary(spark, dir))

  /** [[incrementalSplit]] with the boundary precomputed — callers that
    * also need the boundary itself (p30b) avoid a second id-max scan.
    */
  def incrementalSplitAt(
      spark: SparkSession,
      dir: String,
      split: Long
  ): (DataFrame, DataFrame) = {
    val d = docs(spark, dir).select("doc_id", "text")
    val copies = d
      .filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val all = d.unionByName(copies)
    (all.filter(col("doc_id") < split), all.filter(col("doc_id") >= split))
  }

  /** The canonical d9 query over [[incrementalSplit]]. */
  def incrementalDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val (oldDocs, newDocs) = incrementalSplit(spark, dir)
    incrementalDedup(oldDocs, newDocs)
  }

  def nearDupClusters(spark: SparkSession, dir: String): DataFrame = {
    // minhashPairs returns an eagerly-materialized result, so the edge-list
    // union's double scan re-reads blocks, not lineage — no extra cache
    val pairs = minhashPairs(spark, dir)
    components(pairs)
      .withColumn("keep", col("doc_id") === col("label"))
      .orderBy("doc_id")
  }

  /** D11 — quality-aware canonical selection: the materialization step a
    * curation pipeline runs AFTER clustering. d5 keeps each cluster's
    * min-id member (an arbitrary survivor); real pipelines keep the BEST
    * member — here the longest document (word count, ties to the lower
    * doc_id), the deterministic stand-in for a quality model's score
    * (swap in p22's scorer unchanged: any integer quality key works).
    * Docs outside every cluster are their own canonical.
    *
    * Scale shape: the cluster labels carry only (doc_id, label); quality
    * is computed row-local on the corpus scan, and the argmax is one
    * window over `label` shuffling (id, label, n_words) — never text.
    * Cluster sizes bound the per-task work exactly as d5's contraction
    * already does; mostly-singleton partitions make the window cheap.
    */
  def canonicalSelection(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashPairs(spark, dir)
    val labels = components(pairs)
    val scored = docs(spark, dir)
      .select(
        col("doc_id"),
        (length(col("text")) -
          length(replace(col("text"), lit(" "), lit(""))) + 1)
          .cast("long")
          .as("n_words")
      )
      .join(labels.select("doc_id", "label"), Seq("doc_id"), "left")
      .withColumn("label", coalesce(col("label"), col("doc_id")))
    // first_value over the (quality desc, id asc) order = the per-cluster
    // argmax; the default running frame starts at the partition head, so
    // every row of the cluster sees the same winner
    val w = Window
      .partitionBy("label")
      .orderBy(col("n_words").desc, col("doc_id"))
    scored
      .withColumn("canonical_id", first("doc_id").over(w))
      .withColumn("kept", col("doc_id") === col("canonical_id"))
      .select("doc_id", "label", "n_words", "canonical_id", "kept")
      .orderBy("doc_id")
  }

  /** SimHash near-dup: 60-bit signature by bit-voting word-hash bits,
    * bucketed by 15-bit chunks for candidate generation (pigeonhole: any
    * pair within Hamming distance 3 collides on ≥1 of the 4 chunks).
    * Output: candidate pairs with their Hamming distance ≤ maxDist.
    *
    * RECALL CONTRACT: candidate generation is exhaustive only for
    * distance ≤ 3 (the pigeonhole bound); pairs at distance 4..maxDist
    * surface only when their differing bits happen to spare one chunk —
    * the standard simhash chunking tradeoff (more chunks = more recall =
    * more candidates). The DuckDB oracle replays the identical candidate
    * generation, so the check pins the implementation, not exhaustive
    * distance-8 recall.
    *
    * The 60-bit word hash is two independent polynomial char hashes (each
    * < 2^30) packed as h1·2^30 + h2 — exact BIGINT arithmetic the DuckDB
    * oracle replays bit-for-bit (xxhash64 had no oracle equivalent).
    */
  def simhashPairs(
      spark: SparkSession,
      dir: String,
      maxDist: Int = 8
  ): DataFrame = {
    val nBits = 60
    val chunkBits = 15
    val d = docs(spark, dir)
    // affine post-scrambles (bijections mod each prime) spread the short
    // words whose raw polynomial value is far below the modulus — without
    // them the high bits of every common word vote identically and the
    // signature loses most of its discrimination
    val words = d
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn(
        "h",
        ((lit(123456789L) * polyHash(col("w"), 31L, M) + 987654321L) % M) *
          (1L << 30) +
          (lit(362437L) * polyHash(col("w"), 37L, 998244353L) + 9876543L) %
            998244353L
      )

    // bit-vote: for each bit, +1 if set else -1; sign of sum = bit
    val bitCols = (0 until nBits).map { i =>
      sum(
        when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)
      ).as(s"b_$i")
    }
    val sig = words
      .groupBy("doc_id")
      .agg(bitCols.head, bitCols.tail: _*)
      .select(
        col("doc_id"),
        (0 until nBits)
          .map(i =>
            when(col(s"b_$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
          )
          .reduce((a, b) => a.bitwiseOR(b))
          .as("sig")
      )

    // cached: the self-join below reads the chunk index on BOTH legs — an
    // uncached plan would run the word-explode bit-vote aggregation twice.
    // 4 rows per doc, two longs each; released before return.
    val chunked = sig.select(
      col("doc_id"),
      col("sig"),
      explode(
        array((0 until 4).map { c =>
          struct(
            lit(c).as("chunk"),
            shiftright(col("sig"), c * chunkBits)
              .bitwiseAND((1L << chunkBits) - 1).as("key")
          )
        }: _*)
      ).as("ck")
    ).cache()

    val cand = chunked
      .as("l")
      .join(
        chunked.as("r"),
        col("l.ck.chunk") === col("r.ck.chunk") &&
          col("l.ck.key") === col("r.ck.key") &&
          col("l.doc_id") < col("r.doc_id")
      )
      .select(
        col("l.doc_id").as("a"),
        col("r.doc_id").as("b"),
        col("l.sig").as("sig_a"),
        col("r.sig").as("sig_b")
      )
      .distinct()

    val out = cand
      .withColumn("dist", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
      .orderBy("a", "b")
    Eager.materialized(out, chunked)
  }

  /** D10 — cross-document duplicate-SPAN mass: for each document, how many
    * of its L-word windows also occur verbatim in at least one OTHER
    * document. This is the signal behind exact-substring train-set dedup
    * (suffix-array dedup a la Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"): near-dup metrics (d2/d6) score whole
    * documents, while a long verbatim span buried in an otherwise-unique
    * page — a license block, a syndicated paragraph, a memorized quote —
    * only shows up position-wise.
    *
    * Shape: explode each doc into its word windows, aggregate at
    * (doc_id, window) (map-side combine collapses in-doc repeats), then
    * count each window's DISTINCT docs as a COUNT OVER (PARTITION BY
    * window) — a row count at the already-collapsed grain, no
    * countDistinct pass and, deliberately, no self-join: the two-leg
    * join form makes Catalyst re-scan and re-aggregate the whole corpus
    * for the per-window leg (no subplan reuse) and tempts a broadcast of
    * the full window dictionary. The doc rollup then shuffles only
    * (doc_id, count, dup-flag) rows — the window text never crosses the
    * final exchange.
    *
    * The window key shuffled is, by default, the literal L-word text:
    * exact by construction (this is the correctness oracle's form). With
    * `fingerprint = true` the key becomes a dual independent portable
    * poly-hash of the window (two coprime base/modulus pairs, ~2⁶⁰ joint
    * space packed in one 16-byte struct) computed in the codegen'd
    * [[graft.functions.PolyHash]] pass — the 100 TB form: it cuts the
    * shuffled key from the L-word string (~80 B at L=10) to 16 B and
    * makes a cross-corpus collision vanishingly unlikely (~1e-18 per
    * pair) without changing the plan shape or any downstream column. The
    * PipelineSpec law pins the two forms row-identical on the
    * test corpus (collision-free there by construction); the canonical
    * d10 query runs the text form because the fingerprint is
    * xxhash-free but still not expressible as the oracle's exact
    * window-text semantics.
    *
    * Docs shorter than L words have no windows and drop out (n_windows = 0
    * rows carry no signal). `dup_frac` is one IEEE division of two exact
    * BIGINTs — oracle-replayable.
    */
  def dupSpans(
      spark: SparkSession,
      dir: String,
      spanWords: Int = 10,
      fingerprint: Boolean = false,
      skewSafe: Boolean = false
  ): DataFrame = {
    val wins = docs(spark, dir)
      .select(
        col("doc_id"),
        expr("filter(split(text, ' '), x -> x <> '')").as("ws")
      )
      .filter(size(col("ws")) >= spanWords)
      .select(
        col("doc_id"),
        explode(
          expr(
            s"transform(sequence(1, size(ws) - ${spanWords - 1}), " +
              s"i -> array_join(slice(ws, i, $spanWords), ' '))"
          )
        ).as("win")
      )
    val keyed =
      if (!fingerprint) wins
      else
        wins.select(
          col("doc_id"),
          struct(
            graft.functions.PolyHash.polyHash(col("win"), 31L, 1000000007L).as("h1"),
            graft.functions.PolyHash.polyHash(col("win"), 131L, 998244353L).as("h2")
          ).as("win")
        )
    val perDocWin = keyed
      .groupBy("doc_id", "win")
      .agg(count(lit(1)).as("c"))
    val (flagged, cached) = withWinCount(perDocWin, skewSafe)
    val out = flagged
      .select("doc_id", "c", "nd")
      .groupBy("doc_id")
      .agg(
        sum("c").as("n_windows"),
        count(lit(1)).as("distinct_windows"),
        sum(when(col("nd") >= 2, col("c")).otherwise(0L)).as("dup_positions"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup_distinct")
      )
      .withColumn(
        "dup_frac",
        col("dup_positions").cast("double") / col("n_windows").cast("double")
      )
      .orderBy("doc_id")
    cached.fold(out)(c => Eager.materialized(out, c))
  }

  /** Attach `nd` (distinct-doc count of the window) to collapsed
    * (doc_id, win, …) rows.
    *
    * Default: `COUNT OVER (PARTITION BY win)` — one exchange, zero
    * recompute, the form the oracle replays. A window function has no
    * skew mitigation, so a boilerplate span (license block, syndicated
    * footer) concentrates its rows on one task — but at the COLLAPSED
    * grain that task does a single spill-safe sorted scan of one narrow
    * row per containing doc, linear and bounded; SpanSkewStress measured
    * it FASTER than the alternative at every reachable occupancy
    * (planted universal-boilerplate corpus, 5×/10×/20×: the window form
    * held ~flat while the decomposed form paid cache + a second
    * win-keyed shuffle — 2.6–3.3× slower for d10, more for d12 whose
    * cached rows carry start arrays).
    *
    * `skewSafe` is the measured-and-kept escape hatch for the extreme
    * tail (occupancy ~10⁸+, where a single-task sort becomes a
    * straggler): nd as a two-level groupBy — map-side combine REDUCES
    * the hot key to one partial row per task instead of gathering it —
    * joined back under AQE skew-join splitting. Law (PipelineSpec): both
    * forms row-identical; the skewSafe cache is released by the caller's
    * materialization. Returns (flagged rows, the cache to release).
    */
  private def withWinCount(
      perDocWin: DataFrame,
      skewSafe: Boolean
  ): (DataFrame, Option[DataFrame]) =
    if (!skewSafe)
      (
        perDocWin
          .withColumn("nd", count(lit(1)).over(Window.partitionBy("win"))),
        None
      )
    else {
      // cached: the groupBy leg and the join probe leg both read it —
      // uncached, Catalyst re-scans and re-aggregates the corpus twice
      val cached = perDocWin.cache()
      val nd = cached.groupBy("win").agg(count(lit(1)).as("nd"))
      (cached.join(nd, "win"), Some(cached))
    }

  /** D12 — duplicate-span REMOVAL: the actionable form of [[dupSpans]].
    * d10 measures how much of each document sits inside cross-document
    * verbatim L-word windows; this operator REWRITES the corpus with those
    * positions cut out — the Spark analogue of exact-substring train-set
    * dedup (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better": remove every substring shared verbatim across documents,
    * keep the unique remainder).
    *
    * Semantics: a word position is removed iff it is COVERED by at least
    * one window (length L words, any start) whose text occurs in ≥ 2
    * distinct documents. Coverage of position p = OR over the ≤ L window
    * starts i ∈ [p−L+1, p] of dup(i) — computed as a windowed MAX over a
    * per-position start flag, ROWS L−1 PRECEDING. Documents shorter than L
    * words have no windows and pass through verbatim.
    *
    * Plan shape (two bounded shuffles, both O(corpus words)):
    *  1. window grain — the d10 aggregation at (doc_id, win) with the
    *     start POSITIONS carried as a packed array (in-doc repeats
    *     collapse into one row, so the per-window COUNT OVER row count IS
    *     the distinct-doc count, the d10 trick: no countDistinct, no
    *     self-join). Only dup windows explode their starts back out.
    *  2. doc grain — word rows left-join the dup starts on (doc_id, pos)
    *     (a co-partitioned equi-join: both sides hash on the same compound
    *     key), one per-doc ordered window pass marks coverage, and one
    *     final groupBy reassembles the kept words via a sorted
    *     struct-collect (order restored by position, not by arrival).
    * The window TEXT never reaches the doc-grain stages — it dies inside
    * stage 1; at 100 TB the [[dupSpans]] fingerprint idiom (16-byte dual
    * poly-hash keys) applies to stage 1 unchanged.
    */
  def removeDupSpans(
      spark: SparkSession,
      dir: String,
      spanWords: Int = 10,
      fingerprint: Boolean = false,
      skewSafe: Boolean = false
  ): DataFrame =
    removeDupSpansOf(
      docs(spark, dir).select("doc_id", "text"),
      spanWords,
      fingerprint,
      skewSafe
    )

  /** [[removeDupSpans]] over an explicit (doc_id, text) frame. */
  def removeDupSpansOf(
      d: DataFrame,
      spanWords: Int = 10,
      fingerprint: Boolean = false,
      skewSafe: Boolean = false
  ): DataFrame = {
    val ws = tokenized(d)
    // stage 1: dup-window starts, at (doc_id, win) grain (d10's collapse)
    val (flagged, cached) = withWinCount(
      spanWindows(ws, spanWords, fingerprint)
        .groupBy("doc_id", "win")
        .agg(collect_list(col("i")).as("starts")),
      skewSafe
    )
    val dupStarts = flagged
      .filter(col("nd") >= 2)
      .select(col("doc_id"), explode(col("starts")).as("i"))
    val out = applySpanRemoval(ws, dupStarts, spanWords)
    cached.fold(out)(c => Eager.materialized(out, c))
  }

  /** (doc_id, ws) word arrays — the shared d10/d12 tokenization. */
  private[pipeline] def tokenized(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"),
      expr("filter(split(text, ' '), x -> x <> '')").as("ws")
    ).filter(size(col("ws")) >= 1)

  /** One row per L-word window occurrence: (doc_id, i, win) with `win`
    * either the literal window text (oracle form) or the 16-byte dual
    * poly-hash struct (the 100 TB shuffle key — d10's fingerprint idiom,
    * law-pinned row-identical to the text form).
    */
  private[pipeline] def spanWindows(
      ws: DataFrame,
      spanWords: Int,
      fingerprint: Boolean
  ): DataFrame = {
    val wins = ws
      .filter(size(col("ws")) >= spanWords)
      .select(
        col("doc_id"),
        explode(
          expr(
            s"transform(sequence(1, size(ws) - ${spanWords - 1}), " +
              s"i -> struct(i AS i, " +
              s"array_join(slice(ws, i, $spanWords), ' ') AS win))"
          )
        ).as("x")
      )
      .select(col("doc_id"), col("x.i").as("i"), col("x.win").as("win"))
    if (!fingerprint) wins
    else
      wins.select(
        col("doc_id"),
        col("i"),
        struct(
          graft.functions.PolyHash.polyHash(col("win"), 31L, 1000000007L)
            .as("h1"),
          graft.functions.PolyHash.polyHash(col("win"), 131L, 998244353L)
            .as("h2")
        ).as("win")
      )
  }

  /** Stage 2 of span removal: given (doc_id, i) dup-window starts, mark
    * coverage (windowed MAX, ROWS L−1 PRECEDING) and reassemble the
    * surviving words in position order.
    */
  private[pipeline] def applySpanRemoval(
      ws: DataFrame,
      dupStarts: DataFrame,
      spanWords: Int
  ): DataFrame = {
    val words = ws.select(
      col("doc_id"),
      size(col("ws")).cast("long").as("n"),
      posexplode(col("ws")).as(Seq("p0", "word"))
    ).withColumn("p", col("p0") + 1)
    words
      .join(
        dupStarts,
        words("doc_id") === dupStarts("doc_id") && col("p") === col("i"),
        "left"
      )
      .select(
        words("doc_id"),
        col("n"), col("p"), col("word"),
        when(col("i").isNotNull, 1).otherwise(0).as("s")
      )
      .withColumn(
        "covered",
        max(col("s")).over(
          Window.partitionBy("doc_id").orderBy("p")
            .rowsBetween(-(spanWords - 1), 0)
        )
      )
      .groupBy("doc_id")
      .agg(
        max(col("n")).as("n_words"),
        sum(col("covered")).cast("long").as("n_removed"),
        array_join(
          transform(
            array_sort(
              collect_list(
                when(col("covered") === 0, struct(col("p"), col("word")))
              )
            ),
            x => x.getField("word")
          ),
          " "
        ).as("cleaned_text")
      )
      .orderBy("doc_id")
  }

  /** Persist the span index of a corpus: the DISTINCT window fingerprints
    * the next [[removeDupSpansAgainstIndex]] run consumes instead of
    * re-windowing the old corpus. Presence is all the incremental form
    * needs (one old occurrence + one new occurrence already makes a
    * cross-doc dup), so counts are deliberately not stored and appends
    * stay idempotent. Self-describing: spanWords rides with the index so
    * a reader can never join windows of a different length.
    */
  def writeSpanIndex(
      spark: SparkSession,
      d: DataFrame,
      out: String,
      spanWords: Int = 10
  ): Unit = graft.util.MaintainerLease.withMaintainer(
    out
  ) {
    import spark.implicits._
    // a REBUILD into an existing store supersedes any swapped generation;
    // fenced so the retraction cannot race a compaction's swap
    graft.util.Blob.deleteIfExists(
      graft.util.Loc.join(out, "windows.current"))
    spanWindows(tokenized(d), spanWords, fingerprint = true)
      .select("win")
      .distinct()
      .write
      .mode("overwrite")
      .parquet(s"$out/windows")
    Seq(spanWords).toDF("span_words").write
      .mode("overwrite")
      .parquet(s"$out/params")
  }

  /** Append a batch's windows to a persisted span index: only windows the
    * index does not already hold are written (left-anti against the stored
    * set), so the index stays DISTINCT by construction — the contract
    * [[removeDupSpansAgainstIndex]]'s equi-join relies on (a duplicated
    * stored window would duplicate dup-start rows). Append-only parquet;
    * single writer (the streaming dedup loop), same posture as the IVF
    * index's `appendToIvfIndex`.
    */
  def appendToSpanIndex(
      spark: SparkSession,
      indexDir: String,
      d: DataFrame
  ): Unit = {
    repairSpanIndex(indexDir)
    val spanWords =
      spark.read.parquet(s"$indexDir/params").head().getAs[Int]("span_words")
    // materialize the novel set BEFORE appending: the anti-join reads the
    // same directory the append writes — checkpointing pins the result so
    // the write job can't re-list the target mid-append
    val novel = Eager.materialized(
      spanWindows(tokenized(d), spanWords, fingerprint = true)
        .select("win")
        .distinct()
        .join(
          spark.read.parquet(graft.util.DirSwap.resolve(indexDir, "windows")),
          Seq("win"),
          "left_anti"
        )
    )
    novel.write.mode("append").parquet(graft.util.DirSwap.resolve(indexDir, "windows"))
    Eager.releaseCheckpoint(novel)
  }

  /** D13 — WITHIN-doc self-repetition removal, keep-first: positions
    * covered by a later occurrence of an L-word window that already
    * occurred earlier in the SAME document are cut; the first occurrence
    * (and everything non-repeated) survives. The within-doc complement of
    * [[removeDupSpansOf]] (cross-doc) and the actionable form of p15's
    * repetition DETECTION — the C4-style cleanup for pages that loop
    * their own boilerplate (menus repeated per section, pagination
    * echoes, chat logs quoting themselves).
    *
    * Plan shape: strictly cheaper than d12 — the dup decision is
    * doc-LOCAL (a window's repeat starts are `starts` minus its earliest
    * element, straight out of the same (doc_id, win) collapse), so there
    * is NO corpus-wide window grain at all: one (doc_id, win) groupBy,
    * one doc-keyed coverage pass, perfectly parallel per document at any
    * corpus size. No hot keys exist by construction (a window's group is
    * bounded by its repeats within ONE doc).
    */
  def removeRepeatedSpans(
      spark: SparkSession,
      dir: String,
      spanWords: Int = 3
  ): DataFrame =
    removeRepeatedSpansOf(docs(spark, dir).select("doc_id", "text"), spanWords)

  /** [[removeRepeatedSpans]] over an explicit (doc_id, text) frame. The
    * semantics are PER-DOCUMENT — no cross-doc term anywhere — which is
    * what makes the streaming form
    * ([[graft.streaming.StreamingCuration.selfRepetitionStream]])
    * chunking-independent by construction.
    */
  def removeRepeatedSpansOf(d: DataFrame, spanWords: Int = 3): DataFrame = {
    val ws = tokenized(d)
    val dupStarts = spanWindows(ws, spanWords, fingerprint = false)
      .groupBy("doc_id", "win")
      .agg(collect_list(col("i")).as("starts"))
      .filter(size(col("starts")) >= 2)
      // every start except the earliest is a repeat
      .select(
        col("doc_id"),
        explode(
          expr("slice(array_sort(starts), 2, size(starts) - 1)")
        ).as("i")
      )
    applySpanRemoval(ws, dupStarts, spanWords)
  }

  /** P27 — per-source dedup AUDIT report: the observability view a
    * production pipeline monitors after every dedup run — for each
    * source, how much of its corpus is exact-duplicate and how much of
    * its text mass sits inside cross-document spans. Composes the d1 and
    * d10 planes at the `source` grain (a report, not a new mechanism —
    * which is the point: the planes must compose without re-deriving
    * anything).
    *
    * All aggregates are exact integers; the one ratio per source is a
    * single IEEE division of two exact sums (the q22 discipline), so the
    * report hash-replays in the oracle. Plan: d1's hash window + d10's
    * window grain feed two source-grain rollups joined on the tiny
    * source dimension — nothing new shuffles at corpus scale.
    */
  def dedupReport(spark: SparkSession, dir: String): DataFrame = {
    val src = docs(spark, dir).select("doc_id", "source")
    val exactBySrc = exact(spark, dir)
      .join(src, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_exact_dups"),
        sum(when(col("in_dup_group"), 1L).otherwise(0L)).as("n_in_dup_groups")
      )
    val spansBySrc = dupSpans(spark, dir)
      .join(src, "doc_id")
      .groupBy("source")
      .agg(
        sum("n_windows").as("span_windows"),
        sum("dup_positions").as("span_dup_positions")
      )
    exactBySrc
      .join(spansBySrc, Seq("source"), "left")
      .select(
        col("source"),
        col("n_docs"),
        col("n_exact_dups"),
        col("n_in_dup_groups"),
        coalesce(col("span_windows"), lit(0L)).as("span_windows"),
        coalesce(col("span_dup_positions"), lit(0L))
          .as("span_dup_positions"),
        (coalesce(col("span_dup_positions"), lit(0L)).cast("double") /
          greatest(coalesce(col("span_windows"), lit(0L)), lit(1L))
            .cast("double")).as("span_dup_frac")
      )
      .orderBy("source")
  }

  /** Compact a span index in place: the streaming loop appends one file
    * set per micro-batch, so a long-lived index accretes small files and
    * every per-batch join pays the listing/open overhead. Rewrites the
    * (distinct by construction) window set into `targetFiles` parquet
    * files behind the generation swap ([[graft.util.DirSwap]] — a fresh
    * generation directory published by an atomic pointer replace, the
    * previous generation retained for in-flight readers), so concurrent
    * readers never lose listed files mid-read. The set itself is
    * untouched: readers see identical windows before and after (spec'd).
    * Single maintainer, like the appends.
    */
  def compactSpanIndex(
      spark: SparkSession,
      indexDir: String,
      targetFiles: Int = 8
  ): Unit = graft.util.MaintainerLease.withMaintainer(
    indexDir
  ) {
    val root = indexDir
    val live = graft.util.DirSwap.resolve(root, "windows")
    graft.util.DirSwap.swap(root, "windows") { tmp =>
      spark.read
        .parquet(live)
        .repartition(targetFiles)
        .write
        .parquet(tmp.toString)
    }
  }

  /** Consumer-side validation hook for the span index's generation swap
    * (see [[graft.util.DirSwap.repair]]): with the pointer publish there
    * is nothing to adopt — a crashed compaction leaves an orphan
    * generation or a stale pointer tmp, both invisible to readers and
    * swept by the next swap. Kept so every consumer's call site still
    * fails fast on a store damaged outside the protocol.
    */
  def repairSpanIndex(indexDir: String): Unit =
    graft.util.DirSwap.repair(indexDir, "windows")

  /** D12 incremental form: clean a NEW batch against a PERSISTED span
    * index ([[writeSpanIndex]]) — the old corpus never re-windows. A new
    * doc's position is removed iff a window containing it either exists
    * in the index (≥ 1 old occurrence ⇒ cross-doc dup with the new one)
    * or occurs in ≥ 2 distinct docs of the new batch itself.
    *
    * Law (IndexStoreSpec): equal, row for row including cleaned text, to
    * [[removeDupSpansOf]] over (old ∪ new) restricted to the new ids —
    * presence-only index suffices because batch coverage only ever asks
    * "≥ 2 distinct docs", never "how many".
    *
    * Scale: the index join is an equi-join on the 16-byte fingerprint —
    * new-batch windows against a bucketed windows table; the old corpus
    * contributes O(distinct windows) storage and no recompute.
    */
  def removeDupSpansAgainstIndex(
      spark: SparkSession,
      indexDir: String,
      newDocs: DataFrame
  ): DataFrame = {
    repairSpanIndex(indexDir)
    val spanWords =
      spark.read.parquet(s"$indexDir/params").head().getAs[Int]("span_words")
    val ws = tokenized(newDocs)
    val grouped = spanWindows(ws, spanWords, fingerprint = true)
      .groupBy("doc_id", "win")
      .agg(collect_list(col("i")).as("starts"))
    val dupStarts = grouped
      .withColumn("nd", count(lit(1)).over(Window.partitionBy("win")))
      .join(
        spark.read.parquet(graft.util.DirSwap.resolve(indexDir, "windows"))
          .select(col("win").as("iw"), lit(1).as("in_index")),
        col("win") === col("iw"),
        "left"
      )
      .filter(col("nd") >= 2 || col("in_index").isNotNull)
      .select(col("doc_id"), explode(col("starts")).as("i"))
    applySpanRemoval(ws, dupStarts, spanWords)
  }

  /** D14 — PARAGRAPH-grain dedup, cross-document keep-first: the CCNet
    * cleanup step (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data" dedups crawl text at the
    * paragraph hash grain before anything else touches it). Each
    * document is segmented into fixed-`chunkWords` paragraphs (this
    * corpus carries no newline structure, so the deterministic
    * fixed-width segmentation stands in for the paragraph splitter — a
    * real corpus swaps in `split(text, '\n')` upstream and nothing else
    * changes); every occurrence of a paragraph EXCEPT the globally first
    * (minimal (doc_id, position), the processing order of a sequential
    * CCNet pass) is cut, and each document is reassembled from its
    * surviving paragraphs.
    *
    * Where it sits in the plane: d1 drops whole duplicate DOCUMENTS,
    * d12 cuts duplicated sliding WINDOWS wherever they occur (removing
    * every copy), d13 is within-doc; d14 is the between-doc keep-first
    * at a coarse grain — boilerplate paragraphs (headers, license
    * blocks, nav text) survive exactly once in the corpus instead of
    * zero or N times.
    *
    * Plan shape: the chunk grain has n/chunkWords rows per doc (~20×
    * fewer than d12's per-position window grain), ONE corpus-wide
    * shuffle keyed by the paragraph value picks winners (min-struct
    * window — no countDistinct, no self-join), and the doc-keyed
    * reassembly is the same sorted conditional-collect as d12's stage 2.
    * `fingerprint = true` is the 100 TB form: the corpus-wide shuffle
    * key becomes the 16-byte dual poly-hash and the paragraph TEXT never
    * leaves its map task — winners rejoin the map-side chunk rows on
    * (doc_id, j) (law-pinned row-identical in CorpusOpsSpec, same
    * collision posture as d10/d12's fingerprint mode).
    */
  def paragraphDedup(
      spark: SparkSession,
      dir: String,
      chunkWords: Int = 20,
      fingerprint: Boolean = false
  ): DataFrame =
    paragraphDedupOf(
      docs(spark, dir).select("doc_id", "text"),
      chunkWords,
      fingerprint
    )

  /** One row per fixed-width paragraph: (doc_id, n, j, chunk) — the
    * shared d14 segmentation (tail chunk may run short).
    */
  private[pipeline] def chunkRows(ws: DataFrame, chunkWords: Int): DataFrame =
    ws.select(
        col("doc_id"),
        size(col("ws")).cast("long").as("n"),
        explode(
          expr(
            s"transform(sequence(0, (size(ws) - 1) div $chunkWords), " +
              s"j -> struct(j AS j, " +
              s"array_join(slice(ws, j * $chunkWords + 1, $chunkWords), ' ')" +
              s" AS chunk))"
          )
        ).as("x")
      )
      .select(
        col("doc_id"),
        col("n"),
        col("x.j").as("j"),
        col("x.chunk").as("chunk")
      )

  /** The 16-byte dual poly-hash fingerprint — d10/d12's shuffle-key idiom
    * at the paragraph grain.
    */
  private[pipeline] def chunkFp(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    struct(
      graft.functions.PolyHash.polyHash(c, 31L, 1000000007L).as("h1"),
      graft.functions.PolyHash.polyHash(c, 131L, 998244353L).as("h2")
    )

  /** Stage 2 of paragraph dedup: reassemble each doc from its kept
    * chunks (`marked` carries doc_id, n, j, chunk, keep).
    */
  private def reassembleChunks(marked: DataFrame): DataFrame =
    marked
      .groupBy("doc_id")
      .agg(
        max(col("n")).as("n_words"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(
              collect_list(
                when(col("keep"), struct(col("j"), col("chunk")))
              )
            ),
            x => x.getField("chunk")
          ),
          " "
        ).as("cleaned_text")
      )
      .orderBy("doc_id")

  /** [[paragraphDedup]] over an explicit (doc_id, text) frame. */
  def paragraphDedupOf(
      d: DataFrame,
      chunkWords: Int = 20,
      fingerprint: Boolean = false
  ): DataFrame = {
    val chunks = chunkRows(tokenized(d), chunkWords)
    val byChunk = Window.partitionBy("key")
    val first = min(struct(col("doc_id"), col("j"))).over(byChunk)
    val marked =
      if (!fingerprint)
        chunks
          .withColumn("key", col("chunk"))
          .withColumn("first", first)
          .withColumn(
            "keep",
            col("first.doc_id") === col("doc_id") && col("first.j") === col("j")
          )
          .select("doc_id", "n", "j", "chunk", "keep")
      else {
        // the corpus-wide shuffle carries (doc_id, j, 16-byte key) only;
        // winners rejoin the map-side chunk rows on the (doc_id, j)
        // compound key, so the paragraph text never crosses the hot
        // chunk-valued exchange
        val winners = chunks
          .select(col("doc_id"), col("j"), chunkFp(col("chunk")).as("key"))
          .withColumn("first", first)
          .filter(
            col("first.doc_id") === col("doc_id") && col("first.j") === col("j")
          )
          .select(col("doc_id").as("kd"), col("j").as("kj"))
        chunks
          .join(
            winners,
            col("doc_id") === col("kd") && col("j") === col("kj"),
            "left"
          )
          .withColumn("keep", col("kd").isNotNull)
          .select("doc_id", "n", "j", "chunk", "keep")
      }
    reassembleChunks(marked)
  }

  /** Persist the paragraph index of a corpus: the DISTINCT chunk
    * fingerprints later [[paragraphDedupAgainstIndex]] runs consume.
    * Presence-only suffices for keep-first across batches — a stored
    * fingerprint means the paragraph's first occurrence is already kept
    * somewhere upstream, so every later occurrence loses. Same directory
    * layout as the span index (`windows` + `params`), so
    * [[compactSpanIndex]] / [[repairSpanIndex]] apply unchanged.
    */
  def writeParagraphIndex(
      spark: SparkSession,
      d: DataFrame,
      out: String,
      chunkWords: Int = 20
  ): Unit = graft.util.MaintainerLease.withMaintainer(
    out
  ) {
    import spark.implicits._
    // a REBUILD into an existing store supersedes any swapped generation;
    // fenced so the retraction cannot race a compaction's swap
    graft.util.Blob.deleteIfExists(
      graft.util.Loc.join(out, "windows.current"))
    chunkRows(tokenized(d), chunkWords)
      .select(chunkFp(col("chunk")).as("win"))
      .distinct()
      .write
      .mode("overwrite")
      .parquet(s"$out/windows")
    Seq(chunkWords).toDF("chunk_words").write
      .mode("overwrite")
      .parquet(s"$out/params")
  }

  /** Append a batch's chunk fingerprints to a persisted paragraph index
    * (left-anti against the stored set — the index stays DISTINCT by
    * construction, appends are idempotent). Mirrors [[appendToSpanIndex]].
    */
  def appendToParagraphIndex(
      spark: SparkSession,
      indexDir: String,
      d: DataFrame
  ): Unit = {
    repairSpanIndex(indexDir)
    val chunkWords =
      spark.read.parquet(s"$indexDir/params").head().getAs[Int]("chunk_words")
    val novel = Eager.materialized(
      chunkRows(tokenized(d), chunkWords)
        .select(chunkFp(col("chunk")).as("win"))
        .distinct()
        .join(
          spark.read.parquet(graft.util.DirSwap.resolve(indexDir, "windows")),
          Seq("win"),
          "left_anti"
        )
    )
    novel.write.mode("append").parquet(graft.util.DirSwap.resolve(indexDir, "windows"))
    Eager.releaseCheckpoint(novel)
  }

  /** D14 incremental form: keep-first paragraph dedup of a NEW batch
    * against a PERSISTED index — a chunk occurrence survives iff it is
    * the batch's first occurrence AND its fingerprint is absent from the
    * index. For batches arriving in doc_id order (the append-only crawl
    * shape; the same monotonicity [[incrementalSplit]] encodes), the
    * sequential fold over batches equals the global [[paragraphDedupOf]]
    * restricted to each batch's ids — law-checked in IndexStoreSpec.
    * Scale: the index join is a fingerprint equi-join; the batch-local
    * winner pass is one batch-sized window.
    */
  def paragraphDedupAgainstIndex(
      spark: SparkSession,
      indexDir: String,
      newDocs: DataFrame
  ): DataFrame = {
    repairSpanIndex(indexDir)
    val chunkWords =
      spark.read.parquet(s"$indexDir/params").head().getAs[Int]("chunk_words")
    val chunks = chunkRows(tokenized(newDocs), chunkWords)
    val byChunk = Window.partitionBy("key")
    val first = min(struct(col("doc_id"), col("j"))).over(byChunk)
    val marked = chunks
      .withColumn("key", chunkFp(col("chunk")))
      .withColumn("first", first)
      .join(
        spark.read
          .parquet(graft.util.DirSwap
            .resolve(indexDir, "windows")
            .toString)
          .select(col("win").as("iw"), lit(1).as("in_index")),
        col("key") === col("iw"),
        "left"
      )
      .withColumn(
        "keep",
        col("in_index").isNull &&
          col("first.doc_id") === col("doc_id") && col("first.j") === col("j")
      )
      .select("doc_id", "n", "j", "chunk", "keep")
    reassembleChunks(marked)
  }
}
