package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, processed by per-partition batch "decoders".
  *
  * The decode itself is STUBBED (no codec libraries in this container) with
  * a deterministic fake — but everything Spark-side is real: the binary
  * column, the schema of the extracted metadata, the mapPartitions batch
  * shape (one decoder instantiation per partition, streamed rows), and the
  * partitioning strategy (media rows are heavy — partition count follows
  * bytes, not row count; at 100 TB, `maxPartitionBytes` and a bucketed
  * doc_id layout keep a decoder's working set bounded).
  */
object Multimodal {

  /** Typed metadata a real decoder would emit. */
  final case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      duration_ms: Long
  )

  /** Builds the media table: the document text reinterpreted as opaque
    * bytes (stand-in for image/audio payloads) + a media_type derived from
    * the id.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")
        ).as("media_type")
      )

  /** STUB decoder: deterministic metadata from the byte payload. A real
    * implementation swaps ONLY the body of this function for e.g. a JNI
    * image decoder — the batch shape (Iterator→Iterator, one init per
    * partition) is what matters for Spark.
    */
  private def decodeBatch(
      rows: Iterator[(Long, Array[Byte], String)]
  ): Iterator[MediaMeta] = {
    // per-partition decoder init would happen here (expensive handle)
    rows.map { case (id, bytes, mtype) =>
      val n = bytes.length.toLong
      MediaMeta(
        doc_id = id,
        media_type = mtype,
        n_bytes = n,
        width = (n % 640).toInt,
        height = (n % 480).toInt,
        n_frames = if (mtype == "video") (n % 250).toInt else 1,
        duration_ms = if (mtype != "image") n * 10 else 0L
      )
    }
  }

  /** Decode pipeline: binary payloads → typed metadata via a per-partition
    * batch decode (mapPartitions — the Scala analogue of mapInPandas).
    */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select("doc_id", "payload", "media_type")
      .as[(Long, Array[Byte], String)]
      .mapPartitions(decodeBatch)
  }

  /** Oracle-checkable projection of the decode output: all fields are pure
    * arithmetic on the payload byte length, so DuckDB can mirror them.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir)
      .toDF()
      .orderBy("doc_id")

  /** Frame sampling: one row per sampled frame of each video (every
    * `stride`-th frame) — the explode/generator shape a vision pipeline
    * uses to turn media rows into training examples. The frame "decode" is
    * the stub; the explode semantics, stride arithmetic and row fan-out
    * are real and oracle-checked.
    */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 25): DataFrame =
    decodeMeta(spark, dir)
      .toDF()
      .filter(col("media_type") === "video" && col("n_frames") > 0)
      .select(
        col("doc_id"),
        col("n_frames"),
        explode(
          sequence(
            lit(0L),
            (col("n_frames") - 1).cast("long"),
            lit(stride.toLong)
          )
        ).as("frame_idx")
      )
      .withColumn("frame_ts_ms", col("frame_idx") * 40L)
      .orderBy("doc_id", "frame_idx")

  /** STUB feature extractor: a deterministic 8-dim "embedding" from the
    * payload (a real build swaps the body for a vision/audio encoder; the
    * batch shape — per-partition init, Iterator→Iterator, fixed-width
    * float vector out — is the real contract).
    */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition model handle init would happen here
        rows.map { case (id, bytes) =>
          val n = bytes.length.toLong
          // exact small integers: float-representable, so the DuckDB
          // oracle reproduces the vectors bit-for-bit
          // +1 keeps the vector nonzero even when n ≡ 0 (mod 97)
          val vec = (1 to 8).map(k => ((n * k) % 97 + 1).toFloat).toArray
          (id, vec)
        }
      }
      .toDF("doc_id", "embedding")
  }

  /** Media similarity: cosine top-k over the extracted features — the full
    * multimodal retrieval chain (binary column → batch extract → ANN).
    * Deterministic stub features make the whole chain oracle-checkable.
    */
  def mediaKnn(spark: SparkSession, dir: String, nQueries: Int = 5, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = extractFeatures(spark, dir)
    val queries = feats
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), col("embedding").as("q"))
    val w = Window
      .partitionBy("qid")
      .orderBy(col("sim").desc, col("doc_id"))
    feats
      .join(broadcast(queries), col("doc_id") =!= col("qid"))
      .select(
        col("qid"),
        col("doc_id"),
        Similarity.cosine(col("q"), col("embedding")).as("sim")
      )
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "rank")
      .orderBy("qid", "rank")
  }

  /** The media features as EXACT integer codes (the stub features are
    * small exact integers, so no 127-scaling is needed): the `(vec_id,
    * q8)` frame the exact-IVF machinery consumes.
    */
  private[graft] def mediaCodes(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir)
      .select(
        col("doc_id").as("vec_id"),
        transform(col("embedding"), x => x.cast("long")).as("q8")
      )

  /** ROW-LOCAL media feature codes from raw media rows `(doc_id,
    * payload, media_type)` — the pure-Column twin of [[mediaCodes]]'s
    * mapPartitions extraction (same stub arithmetic, law-checked in
    * StreamingDedupSpec's mediaVecOf mirror), usable on STREAMING frames:
    * the deployment's media ingest loop maps arriving assets to `(vec_id,
    * q8)` before the generic exact-IVF append. A real build swaps this
    * for the encoder output column its extract stage already computed —
    * the (vec_id, q8) seam is the contract.
    */
  def mediaCodesOf(media: DataFrame): DataFrame =
    media.select(
      col("doc_id").as("vec_id"),
      transform(
        sequence(lit(1), lit(8)),
        k => (octet_length(col("payload")).cast("long") * k.cast("long")) % 97L + 1L
      ).as("q8")
    )

  /** M4B — media retrieval THROUGH the ANN index: the extracted features
    * are trained into the exact-integer IVF quantizer (k5's trainer) and
    * searched cell-pruned, replacing [[mediaKnn]]'s brute corpus scan as
    * the scale path. This is where the multimodal plane meets the
    * similarity plane: at 100 TB the brute form scans every media vector
    * per query set, while this one touches nprobe/kCentroids of the
    * corpus — the same plan the k5/k9 embedding searches carry, reused
    * verbatim (train → row-local cell assign → broadcast probes → keyed
    * top-k window). Everything BIGINT, so the whole chain — feature
    * extraction AND training — hash-replays in DuckDB. Completeness law
    * in PipelineSpec: probe-ALL ≡ brute top-k under the same integer
    * ranking (cell assignment partitions the corpus whatever the
    * centroids are); [[mediaKnn]] stays as the float truth leg, and
    * [[mediaRecall]] reports the index's recall against it.
    */
  /** Session memo of the media-feature training run (the Similarity
    * exact-train memo's m-plane twin): m4b and m4c share one
    * quantization + k-means and one cached codes frame. Released by
    * [[releaseMediaMemo]] (wired into SparkEntry.releaseCaches).
    */
  private val mediaTrainMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, Int, Int), (DataFrame, Seq[(Int, Seq[Long])])]

  def releaseMediaMemo(): Unit = {
    mediaTrainMemo.values.foreach(_._1.unpersist(false))
    mediaTrainMemo.clear()
  }

  private def trainedMedia(
      spark: SparkSession,
      dir: String,
      kCentroids: Int,
      iters: Int
  ): (DataFrame, Seq[(Int, Seq[Long])]) =
    mediaTrainMemo.getOrElseUpdate(
      (spark, dir, kCentroids, iters), {
        val codes = mediaCodes(spark, dir).cache()
        (codes, Similarity.trainCentroidsExact(codes, kCentroids, iters))
      }
    )

  def mediaKnnIvf(
      spark: SparkSession,
      dir: String,
      nQueries: Int = 5,
      k: Int = 3,
      kCentroids: Int = 16,
      iters: Int = 3,
      nprobe: Int = 2
  ): DataFrame = {
    val (codes, centroids) = trainedMedia(spark, dir, kCentroids, iters)
    val out = Similarity
      .searchCellsExact(
        Similarity.assignCellsInt(codes, centroids),
        codes,
        centroids,
        nQueries,
        k,
        nprobe
      )
      .withColumnRenamed("vec_id", "doc_id")
    Eager.materialized(out) // codes cache stays: the memo owns it
  }

  /** Persist the media ANN index: [[mediaCodes]]' exact-integer features
    * through [[Similarity.writeIvfIndexExactOf]] — the vec plane's store
    * layout VERBATIM (centroids + (cid, layer)-partitioned vectors under
    * DirSwap), so append/repair/compact/health apply unchanged and the
    * store registers in the deployment's maintenance registry like any
    * other IVF store. This is the media plane's graduation to the
    * write/append/compact/health lifecycle every other plane has: the
    * quantizer trains ONCE here and every later ingest (the deployment's
    * media loop) assigns against it row-locally.
    */
  def writeMediaIvfIndex(
      spark: SparkSession,
      codes: DataFrame, // (vec_id, q8) — mediaCodes / mediaCodesOf
      out: String,
      kCentroids: Int = 16,
      iters: Int = 3
  ): Unit = Similarity.writeIvfIndexExactOf(spark, codes, out, kCentroids, iters)

  /** Media retrieval through the PERSISTED media index — no training at
    * query time (the production path; [[mediaKnnIvf]] remains the inline
    * teaching form whose per-query retrain does not survive scale):
    * [[Similarity.knnIvfIndexedExactOf]] against the stored frozen
    * quantizer, probed-cell partition pruning and all, presenting doc_id.
    */
  def mediaKnnIvfStored(
      spark: SparkSession,
      queryCodes: DataFrame, // (vec_id, q8)
      indexDir: String,
      nQueries: Long = 5L,
      k: Int = 3,
      nprobe: Int = 2,
      excludeSelf: Boolean = true
  ): DataFrame =
    Similarity
      .knnIvfIndexedExactOf(
        spark, queryCodes, indexDir, nQueries, k, nprobe, excludeSelf)
      .withColumnRenamed("vec_id", "doc_id")

  /** K16 — the media index lifecycle as one oracle-replayable query (the
    * k10 protocol on the media plane): train the store on the initial 3/4
    * ingest of [[mediaCodes]], append the remaining assets to the FROZEN
    * quantizer, then the stored search at the m4b protocol (nQueries=5,
    * k=3, nprobe=2). Everything BIGINT end to end — feature extraction,
    * training, assignment, search — so the whole lifecycle hash-replays
    * in DuckDB.
    */
  def mediaIndexLifecycle(
      spark: SparkSession,
      dir: String,
      nQueries: Int = 5,
      k: Int = 3,
      nprobe: Int = 2
  ): DataFrame = {
    val codes = mediaCodes(spark, dir)
    Eager.withTempStore("graft-k16-media-index") { tmp =>
      writeMediaIvfIndex(spark, codes.filter(col("vec_id") % 4 < 3), tmp)
      Similarity.appendToIvfIndexExact(
        spark, codes.filter(col("vec_id") % 4 >= 3), tmp)
      mediaKnnIvfStored(spark, codes, tmp, nQueries.toLong, k, nprobe)
    }
  }

  /** M4C — the m-plane's k12: recall@k of the IVF-indexed media search
    * ([[mediaKnnIvf]]) against the exact float brute force ([[mediaKnn]])
    * on the same query set — the monitoring row a deployment watches
    * after each media-index rebuild. Same protocol and scale shape as
    * [[Similarity.recallReport]]: the truth set is nQueries × k rows at
    * any corpus size, so it broadcasts into the approximate leg and the
    * report is one O(1)-row aggregation beyond the two searches.
    */
  def mediaRecall(
      spark: SparkSession,
      dir: String,
      nQueries: Int = 5,
      k: Int = 3
  ): DataFrame =
    recallAgainstBrute(
      spark,
      dir,
      mediaKnnIvf(spark, dir, nQueries, k),
      "media_ivf",
      nQueries,
      k
    )

  /** M4D — the recall report for the PERSISTED media store (k16's read
    * path): the monitoring row a deployment watches after media-store
    * maintenance, with the approximate leg the store search itself —
    * where [[mediaRecall]] grades the inline teaching form, this grades
    * what production actually serves (train-3/4 / frozen-append /
    * stored search). Same O(1)-row report shape as k12.
    */
  def mediaRecallStored(
      spark: SparkSession,
      dir: String,
      nQueries: Int = 5,
      k: Int = 3
  ): DataFrame =
    recallAgainstBrute(
      spark,
      dir,
      mediaIndexLifecycle(spark, dir, nQueries, k),
      "media_ivf_stored",
      nQueries,
      k
    )

  /** The shared m-plane recall report tail: `approx` (qid, doc_id, …)
    * LEFT-joined against the float brute-force truth ([[mediaKnn]]),
    * counted exactly — truth is nQueries × k rows at any corpus size, so
    * it broadcasts and the report costs one O(1)-row aggregation beyond
    * the two searches.
    */
  private def recallAgainstBrute(
      spark: SparkSession,
      dir: String,
      approxTopK: DataFrame,
      method: String,
      nQueries: Int,
      k: Int
  ): DataFrame = {
    val truth = mediaKnn(spark, dir, nQueries, k)
      .select(col("qid"), col("doc_id"), lit(1L).as("bhit"))
    val approx = approxTopK
      .select(lit(method).as("method"), col("qid"), col("doc_id"))
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    approx
      .join(broadcast(truth), Seq("qid", "doc_id"), "left")
      .groupBy("method")
      .agg(
        countDistinct(col("qid")).as("n_queries"),
        count(lit(1)).as("n_retrieved"),
        count(col("bhit")).as("n_hits")
      )
      .crossJoin(broadcast(nTruth)) // single-row total
      .withColumn("recall", col("n_hits").cast("double") / col("n_truth"))
      .select("method", "n_queries", "n_retrieved", "n_hits", "n_truth", "recall")
      .orderBy("method")
  }

  /** m5 — exact content dedup on the BINARY plane: group identical
    * payloads by (media_type, md5 digest) and elect the lowest doc_id as
    * canonical. The 100 TB shape is the point: the digest is computed in
    * the scan pass (one codegen'd hash per row, payload never leaves its
    * partition) and only 16-byte digests shuffle — deduping a petabyte of
    * video costs one exchange of digests, not payloads. Byte-identical
    * copies under DIFFERENT media types stay separate on purpose (an
    * image and a video that share bytes are not the same asset).
    */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_type", "content_md5")
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        col("media_type"),
        md5(col("payload")).as("content_md5")
      )
      .withColumn("canonical_id", min("doc_id").over(w))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .orderBy("doc_id")
  }

  /** The m6 HARNESS corpus (the d4/p16 seeded-fixture pattern, applied to
    * media features): the corpus's stub feature vectors plus one
    * exactly-parallel "re-encoded copy" per low-id asset — the same
    * features scaled ×2 (small exact integers, so the scaled floats and
    * every cosine are bit-identical between engines and the pair's
    * similarity is exactly parallel by construction). A re-encode/resize
    * changes bytes but barely moves the perceptual feature vector; the
    * ×2 seed models the limiting case. Seeds keep the ORIGINAL's
    * media_type and offset ids by 1e6 (asserted non-colliding).
    */
  private[graft] def seededMediaFeatures(
      spark: SparkSession,
      dir: String,
      nSeeds: Int = 20
  ): DataFrame = {
    val mt = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int")
    )
    // collision guard FIRST, on the RAW doc_id column (one pruned
    // columnar scan): it must not cost a full feature-extraction pass,
    // and a violating corpus should fail before the extraction runs
    require(
      spark.read
        .parquet(s"$dir/documents.parquet")
        .agg(max("doc_id"))
        .head()
        .getLong(0) < 1000000L,
      "seed id offset collides with corpus doc_ids"
    )
    // materialized ONCE: the returned frame is base ∪ f(base), and a lazy
    // base would run the feature extraction (the mapPartitions decoder —
    // the expensive pass over payload bytes at scale) once per union
    // branch in every downstream fill (round-16 verdict item 8). The
    // checkpoint is feature-row-sized; its blocks free with the frame.
    val base = graft.pipeline.Eager.materialized(
      extractFeatures(spark, dir).withColumn("media_type", mt)
    )
    val seeds = base
      .filter(col("doc_id") < nSeeds)
      .select(
        (col("doc_id") + 1000000L).as("doc_id"),
        transform(col("embedding"), v => (v * lit(2.0f)).cast("float"))
          .as("embedding"),
        col("media_type")
      )
    base.unionByName(seeds)
  }

  /** M6 — PERCEPTUAL media near-dup: the production case m5's byte hash
    * cannot catch (a re-encoded or resized asset has different bytes but
    * a near-identical feature vector). The d4 sign-LSH near-dup
    * transposed to the media plane: candidates from the 1-bit-multiprobe
    * LSH index over the extracted features (media_type as the cell — an
    * image is never a dup of a video), exact cosine on candidates only,
    * transitive clustering with lowest-id keeper election à la d8. Runs
    * on the seeded harness so ground truth is non-vacuous.
    *
    * The default threshold is tight on purpose: the STUB feature space
    * has only 97 distinct directions (features depend on byte length mod
    * 97), whose closest non-parallel pair sits at cosine ≈ 0.99999978 —
    * so 0.9999999 admits exactly the parallel pairs (the re-encode
    * seeds and byte-length-congruent assets), which is both the honest
    * semantic under the stub extractor and what makes the operator
    * hash-replayable (parallel pairs share their LSH bucket, so the
    * multiprobe index provably recovers every qualifying pair). A real
    * feature extractor swaps the threshold to d4's 0.99.
    */
  def mediaNearDup(
      spark: SparkSession,
      dir: String,
      threshold: Double = 0.9999999,
      nBits: Int = 12
  ): DataFrame = {
    val feats = seededMediaFeatures(spark, dir)
      .select(
        col("doc_id").as("vec_id"),
        col("embedding"),
        col("media_type").as("label")
      )
    val pairs = Similarity.embeddingNearDupOn(feats, threshold, nBits)
    Dedup
      .components(pairs.select("a", "b"))
      .filter(col("doc_id") =!= col("label"))
      .select(col("doc_id"), col("label").as("keeper"))
      .orderBy("doc_id")
  }

  /** Rollup per media type — the "what's in this corpus" report. */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir)
      .toDF()
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n"),
        sum("n_bytes").as("total_bytes"),
        max("n_bytes").as("max_bytes"),
        sum("duration_ms").as("total_duration_ms")
      )
      .orderBy("media_type")
}
