package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.StoreHealth
import graft.util.StoreHealth.Store

/** The operational registry: every persisted store expressed as a
  * [[graft.util.StoreHealth.Store]], so ONE `healthAll` reports the whole
  * deployment's maintenance debt in one row shape and ONE `maintainAll`
  * drives every compactor (each behind its own DirSwap/protocol).
  *
  * Concurrency posture:
  *
  *   - '''maintainer vs maintainer''' — fenced. Every registered compactor
  *     takes the store's [[graft.util.MaintainerLease]] for the whole
  *     build-then-swap-then-sweep sequence, so two `maintainAll`s (or a
  *     `maintainAll` racing a direct compactor call) cannot interleave
  *     swaps on one store: the loser fails with
  *     [[graft.util.ConcurrentStoreWriteException]] having published
  *     nothing, and the store reads row-identical throughout
  *     (StoreHealthSpec's concurrent-maintainer race).
  *   - '''maintainer vs streaming ingest''' — governed by
  *     `protectLayersAbove`: a compactor must NOT fold a layer whose
  *     offsets are not yet committed (under T1 the last micro-batch can
  *     redeliver; folding it and then dynamic-overwriting it back
  *     double-counts the sum-merged df/stats/LM members). A deployment
  *     running `maintainAll` BESIDE a live ingest therefore constructs
  *     the layered stores with `protectLayersAbove` = the newest layer id
  *     its ingest may still redeliver (the streaming loops' own
  *     compactions do exactly this). The defaults protect nothing — safe
  *     for the batch maintainer that runs BETWEEN batches and controls
  *     its ingests, which is the posture `maintainAll` is scheduled in.
  */
object Maintenance {

  def invertedIndex(
      dir: String,
      protectLayersAbove: Long = Long.MaxValue
  ): Store = Store(
    "inverted_index",
    dir,
    // `positions`/`fields` only exist in positional / stored-field
    // stores; a missing member reports 0 files and no layers —
    // healthAll tolerates it
    layeredDirs =
      Seq("postings", "df", "dict", "dictgrams", "stats", "positions", "fields"),
    compact = s =>
      graft.pipeline.Retrieval
        .compactInvertedIndex(s, dir, protectLayersAbove)
  )

  def lmModel(
      dir: String,
      protectLayersAbove: Long = Long.MaxValue
  ): Store = Store(
    "lm_model",
    dir,
    layeredDirs = Seq("uni", "bi"),
    compact = s =>
      graft.pipeline.QualityModel
        .compactLmModel(s, dir, protectLayersAbove = protectLayersAbove)
  )

  def ivfVectors(
      dir: String,
      protectLayersAbove: Long = Long.MaxValue
  ): Store = Store(
    "ivf_vectors",
    dir,
    layeredDirs = Seq("vectors"),
    compact = s =>
      graft.pipeline.Similarity.compactIvfIndex(s, dir, protectLayersAbove)
  )

  /** The media plane's ANN store — the IVF layout verbatim
    * (Multimodal.writeMediaIvfIndex delegates to the exact-integer IVF
    * writer), so the vec plane's compactor applies unchanged; its own
    * registry name keeps the health report per-plane.
    */
  def mediaIvfVectors(
      dir: String,
      protectLayersAbove: Long = Long.MaxValue
  ): Store = Store(
    "media_ivf",
    dir,
    layeredDirs = Seq("vectors"),
    compact = s =>
      graft.pipeline.Similarity.compactIvfIndex(s, dir, protectLayersAbove)
  )

  def spanIndex(dir: String, targetFiles: Int = 8): Store = Store(
    "span_index",
    dir,
    flatDirs = Seq("windows"),
    compactOverFiles = targetFiles.toLong * 4,
    // presence stores are idempotent row sets (no sum-merged layers), so
    // there is nothing a redelivered append could double-count — no
    // protect parameter by construction
    compact = s => graft.pipeline.Dedup.compactSpanIndex(s, dir, targetFiles)
  )

  def paragraphIndex(dir: String, targetFiles: Int = 8): Store = Store(
    "paragraph_index",
    dir,
    flatDirs = Seq("windows"),
    compactOverFiles = targetFiles.toLong * 4,
    // the paragraph index shares the span store's layout (one distinct
    // `windows` presence set), so it shares the compactor
    compact = s => graft.pipeline.Dedup.compactSpanIndex(s, dir, targetFiles)
  )

  def headCache(
      dir: String,
      protectLayersAbove: Long = Long.MaxValue
  ): Store = Store(
    "head_cache",
    dir,
    layeredDirs = Seq("entries", "wm"),
    compact = s =>
      graft.streaming.StreamingHeadCache
        .compactHeadCache(s, dir, protectLayersAbove)
  )

  def snapshotStore(
      dir: String,
      bufferSize: Int = 3,
      protectLayersAbove: Long = Long.MaxValue
  ): Store = Store(
    "snapshot_store",
    dir,
    layeredDirs = Seq("snaps", "ptr"),
    compact = s =>
      graft.streaming.StreamingSnapshots
        .compactSnapshotStore(s, dir, bufferSize, protectLayersAbove)
  )

  /** One row per registered store — see [[graft.util.StoreHealth]]. */
  def healthAll(spark: SparkSession, stores: Seq[Store]): DataFrame =
    StoreHealth.healthAll(spark, stores)

  /** Compacts every store whose debt threshold fired. Fenced per store by
    * the maintainer lease (see the object doc); a lost race propagates
    * [[graft.util.ConcurrentStoreWriteException]] with nothing published.
    */
  def maintainAll(spark: SparkSession, stores: Seq[Store]): DataFrame =
    StoreHealth.maintainAll(spark, stores)
}
