package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.util.StoreHealth
import graft.util.StoreHealth.Store

/** The operational registry: every persisted store expressed as a
  * [[graft.util.StoreHealth.Store]], so ONE `healthAll` reports the whole
  * deployment's maintenance debt in one row shape and ONE `maintainAll`
  * drives every compactor (each behind its own DirSwap/protocol). A
  * deployment schedules `maintainAll` between batches — the single
  * maintainer posture all the stores already assume.
  */
object Maintenance {

  def invertedIndex(dir: String): Store = Store(
    "inverted_index",
    dir,
    // `positions` only exists in positional stores; a missing member
    // reports 0 files and no layers — healthAll tolerates it
    layeredDirs = Seq("postings", "df", "stats", "positions"),
    compact = s => graft.pipeline.Retrieval.compactInvertedIndex(s, dir)
  )

  def lmModel(dir: String): Store = Store(
    "lm_model",
    dir,
    layeredDirs = Seq("uni", "bi"),
    compact = s => graft.pipeline.QualityModel.compactLmModel(s, dir)
  )

  def ivfVectors(dir: String): Store = Store(
    "ivf_vectors",
    dir,
    layeredDirs = Seq("vectors"),
    compact = s => graft.pipeline.Similarity.compactIvfIndex(s, dir)
  )

  def spanIndex(dir: String, targetFiles: Int = 8): Store = Store(
    "span_index",
    dir,
    flatDirs = Seq("windows"),
    compactOverFiles = targetFiles.toLong * 4,
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

  def headCache(dir: String): Store = Store(
    "head_cache",
    dir,
    layeredDirs = Seq("entries", "wm"),
    compact = s => graft.streaming.StreamingHeadCache.compactHeadCache(s, dir)
  )

  def snapshotStore(dir: String, bufferSize: Int = 3): Store = Store(
    "snapshot_store",
    dir,
    layeredDirs = Seq("snaps", "ptr"),
    compact = s =>
      graft.streaming.StreamingSnapshots
        .compactSnapshotStore(s, dir, bufferSize)
  )

  /** One row per registered store — see [[graft.util.StoreHealth]]. */
  def healthAll(spark: SparkSession, stores: Seq[Store]): DataFrame =
    StoreHealth.healthAll(spark, stores)

  /** Compacts every store whose debt threshold fired. */
  def maintainAll(spark: SparkSession, stores: Seq[Store]): DataFrame =
    StoreHealth.maintainAll(spark, stores)
}
