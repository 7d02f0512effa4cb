package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ONE health surface for every persisted store — the round-10 verdict's
  * unification item: the inverted index, LM count tables, IVF vector
  * store, span/paragraph presence indexes, head cache, and snapshot store
  * each accrete maintenance debt in one of exactly two shapes, and this
  * object reports all of them as ONE row schema and drives all their
  * compactors behind one call:
  *
  *   - '''layered''' stores (the exactly-once ingest discipline): every
  *     append lands a `layer=*` partition; debt = delta layers above the
  *     base, because every layer is one more file set per scan and one
  *     more summand in the read-side merges.
  *   - '''flat''' presence stores (span/paragraph windows): appends are
  *     idempotent distinct-row files; debt = the data-file count, because
  *     the per-file open cost is the only thing that grows.
  *
  * Row shape: (store, n_layers, n_files, debt_metric, debt,
  * compact_recommended). Layer identities come from the layer PARTITION
  * column (no data files read); file counts from [[Fs.countParquetFiles]]
  * — the single listing API an object-store binding swaps out. Every
  * directory resolves through [[DirSwap]], so the report always reads the
  * published generation.
  *
  * The generic contract the StoreHealthSpec drives per store:
  * accrete (appends raise debt) → recommend (threshold fires) →
  * [[maintainAll]] (the store's own compactor, behind DirSwap) → clear
  * (the same report stops recommending), reads row-identical throughout
  * (each store's own law spec pins the read identity; this surface pins
  * the OPERATIONAL loop).
  */
object StoreHealth {

  /** A maintainable store: its root, which sub-directories are
    * layer-keyed vs flat, the fire thresholds, and its compactor.
    */
  final case class Store(
      name: String,
      root: String,
      layeredDirs: Seq[String] = Seq.empty,
      flatDirs: Seq[String] = Seq.empty,
      compactOverLayers: Long = 8L,
      compactOverFiles: Long = 32L,
      compact: SparkSession => Unit = _ => ()
  )

  private def liveDir(root: String, sub: String): String =
    DirSwap.resolve(root, sub)

  /** One health row per store, computed from store METADATA only — and
    * ONE Spark job for the whole registry: every layered member's layer
    * partition column is unioned into a single (store, member, layer)
    * frame and counted in one pass, instead of one distinct-count job per
    * member per store (the round-11 note: at many stores × members the
    * report is maintainer-cadence but should still be one job).
    */
  def healthAll(spark: SparkSession, stores: Seq[Store]): DataFrame = {
    import spark.implicits._
    healthRows(spark, stores)
      .map(_._2)
      .toDF(
        "store",
        "n_layers",
        "n_files",
        "debt_metric",
        "debt",
        "compact_recommended"
      )
      .orderBy("store")
  }

  /** The per-store health tuples IN REGISTRY ORDER — shared by
    * [[healthAll]] (one row shape) and [[maintainAll]] (which pairs each
    * fire decision with ITS store positionally: two registry stores may
    * share a name, so a name-keyed map could drive the wrong compactor).
    */
  private def healthRows(
      spark: SparkSession,
      stores: Seq[Store]
  ): Seq[(Store, (String, Long, Long, String, Long, Boolean))] = {
    import org.apache.spark.sql.functions._
    stores.foreach { st =>
      (st.layeredDirs ++ st.flatDirs).foreach(DirSwap.repair(st.root, _))
    }
    // a member directory can be absent (optional, e.g. a frequency-only
    // index's positions) or exist with ZERO data files (a store whose
    // first batch had nothing to write) — both contribute no layers
    // rather than failing schema inference
    // keyed by the store's REGISTRY POSITION, not its name: two stores of
    // the same type at different roots must not merge their layer sets
    val members = for {
      (st, idx) <- stores.zipWithIndex
      sub <- st.layeredDirs
      p = liveDir(st.root, sub)
      if Fs.countParquetFiles(p) > 0
    } yield (idx, sub, p)
    val layerCounts: Map[Int, Long] =
      if (members.isEmpty) Map.empty
      else
        members
          .map { case (idx, sub, p) =>
            spark.read
              .parquet(p)
              .select(
                lit(idx).as("store_idx"),
                lit(sub).as("member"),
                col("layer").cast("long").as("layer")
              )
          }
          .reduce(_.unionByName(_))
          .groupBy("store_idx", "member")
          .agg(countDistinct("layer").as("n"))
          .groupBy("store_idx")
          .agg(max("n").as("n_layers"))
          .collect() // one row per store — driver-bounded
          .map(r => r.getInt(0) -> r.getLong(1))
          .toMap
    stores.zipWithIndex
      .map { case (st, idx) =>
        val nLayers = layerCounts.getOrElse(idx, 1L)
        val nFiles = (st.layeredDirs ++ st.flatDirs)
          .map(sub => Fs.countParquetFiles(liveDir(st.root, sub)))
          .sum
        val (metric, debt, fire) =
          if (st.layeredDirs.nonEmpty)
            ("delta_layers", nLayers - 1L, nLayers > st.compactOverLayers)
          else ("data_files", nFiles, nFiles > st.compactOverFiles)
        st -> ((st.name, nLayers, nFiles, metric, debt, fire))
      }
  }

  /** Runs every recommended store's compactor (each already publishes
    * behind [[DirSwap]]/its protocol), returning (store, compacted) —
    * the single maintenance entry point a deployment schedules between
    * batches. Stores below threshold are left untouched: compaction is
    * not free (it rewrites the base), so the debt threshold IS the
    * policy.
    */
  def maintainAll(spark: SparkSession, stores: Seq[Store]): DataFrame = {
    import spark.implicits._
    healthRows(spark, stores)
      .map { case (st, (_, _, _, _, _, due)) =>
        if (due) st.compact(spark)
        (st.name, due)
      }
      .toDF("store", "compacted")
      .orderBy("store")
  }
}
