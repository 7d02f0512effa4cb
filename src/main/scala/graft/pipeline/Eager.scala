package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Cache lifecycle for multi-pass pipeline operators.
  *
  * The dedup/ANN operators reference intermediates (shingle sets, LSH
  * indexes, edge lists) several times inside ONE logical result, so they
  * `cache()` them — but a cache that outlives its query leaks executor
  * storage into every later query of a long-lived session (at 100 TB that
  * is eviction thrash mid-pipeline). The contract here: every cache an
  * operator takes is released before the operator returns, by eagerly
  * materializing the (small) final result and then unpersisting the
  * (large) intermediates.
  *
  * `localCheckpoint(eager = true)` computes the result once and pins only
  * the result blocks, whose lineage no longer references the caches; the
  * blocks are freed by the ContextCleaner when the returned DataFrame is
  * collected/written and dropped. On a real cluster a reliable
  * `checkpoint()` directory (or writing the result table) replaces the
  * local variant — the lifecycle is the same.
  */
private[graft] object Eager {

  /** Materializes `result`, then releases `caches`. The returned DataFrame
    * re-reads the materialized blocks — downstream consumers never re-run
    * the lineage, so dropping the caches cannot re-trigger their upstream.
    */
  def materialized(result: DataFrame, caches: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    caches.foreach(_.unpersist(false))
    out
  }

  /** Runs `build` against a fresh temp store directory, eagerly
    * materializes the resulting frame, and deletes the store. The
    * registered lifecycle queries (p33b/p33d/p35b/d9b) build a full
    * index/model copy per invocation, and they run on every bench and
    * verify pass — a copy left behind per run is unbounded /tmp growth.
    * Materializing FIRST is what makes the delete safe: the returned
    * frame re-reads its own checkpointed blocks, never the deleted store.
    * The delete runs in a finally so a failed build/materialization can't
    * leak the directory — the lifecycle queries run on every bench and
    * verify pass, so a leak on the error path is the same unbounded /tmp
    * growth this helper exists to stop.
    */
  def withTempStore(prefix: String)(build: String => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    try {
      // phase marks at the natural seam (see graft.util.PhaseClock): the
      // store ingests run eagerly inside `build`; the returned SEARCH
      // plan executes at materialization — the bench stamps the two
      // phases separately so the production read leg stays visible under
      // the lifecycle's ingest cost
      val result = graft.util.PhaseClock.timed("build")(build(tmp.toString))
      graft.util.PhaseClock.timed("search")(materialized(result))
    } finally graft.util.Fs.deleteRecursively(tmp)
  }

  /** Frees the storage blocks behind a `localCheckpoint`'d DataFrame NOW.
    * `Dataset.unpersist` is a NO-OP for checkpointed frames — it routes
    * through the CacheManager, which has no entry for the LogicalRDD a
    * checkpoint plans to — so without this the blocks linger until the
    * driver GCs the RDD reference and the ContextCleaner fires. Iterative
    * operators (star-contraction CC) and per-micro-batch materializations
    * (the replicator sink) call this as each round's/batch's frame is
    * superseded; the blocks released are exactly the checkpoint's own.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed
      .collect { case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd
      }
      .foreach(_.unpersist(false))
}
