package graft.util

/** Concurrent driver-side submission of INDEPENDENT Spark actions.
  *
  * A store build writes several members (postings, df, dict, stats,
  * positions, fields…) whose jobs touch disjoint output directories and
  * share no uncommitted state: running them sequentially leaves most of
  * the cluster idle through each job's tail and pays every job's
  * scheduling latency back to back. Spark's scheduler runs jobs submitted
  * from separate driver threads concurrently (FIFO: later jobs back-fill
  * executors the earlier job's tail frees), so the wall of N independent
  * member writes drops from Σ to ≈ max — on a cluster AND in local mode.
  *
  * Failure posture: every task runs to completion (a member write racing
  * a cancelled sibling would leave a half-written store), then the FIRST
  * failure is rethrown with the others attached as suppressed — callers
  * see the same exception type a sequential run would have thrown.
  *
  * Deliberately NOT a fork-join pool: tasks are few (≤ 8) and blocking
  * (each waits on a Spark job), so one plain thread per task is the whole
  * story. Spark job groups/descriptions are thread-locals and stay with
  * the submitting thread, which is exactly right for UI attribution.
  */
private[graft] object Par {

  /** Runs the given thunks concurrently, one thread each, and joins all.
    * Exceptions: first one rethrown after ALL tasks finished, later ones
    * suppressed. No-ops and single tasks run inline (no thread cost).
    */
  def run(tasks: (() => Unit)*): Unit = {
    val live = tasks.filter(_ != null)
    if (live.isEmpty) return
    if (live.size == 1) { live.head.apply(); return }
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = live.map { t =>
      val th = new Thread(() =>
        try t()
        catch { case e: Throwable => failures.add(e): Unit })
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    val it = failures.iterator()
    if (it.hasNext) {
      val first = it.next()
      while (it.hasNext) first.addSuppressed(it.next())
      throw first
    }
  }

  /** [[run]] over an optional task list — `Some(thunk)` runs, `None` is
    * skipped (the opt-in store members' natural shape).
    */
  def runOpt(tasks: Option[() => Unit]*): Unit =
    run(tasks.flatten: _*)

  /** Value-returning [[run]]: evaluates the thunks concurrently and
    * returns their results in ARGUMENT ORDER. Used where constructing
    * independent query legs itself runs driver-side Spark jobs (probed
    * bucket collects, centroid loads) — the legs' construction latencies
    * overlap instead of summing. Same failure posture as [[run]].
    */
  def eval[A](tasks: (() => A)*): Seq[A] = {
    val out = new Array[Any](tasks.size)
    run(tasks.zipWithIndex.map { case (t, i) =>
      () => { out(i) = t() }
    }: _*)
    scala.collection.immutable.ArraySeq
      .unsafeWrapArray(out)
      .map(_.asInstanceOf[A])
  }
}
