package graft.util

/** Driver-side phase stopwatch for the registered LIFECYCLE queries,
  * feeding the bench's per-phase split: a lifecycle query's wall mixes
  * store BUILD cost (the write/append ingests the oracle requires) with
  * the production SEARCH leg, and a headline total that drifts with
  * ingest cost hides read-path regressions (the round-11 finding).
  * `Eager.withTempStore` marks the two phases at its natural seam — the
  * store writes run eagerly inside the build function, the returned
  * search plan executes at materialization — and `Bench` drains the
  * accumulator after each query, stamping `{"build": s, "search": s}`
  * per lifecycle query in the artifact.
  *
  * Thread-local (the lifecycle functions run driver-side on the caller's
  * thread; Spark jobs they trigger are timed from that thread's
  * blocking call) and nesting-safe: only the OUTERMOST span of a phase
  * accumulates, so a lifecycle composed of lifecycles cannot
  * double-count a phase.
  */
object PhaseClock {

  private final class St {
    val acc = scala.collection.mutable.Map.empty[String, Long]
    val depth = scala.collection.mutable.Map.empty[String, Int]
  }

  private val tl = new ThreadLocal[St] {
    override def initialValue(): St = new St
  }

  def timed[A](phase: String)(body: => A): A = {
    val st = tl.get()
    val d = st.depth.getOrElse(phase, 0)
    st.depth(phase) = d + 1
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = System.nanoTime() - t0
      st.depth(phase) = d
      if (d == 0) st.acc(phase) = st.acc.getOrElse(phase, 0L) + dt
    }
  }

  /** Returns and clears the calling thread's accumulated per-phase
    * seconds (empty for non-lifecycle queries).
    */
  def drain(): Map[String, Double] = {
    val st = tl.get()
    val out = st.acc.toMap.map { case (k, v) => k -> v / 1e9 }
    st.acc.clear()
    out
  }
}
