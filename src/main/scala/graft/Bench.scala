package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds.
  *
  * A short untimed warmup absorbs one-time JVM/codegen/classloading cost so
  * the per-query numbers measure plans, not Janino compilation of the first
  * query to run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")

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
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      (name, if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // the driver's log-tail artifact truncates long runs, hiding the
    // alphabetically-first queries' timings; persist the full line so
    // round-over-round comparison never depends on tail luck. Path is
    // overridable / cwd-relative (not a hardcoded absolute checkout
    // path), and a write failure is REPORTED — silently comparing a
    // stale file from a previous run would be worse than no file
    try {
      val out = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
      )
      java.nio.file.Files.write(out, (line + "\n").getBytes("UTF-8"))
    } catch {
      case e: Exception =>
        System.err.println(s"[bench] full-results write failed: $e")
    }
    spark.stop()
  }
}
