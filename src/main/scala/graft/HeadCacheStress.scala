package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingHeadCache

/** Head-cache scale harness: the plane's claim is that per-batch cost is
  * O(batch) — history is NEVER re-folded — and that the cache stays
  * replication-lag-sized under eviction, so reads merge a bounded number
  * of partials per journal. The harness drives a synthetic many-journal
  * log (one action per journal per batch, watermark lagging one batch)
  * and measures:
  *
  *   - append wall per batch as stored history grows (must stay flat —
  *     a re-folding implementation would grow linearly);
  *   - the hot-journal pathology: one journal receiving a whole batch of
  *     actions alone — the per-journal fold sorts only ITS share of ONE
  *     batch, so the cost is bounded by batch size, not journal history;
  *   - read + compaction costs with the eviction live (the cache holds
  *     two batches' entries regardless of how many batches ran).
  *
  *   sbt "runMain graft.HeadCacheStress 200000 5"
  */
object HeadCacheStress {
  def main(args: Array[String]): Unit = {
    val nJournals = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.local("graft-headcache-stress")
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-headcache-stress")
      .toString
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hstress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val parts = spark
      .range(32)
      .select(lit("t").as("topic"), col("id").cast("int").as("part_no"))
      .cache()
    def batch(i: Int) = spark
      .range(nJournals)
      .select(
        lit("t").as("topic"),
        (col("id") % 32).cast("int").as("part_no"),
        (lit(i.toLong * nJournals) + col("id")).as("koffset"),
        col("id").cast("string").as("id"),
        lit("append").as("action"),
        lit(i + 1L).as("seq_nr"),
        lit(null).cast("long").as("delete_to")
      )
    // watermark lags one batch: the cache holds two batches' entries at
    // any time, however long the run — the eviction invariant
    def wmAt(i: Int) = parts
      .withColumn("wm", lit(math.max(-1L, i.toLong * nJournals - 1L)))

    val walls = (0 until nBatches).map { i =>
      val t0 = System.nanoTime()
      StreamingHeadCache.appendBatch(spark, batch(i), tmp, wmAt(i - 1), i + 1L)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[hstress] append batch $i ($nJournals journals): $s%.2f s")
      s
    }
    // flatness: the last batch must not cost more than 2x the second
    // (the first pays session warmup) — a re-folding bug grows ~linearly
    assert(
      walls.last < 2.0 * walls(1) + 0.5,
      s"per-batch append cost must stay O(batch): ${walls.mkString(", ")}"
    )

    // hot journal: one journal receives 100k actions in ONE batch — the
    // per-journal in-memory sort is bounded by its share of the batch
    val hot = spark
      .range(100000)
      .select(
        lit("t").as("topic"),
        lit(0).cast("int").as("part_no"),
        (lit(nBatches.toLong * nJournals) + col("id")).as("koffset"),
        lit("hot-journal").as("id"),
        lit("append").as("action"),
        (col("id") + 1L).as("seq_nr"),
        lit(null).cast("long").as("delete_to")
      )
    time("append hot batch (100k actions, ONE journal)") {
      StreamingHeadCache
        .appendBatch(spark, hot, tmp, wmAt(nBatches - 1), nBatches + 1L)
    }

    val n = time("readHeads (merge + eviction)") {
      StreamingHeadCache.readHeads(spark, tmp).count()
    }
    println(s"[hstress] live journals in cache: $n")
    // eviction held: only the last two synthetic batches + hot journal
    assert(n <= 2 * nJournals + 1)

    time("compactHeadCache") {
      StreamingHeadCache.compactHeadCache(spark, tmp)
    }
    val n2 = time("readHeads post-compact") {
      StreamingHeadCache.readHeads(spark, tmp).count()
    }
    assert(n2 == n, "compaction must not change the live head set")

    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(tmp))
    spark.stop()
  }
}
