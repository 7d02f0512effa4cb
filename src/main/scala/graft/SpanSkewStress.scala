package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Skew probe for the span-dedup plane (d10/d12): a BOILERPLATE span — one
  * fixed sentence sitting in EVERY document, the license-block/syndicated-
  * footer shape exact-substring dedup exists to catch — concentrates the
  * hot window's rows on one task under the default
  * `COUNT OVER (PARTITION BY win)` nd computation (window functions have
  * no skew mitigation). The corpus: sf0.1 documents amplified ×f with ids
  * re-keyed AND a fixed 12-word boilerplate sentence prepended to every
  * doc — 3 hot windows of occupancy f×5000 each.
  *
  * RECORDED RESULT (the reason the window form stays the default): at
  * occupancy 50k and 100k the window form held ~flat (d10 1.55→1.96 s,
  * d12 0.62→0.63 s) while the decomposed `skewSafe` form paid its cache +
  * second win-keyed shuffle (d10 2.6–3.3× slower; d12 more — its cached
  * rows carry the start arrays). The hot task at the collapsed grain is a
  * single spill-safe sorted scan of one narrow row per containing doc —
  * linear, and cheaper than re-shuffling everything until occupancy grows
  * ~10³× beyond what this box can host. `skewSafe` stays as the
  * law-identical escape hatch for that extreme tail.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.SpanSkewStress 20"
  */
object SpanSkewStress {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(20)
    require(factor >= 2, s"need factor >= 2, got $factor")
    val spark = GraftSession.local("graft-span-skew-stress")
    spark.sparkContext.setLogLevel("WARN")

    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def writeDir(f: Int): String = {
      val dir = s"/tmp/graft_spanskew_$f"
      (0 until f)
        .map { i =>
          base.select(
            (col("doc_id") + i.toLong * 50000L).as("doc_id"),
            concat(lit(boiler + " "), col("text")).as("text"),
            col("lang"), col("source"), col("n_chars")
          )
        }
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[spanskew] $name%-34s $sec%7.2f s  ($n rows)")
      sec
    }

    // warmup (JIT + codegen) at base scale
    Dedup.dupSpans(spark, "/root/testdata/sf0.1").count()
    Dedup.dupSpans(spark, "/root/testdata/sf0.1", skewSafe = true).count()

    Seq(factor / 2, factor).foreach { f =>
      val dir = writeDir(f)
      val hot = f * 5000L
      println(s"[spanskew] --- factor $f (hot-window occupancy ~$hot docs) ---")
      val tw = time(s"d10 window form")(Dedup.dupSpans(spark, dir).count())
      val ts = time(s"d10 skew-safe form")(
        Dedup.dupSpans(spark, dir, skewSafe = true).count()
      )
      val tw12 = time(s"d12 window form")(
        Dedup.removeDupSpans(spark, dir).count()
      )
      val ts12 = time(s"d12 skew-safe form")(
        Dedup.removeDupSpans(spark, dir, skewSafe = true).count()
      )
      println(
        f"[spanskew] ratios (skewSafe/window): d10 ${ts / tw}%.2f, " +
          f"d12 ${ts12 / tw12}%.2f"
      )
      deleteRecursively(new java.io.File(dir))
    }
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.util.Fs.deleteRecursively(f)
}
