package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Decontamination, Sampling}
import graft.streaming.StreamingCuration

/** Corpus-scaling harness for the hygiene operators: amplifies the sf0.1
  * documents table `factor`× (shifted doc_ids keep the eval-slice mod
  * structure and the per-source strata), then times p9 (both the batch
  * broadcast-join path and the row-local SortedHitCount path), p10 and
  * p11 at half and full amplification.
  *
  * The claim under test is LINEAR: per-row cost must stay flat as the
  * corpus doubles (each operator is one scan + at most one bounded
  * shuffle — a super-linear step would mean a corpus-sized broadcast,
  * sort, or driver materialization hid somewhere). The eval dictionary
  * is also held fixed while the corpus grows, mirroring the real shape:
  * benchmarks don't grow with the training set.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.CorpusStress 10"
  */
object CorpusStress {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    require(factor >= 2, s"need factor >= 2 for a half/full comparison, got $factor")
    val spark = GraftSession.local("graft-corpus-stress")
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def amplified(f: Int) = (0 until f)
      .map { i =>
        base.select(
          (col("doc_id") + i.toLong * 10000000L).as("doc_id"),
          col("text"),
          col("lang"),
          col("source"),
          col("n_chars")
        )
      }
      .reduce(_ unionByName _)

    def writeDir(f: Int): String = {
      val dir = s"/tmp/graft_corpus_$f"
      amplified(f).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }

    def time(name: String, rows: Long)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[corpus] $name%-28s $sec%7.2f s  ($n rows, ${rows / sec}%.0f docs/s)")
      sec
    }

    // untimed warmup at base scale: JIT + codegen + parquet footer caches,
    // so the half/full comparison measures steady-state per-row cost
    locally {
      val d = "/root/testdata/sf0.1"
      val dict = StreamingCuration.evalGramDictionary(
        base.filter(col("doc_id") % 50 === 0)
      )
      Decontamination.contaminationScan(spark, d).count()
      StreamingCuration
        .contaminationScan(base.select("doc_id", "text"), dict)
        .count()
      Sampling.weightedSampleQuery(spark, d).count()
      Sampling.shardAssignment(spark, d).count()
      graft.pipeline.TextAnalysis.repetition(spark, d).count()
      graft.pipeline.Pii.piiScan(spark, d).count()
      graft.pipeline.Packing.tokenWindows(spark, d).count()
      graft.pipeline.Dedup.dupSpans(spark, d).count()
      Sampling.budgetMixQuery(spark, d).count()
      graft.pipeline.QualityModel.qualityModel(spark, d).count()
      graft.pipeline.TextAnalysis.heavyHitters(spark, d).count()
    }

    val results = Seq(factor / 2, factor).map { f =>
      val dir = writeDir(f)
      val rows = f.toLong * base.count()
      println(s"[corpus] --- factor $f ($rows docs) ---")
      val dict = StreamingCuration.evalGramDictionary(
        spark.read
          .parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") % 50 === 0)
      )
      val t9j = time("p9 batch (broadcast join)", rows) {
        Decontamination.contaminationScan(spark, dir).count()
      }
      val t9r = time("p9 row-local (hit count)", rows) {
        StreamingCuration
          .contaminationScan(
            spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"),
            dict
          )
          .count()
      }
      val t10 = time("p10 weighted sample", rows) {
        Sampling.weightedSampleQuery(spark, dir).count()
      }
      val t11 = time("p11 shard rollup", rows) {
        Sampling.shardAssignment(spark, dir).count()
      }
      val t15 = time("p15 repetition signals", rows) {
        graft.pipeline.TextAnalysis.repetition(spark, dir).count()
      }
      val t16 = time("p16 pii scan", rows) {
        graft.pipeline.Pii.piiScan(spark, dir).count()
      }
      val t17 = time("p17 token windows", rows) {
        graft.pipeline.Packing.tokenWindows(spark, dir).count()
      }
      val td10 = time("d10 duplicate spans", rows) {
        graft.pipeline.Dedup.dupSpans(spark, dir).count()
      }
      val t20 = time("p20 budget mix", rows) {
        Sampling.budgetMixQuery(spark, dir).count()
      }
      val t22 = time("p22 quality model", rows) {
        graft.pipeline.QualityModel.qualityModel(spark, dir).count()
      }
      val t23 = time("p23 heavy hitters (cms)", rows) {
        graft.pipeline.TextAnalysis.heavyHitters(spark, dir).count()
      }
      (f, Seq(t9j, t9r, t10, t11, t15, t16, t17, td10, t20, t22, t23))
    }

    val Seq((fHalf, half), (fFull, full)) = results
    half.zip(full).zip(
      Seq("p9join", "p9row", "p10", "p11", "p15", "p16", "p17", "d10", "p20",
        "p22", "p23")
    ).foreach {
      case ((h, fl), name) =>
        val perRowRatio = (fl / fFull) / (h / fHalf)
        println(f"[corpus] $name%-8s per-row cost ratio (full/half): $perRowRatio%.2f")
    }
    // the amplified corpora are multi-GB at large factors: clean up
    Seq(factor / 2, factor).foreach { f =>
      deleteRecursively(new java.io.File(s"/tmp/graft_corpus_$f"))
    }
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.util.Fs.deleteRecursively(f)
}
