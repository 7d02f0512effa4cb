package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{JournalOps, Replay, Replicate}
import graft.model.ActionLog
import graft.pipeline.{Dedup, Multimodal, Retrieval, Similarity}
import graft.streaming.FullDeployment

/** The ONE-app law — [[graft.streaming.FullDeployment]] composes the
  * journal plane AND the retrieval plane from one wiring (the
  * reference's single-Replicator posture over the repo's whole surface),
  * and the planes' own laws hold SIMULTANEOUSLY from the composed tick:
  *
  *   - journal replay ≡ whole-log batch derivation (replicated store
  *     exact), and the gated read through the composed wiring's head
  *     cache is row-identical to the ungated read;
  *   - the pipeline's stored hybrid search ≡ batch-built stores over the
  *     same ingest history, and the maintained media store likewise;
  *   - ONE health frame: a row for every store of BOTH planes, all
  *     clear after the final tick.
  */
class FullDeploymentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-full-deployment-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def assertSame(got: DataFrame, want: DataFrame, clue: String): Unit = {
    assert(got.exceptAll(want).count() == 0, s"$clue: extra rows")
    assert(want.exceptAll(got).count() == 0, s"$clue: missing rows")
  }

  test("one composed tick drives both planes: journal exact + gated read identical, search ≡ batch stores, one clear health frame") {
    // ---- journal-plane input: per-partition proportional chunks (the
    // DeploymentSpec protocol — every partition replicates at the same
    // fractional pace, keeping the cache watermark below the read's 0.8
    // staleness bound)
    val a = ActionLog.fromEvents(spark, sfDir).cache()
    val n = 4
    val bounds = a
      .groupBy("topic", "part_no")
      .agg((max("koffset") + 1L).as("cnt"))
    def chunk(i: Int): DataFrame =
      a.join(broadcast(bounds), Seq("topic", "part_no"))
        .filter(
          col("koffset") >= expr(s"(cnt * $i) DIV $n") &&
            col("koffset") < expr(s"(cnt * ${i + 1}) DIV $n")
        )
        .drop("cnt")

    // ---- pipeline-plane input: the p36d/k16 splits
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val split = Dedup.incrementalBoundary(spark, sfDir)
    val histDocs = d.filter(col("doc_id") < split)
    val dailyDocs = d.filter(col("doc_id") >= split)
    val codes = Similarity.quantized(spark, sfDir).select("vec_id", "q8").cache()
    val histCodes = codes.filter(col("vec_id") % 4 < 3)
    val dailyCodes = codes.filter(col("vec_id") % 4 >= 3)
    val media = Multimodal.mediaTable(spark, sfDir)
    val histMedia = media.filter(col("doc_id") < split)
    val dailyMedia = media.filter(col("doc_id") >= split)

    val tmp = Files.createTempDirectory("graft-fulldeploy").toString
    // compactOverLayers = 1: a single delta layer is already debt, so
    // BOTH planes' maintainers genuinely fire within the composed ticks
    val dep = FullDeployment(s"$tmp/app", compactOverLayers = 1L)
    dep.pipeline.bootstrap(spark, histDocs, histCodes, histMedia)

    val inA = s"$tmp/in-actions"
    val inDocs = s"$tmp/in-docs"
    val inCodes = s"$tmp/in-codes"
    val inMedia = s"$tmp/in-media"
    // the pipeline dailies land before tick 1; the journal chunks one per
    // tick — later composed ticks see no new pipeline files (a legal idle
    // drain) and keep maintaining both planes
    dailyDocs.coalesce(1).write.parquet(s"$inDocs/drop_0")
    dailyCodes.coalesce(1).write.parquet(s"$inCodes/drop_0")
    dailyMedia.coalesce(1).write.parquet(s"$inMedia/drop_0")
    val schema = a.schema
    val decisions = (0 until n).map { i =>
      chunk(i).coalesce(1).write.parquet(s"$inA/chunk_$i")
      dep.tick(
        spark,
        s"$inA/chunk_*",
        schema,
        s"$inDocs/drop_*",
        spark.read.parquet(s"$inDocs/drop_0").schema,
        s"$inCodes/drop_*",
        spark.read.parquet(s"$inCodes/drop_0").schema,
        s"$inMedia/drop_*",
        spark.read.parquet(s"$inMedia/drop_0").schema
      )
    }

    // ---- journal plane from the composed wiring
    val store = dep.journal.readStore(spark)
    val want = Replicate.compute(a)
    def aligned(df: DataFrame, ref: DataFrame): DataFrame =
      df.select(ref.columns.sorted.map(col).toIndexedSeq: _*)
    assertSame(
      aligned(store.journal, want.journal),
      aligned(want.journal, want.journal),
      "replicated journal"
    )
    val outCols = Seq("topic", "id", "seq_nr", "koffset", "payload")
    assertSame(
      Replay
        .mergedReadGated(a, dep.journal.readHeads(spark))
        .select(outCols.map(col): _*),
      Replay.mergedRead(a).select(outCols.map(col): _*),
      "gated replay through the composed wiring's cache"
    )

    // ---- pipeline plane from the same wiring: search ≡ batch twin
    val rt = Files.createTempDirectory("graft-fulldeploy-ref").toString
    Retrieval.writeInvertedIndexOf(spark, histDocs, s"$rt/text", withPositions = true)
    Retrieval.appendToInvertedIndex(spark, dailyDocs, s"$rt/text")
    Similarity.writeIvfIndexExactOf(spark, histCodes, s"$rt/vec")
    Similarity.appendToIvfIndexExact(spark, dailyCodes, s"$rt/vec")
    def rows4(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      df.select("qid", "doc_id", "rank", "rrf_ppm")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3))
        .toSeq
    assert(
      rows4(dep.pipeline.search(spark, sfDir)) ==
        rows4(Retrieval.hybridStoredTopK(spark, sfDir, s"$rt/text", s"$rt/vec")),
      "composed-wiring search ≡ batch stores"
    )
    // the media store too (the fourth ingest ran from the same tick)
    val mq = Multimodal.mediaCodesOf(media)
    val mRef = s"$tmp/media-ref"
    Multimodal.writeMediaIvfIndex(spark, Multimodal.mediaCodesOf(histMedia), mRef)
    Similarity.appendToIvfIndexExact(
      spark, Multimodal.mediaCodesOf(dailyMedia), mRef)
    def rowsM(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      df.select("qid", "doc_id", "rank", "score")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3))
        .toSeq
    assert(
      rowsM(dep.pipeline.mediaSearch(spark, mq)) ==
        rowsM(Multimodal.mediaKnnIvfStored(spark, mq, mRef)),
      "composed-wiring media search ≡ batch twin"
    )

    // ---- ONE health frame across both planes, all stores clear
    val health = dep.health(spark).collect()
    assert(
      health.map(_.getAs[String]("store")).toSet == Set(
        "head_cache",
        "snapshot_store",
        "inverted_index",
        "ivf_vectors",
        "lm_model",
        "media_ivf"
      ),
      s"one frame, every store of both planes: ${health.mkString("; ")}"
    )
    assert(
      health.forall(!_.getAs[Boolean]("compact_recommended")),
      s"final health must be clear: ${health.mkString("; ")}"
    )
    // the composition genuinely maintained (not vacuously clear): some
    // composed tick compacted at least one store on each plane
    val fired = decisions
      .flatMap(_.collect())
      .filter(_.getAs[Boolean]("compacted"))
      .map(_.getAs[String]("store"))
      .toSet
    assert(
      fired.exists(Set("head_cache", "snapshot_store")) &&
        fired.exists(Set("inverted_index", "ivf_vectors", "lm_model", "media_ivf")),
      s"both planes must have compacted through the composed ticks: $fired"
    )

    a.unpersist(false)
    codes.unpersist(false)
  }
}
