package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Multimodal, Retrieval, Similarity}
import graft.streaming.PipelineDeployment

/** The retrieval-plane ONE-wiring integration law — [[graft.streaming.PipelineDeployment]]
  * composes the three store ingests + the fenced maintainer + the search
  * service the way [[graft.streaming.Deployment]] composes the journal
  * loops (the reference's Replicator.make posture). From one wiring:
  *
  *   - stored hybrid search ≡ the batch-built stores over EVERY tick
  *     boundary (after each tick, not just at the end);
  *   - maintainAll fires DURING live ingest without double-counting any
  *     sum-merged layer: the fold boundary comes from the ingests' own
  *     commit logs, probed by FORCING a redelivery (commit file removed,
  *     stream restarted) — and the hazard it prevents is demonstrated
  *     for real on an unprotected store (fold-then-redeliver
  *     double-counts);
  *   - the LM plane's maintained model scores identically to its
  *     batch-built twin;
  *   - final health clear.
  */
class PipelineDeploymentSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-pipeline-deployment-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.select("qid", "doc_id", "rank", "rrf_ppm")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3))
      .toSeq

  test("one wiring: search ≡ batch at every tick, maintainer fenced at the committed frontier through a forced redelivery, LM twin, health clear") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val codes = Similarity.quantized(spark, sfDir).select("vec_id", "q8").cache()
    val split = Dedup.incrementalBoundary(spark, sfDir)
    val maxDoc = d.agg(max("doc_id")).head().getLong(0)
    val midDoc = (split + maxDoc + 1L) / 2L
    val histDocs = d.filter(col("doc_id") < split)
    val drop0Docs = d.filter(col("doc_id") >= split && col("doc_id") < midDoc)
    val drop1Docs = d.filter(col("doc_id") >= midDoc)
    val histCodes = codes.filter(col("vec_id") % 4 < 3)
    val dailyCodes = codes.filter(col("vec_id") % 4 >= 3)
    val maxVec = codes.agg(max("vec_id")).head().getLong(0)
    val midVec = maxVec / 2L
    val drop0Codes = dailyCodes.filter(col("vec_id") < midVec)
    val drop1Codes = dailyCodes.filter(col("vec_id") >= midVec)
    val media = Multimodal.mediaTable(spark, sfDir)
    val histMedia = media.filter(col("doc_id") < split)
    val drop0Media = media.filter(col("doc_id") >= split && col("doc_id") < midDoc)
    val drop1Media = media.filter(col("doc_id") >= midDoc)
    assert(drop0Docs.count() > 0 && drop1Docs.count() > 0)
    assert(drop0Codes.count() > 0 && drop1Codes.count() > 0)

    val tmp = Files.createTempDirectory("graft-pipedeploy").toString
    // compactOverLayers = 1: one delta layer is already debt, so the
    // maintainer genuinely fires during the lifecycle
    val dep = PipelineDeployment(s"$tmp/stores", compactOverLayers = 1L)
    dep.bootstrap(spark, histDocs, histCodes, histMedia)

    val inDocs = s"$tmp/in-docs"
    val inCodes = s"$tmp/in-codes"
    val inMedia = s"$tmp/in-media"
    drop0Docs.coalesce(1).write.parquet(s"$inDocs/drop_0")
    drop0Codes.coalesce(1).write.parquet(s"$inCodes/drop_0")
    drop0Media.coalesce(1).write.parquet(s"$inMedia/drop_0")
    val docsSchema = spark.read.parquet(s"$inDocs/drop_0").schema
    val codesSchema = spark.read.parquet(s"$inCodes/drop_0").schema
    val mediaSchema = spark.read.parquet(s"$inMedia/drop_0").schema
    def tick(): DataFrame = dep.tick(
      spark, s"$inDocs/drop_*", docsSchema, s"$inCodes/drop_*", codesSchema,
      s"$inMedia/drop_*", mediaSchema)

    // reference stores built BATCH-wise over the same splits (the p36d
    // protocol applied to each prefix) — the law's right-hand side
    def refSearch(docsPrefix: DataFrame, codesPrefix: DataFrame): Seq[(Long, Long, Long, Long)] = {
      val rt = Files.createTempDirectory("graft-pipedeploy-ref").toString
      Retrieval.writeInvertedIndexOf(
        spark, histDocs, s"$rt/text", withPositions = true)
      Retrieval.appendToInvertedIndex(spark, docsPrefix, s"$rt/text")
      Similarity.writeIvfIndexExactOf(spark, histCodes, s"$rt/vec")
      Similarity.appendToIvfIndexExact(spark, codesPrefix, s"$rt/vec")
      rows(Retrieval.hybridStoredTopK(spark, sfDir, s"$rt/text", s"$rt/vec"))
    }

    // ---- tick 1: search over the deployment ≡ batch over the prefix
    val m1 = tick()
    assert(
      rows(dep.search(spark, sfDir)) == refSearch(drop0Docs, drop0Codes),
      "search ≡ batch after tick 1"
    )
    // the maintainer FIRED during the live lifecycle (compactOverLayers=1
    // and the bootstrap+drop0 stores each hold a delta layer)
    assert(
      m1.collect().exists(_.getAs[Boolean]("compacted")),
      "tick 1 must have compacted at least one store"
    )

    // ---- tick 2's TEXT ingest CRASHES after the append but before its
    // batch commits (a throwing healthSink sits exactly at that seam in
    // the foreachBatch body): layer 2 lands on disk, the commit log stays
    // at batch 0 — the genuine T1 crash-before-commit state, injected
    // through the loop's own API
    drop1Docs.coalesce(1).write.parquet(s"$inDocs/drop_1")
    drop1Codes.coalesce(1).write.parquet(s"$inCodes/drop_1")
    drop1Media.coalesce(1).write.parquet(s"$inMedia/drop_1")
    val crashed = graft.streaming.StreamingRetrieval
      .ingestStream(
        spark.readStream.schema(docsSchema).parquet(s"$inDocs/drop_*"),
        dep.textIndexDir,
        dep.ckText,
        healthEvery = 1
      )((_, batchId) =>
        if (batchId == 1L)
          throw new RuntimeException("injected crash before commit")
      )
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashed.awaitTermination()
    }
    // the vector and LM loops drain cleanly (their redelivery mechanics
    // carry their own per-store specs; the fence probe runs on the store
    // with the most sum-merged members)
    graft.streaming.StreamingSimilarity
      .ingestExactStream(
        spark.readStream.schema(codesSchema).parquet(s"$inCodes/drop_*"),
        dep.vecIndexDir,
        dep.ckVec
      )
      .awaitTermination()
    graft.streaming.StreamingCuration
      .lmTrainStream(
        spark.readStream.schema(docsSchema).parquet(s"$inDocs/drop_*"),
        dep.lmDir,
        dep.ckLm
      )()
      .awaitTermination()
    val wantFull = refSearch(
      drop0Docs.unionByName(drop1Docs),
      drop0Codes.unionByName(drop1Codes)
    )
    // the appended-but-uncommitted layer already serves reads (layer
    // merges are read-side), so search is whole-corpus even mid-crash
    assert(rows(dep.search(spark, sfDir)) == wantFull, "search ≡ batch after the drains")
    assert(
      dep.committedBatchId(dep.ckText) == 0L,
      "the crash must precede the text batch's commit"
    )

    // maintenance DURING the redeliverable window: the fold boundary from
    // the commit log protects layer 2 (batch 1's layer), so maintainAll
    // may run beside the crashed ingest without double-count exposure
    graft.Maintenance.maintainAll(spark, dep.registry)
    def textLayers(): Set[Long] = spark.read
      .parquet(
        graft.util.DirSwap
          .resolve(dep.textIndexDir, "postings")
          .toString
      )
      .select(col("layer").cast("long"))
      .distinct()
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(
      textLayers().contains(2L),
      "the uncommitted batch's layer must survive maintenance unfolded"
    )
    // the next tick RE-DELIVERS batch 1 (same batch id, same files),
    // rewriting its own layer via dynamic overwrite, re-committing it —
    // and its maintainAll (protect now 2) folds it: nothing double-counts
    tick()
    assert(
      rows(dep.search(spark, sfDir)) == wantFull,
      "search ≡ batch after maintenance-during-redelivery"
    )
    val trueDocs = d.count()
    def storedDocs(dir: String): Long = spark.read
      .parquet(graft.util.DirSwap.resolve(dir, "stats"))
      .agg(sum("n_docs"))
      .head()
      .getLong(0)
    assert(storedDocs(dep.textIndexDir) == trueDocs, "stats never double-count")

    // ---- the hazard is REAL (non-vacuous): an UNPROTECTED fold followed
    // by the same redelivery double-counts the sum-merged members
    val bad = Files.createTempDirectory("graft-pipedeploy-bad").toString
    Retrieval.writeInvertedIndexOf(spark, histDocs, bad, withPositions = true)
    Retrieval.appendToInvertedIndex(spark, drop0Docs, bad, layer = 1L)
    // fold EVERYTHING, including the possibly-redeliverable layer 1
    Retrieval.compactInvertedIndex(spark, bad, protectLayersAbove = Long.MaxValue)
    // T1 redelivery rewrites layer 1 — but its rows were already folded
    Retrieval.appendToInvertedIndex(spark, drop0Docs, bad, layer = 1L)
    assert(
      storedDocs(bad) > histDocs.count() + drop0Docs.count(),
      "unprotected fold + redelivery must double-count (else the fence is vacuous)"
    )

    // ---- LM plane: the deployment's maintained model scores identically
    // to its batch-built twin over the same ingest history
    val lmRef = Files.createTempDirectory("graft-pipedeploy-lm").toString
    graft.pipeline.QualityModel.writeLmModelOf(spark, histDocs, lmRef)
    graft.pipeline.QualityModel.appendToLmModel(
      spark, drop0Docs.unionByName(drop1Docs), lmRef, layer = 1L)
    def lmRows(dir: String): Seq[(Long, Long)] =
      graft.pipeline.QualityModel
        .scoreWithLmModel(spark, d, dir)
        .select("doc_id", "score_ppm")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1)
        .toSeq
    assert(lmRows(dep.lmDir) == lmRows(lmRef), "maintained LM ≡ batch twin")

    // ---- media plane: the deployment's MAINTAINED media ANN store reads
    // row-identical to the batch-built twin over the same ingest history
    // (the stream ≡ batch law on the fourth store — its layers arrived
    // through two streaming batches + compaction, the twin's through one
    // batch append)
    val mq = Multimodal.mediaCodesOf(media)
    val mRef = Files.createTempDirectory("graft-pipedeploy-media").toString
    Multimodal.writeMediaIvfIndex(spark, Multimodal.mediaCodesOf(histMedia), mRef)
    Similarity.appendToIvfIndexExact(
      spark,
      Multimodal.mediaCodesOf(drop0Media.unionByName(drop1Media)),
      mRef
    )
    def mRows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
      df.select("qid", "doc_id", "rank", "score")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3))
        .toSeq
    assert(
      mRows(dep.mediaSearch(spark, mq)) ==
        mRows(Multimodal.mediaKnnIvfStored(spark, mq, mRef)),
      "maintained media store ≡ batch twin"
    )

    // ---- final health: the redelivered batch is committed again, so the
    // next maintenance folds it and the report clears
    graft.Maintenance.maintainAll(spark, dep.registry)
    val health = dep.health(spark).collect()
    assert(health.nonEmpty)
    assert(
      health.map(_.getAs[String]("store")).toSet ==
        Set("inverted_index", "ivf_vectors", "lm_model", "media_ivf"),
      "one health frame across all four stores"
    )
    assert(
      health.forall(!_.getAs[Boolean]("compact_recommended")),
      s"final health must be clear: ${health.mkString("; ")}"
    )
    codes.unpersist(false)
  }

  test("committedBatchId resolves through Hadoop FileSystem: URI-schemed checkpoints read correctly, unreadable ones fail loudly") {
    val tmp = Files.createTempDirectory("graft-ckfs").toString
    // a real commit log, addressed through an explicitly URI-schemed path
    // (Hadoop LocalFileSystem resolution, NOT java.nio string paths):
    // same answer as the bare-path read
    Files.createDirectories(Paths.get(tmp, "ck", "commits"))
    Files.write(Paths.get(tmp, "ck", "commits", "0"), Array[Byte]('v'))
    Files.write(Paths.get(tmp, "ck", "commits", "3"), Array[Byte]('v'))
    val dep = PipelineDeployment(s"$tmp/stores")
    assert(dep.committedBatchId(s"$tmp/ck") == 3L)
    assert(dep.committedBatchId(s"file:$tmp/ck") == 3L, "URI-schemed resolution")
    // virgin checkpoint (never started / never committed): the one benign
    // miss — protect everything
    assert(dep.committedBatchId(s"$tmp/no-such-ck") == -1L)
    assert(dep.committedBatchId(s"file:$tmp/no-such-ck") == -1L)
    // an UNRESOLVABLE checkpoint location must throw, not silently return
    // −1 (silent over-protection wedges compaction forever — the outage
    // must surface)
    intercept[Exception] {
      dep.committedBatchId("nosuchfs://bucket/ck"): Unit
    }
  }

  test("p36e lifecycle query is row-identical to the p36d lifecycle (the oracle-reuse law)") {
    assert(
      rows(PipelineDeployment.lifecycleQuery(spark, sfDir)) ==
        rows(Retrieval.hybridStoredLifecycle(spark, sfDir)),
      "deployment lifecycle ≡ hybridStoredLifecycle"
    )
  }
}
