package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Decontamination, Sampling}
import graft.streaming.StreamingCuration
import graft.streaming.StreamingDedup.Doc

/** Laws for the streaming corpus-hygiene operators: the stateless
  * row-local paths must agree with the batch p9/p10 operators exactly,
  * under any micro-batch chunking.
  */
class StreamingCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-streaming-curation-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // the driver testdata stores naive (isAdjustedToUTC=false) micros;
      // read them as TIMESTAMP so epoch extraction matches the DuckDB oracle
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def corpus(): Seq[Doc] = {
    val sp = spark
    import sp.implicits._
    spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .as[Doc]
      .collect()
      .toSeq
      .sortBy(_.doc_id)
  }

  test("row-local hit counting agrees with the batch join-based p9 per doc") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val eval = d.filter(col("doc_id") % 50 === 0)
    val train = d.filter(col("doc_id") % 50 =!= 0)
    val dict = StreamingCuration.evalGramDictionary(eval)
    val rowLocal = StreamingCuration
      .contaminationScan(train.select("doc_id", "text"), dict)
    val batch = Decontamination.scan(train, eval)
    assert(rowLocal.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(rowLocal).count() == 0)
  }

  test("null text scores as empty text in both batch and row-local paths") {
    val sp = spark
    import sp.implicits._
    val train = Seq((1L, null: String), (2L, ""), (3L, "some text here"))
      .toDF("doc_id", "text")
    val eval = Seq((0L, "")).toDF("doc_id", "text")
    val dict = StreamingCuration.evalGramDictionary(eval)
    val batch =
      Decontamination.scan(train, eval).orderBy("doc_id").collect()
    val rowLocal = StreamingCuration
      .contaminationScan(train, dict)
      .orderBy("doc_id")
      .collect()
    // the null-text doc must NOT be silently dropped, and both paths
    // must emit the identical row for it (null ≡ empty: one partial
    // gram, which hits the empty eval doc's gram)
    assert(batch.length == 3 && rowLocal.length == 3)
    assert(batch.toSeq == rowLocal.toSeq)
    assert(batch(0).getAs[Long]("n_grams") == 1L)
    assert(batch(0).getAs[Long]("n_hit") == 1L)
  }

  test("streaming contamination over chunks equals the batch operator") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val dict =
      StreamingCuration.evalGramDictionary(d.filter(col("doc_id") % 50 === 0))
    val train = corpus().filter(_.doc_id % 50 != 0)
    val chunks = train.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)

    val ms = MemoryStream[Doc]
    val q = StreamingCuration
      .contaminationScan(ms.toDS().toDF(), dict)
      .writeStream
      .format("memory")
      .queryName("sc_contam")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("sc_contam")
    val want = Decontamination.scan(
      d.filter(col("doc_id") % 50 =!= 0),
      d.filter(col("doc_id") % 50 === 0)
    )
    assert(got.count() == train.size.toLong)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming PII scrub over chunks plus redelivery equals the batch scan") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // seeded harness text (the batch p16 corpus) so matches are non-vacuous
    val seeded = graft.pipeline.Pii
      .seededText(spark, sfDir)
      .as[Doc]
      .collect()
      .toSeq
      .sortBy(_.doc_id)
    val chunks = seeded.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)

    val ms = MemoryStream[Doc]
    val q = StreamingCuration
      .piiScanStream(ms.toDS().toDF())
      .writeStream
      .format("memory")
      .queryName("sc_pii")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      // row-local => redelivery re-emits byte-identical rows
      ms.addData(chunks.head)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sc_pii").distinct()
    val want = graft.pipeline.Pii.scan(graft.pipeline.Pii.seededText(spark, sfDir))
    assert(got.count() == seeded.size.toLong)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming sample over chunks equals the batch filter") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // stratify by doc_id parity so the stream needs no source column
    case class SDoc(doc_id: Long, source: String)
    val rows = corpus().map(d =>
      (d.doc_id, if (d.doc_id % 2 == 0) "even" else "odd"))
    val chunks = rows.grouped(math.max(rows.size / 4, 1)).toSeq
    val rates = Map("even" -> 0.3, "odd" -> 0.8)

    val ms = MemoryStream[(Long, String)]
    val q = StreamingCuration
      .sampleStream(ms.toDS().toDF("doc_id", "source"), rates)
      .writeStream
      .format("memory")
      .queryName("sc_sample")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("sc_sample")
    val want = Sampling.weightedSample(
      rows.toDF("doc_id", "source"),
      rates
    )
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
    // and the redelivery story: re-sending a chunk adds only exact
    // duplicates of rows already emitted (deterministic gate)
    val before = got.count()
    val q2 = StreamingCuration
      .sampleStream(ms.toDS().toDF("doc_id", "source"), rates)
      .writeStream
      .format("memory")
      .queryName("sc_sample2")
      .outputMode("append")
      .start()
    try {
      ms.addData(chunks.head); q2.processAllAvailable()
    } finally q2.stop()
    val redelivered = spark.table("sc_sample2")
    assert(redelivered.exceptAll(want).count() == 0)
    assert(before == spark.table("sc_sample").count())
  }

  test("sorted_hit_count: null elements miss, empty dictionary hits nothing") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, null, 3L)),
      (2L, Seq[java.lang.Long]())
    ).toDF("id", "xs")
    val withDict = df.select(
      col("id"),
      graft.functions.SortedHitCount
        .hitCount(col("xs"), Array(3L, 1L, 99L)) // unsorted on purpose
        .as("hits")
    )
    val got = withDict.orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(2L, 0L))
    val empty = df.select(
      graft.functions.SortedHitCount.hitCount(col("xs"), Array.empty[Long])
    )
    assert(empty.collect().map(_.getLong(0)).sum == 0L)
  }

  // --- budgetFillStream (streaming p20) ---

  import graft.streaming.StreamingCuration.{MixDoc, MixOut}

  private val mixCorpus: Seq[MixDoc] = {
    val rnd = new scala.util.Random(13)
    (0 until 120).map(i =>
      MixDoc(i.toLong, s"src${i % 3}", 10L + rnd.nextInt(40))
    )
  }

  /** The semantics source of truth: greedy fill in doc_id order. */
  private def greedy(budget: Long): Seq[MixOut] = {
    val filled = scala.collection.mutable.Map.empty[String, Long]
    mixCorpus.sortBy(_.doc_id).flatMap { d =>
      val f = filled.getOrElse(d.source, 0L)
      if (f < budget) {
        filled(d.source) = f + d.n_toks
        Some(MixOut(d.doc_id, d.source, d.n_toks, f))
      } else None
    }
  }

  private def runFill(
      chunks: Seq[Seq[MixDoc]],
      budget: Long,
      name: String
  ): Seq[MixOut] = {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[MixDoc]
    val q = StreamingCuration
      .budgetFillStream(spark, ms.toDS(), budget)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    spark
      .table(name)
      .as[MixOut]
      .collect()
      .toSeq
      .sortBy(o => (o.source, o.doc_id))
  }

  test("budget fill: any chunking of an ordered stream equals the greedy batch fill") {
    val budget = 600L
    val want = greedy(budget).sortBy(o => (o.source, o.doc_id))
    assert(want.nonEmpty && want.size < mixCorpus.size) // budget bites
    val oneShot = runFill(Seq(mixCorpus), budget, "bf_one")
    val chunked = runFill(mixCorpus.grouped(17).toSeq, budget, "bf_chunk")
    assert(oneShot == want)
    assert(chunked == want)
  }

  test("budget fill: straddling doc kept, then the stratum stays closed") {
    val out = runFill(Seq(mixCorpus), 1L, "bf_straddle")
    // budget 1: exactly the first doc of each stratum, cum_before = 0
    assert(out.size == 3)
    assert(out.forall(_.cum_before == 0L))
    // zero budget admits nothing
    assert(runFill(Seq(mixCorpus), 0L, "bf_zero").isEmpty)
  }

  test("budget fill: redelivered rows emit nothing and never double-count") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val budget = 600L
    val ms = MemoryStream[MixDoc]
    val q = StreamingCuration
      .budgetFillStream(spark, ms.toDS(), budget)
      .writeStream
      .format("memory")
      .queryName("bf_redeliver")
      .outputMode("append")
      .start()
    val (first, rest) = mixCorpus.splitAt(40)
    try {
      ms.addData(first); q.processAllAvailable()
      ms.addData(first); q.processAllAvailable() // source-level redelivery
      ms.addData(rest); q.processAllAvailable()
    } finally q.stop()
    val got = spark
      .table("bf_redeliver")
      .as[MixOut]
      .collect()
      .toSeq
      .sortBy(o => (o.source, o.doc_id))
    assert(got == greedy(budget).sortBy(o => (o.source, o.doc_id)))
  }

  test("streaming surgical decontamination over arbitrary chunks equals batch p29") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    val eval = all.filter(col("doc_id") % 50 === 0)
    val train = corpus().filter(_.doc_id % 50 != 0)
    // UNORDERED chunking — doc-locality makes any split legal
    val chunks = train.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val base = java.nio.file.Files
      .createTempDirectory("graft-p29-stream").toString

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val ms = MemoryStream[Doc]
    val q = StreamingCuration.decontaminationStream(
      ms.toDS().toDF(), eval, s"$base/ckpt"
    ) { (cleaned, _) =>
      collected ++= cleaned
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    }
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val want = graft.pipeline.Decontamination
      .decontaminationRemoval(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(collected.exists(_._3 > 0)) // eval really overlaps the stream
    assert(collected.toSeq.sortBy(_._1) == want.sortBy(_._1))
  }

  test("streaming self-repetition removal over chunks equals the batch op") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    val chunks = docs.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)
    val base = java.nio.file.Files
      .createTempDirectory("graft-d13-stream").toString

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val ms = MemoryStream[Doc]
    val q = StreamingCuration.selfRepetitionStream(
      ms.toDS().toDF(), s"$base/ckpt"
    ) { (cleaned, _) =>
      collected ++= cleaned
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    }
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val want = graft.pipeline.Dedup
      .removeRepeatedSpansOf(
        spark.read
          .parquet(s"$sfDir/documents.parquet")
          .select("doc_id", "text")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(collected.exists(_._3 > 0)) // non-vacuous at L=3
    assert(collected.toSeq.sortBy(_._1) == want.sortBy(_._1))
  }

  test("streaming affinity scoring over chunks equals the batch scorer") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    // profile trained offline on the reference corpus, then FROZEN
    val weights = Sampling.affinityWeights(spark, d)
    val docs = corpus()
    val chunks = docs.groupBy(_.doc_id % 4).toSeq.sortBy(_._1).map(_._2)

    val ms = MemoryStream[Doc]
    val q = StreamingCuration
      .affinityScoreStream(ms.toDS().toDF(), weights)
      .writeStream
      .format("memory")
      .queryName("sc_affinity")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("sc_affinity")
    val want = Sampling.affinityScoreLocal(d, weights)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming drift report per micro-batch equals the batch kernel on that chunk") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text")
    val boundary = graft.pipeline.Dedup.incrementalBoundary(spark, sfDir)
    // reference profile trained offline on the history corpus, FROZEN
    val ref = Sampling.frozenProfile(d.filter(col("doc_id") < boundary)).cache()
    val rows: Seq[(Long, String, String)] = d
      .filter(col("doc_id") >= boundary)
      .as[(Long, String, String)]
      .collect()
      .toSeq
    val chunks = rows.groupBy(_._1 % 3).toSeq.sortBy(_._1).map(_._2)
    val ck =
      java.nio.file.Files.createTempDirectory("graft-drift-ck").toString
    val perBatch = scala.collection.mutable.Map
      .empty[Long, Seq[(String, Long, Long, Long)]]
    val ms = MemoryStream[(Long, String, String)]
    val q = StreamingCuration.driftReportStream(
      ms.toDF().toDF("doc_id", "source", "text"),
      ref,
      ck
    ) { (rep, bid) =>
      val r = rep
        .collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
        .toSeq
      perBatch.synchronized { perBatch(bid) = r; () }
    }
    try chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    finally q.stop()
    assert(perBatch.size == chunks.size)
    // the monitor's per-batch semantics: each arriving chunk's report IS
    // the batch kernel applied to exactly that chunk
    chunks.zipWithIndex.foreach { case (c, i) =>
      val want = Sampling
        .driftReportOf(c.toDF("doc_id", "source", "text"), ref)
        .collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
        .toSeq
      assert(want.nonEmpty)
      assert(perBatch(i.toLong) == want)
    }
  }

  test("streaming LM scoring over chunks equals the stored-model batch scorer") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val boundary = graft.pipeline.Dedup.incrementalBoundary(spark, sfDir)
    // model trained offline on the history corpus, FROZEN during the run
    val model = java.nio.file.Files.createTempDirectory("graft-lm-sm").toString
    graft.pipeline.QualityModel
      .writeLmModelOf(spark, d.filter(col("doc_id") < boundary), model)

    val rows: Seq[Doc] = d
      .filter(col("doc_id") >= boundary)
      .as[Doc]
      .collect()
      .toSeq
      .sortBy(_.doc_id)
    val ck = java.nio.file.Files.createTempDirectory("graft-lm-sm-ck").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val ms = MemoryStream[Doc]
    val q = StreamingCuration.lmScoreStream(ms.toDF(), model, ck) { (res, _) =>
      val r = res.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      buf.synchronized { buf ++= r: Unit }
    }
    try rows.grouped(rows.size / 3 + 1).foreach { c =>
      ms.addData(c)
      q.processAllAvailable()
    } finally q.stop()

    val batch = graft.pipeline.QualityModel
      .scoreWithLmModel(spark, d.filter(col("doc_id") >= boundary), model)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSeq
    // a doc's score depends only on its own bigrams and the frozen
    // tables, so any chunking reproduces the batch scorer row-for-row
    assert(buf.nonEmpty)
    assert(buf.sortBy(_._1) == batch.sortBy(_._1))
  }

  test("streaming perplexity tiers over chunks equal the batch threshold form") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val boundary = graft.pipeline.Dedup.incrementalBoundary(spark, sfDir)
    val model = java.nio.file.Files.createTempDirectory("graft-lm-tr").toString
    graft.pipeline.QualityModel
      .writeLmModelOf(spark, d.filter(col("doc_id") < boundary), model)
    val arriving = d.filter(col("doc_id") >= boundary)

    // frozen thresholds: the tertile cut points of the history-scored
    // batch (the offline p23-style job a deployment runs)
    val scored = graft.pipeline.QualityModel
      .scoreWithLmModel(spark, arriving, model)
    val cuts = graft.pipeline.QualityModel
      .tiersByRank(scored)
      .groupBy("tier")
      .agg(min("score_ppm").as("lo"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val (tHigh, tLow) = (cuts(1L), cuts(2L))

    val rows: Seq[Doc] =
      arriving.as[Doc].collect().toSeq.sortBy(_.doc_id)
    val ck = java.nio.file.Files.createTempDirectory("graft-lm-tr-ck").toString
    val buf =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    val ms = MemoryStream[Doc]
    val q = StreamingCuration.lmTierStream(ms.toDF(), model, tLow, tHigh, ck) {
      (res, _) =>
        val r = res
          .collect()
          .map(x =>
            (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
              x.getLong(4)))
        buf.synchronized { buf ++= r: Unit }
    }
    try rows.grouped(rows.size / 3 + 1).foreach { c =>
      ms.addData(c)
      q.processAllAvailable()
    } finally q.stop()

    val batch = graft.pipeline.QualityModel
      .tiersByThreshold(scored, tLow, tHigh)
      .collect()
      .map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSeq
    // a doc's tier/keep decision depends only on its own score and the
    // frozen thresholds, so any chunking reproduces the batch form
    assert(buf.nonEmpty)
    assert(buf.sortBy(_._1) == batch.sortBy(_._1))
    assert(buf.map(_._4).toSet == Set(1L, 2L, 3L))
  }

  test("streaming encode over chunks equals the stored-tokenizer batch encoder") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val art = java.nio.file.Files
      .createTempDirectory("graft-tok-stream")
      .toString
    graft.pipeline.TextAnalysis.writeTokenizer(spark, sfDir, art)
    val d = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val rows: Seq[Doc] = d.as[Doc].collect().toSeq.sortBy(_.doc_id).take(120)

    val ck = java.nio.file.Files.createTempDirectory("graft-tok-ck").toString
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val ms = MemoryStream[Doc]
    val q = StreamingCuration.encodeStream(ms.toDF(), art, ck) { (res, _) =>
      val r = res.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      buf.synchronized { buf ++= r: Unit }
    }
    try rows.grouped(rows.size / 3 + 1).foreach { c =>
      ms.addData(c)
      q.processAllAvailable()
    } finally q.stop()

    val batch = graft.pipeline.TextAnalysis
      .encodeWithTokenizer(spark, d.filter(col("doc_id") < rows.size), art)
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .toSeq
    assert(buf.nonEmpty)
    assert(buf.sortBy(t => (t._1, t._2)) == batch.sortBy(t => (t._1, t._2)))
  }
}
