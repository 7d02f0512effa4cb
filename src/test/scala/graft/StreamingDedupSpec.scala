package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity}
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{Doc, Vec}

/** Chunked-stream ≡ batch laws for the incremental dedup operators: a
  * document stream deduped as it arrives must agree with the batch dedup
  * of the accumulated corpus.
  */
class StreamingDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-streaming-dedup-test")
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

  test("row-local band signature mirrors the batch band index exactly") {
    val sp = spark
    import sp.implicits._
    val docs = corpus()
    val scalar = docs
      .flatMap(d => StreamingDedup.bandsOf(d.text).map {
        case (band, bucket) => (d.doc_id, band, bucket)
      })
      .toSet
    val batch = Dedup
      .bandedIndex(Dedup.shingles(
        spark.read.parquet(s"$sfDir/documents.parquet")))
      .as[(Long, Int, Long)]
      .collect()
      .toSet
    // covers the full tokenizer/hash chain: Spark split keeps trailing
    // empties, short-doc partial shingles, affine minhash, Horner buckets
    assert(scalar == batch)
  }

  test("streaming exact dedup over ordered chunks equals batch assignment") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    val chunks = docs.grouped(math.max(docs.size / 3, 1)).toSeq

    val ms = MemoryStream[Doc]
    val q = StreamingDedup
      .exactDedup(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("sd_exact")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark
      .table("sd_exact")
      .select("doc_id", "canonical_id", "is_dup")
    val want = Dedup
      .exact(spark, sfDir)
      .select("doc_id", "canonical_id", "is_dup")
    assert(got.count() == docs.size.toLong)
    assert(got.exceptAll(want).count() == 0)
    assert(want.exceptAll(got).count() == 0)
  }

  test("streaming minhash candidates over arbitrary chunks equal batch set") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    // arbitrary (non-ordered) chunking: the law is chunking-independent
    val chunks = docs.groupBy(_.doc_id % 3).toSeq.sortBy(_._1).map(_._2)

    val ms = MemoryStream[Doc]
    val q = StreamingDedup
      .minhashCandidatePairs(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("sd_cand")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark.table("sd_cand").as[(Long, Long)].collect().toSet
    val want = Dedup
      .minhashCandidates(Dedup.shingles(
        spark.read.parquet(s"$sfDir/documents.parquet")))
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  private def seededVecs(): Seq[Vec] = {
    val sp = spark
    import sp.implicits._
    Similarity
      .seededCorpus(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .as[Vec]
      .collect()
      .toSeq
      .sortBy(_.vec_id)
  }

  test("streaming embedding near-dup over arbitrary chunks equals batch d4") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = seededVecs()
    // non-ordered chunking: seeds (high ids) land in different chunks than
    // their twins, so pairs must be found across micro-batch boundaries
    val chunks = vecs.groupBy(_.vec_id % 3).toSeq.sortBy(_._1).map(_._2)

    val ms = MemoryStream[Vec]
    val q = StreamingDedup
      .embeddingNearDup(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("sd_neardup")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark
      .table("sd_neardup")
      .as[(Int, Long, Long, Double)]
      .collect()
      .toSet
    val want = Similarity
      .embeddingNearDupOn(Similarity.seededCorpus(spark, sfDir))
      .select(col("label"), col("a"), col("b"), col("sim"))
      .as[(Int, Long, Long, Double)]
      .collect()
      .toSet
    assert(want.nonEmpty) // seeded twins guarantee ground truth
    assert(got == want)   // exact, including bit-identical sims
  }

  test("media scrub stream: row-local features mirror the batch extractor; streamed verdicts equal batch m6") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val media = graft.pipeline.Multimodal
      .mediaTable(spark, sfDir)
      .as[(Long, Array[Byte], String)]
      .collect()
      .map { case (id, p, t) => StreamingDedup.MediaRow(id, p, t) }
      .sortBy(_.doc_id) // monotone ingest ids — the keep-first contract
      .toSeq

    // law 1: the scalar feature mirror ≡ the batch extractor, row-for-row
    val mirrored = media
      .map(m => StreamingDedup.mediaVecOf(m.doc_id, m.payload, m.media_type))
      .map(v => v.vec_id -> v.embedding.toSeq)
      .toMap
    val batchFeats = graft.pipeline.Multimodal
      .extractFeatures(spark, sfDir)
      .as[(Long, Array[Float])]
      .collect()
    assert(batchFeats.nonEmpty)
    batchFeats.foreach { case (id, e) => assert(mirrored(id) == e.toSeq) }

    // law 2: streamed scrub verdicts ≡ the batch m6 operator. Seeds are
    // feature-level fixtures (no generating payload), so the stream runs
    // the REAL media table; seed ids are never keepers and connect only
    // within already-connected direction groups, so the batch output
    // filtered below the seed offset IS the unseeded answer.
    val chunks = media.grouped((media.size + 2) / 3).toSeq
    val ms = MemoryStream[StreamingDedup.MediaRow]
    val q = StreamingDedup
      .mediaScrubStream(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("sd_media_scrub")
      .outputMode("append")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark
      .table("sd_media_scrub")
      .groupBy(col("b").as("doc_id"))
      .agg(min("a").as("keeper"))
      .as[(Long, Long)]
      .collect()
      .toSet
    val want = graft.pipeline.Multimodal
      .mediaNearDup(spark, sfDir)
      .filter(col("doc_id") < 1000000L)
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("redelivered vectors are no-ops (idempotent near-dup emission)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = seededVecs()

    val ms = MemoryStream[Vec]
    val q = StreamingDedup
      .embeddingNearDup(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("sd_neardup_redeliver")
      .outputMode("append")
      .start()
    try {
      ms.addData(vecs); q.processAllAvailable()
      val afterFirst = spark.table("sd_neardup_redeliver").count()
      assert(afterFirst > 0)
      ms.addData(vecs); q.processAllAvailable() // full redelivery
      assert(spark.table("sd_neardup_redeliver").count() == afterFirst)
    } finally q.stop()
  }

  test("seen-window cap: single delivery exact; beyond-window replay dupes, never corrupts") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = seededVecs()
    val chunks = vecs.groupBy(_.vec_id % 3).toSeq.sortBy(_._1).map(_._2)

    val ms = MemoryStream[Vec]
    // maxSeenPerBucket=1: the redelivery guard degrades to a 1-row window,
    // the harshest setting — single-delivery output must be unaffected
    // (the guard is never consulted for first arrivals)
    val q = StreamingDedup
      .embeddingNearDup(spark, ms.toDS(), maxSeenPerBucket = 1)
      .writeStream
      .format("memory")
      .queryName("sd_seencap")
      .outputMode("append")
      .start()
    val want = Similarity
      .embeddingNearDupOn(Similarity.seededCorpus(spark, sfDir))
      .select(col("label"), col("a"), col("b"), col("sim"))
      .as[(Int, Long, Long, Double)]
      .collect()
      .toSet
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
      val single = spark
        .table("sd_seencap")
        .as[(Int, Long, Long, Double)]
        .collect()
      assert(single.toSet == want) // exact under single delivery
      // replay the FIRST chunk — far beyond the 1-row seen window: rows
      // re-pair (at-least-once dupes) but the pair SET stays the batch
      // set — no spurious pairs, no lost pairs, no corrupted sims
      ms.addData(chunks.head)
      q.processAllAvailable()
      val replayed = spark
        .table("sd_seencap")
        .as[(Int, Long, Long, Double)]
        .collect()
      assert(replayed.length >= single.length)
      assert(replayed.toSet == want)
    } finally q.stop()
  }

  test("bucket at maxBucketOccupancy stops admitting without corrupting state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // identical texts → every doc lands in the same (band, bucket) groups
    val docs = (1L to 6L).map(i => Doc(i, "alpha beta gamma delta"))

    val ms = MemoryStream[Doc]
    val q = StreamingDedup
      .minhashCandidatePairs(spark, ms.toDS(), maxBucketOccupancy = 3)
      .writeStream
      .format("memory")
      .queryName("sd_cap")
      .outputMode("append")
      .start()
    try {
      ms.addData(docs.take(4)); q.processAllAvailable()
      // docs 1-3 admitted; doc 4 hits the cap in every bucket: the 4 bands
      // emit pairs only among the first 3 → C(3,2)=3 pairs × 4 bands
      val got1 = spark.table("sd_cap").as[(Long, Long)].collect()
      assert(got1.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
      assert(got1.length == 12)
      // prior state intact: later arrivals still pair against the SAME
      // uncorrupted occupant set, and the capped bucket admits no one new
      ms.addData(docs.drop(4)); q.processAllAvailable()
      val got2 = spark.table("sd_cap").as[(Long, Long)].collect()
      assert(got2.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
      assert(got2.length == 12)
    } finally q.stop()
  }

  test("redelivered documents are no-ops (idempotent candidate emission)") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus().take(50)

    val ms = MemoryStream[Doc]
    val q = StreamingDedup
      .minhashCandidatePairs(spark, ms.toDS())
      .writeStream
      .format("memory")
      .queryName("sd_redeliver")
      .outputMode("append")
      .start()
    try {
      ms.addData(docs); q.processAllAvailable()
      val afterFirst = spark.table("sd_redeliver").count()
      ms.addData(docs); q.processAllAvailable() // full redelivery
      assert(spark.table("sd_redeliver").count() == afterFirst)
    } finally q.stop()
  }

  test("streaming span dedup folds chunks exactly like the batch APIs") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-span-stream").toString
    // old corpus seeds the index; the stream delivers two chunks, the
    // second containing a verbatim copy of a CHUNK-1 doc (ids offset so
    // nothing collides) — the cross-chunk dup must lose its span
    val all = corpus()
    val oldDocs = all.filter(_.doc_id < 300)
    val chunk1 = all.filter(d => d.doc_id >= 300 && d.doc_id < 400)
    val chunk2 = all.filter(_.doc_id >= 400) ++
      chunk1.take(5).map(d => Doc(d.doc_id + 2000000L, d.text))
    graft.pipeline.Dedup.writeSpanIndex(
      spark, oldDocs.toDF(), s"$base/index", spanWords = 8)

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, String)]
    val ms = MemoryStream[Doc]
    val q = graft.streaming.StreamingDedup.spanDedupStream(
      ms.toDS().toDF(), s"$base/index", s"$base/ckpt"
    ) { (cleaned, _) =>
      collected ++= cleaned
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    }
    try {
      ms.addData(chunk1); q.processAllAvailable()
      ms.addData(chunk2); q.processAllAvailable()
    } finally q.stop()

    // sequential fold of the batch APIs over the SAME chunks and a
    // freshly seeded index
    graft.pipeline.Dedup.writeSpanIndex(
      spark, oldDocs.toDF(), s"$base/index2", spanWords = 8)
    val want = Seq(chunk1, chunk2).flatMap { c =>
      val out = graft.pipeline.Dedup
        .removeDupSpansAgainstIndex(spark, s"$base/index2", c.toDF())
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      graft.pipeline.Dedup.appendToSpanIndex(spark, s"$base/index2", c.toDF())
      out
    }
    assert(collected.toSeq == want)
    // non-vacuous: every copied doc arrives after its chunk-1 original
    // and must lose (at least) its whole span coverage
    val copies = collected.filter(_._1 >= 2000000L)
    assert(copies.size == 5 && copies.forall(_._3 > 0))
  }

  test("streaming paragraph dedup folds chunks exactly like the batch APIs") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-para-stream").toString
    // same delivery shape as the span-stream law: an old corpus seeds the
    // index, two chunks arrive in doc_id order, the second carrying
    // verbatim copies of chunk-1 docs — their paragraphs must lose to the
    // index while first-seen paragraphs survive exactly once
    val all = corpus()
    val oldDocs = all.filter(_.doc_id < 300)
    val chunk1 = all.filter(d => d.doc_id >= 300 && d.doc_id < 400)
    val chunk2 = all.filter(_.doc_id >= 400) ++
      chunk1.take(5).map(d => Doc(d.doc_id + 2000000L, d.text))
    graft.pipeline.Dedup.writeParagraphIndex(
      spark, oldDocs.toDF(), s"$base/index")

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, String)]
    def grab(df: org.apache.spark.sql.DataFrame) = df
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      )
    val ms = MemoryStream[Doc]
    val q = graft.streaming.StreamingDedup.paragraphDedupStream(
      ms.toDS().toDF(), s"$base/index", s"$base/ckpt"
    ) { (cleaned, _) => collected ++= grab(cleaned) }
    try {
      ms.addData(chunk1); q.processAllAvailable()
      ms.addData(chunk2); q.processAllAvailable()
    } finally q.stop()

    // sequential fold of the batch APIs over the same chunks
    graft.pipeline.Dedup.writeParagraphIndex(
      spark, oldDocs.toDF(), s"$base/index2")
    val want = Seq(chunk1, chunk2).flatMap { c =>
      val out = grab(
        graft.pipeline.Dedup
          .paragraphDedupAgainstIndex(spark, s"$base/index2", c.toDF())
      )
      graft.pipeline.Dedup.appendToParagraphIndex(spark, s"$base/index2", c.toDF())
      out
    }
    assert(collected.toSeq == want)
    // and the fold equals the GLOBAL keep-first over old ∪ all chunks,
    // restricted to the streamed ids — doc_id-monotone arrival makes the
    // batch boundary invisible
    val streamedIds = (chunk1 ++ chunk2).map(_.doc_id).toSet
    val global = grab(
      graft.pipeline.Dedup
        .paragraphDedupOf((oldDocs ++ chunk1 ++ chunk2).toDF())
    ).filter(r => streamedIds.contains(r._1))
    assert(collected.toSeq.sortBy(_._1) == global.toSeq.sortBy(_._1))
    // non-vacuous: every copied doc lost every paragraph
    val copies = collected.filter(_._1 >= 2000000L)
    assert(copies.size == 5 && copies.forall(_._4 == 0L))
  }
}
