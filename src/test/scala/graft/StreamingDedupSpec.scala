package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Doc

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
}
