package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.KmvMinHashes.kmvMinHashes

/** Laws for the KMV distinct sketch aggregate: partition-layout
  * independence (merge associativity + determinism), k-min correctness
  * vs a collected oracle, exactness below k, null handling, and
  * estimator sanity on the real corpus.
  */
class KmvSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-kmv-test")
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

  private def hashed(rows: Seq[(String, Long)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("g", "hv")
  }

  test("result is independent of the partition layout (merge law)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000)(i =>
      (s"g${i % 3}", math.abs(rnd.nextLong()) % 1000000007L))
    def run(parts: Int) = hashed(rows)
      .repartition(parts)
      .groupBy("g")
      .agg(kmvMinHashes(col("hv"), 32).as("mins"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    assert(run(1) == run(13))
  }

  test("the buffer holds exactly the k smallest distinct values, sorted") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(2000)(_ =>
      ("g", math.abs(rnd.nextLong()) % 100000L)) // forced collisions
    val got = hashed(rows)
      .groupBy("g")
      .agg(kmvMinHashes(col("hv"), 16).as("mins"))
      .select("mins")
      .head()
      .getSeq[Long](0)
      .toSeq
    val want = rows.map(_._2).distinct.sorted.take(16)
    assert(got == want)
  }

  test("below k the sketch is exact; nulls are ignored") {
    val sp = spark
    import sp.implicits._
    val rows = Seq[(String, java.lang.Long)](
      ("g", 5L), ("g", 3L), ("g", 5L), ("g", null), ("g", 9L)
    ).toDF("g", "hv")
    val got = rows
      .groupBy("g")
      .agg(kmvMinHashes(col("hv"), 16).as("mins"))
      .select("mins")
      .head()
      .getSeq[Long](0)
      .toSeq
    assert(got == Seq(3L, 5L, 9L))
  }

  test("streaming-native: the sketch aggregates across micro-batches via state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(3000)(i =>
      (s"g${i % 4}", math.abs(rnd.nextLong()) % 1000000007L))
    val chunks = rows.grouped(1000).toSeq

    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val q = ms
      .toDS()
      .toDF("g", "hv")
      .groupBy("g")
      .agg(kmvMinHashes(col("hv"), 32).as("mins"))
      .writeStream
      .format("memory")
      .queryName("kmv_stream")
      .outputMode("complete")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark
      .table("kmv_stream")
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    val want = hashed(rows)
      .groupBy("g")
      .agg(kmvMinHashes(col("hv"), 32).as("mins"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    assert(got == want)
  }

  test("kmv inside a watermarked event-time window aggregation (append mode)") {
    // the T5 composition: the sketch's buffers must survive windowed
    // state (append output, watermark-driven eviction) and each CLOSED
    // window's sketch must equal the batch computation over its rows
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(31)
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    // two 1-minute windows of data, then a far-future row to close them
    val winA = Seq.tabulate(400)(i =>
      (ts(0), s"g${i % 3}", math.abs(rnd.nextLong()) % 1000000007L))
    val winB = Seq.tabulate(400)(i =>
      (ts(1), s"g${i % 3}", math.abs(rnd.nextLong()) % 1000000007L))
    val closer = Seq((ts(60), "g0", 1L))

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Long)]
    val q = ms
      .toDS()
      .toDF("ts", "g", "hv")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("g"))
      .agg(kmvMinHashes(col("hv"), 32).as("mins"))
      .writeStream
      .format("memory")
      .queryName("kmv_win")
      .outputMode("append")
      .start()
    try {
      Seq(winA, winB, closer).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()

    val got = spark
      .table("kmv_win")
      .select(col("window.start").cast("long").as("w"), col("g"), col("mins"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getSeq[Long](2).toSeq)
      .toMap
    // both 1-minute windows are past the watermark -> emitted exactly once
    val batch = (winA ++ winB).toDF("ts", "g", "hv")
      .groupBy(window(col("ts"), "1 minute"), col("g"))
      .agg(kmvMinHashes(col("hv"), 32).as("mins"))
      .select(col("window.start").cast("long").as("w"), col("g"), col("mins"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getSeq[Long](2).toSeq)
      .toMap
    assert(got.keySet == batch.keySet)
    assert(got == batch)
  }

  test("estimator sanity on the corpus: real estimate, bounded error") {
    val out = graft.pipeline.TextAnalysis
      .distinctSketch(spark, sfDir)
      .collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_mins")) == 64L) // k reached: estimating
      assert(r.getDouble(r.fieldIndex("est")) > 0.0)
      assert(r.getDouble(r.fieldIndex("rel_err")) < 0.5)
    }
  }
}
