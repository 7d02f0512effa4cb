package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CmsCounters
import graft.functions.CmsCounters.{cmsCounters, cmsEstimate}

/** Laws for the count-min sketch aggregate: partition-layout independence
  * (counter matrices are a commutative monoid), counter correctness vs a
  * Scala replay, the overcount bound for EVERY key (not just the top-k the
  * p23 query reports), null handling, the ObjectHashAggregate partial-
  * aggregation plan shape, and micro-batch parity in streaming.
  */
class CmsSketchSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-cms-test")
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
    rows.toDF("g", "x")
  }

  private def scalaSketch(
      xs: Seq[Long],
      depth: Int,
      width: Int
  ): Seq[Long] = {
    val m = new Array[Long](depth * width)
    xs.foreach { x =>
      val xr = java.lang.Math.floorMod(x, CmsCounters.P)
      (0 until depth).foreach { i =>
        val b =
          (((CmsCounters.A(i) * xr + CmsCounters.B(i)) % CmsCounters.P) %
            width).toInt
        m(i * width + b) += 1L
      }
    }
    m.toSeq
  }

  test("counters match the Scala replay and are partition-layout independent") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000)(i =>
      (s"g${i % 3}", math.abs(rnd.nextLong()) % 1000000007L))
    def run(parts: Int) = hashed(rows)
      .repartition(parts)
      .groupBy("g")
      .agg(cmsCounters(col("x"), 4, 64).as("sk"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    val one = run(1)
    assert(one == run(13))
    val want = rows
      .groupBy(_._1)
      .map { case (g, rs) => (g, scalaSketch(rs.map(_._2), 4, 64)) }
      .toSeq
      .sortBy(_._1)
    assert(one == want)
  }

  test("nulls are ignored; empty group is the zero matrix") {
    val sp = spark
    import sp.implicits._
    val rows = Seq[(String, java.lang.Long)](
      ("g", 5L), ("g", null), ("g", 5L)
    ).toDF("g", "x")
    val got = rows
      .groupBy("g")
      .agg(cmsCounters(col("x"), 2, 8).as("sk"))
      .select("sk")
      .head()
      .getSeq[Long](0)
    assert(got.sum == 4L) // 2 non-null rows × depth 2
    assert(got == scalaSketch(Seq(5L, 5L), 2, 8))
  }

  test("overcount bound holds for EVERY corpus token, and is tight for most") {
    val toks = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(
        explode(
          regexp_extract_all(
            lower(col("text")),
            lit("[a-z]+|[0-9]+|[^a-z0-9 ]"),
            lit(0)
          )
        ).as("tok")
      )
      .withColumn("x", graft.functions.PolyHash.polyHash(col("tok")))
    val sketch =
      toks.agg(cmsCounters(col("x"), 4, 256).as("sk"))
    val perTok = toks
      .groupBy("tok", "x")
      .agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(sketch))
      .select(
        col("n_exact"),
        cmsEstimate(col("sk"), col("x"), 4, 256).as("n_cms")
      )
    val under = perTok.filter(col("n_cms") < col("n_exact")).count()
    assert(under == 0L, "CMS must never undercount")
    // sanity that the sketch carries signal: at least half the keys are
    // estimated within 2× of truth at this corpus/width ratio
    val loose = perTok.filter(col("n_cms") > col("n_exact") * 2).count()
    val total = perTok.count()
    assert(loose < total / 2, s"estimates too loose: $loose of $total")
  }

  test("negative keys bucket consistently between insert and estimate") {
    val sp = spark
    import sp.implicits._
    // keys OUTSIDE the poly-hash contract (negative, |x| > 2^32): insert
    // must not throw, and must land each key in the same bucket
    // cmsEstimate reads (shared floorMod + shared 64-bit wrap), so the
    // overcount bound still holds for every key
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(2000)(_ => rnd.nextLong()).map(x => ("g", x))
    val df = rows.toDF("g", "x")
    val sk = df.agg(cmsCounters(col("x"), 4, 64).as("sk"))
    val under = df
      .groupBy("x")
      .agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(sk))
      .filter(cmsEstimate(col("sk"), col("x"), 4, 64) < col("n_exact"))
      .count()
    assert(under == 0L)
  }

  test("plans as ObjectHashAggregate with a partial merge side") {
    val rows = hashed(Seq.tabulate(100)(i => (s"g${i % 2}", i.toLong)))
    val plan = rows
      .groupBy("g")
      .agg(cmsCounters(col("x"), 4, 64).as("sk"))
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("cms_counters"))
  }

  test("streaming-native: counters aggregate across micro-batches via state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val rows = Seq.tabulate(3000)(i =>
      (s"g${i % 4}", math.abs(rnd.nextLong()) % 1000000007L))
    val chunks = rows.grouped(1000).toSeq

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val q = ms
      .toDS()
      .toDF("g", "x")
      .groupBy("g")
      .agg(cmsCounters(col("x"), 4, 64).as("sk"))
      .writeStream
      .format("memory")
      .queryName("cms_stream")
      .outputMode("complete")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark
      .table("cms_stream")
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    val want = hashed(rows)
      .groupBy("g")
      .agg(cmsCounters(col("x"), 4, 64).as("sk"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    assert(got == want)
  }
}
