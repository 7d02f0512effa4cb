package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BottomKBuffer, BottomKSample}
import graft.functions.BottomKSample.bottomKSample

/** Laws for the bottom-k-by-hash sample aggregate (p25's kernel):
  * partition-layout independence (merge commutativity/associativity),
  * serialize round-trip, below-k exactness, collision and null semantics,
  * streaming-state survival, and the rank-error bound above k on the real
  * corpus.
  */
class BottomKSampleSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-bottomk-test")
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

  private def rows3(n: Int, seed: Int): Seq[(String, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i =>
      (s"g${i % 3}", math.abs(rnd.nextLong()) % 1000000007L, rnd.nextInt(10000).toLong))
  }

  private def df(rows: Seq[(String, Long, Long)]) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("g", "hv", "v")
  }

  test("result is independent of the partition layout (merge law)") {
    val rows = rows3(5000, 7)
    def run(parts: Int) = df(rows)
      .repartition(parts)
      .groupBy("g")
      .agg(bottomKSample(col("hv"), col("v"), 32).as("smp"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    assert(run(1) == run(13))
  }

  test("the sample is exactly the values of the k smallest hashes, value-sorted") {
    val rows = rows3(2000, 11).map { case (_, h, v) => ("g", h, v) }
    val got = df(rows)
      .groupBy("g")
      .agg(bottomKSample(col("hv"), col("v"), 16).as("smp"))
      .select("smp")
      .head()
      .getSeq[Long](0)
      .toSeq
    // collision semantics: per hash the SMALLEST value survives, then the
    // k smallest hashes' values, sorted by value
    val perHash = rows.groupBy(_._2).view.mapValues(_.map(_._3).min)
    val want =
      perHash.toSeq.sortBy(_._1).take(16).map(_._2).sorted
    assert(got == want)
  }

  test("below k the sample is the whole group; nulls are ignored") {
    val sp = spark
    import sp.implicits._
    val rows = Seq[(String, java.lang.Long, java.lang.Long)](
      ("g", 5L, 100L), ("g", 3L, 50L), ("g", null, 1L), ("g", 9L, null),
      ("g", 7L, 200L)
    ).toDF("g", "hv", "v")
    val got = rows
      .groupBy("g")
      .agg(bottomKSample(col("hv"), col("v"), 16).as("smp"))
      .select("smp")
      .head()
      .getSeq[Long](0)
      .toSeq
    assert(got == Seq(50L, 100L, 200L))
  }

  test("serialize round-trips the buffer and merge is commutative over the wire") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = BottomKSample(Literal(0L), Literal(0L), k = 8)
    val a = new BottomKBuffer(8)
    val b = new BottomKBuffer(8)
    val rnd = new scala.util.Random(13)
    (1 to 40).foreach(_ => a.insert(rnd.nextLong() & Long.MaxValue, rnd.nextInt(1000).toLong))
    (1 to 40).foreach(_ => b.insert(rnd.nextLong() & Long.MaxValue, rnd.nextInt(1000).toLong))

    def entries(x: BottomKBuffer): Seq[(Long, Long)] = {
      import scala.jdk.CollectionConverters._
      x.map.entrySet().asScala.map(e => (e.getKey: Long, e.getValue: Long)).toSeq
    }
    // round-trip identity
    val aRt = agg.deserialize(agg.serialize(a))
    assert(aRt.k == a.k && entries(aRt) == entries(a))

    // merge commutativity THROUGH serialized form (what the shuffle does)
    val ab = agg.deserialize(agg.serialize(a)); ab.mergeIn(agg.deserialize(agg.serialize(b)))
    val ba = agg.deserialize(agg.serialize(b)); ba.mergeIn(agg.deserialize(agg.serialize(a)))
    assert(entries(ab) == entries(ba))
  }

  test("streaming-native: the sample aggregates across micro-batches via state") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = rows3(3000, 23)
    val chunks = rows.grouped(1000).toSeq

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)]
    val q = ms
      .toDS()
      .toDF("g", "hv", "v")
      .groupBy("g")
      .agg(bottomKSample(col("hv"), col("v"), 32).as("smp"))
      .writeStream
      .format("memory")
      .queryName("bk_stream")
      .outputMode("complete")
      .start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()

    val got = spark
      .table("bk_stream")
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    val want = df(rows)
      .groupBy("g")
      .agg(bottomKSample(col("hv"), col("v"), 32).as("smp"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Long](1).toSeq))
      .toSeq
    assert(got == want)
  }

  test("rank error above k is bounded on the corpus (sf0.01: groups of ~1000 > k=128)") {
    val sfDir = "/root/testdata/sf0.01"
    val out = graft.pipeline.TextAnalysis
      .quantileSketch(spark, sfDir)
      .collect()
    val byLang = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("lang", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).sorted.toIndexedSeq)
      .toMap
    assert(out.nonEmpty)
    // langs are NOT uniform in the corpus: groups below k sample whole
    // (their quantiles are exact by construction) — the rank-error claim
    // is about groups where sampling actually truncated
    val sampled = out.filter(_.getLong(out.head.fieldIndex("n_sample")) == 128L)
    assert(sampled.nonEmpty, "fixture needs at least one group above k")
    sampled.foreach { r =>
      val lang = r.getString(r.fieldIndex("lang"))
      val xs = byLang(lang)
      for ((q, f) <- Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75", 0.9 -> "q90")) {
        val est = r.getLong(r.fieldIndex(f))
        // true rank of the estimate within the full group: a k=128 uniform
        // sample's quantile estimator has ±O(1/√k) ≈ 0.09 rank error;
        // assert a 3σ-ish envelope
        val rank = xs.count(_ <= est).toDouble / xs.size
        assert(
          math.abs(rank - q) <= 0.15,
          s"$lang $f: est=$est rank=$rank target=$q"
        )
      }
    }
  }
}
