package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Analytics
import graft.pipeline.Sampling

/** Laws for p20 token-budget mixing and q16 exact group quantiles. */
class MixQuantileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-mixquantile-test")
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

  private def corpus() = {
    val sp = spark
    import sp.implicits._
    val rnd = new Random(7)
    (0 until 200)
      .map(i => (i.toLong, s"src${i % 4}", 10L + rnd.nextInt(90)))
      .toDF("doc_id", "source", "n_toks")
  }

  private def takeSet(budget: Long) =
    Sampling
      .budgetMix(corpus(), budget)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet

  test("budget mix nests: a bigger budget strictly extends a smaller one") {
    val small = takeSet(300L)
    val big = takeSet(900L)
    assert(small.nonEmpty && big.size > small.size)
    assert(small.subsetOf(big))
  }

  test("budget mix: straddling doc kept — budget 1 takes exactly one doc per stratum") {
    val out = Sampling.budgetMix(corpus(), 1L)
    assert(out.count() == 4)
    assert(out.select("cum_before").collect().forall(_.getLong(0) == 0L))
  }

  test("budget mix: zero budget takes nothing; manifest is layout-independent") {
    assert(takeSet(0L).isEmpty)
    val a = Sampling
      .budgetMix(corpus(), 500L)
      .select("source", "doc_id", "take_rank", "cum_before")
      .collect()
      .map(_.toSeq)
      .toSet
    val b = Sampling
      .budgetMix(corpus().repartition(7), 500L)
      .select("source", "doc_id", "take_rank", "cum_before")
      .collect()
      .map(_.toSeq)
      .toSet
    assert(a == b)
  }

  test("budget mix fill lands within one doc of the budget per stratum") {
    val budget = 400L
    val last = Sampling
      .budgetMix(corpus(), budget)
      .groupBy("source")
      .agg(
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions
            .col("cum_before") + org.apache.spark.sql.functions.col("n_toks")
        ).as("filled")
      )
      .collect()
    // every stratum reaches the budget (corpus has enough mass), and the
    // overshoot is bounded by the straddling doc (< budget + max doc)
    last.foreach { r =>
      val filled = r.getLong(1)
      assert(filled >= budget && filled < budget + 100L, r.toString)
    }
  }

  test("group quantiles agree with a driver-side sort on random data") {
    val sp = spark
    import sp.implicits._
    val rnd = new Random(11)
    val rows = (0 until 500).map(i =>
      (i.toLong, s"g${i % 7}", rnd.nextInt(1000).toLong)
    )
    val qs = Seq((1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"), (1, 1, "p100"))
    val got = Analytics
      .groupQuantilesExact(
        rows.toDF("id", "g", "v"),
        Seq("g"),
        "v",
        "id",
        qs
      )
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val expect = rows
      .groupBy(_._2)
      .map { case (g, rs) =>
        val sorted = rs.sortBy(r => (r._3, r._1)).map(_._3)
        def pick(num: Int, den: Int) =
          sorted((num * sorted.size + den - 1) / den - 1)
        g -> (pick(1, 4), pick(1, 2), pick(3, 4), pick(1, 1))
      }
    assert(got == expect)
  }

  test("shuffled packing: salts permute the order but preserve the stream") {
    val sfDir = "/root/testdata/sf0.001"
    def manifest(salt: String) = graft.pipeline.Packing
      .shuffledTokenWindows(spark, sfDir, salt = salt)
      .select("doc_id", "n_toks", "start_tok")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = manifest("graft-pack")
    val b = manifest("graft-pack-2")
    // same docs, same per-doc token counts, same total stream length
    assert(a.map(x => (x._1, x._2)).toSet == b.map(x => (x._1, x._2)).toSet)
    assert(
      a.map(x => x._2 + x._3).max == b.map(x => x._2 + x._3).max
    )
    // the permutation is real: offsets differ between salts
    assert(a.map(x => (x._1, x._3)).toSet != b.map(x => (x._1, x._3)).toSet)
    // starts are a dense exact packing: sorted starts tile the stream
    val sorted = a.sortBy(_._3)
    sorted.sliding(2).foreach {
      case Array((_, t1, s1), (_, _, s2)) => assert(s1 + t1 == s2)
      case _                              => ()
    }
  }

  test("group quantiles: singleton group reports its only value everywhere") {
    val sp = spark
    import sp.implicits._
    val out = Analytics
      .groupQuantilesExact(
        Seq((1L, "a", 42L)).toDF("id", "g", "v"),
        Seq("g"),
        "v",
        "id",
        Seq((1, 4, "p25"), (9, 10, "p90"))
      )
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 1L) // n_rows
    assert(out(0).getLong(2) == 42L && out(0).getLong(3) == 42L)
  }

  test("packing two-level prefix sum is granularity-independent = one-level cumsum") {
    val sfDir = "/root/testdata/sf0.001"
    def p17(bs: Long) = graft.pipeline.Packing
      .tokenWindows(spark, sfDir, bucketSize = bs)
      .select("doc_id", "n_toks", "start_tok")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    // one-level reference: the global cumsum in doc_id order, driver-side
    val base = p17(64L)
    var acc = 0L
    val starts = base.sortBy(_._1).map { case (id, t, _) =>
      val s = acc; acc += t; (id, s)
    }.toMap
    assert(base.forall { case (id, _, s) => starts(id) == s })
    // two other granularities, including the scale-aware default (0)
    assert(p17(7L) == base)
    assert(p17(0L) == base)

    def p21(nb: Long) = graft.pipeline.Packing
      .shuffledTokenWindows(spark, sfDir, nBuckets = nb)
      .select("doc_id", "pri", "n_toks", "start_tok")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val sBase = p21(64L)
    var acc2 = 0L
    val sStarts = sBase.sortBy(r => (r._2, r._1)).map { case (id, _, t, _) =>
      val s = acc2; acc2 += t; (id, s)
    }.toMap
    assert(sBase.forall { case (id, _, _, s) => sStarts(id) == s })
    assert(p21(13L) == sBase)
    assert(p21(0L) == sBase)
  }
}
