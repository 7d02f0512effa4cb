package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.RangeJoin

/** Laws for the binned range join: randomized equivalence to the naive
  * cross-filter form (the semantics source of truth), boundary semantics at
  * bin edges and interval endpoints, exactly-once pair emission for
  * multi-bin intervals, degenerate/empty intervals, negative times, and
  * composite keys.
  */
class RangeJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-rangejoin-test")
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

  private def points(rows: (Long, Long, Long)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("k", "t", "pid")
  }

  private def intervals(rows: (Long, Long, Long, Long)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("k", "lo", "hi", "iid")
  }

  /** The quadratic form the operator must agree with. */
  private def naive(
      p: Seq[(Long, Long, Long)],
      i: Seq[(Long, Long, Long, Long)],
      halfOpen: Boolean
  ): Set[(Long, Long)] =
    (for {
      (pk, t, pid) <- p
      (ik, lo, hi, iid) <- i
      if pk == ik && t >= lo && (if (halfOpen) t < hi else t <= hi)
    } yield (pid, iid)).toSet

  private def run(
      p: Seq[(Long, Long, Long)],
      i: Seq[(Long, Long, Long, Long)],
      binWidth: Long,
      halfOpen: Boolean
  ): Seq[(Long, Long)] =
    RangeJoin
      .joinRange(
        points(p: _*),
        intervals(i: _*),
        Seq("k"),
        "t",
        "lo",
        "hi",
        binWidth,
        halfOpen
      )
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq

  test("randomized equivalence to the naive quadratic form, both tie modes") {
    val rnd = new Random(42)
    for (trial <- 0 until 4; halfOpen <- Seq(true, false)) {
      val p = (0 until 120).map(n =>
        (rnd.nextInt(5).toLong, rnd.nextInt(400).toLong - 100L, n.toLong)
      )
      val i = (0 until 60).map { n =>
        val lo = rnd.nextInt(400).toLong - 100L
        (rnd.nextInt(5).toLong, lo, lo + rnd.nextInt(80).toLong, n.toLong)
      }
      val binWidth = Seq(7L, 32L, 1000L)(trial % 3)
      val got = run(p, i, binWidth, halfOpen)
      assert(got.size == got.toSet.size, s"duplicate pairs, trial $trial")
      assert(
        got.toSet == naive(p, i, halfOpen),
        s"mismatch at trial=$trial halfOpen=$halfOpen binWidth=$binWidth"
      )
    }
  }

  test("endpoint semantics: lo inclusive; hi exclusive half-open, inclusive closed") {
    val p = Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 15L, 3L))
    val i = Seq((1L, 10L, 20L, 7L))
    assert(run(p, i, 4L, halfOpen = true).toSet == Set((1L, 7L), (3L, 7L)))
    assert(
      run(p, i, 4L, halfOpen = false).toSet == Set((1L, 7L), (2L, 7L), (3L, 7L))
    )
  }

  test("an interval spanning many bins emits each qualifying pair exactly once") {
    val p = Seq((1L, 55L, 1L))
    val i = Seq((1L, 0L, 1000L, 9L)) // covers every bin at width 10
    val got = run(p, i, 10L, halfOpen = true)
    assert(got == Seq((1L, 9L)))
  }

  test("degenerate intervals match nothing; empty half-open point-interval too") {
    val p = Seq((1L, 10L, 1L))
    val i = Seq((1L, 10L, 10L, 1L), (1L, 30L, 20L, 2L))
    assert(run(p, i, 8L, halfOpen = true).isEmpty)
    // closed [10,10] DOES contain t=10
    assert(run(p, i, 8L, halfOpen = false) == Seq((1L, 1L)))
  }

  test("negative times bin correctly (floor, not truncate-toward-zero)") {
    // t=-1 and lo=-5..hi=-1: with width 10 a truncating division would put
    // t=-1 in bin 0 and the interval in bin 0 too — but floor must put both
    // in bin -1; cross-check against naive either way
    val p = Seq((1L, -1L, 1L), (1L, -11L, 2L), (1L, 1L, 3L))
    val i = Seq((1L, -5L, 0L, 4L), (1L, -15L, -9L, 5L))
    val got = run(p, i, 10L, halfOpen = true)
    assert(
      got.toSet == naive(
        p.map(x => (x._1, x._2, x._3)),
        i,
        halfOpen = true
      )
    )
    assert(got.toSet == Set((1L, 4L), (2L, 5L)))
  }

  test("composite keys partition the match space") {
    val sp = spark
    import sp.implicits._
    val p = Seq((1L, "a", 10L, 1L), (1L, "b", 10L, 2L)).toDF("k1", "k2", "t", "pid")
    val i = Seq((1L, "a", 0L, 20L, 3L)).toDF("k1", "k2", "lo", "hi", "iid")
    val got = RangeJoin
      .joinRange(p, i, Seq("k1", "k2"), "t", "lo", "hi", 8L)
      .select("pid", "iid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 3L)))
  }

  test("payload column clash is rejected up front") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.joinRange(
        points((1L, 1L, 1L)).withColumnRenamed("pid", "x"),
        intervals((1L, 0L, 2L, 1L)).withColumnRenamed("iid", "x"),
        Seq("k"),
        "t",
        "lo",
        "hi",
        10L
      )
    }
    assert(e.getMessage.contains("clash"))
  }

  test("anti mode is exactly points-minus-matched; leftouter keeps every point") {
    val rnd = new Random(99)
    val p = (0 until 150).map(n =>
      (rnd.nextInt(4).toLong, rnd.nextInt(300).toLong, n.toLong)
    )
    val i = (0 until 40).map { n =>
      val lo = rnd.nextInt(300).toLong
      (rnd.nextInt(4).toLong, lo, lo + rnd.nextInt(50).toLong, n.toLong)
    }
    val matched = naive(p, i, halfOpen = true).map(_._1)
    val anti = RangeJoin
      .joinRange(
        points(p: _*),
        intervals(i: _*),
        Seq("k"),
        "t",
        "lo",
        "hi",
        16L,
        halfOpen = true,
        mode = "anti"
      )
      .select("pid")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(anti == p.map(_._3).toSet -- matched)

    val outer = RangeJoin
      .joinRange(
        points(p: _*),
        intervals(i: _*),
        Seq("k"),
        "t",
        "lo",
        "hi",
        16L,
        halfOpen = true,
        mode = "leftouter"
      )
    val rows = outer.collect()
    // every point appears; unmatched points appear exactly once with null
    // interval payload; matched pairs equal the inner set
    assert(rows.map(_.getLong(rows.head.fieldIndex("pid"))).toSet == p.map(_._3).toSet)
    val nullRows = rows.filter(_.isNullAt(rows.head.fieldIndex("iid")))
    assert(nullRows.map(_.getLong(rows.head.fieldIndex("pid"))).toSet ==
      p.map(_._3).toSet -- matched)
    val pairRows = rows
      .filterNot(_.isNullAt(rows.head.fieldIndex("iid")))
      .map(r =>
        (r.getLong(rows.head.fieldIndex("pid")),
         r.getLong(rows.head.fieldIndex("iid")))
      )
      .toSet
    assert(pairRows == naive(p, i, halfOpen = true))
  }

  test("plan is an equi-join on (key, bin) — no nested-loop join") {
    val plan = RangeJoin
      .joinRange(
        points((1L, 1L, 1L)),
        intervals((1L, 0L, 2L, 1L)),
        Seq("k"),
        "t",
        "lo",
        "hi",
        10L
      )
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
