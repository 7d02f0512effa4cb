package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.AsOf

/** Laws for the as-of join (union + ordered-window plan): left-outer shape,
  * pick-latest correctness vs a naive quadratic oracle, inclusive/strict
  * tie semantics, multi-column keys.
  */
class AsOfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-asof-test")
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

  private def leftDf(rows: (Long, Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("k", "lt", "lval")
  }

  private def rightDf(rows: (Long, Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("k", "rt", "rval")
  }

  test("picks the latest right row at-or-before each left row; no match = null") {
    val l = leftDf((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
    val r = rightDf((1L, 8L, "r8"), (1L, 15L, "r15"), (1L, 25L, "r25"), (2L, 9L, "r9"))
    val out = AsOf
      .joinAsOf(l, r, Seq("k"), "lt", "rt")
      .orderBy("k", "lt")
      .collect()
    assert(out.map(x => (x.getLong(0), x.getLong(1), x.getString(2))).toSeq ==
      Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c")))
    // (k=1,t=10)->r8; (k=1,t=20)->r15; (k=2,t=5)-> no right row before 5
    assert(out(0).getAs[String]("rval") == "r8")
    assert(out(1).getAs[String]("rval") == "r15")
    assert(out(2).isNullAt(out(2).fieldIndex("rval")))
  }

  test("tie semantics: inclusive sees a same-instant right row, strict does not") {
    val l = leftDf((1L, 10L, "a"))
    val r = rightDf((1L, 10L, "same"), (1L, 7L, "older"))
    val inc = AsOf.joinAsOf(l, r, Seq("k"), "lt", "rt").collect()
    assert(inc.head.getAs[String]("rval") == "same")
    val strict =
      AsOf.joinAsOf(l, r, Seq("k"), "lt", "rt", inclusive = false).collect()
    assert(strict.head.getAs[String]("rval") == "older")
  }

  test("left-outer shape: every left row survives exactly once") {
    val l = leftDf((1L, 1L, "a"), (1L, 2L, "b"), (3L, 3L, "c"))
    val r = rightDf((9L, 1L, "unrelated"))
    val out = AsOf.joinAsOf(l, r, Seq("k"), "lt", "rt")
    assert(out.count() == 3)
    assert(out.filter(col("rval").isNotNull).count() == 0)
  }

  test("randomized law: equals the quadratic naive as-of on every row") {
    val rnd = new scala.util.Random(42)
    val lRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, s"l$i"))
    val rRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, s"r$i"))
    val l = leftDf(lRows: _*)
    val r = rightDf(rRows: _*)

    val got = AsOf
      .joinAsOf(l, r, Seq("k"), "lt", "rt")
      .select("k", "lt", "lval", "rt")
      .collect()
      .map(x =>
        (x.getLong(0), x.getLong(1), x.getString(2),
          if (x.isNullAt(3)) -1L else x.getLong(3)))
      .toSet

    // naive: max right time <= left time per key (times may repeat — the
    // operator picks the max TIME; rval identity at duplicate (k,rt) is
    // tie-broken by sort order, so compare on rt only)
    val byKey = rRows.groupBy(_._1)
    val want = lRows.map { case (k, lt, lv) =>
      val cand = byKey.getOrElse(k, Seq.empty).filter(_._2 <= lt)
      (k, lt, lv, if (cand.isEmpty) -1L else cand.map(_._2).max)
    }.toSet
    assert(got == want)
  }

  test("shared time column name resolves with a _right suffix (trades/quotes shape)") {
    val sp = spark
    import sp.implicits._
    val trades = Seq((1L, 10L, 99.5)).toDF("sym", "ts", "price")
    val quotes = Seq((1L, 8L, 99.0), (1L, 12L, 98.0)).toDF("sym", "ts", "bid")
    val out = AsOf.joinAsOf(trades, quotes, Seq("sym"), "ts", "ts")
    assert(out.columns.toSeq ==
      Seq("sym", "ts", "price", "ts_right", "bid"))
    val r = out.head()
    assert(r.getLong(r.fieldIndex("ts")) == 10L)
    assert(r.getLong(r.fieldIndex("ts_right")) == 8L)
    assert(r.getDouble(r.fieldIndex("bid")) == 99.0)
  }

  test("multi-column key joins on the full composite") {
    val sp = spark
    import sp.implicits._
    val l = Seq((1L, "x", 10L, "a"), (1L, "y", 10L, "b"))
      .toDF("k1", "k2", "lt", "lval")
    val r = Seq((1L, "x", 5L, "rx"), (1L, "y", 6L, "ry"))
      .toDF("k1", "k2", "rt", "rval")
    val out = AsOf
      .joinAsOf(l, r, Seq("k1", "k2"), "lt", "rt")
      .orderBy("k2")
      .collect()
    assert(out.map(_.getAs[String]("rval")).toSeq == Seq("rx", "ry"))
  }
}
