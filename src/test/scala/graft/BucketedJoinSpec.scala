package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** The co-located join law: two tables bucketed by the same key into the
  * same bucket count must join with ZERO exchanges — the write-once
  * layout that removes the dominant shuffle from repeated fact-to-fact
  * joins at scale.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-bucketed-join-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // the driver testdata stores naive (isAdjustedToUTC=false) micros;
      // read them as TIMESTAMP so epoch extraction matches the DuckDB oracle
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", wh)
      // forces the join to prove itself without broadcast or AQE rewrites
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("same-key same-count bucketed tables join with zero exchanges") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
    Tables.writeBucketed(orders, "orders_b", "o_orderkey")
    Tables.writeBucketed(lineitem, "lineitem_b", "l_orderkey")

    val joined = spark
      .table("orders_b")
      .join(
        spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey")
      )
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must be exchange-free; the groupBy above it still
    // shuffles (different key) — so assert no exchange BELOW the join by
    // checking the join inputs scan bucketed files directly
    val joinOnly = spark
      .table("orders_b")
      .join(
        spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey")
      )
    val joinPlan = joinOnly.queryExecution.executedPlan.toString
    assert(!joinPlan.contains("Exchange"), joinPlan)
    assert(joinPlan.contains("SortMergeJoin") || joinPlan.contains("Join"))
    assert(joinPlan.contains("Bucketed: true"), joinPlan)

    // and it is the SAME result as the unbucketed join
    val want = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(want).count() == 0)
    assert(want.exceptAll(joined).count() == 0)
  }
}
