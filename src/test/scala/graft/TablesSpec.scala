package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.ActionLog
import graft.sources.Tables

/** Source-format independence: the same events round-tripped through JSON
  * and CSV produce the identical derived action log (µs timestamps intact).
  */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-tables-test")
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

  test("json and csv sources yield the identical action log") {
    val ev = ActionLog.normalizedEvents(spark, "/root/testdata/sf0.001")
    val viaParquet = ActionLog
      .fromEvents(spark, "/root/testdata/sf0.001")
      .cache()

    val tmp = Files.createTempDirectory("graft-tables").toString
    for (fmt <- Seq("json", "csv")) {
      Tables.write(ev, s"$tmp/$fmt", fmt)
      val back = Tables.read(spark, s"$tmp/$fmt", fmt, ev.schema)
      back.createOrReplaceTempView("events")
      val derived = spark.sql(ActionLog.derivationSql)
      assert(derived.exceptAll(viaParquet).count() == 0, fmt)
      assert(viaParquet.exceptAll(derived).count() == 0, fmt)
    }
    viaParquet.unpersist()
  }
}
