package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** The custom expression is reachable from pure SQL via
  * SparkSessionExtensions, and matches JVM String.hashCode exactly.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("java_string_hash registers and computes JVM hashCode in SQL") {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val rows = spark
        .sql(
          "SELECT s, java_string_hash(s) AS h FROM VALUES " +
            "('0'), ('14'), ('kafka-journal'), (''), ('äöü漢字') AS t(s)"
        )
        .collect()
      rows.foreach { r =>
        assert(r.getInt(1) == r.getString(0).hashCode, r.getString(0))
      }
      // codegen and interpreted paths agree
      val viaColumn = spark
        .range(1)
        .select(
          graft.functions.JavaStringHash
            .javaHash(org.apache.spark.sql.functions.lit("graft"))
            .as("h")
        )
        .head()
        .getInt(0)
      assert(viaColumn == "graft".hashCode)
    } finally spark.stop()
  }
}
