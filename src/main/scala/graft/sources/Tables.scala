package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table access: the engine's operators consume DataFrames,
  * so any Spark source slots in under the same plans — parquet (columnar,
  * pushdown + pruning), JSON/CSV (row text, schema supplied explicitly so
  * no inference scan), or Kafka wire records via
  * [[KafkaWire.fromWire]].
  *
  * Timestamp round-tripping through text formats needs an explicit
  * microsecond pattern — the default pattern drops sub-millisecond
  * precision, which would silently break oracle equality.
  */
object Tables {

  val microTs = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  def read(
      spark: SparkSession,
      path: String,
      format: String,
      schema: StructType
  ): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    format match {
      case "csv" =>
        r.option("header", "true").option("timestampFormat", microTs).load(path)
      case "json" =>
        r.option("timestampFormat", microTs).load(path)
      case _ => r.load(path)
    }
  }

  def write(df: DataFrame, path: String, format: String): Unit = {
    val w = df.write.format(format).mode("overwrite")
    format match {
      case "csv" =>
        w.option("header", "true").option("timestampFormat", microTs).save(path)
      case "json" =>
        w.option("timestampFormat", microTs).save(path)
      case _ => w.save(path)
    }
  }

  /** Write a table BUCKETED (and sorted) by its join key — the co-located
    * join layout of SURVEY §7's design stance: two tables bucketed by the
    * same key into the same bucket count join WITHOUT any exchange (and,
    * when `sortBy` matches, without a sort), because every bucket file
    * pair is already key-aligned. At 100 TB this removes the dominant
    * shuffle from every fact-to-fact join that repeats a key — pay the
    * layout cost once at write time, amortize over every downstream join.
    * Bucketed tables need the session catalog (`saveAsTable`), so they
    * address by NAME, not path.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int = 8
  ): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
