package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the defaults this engine assumes everywhere.
  *
  * Local mode is a stand-in for a real cluster: `spark.sql.shuffle.partitions`
  * is sized to the local core count rather than the default 200; on a
  * 1000-executor cluster the same code runs with AQE coalescing shuffle
  * partitions dynamically, so no query hard-codes a partition count.
  */
object GraftSession {

  /** Local session for the driver-contract mains and tools. */
  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the driver testdata stores naive (isAdjustedToUTC=false) micros;
      // read them as TIMESTAMP so epoch extraction matches the DuckDB oracle
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
