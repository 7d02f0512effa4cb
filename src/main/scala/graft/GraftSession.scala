package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the defaults this engine assumes everywhere.
  *
  * Local mode is a stand-in for a real cluster: `spark.sql.shuffle.partitions`
  * is sized to the local core count (32 on the driver box) rather than the
  * default 200; on a 1000-executor cluster the same code runs with AQE
  * coalescing shuffle partitions dynamically, so no query below hard-codes a
  * partition count.
  */
object GraftSession {
  def apply(appName: String = "graft", master: String = ""): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val withMaster =
      if (master.nonEmpty) b.master(master)
      else if (sys.env.contains("SPARK_GRAFT_LOCAL")) b.master(s"local[$cpus]")
      else b // respect an externally provided master (spark-submit / driver)
    withMaster.getOrCreate()
  }
}
