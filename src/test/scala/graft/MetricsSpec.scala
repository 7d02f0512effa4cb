package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{JournalOps, Metrics}
import graft.model.ActionLog

/** A8 — observe()-based meters arrive through the listener bus with the
  * values the query actually produced.
  */
class MetricsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-metrics-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("journal replay meters are observed inline") {
    val captured = new ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
        qe.observedMetrics.get(Metrics.name).foreach(captured.add)
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val scan = JournalOps.journalScan(
        ActionLog.fromEvents(spark, "/root/testdata/sf0.001"))
      val n = Metrics.observed(scan).collect().length

      // listener bus is async — poll briefly
      val deadline = System.currentTimeMillis() + 30000
      while (captured.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)

      assert(!captured.isEmpty, "no observed metrics arrived")
      val m = captured.peek()
      assert(m.getAs[Long]("rows") == n.toLong)
      assert(m.getAs[Long]("n_journals") > 0)
      assert(m.getAs[Long]("max_seq_nr") > 0)
    } finally spark.listenerManager.unregister(listener)
  }
}
