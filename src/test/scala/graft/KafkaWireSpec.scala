package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Journal
import graft.model.ActionLog
import graft.sources.KafkaWire

/** Wire-format roundtrip + user-API surface tests. */
class KafkaWireSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-wire-test")
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

  private def actions = ActionLog.fromEvents(spark, sfDir)

  test("actions → kafka wire → actions is the identity") {
    // event_id/props are derivation provenance, not wire content
    val a = actions.drop("event_id", "props").cache()
    val back = KafkaWire
      .fromWire(KafkaWire.toWire(a))
      .select(a.columns.map(col).toIndexedSeq: _*)
    assert(back.exceptAll(a).count() == 0)
    assert(a.exceptAll(back).count() == 0)
    a.unpersist()
  }

  test("typed payloads ride their own wire format and roundtrip") {
    val wire = KafkaWire.toWire(actions).cache()
    // json/text/payload-less appends use the JSON envelope; binary the frame
    val hdr = wire.select(
      get_json_object(element_at(col("headers"), "journal.action"),
        "$.append.payloadType").as("wpt")
    )
    assert(hdr.filter(col("wpt") === "json").count() > 0)
    assert(hdr.filter(col("wpt") === "binary").count() > 0)
    val back = KafkaWire.fromWire(wire).filter(col("action") === "append")
    val byType = back
      .groupBy("payload_type")
      .count()
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("none") -> r.getLong(1))
      .toMap
    assert(Set("json", "text", "binary", "none").subsetOf(byType.keySet))
    // dual-column storage discipline: txt XOR bin per type
    assert(back.filter(col("payload_type") === "binary" &&
      col("payload_txt").isNotNull).count() == 0)
    assert(back.filter(col("payload_type").isin("json", "text") &&
      col("payload_bin").isNotNull).count() == 0)
    assert(back.filter(col("payload_type") === "json" &&
      !col("payload_txt").startsWith("{")).count() == 0)
    wire.unpersist()
  }

  test("header-only records carry delete_to through the wire") {
    val a = actions.filter(col("action") === "delete")
    val back = KafkaWire
      .fromWire(KafkaWire.toWire(actions))
      .filter(col("action") === "delete")
    assert(back.count() == a.count())
    assert(back.filter(col("delete_to").isNull).count() == 0)
  }

  test("Journal API: read equals engine replay for a single key") {
    val log = actions.cache()
    val j = Journal(spark, log)
    val viaApi = j.read("t1", "1").select("seq_nr")
    val direct = graft.journal.JournalOps
      .journalScan(log)
      .filter(col("topic") === "t1" && col("id") === "1")
      .select("seq_nr")
    assert(viaApi.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(viaApi).count() == 0)
    log.unpersist()
  }

  test("Journal API: typed read yields ordered EventRecords") {
    val log = actions.cache()
    val j = Journal(spark, log)
    val recs = j.readTyped("t1", "1").collect()
    assert(recs.nonEmpty)
    assert(recs.map(_.seq_nr).toSeq == recs.map(_.seq_nr).sorted.toSeq)
    assert(recs.forall(r => r.topic == "t1" && r.id == "1"))
    log.unpersist()
  }

  test("Journal API: pointer, ids, topics, delete clamp") {
    val log = actions.cache()
    val j = Journal(spark, log)
    assert(j.topics.count() == 4)
    assert(j.ids("t1").count() > 0)
    val ptr = j.pointer("t1", "1").head().getLong(0)
    assert(ptr > 0)
    // delete beyond the pointer clamps to the pointer
    val clamped = j.delete("t1", "1", Long.MaxValue).head().getLong(3)
    assert(clamped == ptr)
    log.unpersist()
  }

  test("Journal API: append → purge → read-empty → re-create") {
    val s = spark
    import s.implicits._
    val builder = Journal(spark, actions.filter(col("topic") === "none"))
    def ts(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")

    // append three events; the spec plays broker: koffsets assigned in order
    val ev1 = Seq(
      (1L, ts(1), 1.0), (2L, ts(2), 2.0), (3L, ts(3), 3.0)
    ).toDF("seq_nr", "ts", "payload")
    val log1 = builder.append("tp", "px", ev1)
      .withColumn("koffset", col("seq_nr"))
    assert(Journal(spark, log1).read("tp", "px").count() == 3)

    // purge drops the whole journal: read empty, pointer empty
    val purgeRow = builder.purge("tp", "px", Some(ts(4)))
      .withColumn("koffset", lit(10L))
    val log2 = log1.unionByName(purgeRow)
    val j2 = Journal(spark, log2)
    assert(j2.read("tp", "px").count() == 0)
    assert(j2.pointer("tp", "px").count() == 0)

    // purge is idempotent: a second purge of the (now absent) journal
    // changes nothing
    val log2b = log2.unionByName(
      builder.purge("tp", "px", Some(ts(5))).withColumn("koffset", lit(11L)))
    assert(Journal(spark, log2b).read("tp", "px").count() == 0)

    // re-create: the journal restarts from seq_nr 1 with fresh payloads
    val ev2 = Seq((1L, ts(6), 10.0), (2L, ts(7), 20.0))
      .toDF("seq_nr", "ts", "payload")
    val log3 = log2b.unionByName(
      builder.append("tp", "px", ev2).withColumn("koffset", col("seq_nr") + 20L))
    val replayed = Journal(spark, log3).read("tp", "px")
      .select("seq_nr", "payload").as[(Long, Double)].collect().sortBy(_._1)
    assert(replayed.toSeq == Seq((1L, 10.0), (2L, 20.0)))

    // mark: invisible to replay, but advances the journal's offset bound
    // (the read-barrier protocol — reference Journal.mark)
    val log4 = log3.unionByName(
      builder.mark("tp", "px", Some(ts(8))).withColumn("koffset", lit(30L)))
    val j4 = Journal(spark, log4)
    assert(j4.read("tp", "px").count() == 2) // replay unchanged
    val maxOff = log4
      .filter(col("topic") === "tp")
      .agg(org.apache.spark.sql.functions.max("koffset"))
      .head()
      .getLong(0)
    assert(maxOff == 30L) // the marker IS the new bound
  }
}
