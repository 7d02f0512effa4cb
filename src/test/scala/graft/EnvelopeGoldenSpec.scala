package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ActionHeaderJson

/** Golden-fixture contract for the JSON events envelope (`PayloadJson`,
  * reference PayloadAndType.scala:112): decode the reference's own
  * serialized envelopes (journal/src/test/resources/.../Payload-*.json)
  * through the engine's codegen decoder and verify every field — the
  * JSON-side sibling of EventsCodecSpec's byte-exact binary frames.
  */
class EnvelopeGoldenSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val goldenDir =
    "/root/reference/journal/src/test/resources/com/evolution/kafka/journal"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-envelope-golden")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def decode(name: String) = {
    val sp = spark
    import sp.implicits._
    val json = new String(
      Files.readAllBytes(Paths.get(goldenDir, name)), "UTF-8")
    Seq(json)
      .toDF("j")
      .select(ActionHeaderJson.decodeEnvelope(col("j")).as("env"))
      .select(explode(col("env.events")).as("ev"), col("env.metadata"))
      .select(
        col("ev.seqNr"), col("ev.tags"), col("ev.payloadType"),
        col("ev.payload"), col("metadata.expireAfter"),
        col("metadata.data")
      )
      .collect()
  }

  test("v1 text envelope: quoted payload string surfaces verbatim") {
    val rows = decode("Payload-text.json")
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 1L)
    assert(r.getSeq[String](1) == Seq("0", "1"))
    assert(r.getString(2) == "text")
    assert(r.getString(3) == " {\"key\":\"value\"} ")
  }

  test("v1 json-many envelope: events + batch metadata (expireAfter, data)") {
    val rows = decode("Payload-json-many.json")
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(rows.map(_.getString(2)).forall(_ == "json"))
    assert(rows(1).getSeq[String](1) == Seq("0", "1", "2"))
    assert(rows.head.getString(4) == "1 day")
    assert(rows.head.getMap[String, String](5) == Map("key" -> "value"))
  }

  test("payload-less event: absent payloadType/payload surface as null") {
    val rows = decode("Payload-empty.json")
    assert(rows.length == 1)
    assert(rows.head.isNullAt(2) && rows.head.isNullAt(3))
    assert(rows.head.getSeq[String](1) == Seq("0", "1"))
  }

  test("v0 envelope (no metadata field) decodes with null metadata") {
    val rows = decode("Payload-v0-text.json")
    assert(rows.length == 1)
    assert(rows.head.getString(2) == "text")
    assert(rows.head.isNullAt(4))
  }

  test("json payload OBJECT value surfaces as its raw JSON text") {
    val sp = spark
    import sp.implicits._
    val json =
      """{"events":[{"seqNr":3,"tags":[],"payloadType":"json",
        |"payload":{"a":[1,2],"b":"x"}}],"metadata":{}}""".stripMargin
    val r = Seq(json)
      .toDF("j")
      .select(ActionHeaderJson.decodeEnvelope(col("j")).as("env"))
      .select(explode(col("env.events")).as("ev"))
      .select(col("ev.payload"))
      .head()
    // Spark's JSON reader captures a non-string value's raw text when the
    // target field is string-typed — the property the engine's envelope
    // roundtrip relies on for json payloads
    assert(r.getString(0).replaceAll("\\s", "") == """{"a":[1,2],"b":"x"}""")
  }
}
