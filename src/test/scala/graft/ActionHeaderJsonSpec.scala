package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ActionHeaderJson

/** JSON contract tests against the reference's golden ActionHeader fixtures
  * (journal/src/test/resources/.../{Append,Delete,Mark,Purge}-*.json,
  * including the `*-legacy.json` variants missing newer fields).
  */
class ActionHeaderJsonSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val goldenDir =
    "/root/reference/journal/src/test/resources/com/evolution/kafka/journal"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-header-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def parse(name: String) = {
    val sp = spark
    import sp.implicits._
    val json = new String(
      Files.readAllBytes(Paths.get(goldenDir, name)), "UTF-8")
    Seq(json)
      .toDF("j")
      .select(ActionHeaderJson.decode(col("j")).as("h"))
      .select("h.*")
      .head()
  }

  test("parses golden append header with origin + metadata") {
    val r = parse("Append-origin-Json-metadata.json")
    val append = r.getStruct(0)
    assert(append.getStruct(0).getLong(0) == 1L) // range.from
    assert(append.getStruct(0).getLong(1) == 5L) // range.to
    assert(append.getString(1) == "origin")
    assert(append.getString(3) == "json") // payloadType
    assert(append.getStruct(4).getMap[String, String](1)("key") == "value")
  }

  test("parses golden legacy append header (no metadata field)") {
    val r = parse("Append-origin-Json-legacy.json")
    val append = r.getStruct(0)
    assert(append.getStruct(0).getLong(1) == 5L)
    assert(append.isNullAt(4)) // metadata absent -> null (legacy fallback)
  }

  test("parses golden delete/mark/purge headers") {
    val d = parse("Delete-origin.json").getStruct(1)
    assert(d.getLong(0) == 3L && d.getString(1) == "origin")
    assert(d.getString(2) == "0.0.1")

    val m = parse("Mark-origin.json").getStruct(3)
    assert(m.getString(0) == "id" && m.getString(1) == "origin")

    val p = parse("Purge-origin.json").getStruct(2)
    assert(p.getString(0) == "origin")
  }

  test("parses golden JSON payload envelopes (PayloadJson wire format)") {
    val sp = spark
    import sp.implicits._
    def parseEnv(name: String) = {
      val json = new String(
        Files.readAllBytes(Paths.get(goldenDir, name)), "UTF-8")
      Seq(json)
        .toDF("j")
        .select(ActionHeaderJson.decodeEnvelope(col("j")).as("e"))
        .select("e.*")
        .head()
    }
    val one = parseEnv("Payload-v0-json.json")
    val evs = one.getSeq[org.apache.spark.sql.Row](0)
    assert(evs.length == 1)
    assert(evs.head.getLong(0) == 1L)
    assert(evs.head.getSeq[String](1) == Seq("0", "1"))
    assert(evs.head.getString(2) == "json")

    val many = parseEnv("Payload-json-many.json")
    assert(many.getSeq[org.apache.spark.sql.Row](0).length > 1)
  }

  test("envelope encode→decode roundtrip") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, Seq("a"), "text", "hello"))
      .toDF("seqNr", "tags", "payloadType", "payload")
      .agg(collect_list(struct(
        col("seqNr"), col("tags"), col("payloadType"), col("payload")
      )).as("events"))
      .select(
        ActionHeaderJson.decodeEnvelope(
          ActionHeaderJson.encodeEnvelope(
            col("events"),
            lit(null).cast(ActionHeaderJson.metadataSchema)
          )
        ).as("e")
      )
      .select("e.events")
      .head()
    val evs = df.getSeq[org.apache.spark.sql.Row](0)
    assert(evs.head.getLong(0) == 1L)
    assert(evs.head.getString(3) == "hello")
  }

  test("encode→decode roundtrip preserves the discriminator and fields") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      ("append", Some(1L), Some(5L), None: Option[Long], None: Option[String]),
      ("delete", None, None, Some(3L), None),
      ("purge", None, None, None, None),
      ("mark", None, None, None, Some("m-1"))
    ).toDF("action", "range_from", "range_to", "delete_to", "mark_id")
    val enc = ActionHeaderJson.encode(
      col("action"), col("range_from"), col("range_to"), col("delete_to"),
      col("mark_id"), lit("o"), lit("1.0"), lit("binary"))
    val out = df
      .select(col("action"), ActionHeaderJson.decode(enc).as("h"))
      .collect()
      .map { r =>
        val h = r.getStruct(1)
        r.getString(0) match {
          case "append" => !h.isNullAt(0) && h.isNullAt(1)
          case "delete" => !h.isNullAt(1) && h.isNullAt(0)
          case "purge"  => !h.isNullAt(2)
          case "mark"   => !h.isNullAt(3)
        }
      }
    assert(out.forall(identity))
  }
}
