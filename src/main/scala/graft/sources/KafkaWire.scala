package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ActionHeaderJson, EventsCodec}

/** The Kafka wire format, end to end, without a broker: an action log
  * rendered as Kafka-shaped records (key / value bytes / `journal.action`
  * header — reference conversions/ActionToProducerRecord.scala) and parsed
  * back (ConsRecordToActionRecord + KafkaRead).
  *
  * With a real cluster the exact same columns come from
  * `spark.read.format("kafka")` (`key`,`value`,`headers`,`topic`,
  * `partition`,`offset`) — [[fromWire]] is the ingest projection that
  * plugs onto it unchanged (S1–S4's decode side). Payload decode is the
  * one place the engine uses a UDF: a per-record binary codec is inherently
  * row-at-a-time (the reference does the identical per-record work), and it
  * sits in ingest, not in any analytic hot path.
  */
object KafkaWire {

  private val encodeUdf =
    udf { (seqNr: Long, payload: Double) =>
      EventsCodec.encode(
        EventsCodec.Frame(
          version = 1,
          events = Seq(
            EventsCodec.CodecEvent(
              seqNr = seqNr,
              tags = Seq.empty,
              payloadType = EventsCodec.DiscText,
              payload = payload.toString.getBytes("UTF-8")
            )
          ),
          metadataJson = Some("{}")
        )
      )
    }

  private val decodeUdf =
    udf { (bytes: Array[Byte]) =>
      val frame = EventsCodec.decode(bytes)
      frame.events.map { e =>
        (e.seqNr, new String(e.payload, "UTF-8").toDouble)
      }
    }

  /** actions → Kafka-shaped records. Appends carry an encoded events frame
    * as the value; delete/purge/mark are header-only records (value null),
    * exactly like the producer side of the reference.
    */
  def toWire(actions: DataFrame): DataFrame = {
    val header = ActionHeaderJson.encode(
      action = col("action"),
      rangeFrom = col("seq_nr"),
      rangeTo = col("seq_nr"),
      deleteTo = col("delete_to"),
      markId = concat(lit("m-"), col("id")),
      origin = lit("graft"),
      version = lit("0.1.0"),
      payloadType = lit("binary")
    )
    actions.select(
      col("topic"),
      col("part_no").as("partition"),
      col("koffset").as("offset"),
      col("id").as("key"),
      when(col("action") === "append", encodeUdf(col("seq_nr"), col("payload")))
        .as("value"),
      map(lit("journal.action"), header).as("headers"),
      col("ts").as("timestamp")
    )
  }

  /** Kafka-shaped records → action log: parse the header, classify, and
    * explode decoded event frames back to one row per event.
    */
  def fromWire(wire: DataFrame): DataFrame = {
    val h = ActionHeaderJson
      .decode(element_at(col("headers"), "journal.action"))
      .as("h")
    val classified = wire
      .withColumn("h", h)
      .withColumn(
        // Missing/unparseable headers must STALL the stream (T4:
        // stall-don't-skip), not silently classify as a no-op mark — so
        // "mark" requires h.mark to be present and anything else raises.
        "action",
        when(col("h.append").isNotNull, "append")
          .when(col("h.delete").isNotNull, "delete")
          .when(col("h.purge").isNotNull, "purge")
          .when(col("h.mark").isNotNull, "mark")
          .otherwise(
            raise_error(
              concat(
                lit("unparseable journal.action header: "),
                coalesce(
                  element_at(col("headers"), "journal.action"),
                  lit("<missing>")
                )
              )
            )
          )
      )
    val appends = classified
      .filter(col("action") === "append")
      .withColumn("ev", explode(decodeUdf(col("value"))))
      .select(
        col("topic"),
        col("partition").as("part_no"),
        col("offset").as("koffset"),
        col("key").as("id"),
        col("action"),
        col("timestamp").as("ts"),
        col("ev._1").as("seq_nr"),
        lit(null).cast("long").as("delete_to"),
        col("ev._2").as("payload")
      )
    val others = classified
      .filter(col("action") =!= "append")
      .select(
        col("topic"),
        col("partition").as("part_no"),
        col("offset").as("koffset"),
        col("key").as("id"),
        col("action"),
        col("timestamp").as("ts"),
        lit(null).cast("long").as("seq_nr"),
        col("h.delete.to").as("delete_to"),
        lit(null).cast("double").as("payload")
      )
    appends.unionByName(others)
  }
}
