package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{ActionHeaderJson, EventsCodec}

/** The Kafka wire format, end to end, without a broker: an action log
  * rendered as Kafka-shaped records (key / value bytes / `journal.action`
  * header — reference conversions/ActionToProducerRecord.scala) and parsed
  * back (ConsRecordToActionRecord + KafkaRead).
  *
  * Payloads ride the reference's DUAL wire format (KafkaWrite.scala:19-131,
  * PayloadAndType.scala): a batch whose payloads are all JSON-able
  * (Json / Text / absent) is serialized as the `PayloadJson` JSON envelope
  * with header payloadType="json"; anything carrying binary bytes uses the
  * v1 binary events frame ([[EventsCodec]]) with payloadType="binary". The
  * envelope is built/parsed with codegen'd string/JSON expressions (no UDF
  * on that path); the binary frame keeps the per-record codec UDF — a
  * row-at-a-time byte codec is inherently scalar (the reference does the
  * identical per-record work), and it sits at ingest, not in any analytic
  * hot path.
  *
  * With a real cluster the exact same columns come from
  * `spark.read.format("kafka")` (`key`,`value`,`headers`,`topic`,
  * `partition`,`offset`) — [[fromWire]] is the ingest projection that
  * plugs onto it unchanged (S1–S4's decode side).
  */
object KafkaWire {

  /** The engine-internal numeric fixture payload travels as a sidecar
    * record header (Kafka headers exist exactly for transport metadata);
    * the EVENT payload is the typed dual-column one.
    */
  private val ValueHeader = "graft.value"

  // Both codec UDFs are null-SAFE (not null-filtered): Catalyst treats
  // deterministic UDFs as freely reorderable, so they can be evaluated on
  // rows a sibling filter would discard — a null input must yield null,
  // never throw. (Genuine poison on rows that DO survive stalls the
  // stream via the header classifier's raise_error, T4.)
  private val encodeFrameUdf =
    udf { (seqNr: Long, tags: Seq[String], payload: Array[Byte], metadata: String) =>
      if (payload == null) null
      else
        EventsCodec.encode(
          EventsCodec.Frame(
            version = 1,
            events = Seq(
              EventsCodec.CodecEvent(
                seqNr = seqNr,
                tags = Option(tags).getOrElse(Seq.empty),
                payloadType = EventsCodec.DiscBinary,
                payload = payload
              )
            ),
            metadataJson = Some(Option(metadata).getOrElse("{}"))
          )
        )
    }

  private val decodeFrameUdf =
    udf { (bytes: Array[Byte]) =>
      if (bytes == null) null
      else {
        val frame = EventsCodec.decode(bytes)
        (
          frame.events.map(e => (e.seqNr, e.tags, e.payloadType, e.payload)),
          frame.metadataJson.getOrElse("{}")
        )
      }
    }

  /** Minimal JSON string escaping for envelope text payloads (backslash
    * and quote — the two characters that break a JSON string literal;
    * control characters do not occur in the engine's text payloads).
    */
  private def jsonEscape(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")

  /** The single-event `PayloadJson` envelope, built with codegen'd string
    * concatenation so a raw JSON payload embeds as a JSON value (to_json
    * would re-quote it): `{"events":[{"seqNr":N,"tags":[...],
    * "payloadType":...,"payload":...}],"metadata":{...}}`.
    */
  private def envelope: Column = {
    val payloadFrag = when(
      col("payload_type") === "json",
      concat(lit(",\"payloadType\":\"json\",\"payload\":"), col("payload_txt"))
    ).when(
      col("payload_type") === "text",
      concat(
        lit(",\"payloadType\":\"text\",\"payload\":\""),
        jsonEscape(col("payload_txt")),
        lit("\"")
      )
    ).otherwise(lit("")) // payload-less append (reference Payload None)
    // every fragment is null-guarded: a null tags_csv (client append with
    // no tags column) or a text append with a null payload_txt must
    // degrade to empty-tags / payload-less — concat() null-propagates,
    // and a NULL record value would silently LOSE the event on decode
    concat(
      lit("{\"events\":[{\"seqNr\":"),
      col("seq_nr").cast("string"),
      lit(",\"tags\":"),
      coalesce(to_json(split(col("tags_csv"), ",")), lit("[]")),
      coalesce(payloadFrag, lit("")),
      lit("}],\"metadata\":"),
      coalesce(col("metadata"), lit("{}")),
      lit("}")
    )
  }

  /** actions → Kafka-shaped records. Appends carry the serialized events
    * batch as the value (envelope or binary frame per payload type);
    * delete/purge/mark are header-only records (value null), exactly like
    * the producer side of the reference.
    */
  def toWire(actions: DataFrame): DataFrame = {
    val isBinary = col("payload_type") === "binary"
    val header = ActionHeaderJson.encode(
      action = col("action"),
      rangeFrom = col("seq_nr"),
      rangeTo = col("seq_nr"),
      deleteTo = col("delete_to"),
      markId = concat(lit("m-"), col("id")),
      origin = col("origin"),
      version = col("version"),
      payloadType = when(isBinary, "binary").otherwise("json")
    )
    actions.select(
      col("topic"),
      col("part_no").as("partition"),
      col("koffset").as("offset"),
      col("id").as("key"),
      when(
        col("action") === "append",
        when(
          isBinary,
          encodeFrameUdf(
            col("seq_nr"),
            split(col("tags_csv"), ","),
            col("payload_bin"),
            col("metadata")
          )
        ).otherwise(envelope.cast("binary"))
      ).as("value"),
      map(
        lit("journal.action"), header,
        lit(ValueHeader), col("payload").cast("string")
      ).as("headers"),
      col("ts").as("timestamp")
    )
  }

  /** Kafka-shaped records → action log: parse the header, classify, decode
    * the value by the header's wire payloadType, and explode event frames
    * back to one row per event.
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
        // an append whose wire payloadType is absent or unknown is a
        // poison record, not a silent drop: the reference REQUIRES the
        // field ((json \ "payloadType").validate, ActionHeader.scala:37 —
        // even the legacy fixtures carry it), so decode stalls (T4)
        when(
          col("h.append").isNotNull &&
            !col("h.append.payloadType").isin("json", "binary"),
          raise_error(concat(
            lit("unsupported append payloadType: "),
            coalesce(col("h.append.payloadType"), lit("<missing>"))
          ))
        )
          .when(col("h.append").isNotNull, "append")
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
      .withColumn("origin", coalesce(
        col("h.append.origin"), col("h.delete.origin"),
        col("h.purge.origin"), col("h.mark.origin")))
      .withColumn("version", coalesce(
        col("h.append.version"), col("h.delete.version"),
        col("h.purge.version"), col("h.mark.version")))

    def common = Seq(
      col("topic"),
      col("partition").as("part_no"),
      col("offset").as("koffset"),
      col("key").as("id"),
      col("action"),
      col("timestamp").as("ts")
    )

    // JSON-envelope appends: parsed entirely with from_json (codegen'd);
    // a raw JSON payload value surfaces as its JSON text in the string
    // field, a text payload as the unquoted string — KafkaRead.readJson.
    val jsonAppends = classified
      .filter(col("action") === "append" && col("h.append.payloadType") === "json")
      .withColumn("env", ActionHeaderJson.decodeEnvelope(col("value").cast("string")))
      .withColumn("ev", explode(col("env.events")))
      .select(
        common ++ Seq(
          col("ev.seqNr").as("seq_nr"),
          lit(null).cast("long").as("delete_to"),
          element_at(col("headers"), ValueHeader).cast("double").as("payload"),
          col("ev.payloadType").as("payload_type"),
          col("ev.payload").as("payload_txt"),
          lit(null).cast("binary").as("payload_bin"),
          array_join(col("ev.tags"), ",").as("tags_csv"),
          col("origin"), col("version"),
          to_json(col("env.metadata")).as("metadata")
        ): _*
      )

    // binary-frame appends: the scalar codec UDF (KafkaRead.readBytes).
    // The value reaches the UDF through a when() guard, not only the
    // filter: Catalyst may evaluate deterministic UDFs on rows a sibling
    // filter discards, and envelope bytes must never hit the frame codec.
    val binAppends = classified
      .filter(col("action") === "append" && col("h.append.payloadType") === "binary")
      .withColumn(
        "frame",
        decodeFrameUdf(
          when(col("h.append.payloadType") === "binary", col("value"))
        )
      )
      .withColumn("ev", explode(col("frame._1")))
      .select(
        common ++ Seq(
          col("ev._1").as("seq_nr"),
          lit(null).cast("long").as("delete_to"),
          element_at(col("headers"), ValueHeader).cast("double").as("payload"),
          when(col("ev._3") === EventsCodec.DiscBinary, "binary")
            .when(col("ev._3") === EventsCodec.DiscJson, "json")
            .when(col("ev._3") === EventsCodec.DiscText, "text")
            .as("payload_type"),
          when(
            col("ev._3").isin(EventsCodec.DiscJson, EventsCodec.DiscText),
            col("ev._4").cast("string")
          ).as("payload_txt"),
          when(col("ev._3") === EventsCodec.DiscBinary, col("ev._4"))
            .as("payload_bin"),
          array_join(col("ev._2"), ",").as("tags_csv"),
          col("origin"), col("version"),
          col("frame._2").as("metadata")
        ): _*
      )

    val others = classified
      .filter(col("action") =!= "append")
      .select(
        common ++ Seq(
          lit(null).cast("long").as("seq_nr"),
          col("h.delete.to").as("delete_to"),
          lit(null).cast("double").as("payload"),
          lit(null).cast("string").as("payload_type"),
          lit(null).cast("string").as("payload_txt"),
          lit(null).cast("binary").as("payload_bin"),
          lit(null).cast("string").as("tags_csv"),
          col("origin"), col("version"),
          lit(null).cast("string").as("metadata")
        ): _*
      )

    jsonAppends.unionByName(binAppends).unionByName(others)
  }
}
