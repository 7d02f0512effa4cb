package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** C5 — the `journal.action` Kafka-header JSON contract
  * (reference journal/.../ActionHeader.scala:8-123; golden fixtures
  * journal/src/test/resources/.../Append-*.json, Delete-*.json, Mark-*.json,
  * Purge-*.json):
  *
  * {{{
  *   {"append":{"range":{"from":1,"to":5},"origin":o,"version":v,
  *              "payloadType":"json|binary","metadata":{...}}}
  *   {"delete":{"to":3,"origin":o,"version":v}}
  *   {"purge":{"origin":o,"version":v}}
  *   {"mark":{"id":"id","origin":o,"version":v}}
  * }}}
  *
  * Implemented with `to_json`/`from_json` (Catalyst's Jackson path — no
  * UDF): encoding builds the discriminated struct with null branches and
  * relies on JSON null-field omission; decoding parses the full schema,
  * where absent fields (legacy headers without `metadata`/`version` —
  * the `*-legacy.json` fixtures) surface as nulls, which IS the reference's
  * legacy-fallback read behavior.
  */
object ActionHeaderJson {

  val metadataSchema: StructType = StructType(Seq(
    StructField("expireAfter", StringType),
    StructField("data", MapType(StringType, StringType))
  ))

  val schema: StructType = StructType(Seq(
    StructField("append", StructType(Seq(
      StructField("range", StructType(Seq(
        StructField("from", LongType),
        StructField("to", LongType)
      ))),
      StructField("origin", StringType),
      StructField("version", StringType),
      StructField("payloadType", StringType),
      StructField("metadata", metadataSchema)
    ))),
    StructField("delete", StructType(Seq(
      StructField("to", LongType),
      StructField("origin", StringType),
      StructField("version", StringType)
    ))),
    StructField("purge", StructType(Seq(
      StructField("origin", StringType),
      StructField("version", StringType)
    ))),
    StructField("mark", StructType(Seq(
      StructField("id", StringType),
      StructField("origin", StringType),
      StructField("version", StringType)
    )))
  ))

  /** Encode an action-log row into its header JSON. */
  def encode(
      action: Column,
      rangeFrom: Column,
      rangeTo: Column,
      deleteTo: Column,
      markId: Column,
      origin: Column,
      version: Column,
      payloadType: Column
  ): Column = {
    val appendS = when(
      action === "append",
      struct(
        struct(rangeFrom.as("from"), rangeTo.as("to")).as("range"),
        origin.as("origin"),
        version.as("version"),
        payloadType.as("payloadType")
      )
    )
    val deleteS = when(
      action === "delete",
      struct(deleteTo.as("to"), origin.as("origin"), version.as("version"))
    )
    val purgeS = when(
      action === "purge",
      struct(origin.as("origin"), version.as("version"))
    )
    val markS = when(
      action === "mark",
      struct(markId.as("id"), origin.as("origin"), version.as("version"))
    )
    to_json(
      struct(
        appendS.as("append"),
        deleteS.as("delete"),
        purgeS.as("purge"),
        markS.as("mark")
      )
    )
  }

  def decode(json: Column): Column = from_json(json, schema)

  /** The JSON events envelope (`PayloadJson`) — the Kafka wire format for
    * JSON-able payload batches (reference PayloadAndType.scala:112,
    * golden fixtures Payload-v0-json.json / Payload-json-many.json):
    * `{"events":[{"seqNr":1,"tags":[...],"payloadType":"json|text",
    * "payload":...}], "metadata":{...}}` (metadata v1+ only).
    */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("events", ArrayType(StructType(Seq(
      StructField("seqNr", LongType),
      StructField("tags", ArrayType(StringType)),
      StructField("payloadType", StringType),
      StructField("payload", StringType)
    )))),
    StructField("metadata", metadataSchema)
  ))

  def decodeEnvelope(json: Column): Column = from_json(json, envelopeSchema)

  /** Encode an array<struct<seqNr,tags,payloadType,payload>> column into
    * the envelope JSON.
    */
  def encodeEnvelope(events: Column, metadata: Column): Column =
    to_json(struct(events.as("events"), metadata.as("metadata")))

  /** Roundtrip exercise over an action log: encode each action's header,
    * parse it back, and verify the discriminator + payload fields survive.
    * `codec_ok` hash-joins the oracle's TRUE.
    */
  def roundtrip(actions: DataFrame): DataFrame = {
    val hdr = encode(
      action = col("action"),
      rangeFrom = col("seq_nr"),
      rangeTo = col("seq_nr"),
      deleteTo = col("delete_to"),
      markId = concat(lit("m-"), col("id")),
      origin = lit("graft"),
      version = lit("0.1.0"),
      payloadType = lit("json")
    )
    val parsed = decode(hdr).as("h")
    actions
      .withColumn("h", parsed)
      .withColumn(
        "ok",
        (col("action") === "append" &&
          col("h.append.range.from") === col("seq_nr") &&
          col("h.append.payloadType") === "json") ||
          (col("action") === "delete" &&
            col("h.delete.to") === col("delete_to")) ||
          (col("action") === "purge" && col("h.purge.origin") === "graft") ||
          (col("action") === "mark" &&
            col("h.mark.id") === concat(lit("m-"), col("id")))
      )
      .groupBy("action")
      .agg(
        count(lit(1)).as("n"),
        min(col("ok")).as("header_ok")
      )
      .orderBy("action")
  }
}
