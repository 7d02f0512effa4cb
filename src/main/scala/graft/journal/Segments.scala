package graft.journal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{EventsCodec, JavaStringHash}

/** C1/C6 — segmentation + codec operators. */
object Segments {

  /** C1 — the reference's two segmentation functions
    * (eventual-cassandra/.../SegmentNr.scala:138-150):
    *   - journal-table segment: `(seq_nr - 1) / segmentSize` (scaled-down
    *     segmentSize=10 for the testdata; default 10 000)
    *   - metajournal segment: `abs(javaHashCode(lower(id))) % segments`
    *     via the custom codegen expression [[JavaStringHash]] (Spark's
    *     `hash()` is Murmur3 — not byte-compatible)
    */
  def segments(actions: DataFrame, segmentSize: Int = 10, metaSegments: Int = 100): DataFrame =
    JournalOps
      .survivors(actions)
      .withColumn(
        "seg",
        floor((col("seq_nr") - 1) / segmentSize).cast("long")
      )
      .groupBy("topic", "id")
      .agg(
        countDistinct("seg").as("n_segments"),
        max("seg").as("max_segment")
      )
      .withColumn(
        "meta_segment",
        (abs(JavaStringHash.javaHash(lower(col("id")))) % metaSegments)
          .cast("int")
      )
      .select("topic", "id", "meta_segment", "n_segments", "max_segment")
      .orderBy("topic", "id")

  /** C6 — end-to-end codec exercise: serialize each journal's surviving
    * events into the reference's v1 binary frame, decode, and verify the
    * roundtrip inside the job. `codec_ok` joins the oracle check: the
    * DuckDB side asserts TRUE, so any codec regression hash-mismatches.
    */
  def codecRoundtrip(actions: DataFrame): DataFrame = {
    val spark = actions.sparkSession
    import spark.implicits._
    JournalOps
      .survivors(actions)
      .select("topic", "id", "seq_nr", "payload")
      .as[(String, String, Long, Double)]
      .groupByKey { case (topic, id, _, _) => (topic, id) }
      .mapGroups { (key: (String, String), rows: Iterator[(String, String, Long, Double)]) =>
        val evs = rows.toArray.sortBy(_._3).map { case (_, _, seq, value) =>
          EventsCodec.CodecEvent(
            seqNr = seq,
            tags = Seq("t"),
            payloadType = EventsCodec.DiscText,
            payload = value.toString.getBytes("UTF-8")
          )
        }
        val frame = EventsCodec.Frame(1, evs.toIndexedSeq, Some("""{"k":1}"""))
        val decoded = EventsCodec.decode(EventsCodec.encode(frame))
        val ok = decoded == frame.copy(events = decoded.events) &&
          decoded.events.map(_.seqNr).sameElements(evs.map(_.seqNr)) &&
          decoded.events.zip(evs).forall { case (d, e) =>
            d.payload.sameElements(e.payload) && d.tags == e.tags &&
            d.payloadType == e.payloadType
          }
        (key._1, key._2, evs.length.toLong, ok)
      }
      .toDF("topic", "id", "n_events", "codec_ok")
      .orderBy("topic", "id")
  }
}
