package graft.journal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{EventsCodec, JavaStringHash}

/** C1/C6 — segmentation + codec operators. */
object Segments {

  /** A7 end-to-end — purge-expired pipeline (reference replicator/.../
    * PurgeExpired.scala:53-69): scan for journals whose TTL elapsed,
    * synthesize a Purge action for each at its partition's end offset, fold
    * them through the replication merge, and report the journals that
    * remain. The output is provably `ids ∖ expired`, which the oracle
    * asserts set-algebraically.
    */
  def purgeExpiredApply(actions: DataFrame, asOf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val store = Replicate.compute(actions)
    val expired = JournalOps.expired(actions, asOf).select("topic", "id")
    val ends = actions
      .groupBy("topic", "part_no")
      .agg((max("koffset") + 1L).as("base"))
    val w = Window.partitionBy("topic", "part_no").orderBy("id")
    val purges = expired
      .join(
        store.metajournal.select("topic", "id", "part_no"),
        Seq("topic", "id")
      )
      .join(broadcast(ends), Seq("topic", "part_no"))
      .select(
        col("topic"),
        col("part_no"),
        (col("base") + row_number().over(w) - 1).as("koffset"),
        col("id"),
        lit("purge").as("action"),
        lit("2024-02-01 00:00:00").cast("timestamp").as("ts"),
        lit(null).cast("long").as("seq_nr"),
        lit(null).cast("long").as("delete_to"),
        lit(null).cast("double").as("payload"),
        lit(null).cast("string").as("payload_type"),
        lit(null).cast("string").as("payload_txt"),
        lit(null).cast("binary").as("payload_bin"),
        lit(null).cast("string").as("tags_csv"),
        lit("purge-expired").as("origin"),
        lit("1.0.0").as("version"),
        lit(null).cast("string").as("metadata"),
        lit(0L).as("event_id"),
        lit("{}").as("props")
      )
    Replicate
      .mergeBatch(store, purges)
      .metajournal
      .select("topic", "id")
      .orderBy("topic", "id")
  }

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
        // cast to long BEFORE the modulo, abs AFTER: the reference computes
        // math.abs(hashCode.toLong % segments) (SegmentNr.scala:147-148), and
        // abs on a 32-bit Int.MinValue hash would stay negative
        "meta_segment",
        abs(JavaStringHash.javaHash(lower(col("id"))).cast("long") % metaSegments)
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
