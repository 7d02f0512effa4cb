package graft.journal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{EventsCodec, JavaStringHash}

/** C1/C6 — segmentation + codec operators. */
object Segments {

  /** A7 end-to-end, ORACLE form — purge-expired pipeline derived from the
    * raw action log (reference replicator/.../PurgeExpired.scala:53-69):
    * materialize the store, then delegate to the store-based production
    * path below. Kept because the driver's DuckDB oracle replays the whole
    * derivation from `actions`; the output is provably `ids ∖ expired`,
    * which the oracle asserts set-algebraically.
    */
  def purgeExpiredApply(actions: DataFrame, asOf: String): DataFrame =
    purgeExpiredApply(Replicate.compute(actions), asOf)

  /** A7 PRODUCTION form — TTL purge against the MATERIALIZED store. The
    * reference's purge job scans the metajournal's `expire_on` index and
    * never re-reads the log (PurgeExpired.scala:53-69 reads
    * `IdsByTopicAndExpireOn`); likewise this form touches only the three
    * maintained store tables ([[graft.streaming.StreamingReplicator]]
    * keeps them current):
    *
    *   - expired journals: one pushed-down filter on `metajournal.expire_on`
    *     (at 100 TB: a date-partitioned index scan, no log access)
    *   - purge offsets: allocated past `pointer2.next_offset` (the
    *     replicated watermark — identical to max(koffset)+1 over the log
    *     by the pointer2 invariant, without scanning the log)
    *   - apply: one [[Replicate.mergeBatch]] whose batch is |expired| rows
    *
    * Law (spec): this form over a written+re-read store ≡ the actions
    * form over the same log. Plan contract (spec): with a parquet-backed
    * store the physical plan's file scans read ONLY the store directories
    * — the action log never appears.
    */
  def purgeExpiredApply(store: Replicate.Store, asOf: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val expired = store.metajournal
      .filter(col("expire_on") <= lit(asOf).cast("date"))
      .select("topic", "id", "part_no")
    val ends = store.pointer2
      .select(col("topic"), col("part_no"), col("next_offset").as("base"))
    val w = Window.partitionBy("topic", "part_no").orderBy("id")
    val purges = expired
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
