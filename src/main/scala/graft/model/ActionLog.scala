package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's input IR: an *action log*, one row per journal action, the
  * Spark analogue of the reference's Kafka topic of `Action` records
  * (reference: journal/src/main/scala/com/evolution/kafka/journal/Action.scala:10-173,
  * ActionRecord.scala:5, PartitionOffset.scala:7).
  *
  * Columns (FIXTURES.md §1, trimmed to what the testdata can carry):
  * {{{
  *   topic     STRING    -- Kafka topic hosting many journals
  *   partition INT       -- Kafka partition
  *   koffset   BIGINT    -- offset within (topic, partition); dense, ordered
  *   id        STRING    -- journal key (Kafka record key)
  *   action    STRING    -- 'append' | 'delete' | 'purge' | 'mark'
  *   ts        TIMESTAMP -- producer wall clock
  *   seq_nr    BIGINT    -- append only: 1-based per-journal sequence number
  *   delete_to BIGINT    -- delete only: inclusive truncation watermark
  *   payload   DOUBLE    -- append only: stand-in numeric payload (legacy)
  *   payload_type STRING -- append only: 'json' | 'text' | 'binary' | NULL
  *                          (NULL = payload-less append — the reference's
  *                          Payload None; PayloadType.scala:10-87)
  *   payload_txt  STRING -- json/text payloads (dual-column storage,
  *                          EventualPayloadAndType.scala:25-28)
  *   payload_bin  BINARY -- binary payloads
  *   tags_csv  STRING    -- append only: comma-joined event tags (ARRAY in
  *                          the store; Event.scala:9 tags Set[String])
  *   origin    STRING    -- producing host tag (Origin.scala)
  *   version   STRING    -- client version tag (Version.scala)
  *   metadata  STRING    -- append only: RecordMetadata JSON; carries
  *                          expireAfter (ExpireAfter.scala, drives C3 TTL)
  *   event_id  BIGINT    -- provenance of the synthetic derivation
  *   props     STRING    -- JSON bag (legacy TTL fixture)
  * }}}
  *
  * In production the log comes straight off `spark.read.format("kafka")`
  * where (topic, partition, offset) are physical columns. The synthetic
  * testdata has no Kafka, so the log is derived *deterministically* from the
  * driver-provided `events` table. The derivation is ONE shared SQL text
  * ([[ActionLog.derivationSql]]) executed verbatim by both Spark and the
  * DuckDB oracle — the two engines can therefore never disagree about the
  * fixture itself, only about the operators under test.
  *
  * Derivation semantics (engine-agnostic, window-function SQL):
  *   - journal id   = user_id; topic = user_id % 4; partition = user_id % 8
  *   - koffset      = dense 0-based row_number per (topic, partition) in
  *                    event_id order (event_id is unique ⇒ deterministic)
  *   - action kind  = 'error' rows become delete (every 3rd a mark);
  *                    'signup' rows with event_id % 5 = 0 become purge;
  *                    everything else appends. A delete before the first
  *                    append of its journal degrades to mark (a real client
  *                    cannot delete an empty journal —
  *                    reference Journals.scala:326-332 clamps to pointer).
  *   - seq_nr       = running count of appends per journal (1-based), the
  *                    analogue of the client's SeqNr monotone counter
  *                    (reference SeqNr.scala:12-53)
  *   - delete_to    = ceil(appends_so_far / 2): a mid-journal truncation
  */
object ActionLog {

  /** Shared Spark-SQL ∩ DuckDB-SQL derivation of the action log from the
    * `events` table. Must stay inside the common dialect of both engines:
    * no engine-specific functions, no reserved words as identifiers.
    */
  val derivationSql: String = """
    SELECT topic, part_no, koffset, id,
           CASE WHEN kind = 'delete' AND aps = 0 THEN 'mark' ELSE kind END AS action,
           ts,
           CASE WHEN kind = 'append' THEN aps END AS seq_nr,
           CASE WHEN kind = 'delete' AND aps > 0
                THEN CAST(floor((aps + 1) / 2) AS BIGINT) END AS delete_to,
           CASE WHEN kind = 'append' THEN value END AS payload,
           CASE WHEN kind = 'append' THEN
             CASE CAST(event_id % 4 AS INT)
               WHEN 0 THEN 'json' WHEN 1 THEN 'text' WHEN 2 THEN 'binary'
             END
           END AS payload_type,
           CASE WHEN kind = 'append' AND event_id % 4 = 0
                  THEN '{"e":' || CAST(event_id AS STRING) || '}'
                WHEN kind = 'append' AND event_id % 4 = 1
                  THEN 'p-' || CAST(event_id AS STRING)
           END AS payload_txt,
           CASE WHEN kind = 'append' AND event_id % 4 = 2
             THEN CAST('b-' || CAST(event_id AS STRING) AS BINARY)
           END AS payload_bin,
           CASE WHEN kind = 'append' THEN
             CASE CAST(event_id % 3 AS INT)
               WHEN 0 THEN 'tag-a' WHEN 1 THEN 'tag-a,tag-b' ELSE ''
             END
           END AS tags_csv,
           'origin-' || CAST(event_id % 3 AS STRING) AS origin,
           '1.' || CAST(event_id % 2 AS STRING) || '.0' AS version,
           CASE WHEN kind = 'append' THEN
             CASE WHEN event_id % 5 < 3
               THEN '{"expireAfter":"' || CAST(event_id % 30 AS STRING) || ' days"}'
               ELSE '{}'
             END
           END AS metadata,
           event_id, props
    FROM (
      SELECT r.*,
             CAST(SUM(CASE WHEN kind = 'append' THEN 1 ELSE 0 END)
               OVER (PARTITION BY id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS aps,
             CAST(ROW_NUMBER()
               OVER (PARTITION BY topic, part_no ORDER BY event_id) - 1
               AS BIGINT) AS koffset
      FROM (
        SELECT event_id, ts, value, props,
               't' || CAST(user_id % 4 AS STRING) AS topic,
               CAST(user_id % 8 AS INT) AS part_no,
               CAST(user_id AS STRING) AS id,
               CASE WHEN event_type = 'error' AND event_id % 3 = 0 THEN 'mark'
                    WHEN event_type = 'error' THEN 'delete'
                    WHEN event_type = 'signup' AND event_id % 5 = 0 THEN 'purge'
                    ELSE 'append' END AS kind
        FROM events
      ) r
    ) s
  """

  /** Oracle-side prelude: the same derivation as a CTE named `actions`. */
  def oracleCte: String = s"WITH actions AS ($derivationSql)"

  /** Loads `events` from `sfDir` and materializes the action log DataFrame.
    *
    * The two window functions share no partitioning, so the plan is two
    * shuffles — acceptable because this path exists only to *synthesize* a
    * log from testdata. A production log read from Kafka/Parquet already
    * carries (topic, partition, offset) and skips this entirely.
    */
  def fromEvents(spark: SparkSession, sfDir: String): DataFrame = {
    normalizedEvents(spark, sfDir).createOrReplaceTempView("events")
    spark.sql(derivationSql)
  }

  /** The testdata's `ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as raw nanos and rebuild a TimestampType column —
    * the values are µs-exact (verified: ns % 1000 == 0 across the testdata),
    * so Spark and DuckDB see identical wall-clock instants.
    */
  def normalizedEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      // integer division: a double `/` loses precision at epoch-nanos scale
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
}
