package graft.oracle

import graft.model.ActionLog

/** DuckDB oracle SQL for the journal operator queries. Every statement runs
  * over the same parquet tables the Spark queries read, starts from the SAME
  * action-log derivation text ([[ActionLog.derivationSql]]), and mirrors the
  * operator's semantics independently — the driver hash-compares results.
  *
  * Dialect discipline: plain ANSI window/aggregate SQL, identical column
  * names and ORDER BY as the Spark side.
  */
object JournalOracles {

  /** Purge/delete fold state per action row (mirror of JournalOps.annotate). */
  private val annCte: String = s"""
    ${ActionLog.oracleCte},
    ann AS (
      SELECT a.*,
             MAX(CASE WHEN action = 'purge' THEN koffset END)
               OVER (PARTITION BY topic, id) AS lp
      FROM actions a
    ),
    ann2 AS (
      SELECT *, (lp IS NULL OR koffset > lp) AS after_purge FROM ann
    ),
    ann3 AS (
      SELECT *,
             MAX(CASE WHEN action = 'delete' AND after_purge THEN delete_to END)
               OVER (PARTITION BY topic, id) AS dt
      FROM ann2
    )
  """

  val journalScan: String = s"""$annCte
    SELECT topic, id, seq_nr, koffset, ts, payload
    FROM ann3
    WHERE action = 'append' AND after_purge AND seq_nr > COALESCE(dt, 0)
    ORDER BY topic, id, seq_nr
  """

  val pointer: String = s"""$annCte
    SELECT topic, id, MAX(seq_nr) AS seq_nr
    FROM ann3
    WHERE action = 'append' AND after_purge
    GROUP BY topic, id
    ORDER BY topic, id
  """

  /** Metajournal head-row aggregation body (no ORDER BY), reused by the
    * expiry queries. arg_min/arg_max on the unique koffset mirror the
    * Spark side's struct-min/max; the expiry columns implement the
    * reference's UpdateExpiry/DeleteExpiry merge (last append's metadata
    * wins; an append without expireAfter clears it).
    */
  private val metaBody: String = """
    SELECT topic, id,
           MIN(part_no) AS part_no,
           MAX(koffset) AS koffset,
           GREATEST(
             COALESCE(MAX(CASE WHEN action = 'append' THEN seq_nr END), 0),
             COALESCE(MAX(dt), 0)
           ) AS seq_nr,
           MAX(dt) AS delete_to,
           MIN(ts) AS created,
           CAST(MIN(ts) AS DATE) AS created_date,
           MAX(ts) AS updated,
           MIN(koffset) AS first_koffset,
           md5(topic || '|' || id || '|' || CAST(MIN(koffset) AS STRING))
             AS record_id,
           arg_min(origin, koffset) AS origin,
           MAX(CASE WHEN action = 'append' THEN koffset END)
             AS last_append_koffset,
           arg_max(metadata, koffset) FILTER (WHERE action = 'append')
             AS properties,
           CAST(NULLIF(regexp_extract(
             arg_max(metadata, koffset) FILTER (WHERE action = 'append'),
             '"expireAfter":"([0-9]+)', 1), '') AS INT) AS expire_after_days,
           CAST(arg_max(ts, koffset) FILTER (WHERE action = 'append') AS DATE)
             + CAST(NULLIF(regexp_extract(
                 arg_max(metadata, koffset) FILTER (WHERE action = 'append'),
                 '"expireAfter":"([0-9]+)', 1), '') AS INT) AS expire_on
    FROM ann3
    WHERE action <> 'mark' AND after_purge
    GROUP BY topic, id
  """

  // expire_on is presented as STRING at the query layer (the store column
  // stays DATE): a nullable date column round-trips as NaT-bearing
  // datetime64 on the oracle side and compares unequal to Spark's
  // date-or-null objects even when the values agree
  val metajournal: String = s"""$annCte,
    meta AS ($metaBody)
    SELECT topic, id, part_no, koffset, seq_nr, delete_to, created,
           created_date, updated, first_koffset, record_id, origin,
           last_append_koffset, properties, expire_after_days,
           CAST(expire_on AS STRING) AS expire_on
    FROM meta
    ORDER BY topic, id
  """

  val pointer2: String = s"""${ActionLog.oracleCte}
    SELECT topic, part_no,
           MAX(koffset) + 1 AS next_offset,
           COUNT(*) AS records
    FROM actions
    GROUP BY topic, part_no
    ORDER BY topic, part_no
  """

  val topics: String = s"""${ActionLog.oracleCte}
    SELECT DISTINCT topic FROM actions ORDER BY topic
  """

  val ids: String = s"""$annCte
    SELECT DISTINCT topic, id
    FROM ann2
    WHERE action <> 'mark' AND after_purge
    ORDER BY topic, id
  """

  val idsByCreated: String = s"""$annCte
    SELECT topic, id, created_date
    FROM (
      SELECT topic, id, CAST(MIN(ts) AS DATE) AS created_date
      FROM ann2
      WHERE action <> 'mark' AND after_purge
      GROUP BY topic, id
    ) m
    WHERE created_date BETWEEN DATE '2024-01-03' AND DATE '2024-01-15'
    ORDER BY topic, id
  """

  val headInfo: String = s"""${ActionLog.oracleCte},
    wm AS (
      SELECT topic, part_no,
             CAST(floor(MAX(koffset) * 0.8) AS BIGINT) AS wm
      FROM actions GROUP BY topic, part_no
    ),
    tail AS (
      SELECT a.* FROM actions a
      JOIN wm USING (topic, part_no)
      WHERE koffset > wm
    ),
    tl AS (
      SELECT *,
             MAX(CASE WHEN action = 'purge' THEN koffset END)
               OVER (PARTITION BY topic, id) AS lp
      FROM tail
    ),
    tl2 AS (
      SELECT *, (lp IS NULL OR koffset > lp) AS after_purge FROM tl
    )
    SELECT topic, id,
           MIN(CASE WHEN action = 'append' AND after_purge THEN koffset END)
             AS head_offset,
           MAX(CASE WHEN action = 'append' AND after_purge THEN seq_nr END)
             AS head_seq_nr,
           MAX(CASE WHEN action = 'delete' AND after_purge THEN delete_to END)
             AS head_delete_to,
           CAST(MAX(CASE WHEN action = 'purge' THEN 1 ELSE 0 END) AS BOOLEAN)
             AS purged,
           CASE
             WHEN MAX(CASE WHEN action = 'append' AND after_purge THEN seq_nr END)
                  IS NOT NULL THEN 'append'
             WHEN MAX(CASE WHEN action = 'delete' AND after_purge THEN delete_to END)
                  IS NOT NULL THEN 'delete'
             WHEN MAX(CASE WHEN action = 'purge' THEN 1 ELSE 0 END) = 1
                  THEN 'purge'
             ELSE 'empty'
           END AS kind
    FROM tl2
    GROUP BY topic, id
    ORDER BY topic, id
  """

  val batchCompaction: String = s"""$annCte
    SELECT topic, id,
           MAX(CASE WHEN action = 'purge' THEN koffset END) AS purge_offset,
           MAX(CASE WHEN action = 'delete' AND after_purge THEN delete_to END)
             AS effective_delete_to,
           MAX(CASE WHEN action = 'delete' AND after_purge THEN koffset END)
             AS delete_offset,
           COUNT(CASE WHEN action = 'append' AND after_purge
                       AND seq_nr > COALESCE(dt, 0) THEN 1 END)
             AS surviving_appends,
           MIN(CASE WHEN action = 'append' AND after_purge
                     AND seq_nr > COALESCE(dt, 0) THEN seq_nr END)
             AS first_seq_nr,
           MAX(CASE WHEN action = 'append' AND after_purge THEN seq_nr END)
             AS last_seq_nr
    FROM ann3
    GROUP BY topic, id
    ORDER BY topic, id
  """

  /** J1's oracle is the whole-log replay: the two-source merge must be
    * indistinguishable from having had the full log in one place.
    */
  val mergedRead: String = journalScan

  val dedupReplay: String = s"""$annCte
    SELECT topic, id, seq_nr, koffset, payload
    FROM ann3
    WHERE action = 'append' AND after_purge AND seq_nr > COALESCE(dt, 0)
    ORDER BY topic, id, seq_nr
  """

  val expired: String = s"""$annCte,
    meta AS ($metaBody)
    SELECT topic, id, created_date, expire_after_days, expire_on
    FROM meta
    WHERE expire_on <= DATE '2024-02-15'
    ORDER BY topic, id
  """

  val keyTailScan: String = s"""${ActionLog.oracleCte}
    SELECT topic, part_no, koffset, id, action, seq_nr
    FROM actions
    WHERE id IN ('1', '2', '3') AND koffset >= 5
    ORDER BY topic, id, koffset
  """

  val streamBounds: String = s"""${ActionLog.oracleCte},
    wm AS (
      SELECT topic, part_no,
             CAST(floor(MAX(koffset) * 0.8) AS BIGINT) AS wm
      FROM actions GROUP BY topic, part_no
    ),
    markers AS (
      SELECT topic, part_no, MAX(koffset) AS marker_offset
      FROM actions WHERE action = 'mark'
      GROUP BY topic, part_no
    )
    SELECT topic, part_no, koffset, id, action, seq_nr
    FROM actions
    JOIN wm USING (topic, part_no)
    JOIN markers USING (topic, part_no)
    WHERE marker_offset > wm
      AND koffset > wm AND koffset < marker_offset
      AND action <> 'mark'
    ORDER BY topic, part_no, koffset
  """

  val staleness: String = s"""${ActionLog.oracleCte},
    wm AS (
      SELECT topic, part_no,
             CAST(floor(MAX(koffset) * 0.8) AS BIGINT) AS wm
      FROM actions GROUP BY topic, part_no
    ),
    ends AS (
      SELECT topic, part_no, MAX(koffset) + 1 AS end_offset
      FROM actions GROUP BY topic, part_no
    )
    SELECT topic, part_no, end_offset,
           wm + 1 AS replicated_offset,
           end_offset - wm - 1 AS lag,
           end_offset - wm = 1 AS tail_skippable
    FROM ends JOIN wm USING (topic, part_no)
    ORDER BY topic, part_no
  """

  /** T6b — the head-cache reader decision: per-journal head fold of the
    * unreplicated tail composed with its partition's staleness. The Spark
    * side maintains this INCREMENTALLY through the persisted head cache
    * (chunked partial folds merged by the Semigroup); maintained ≡ the
    * whole-log fold is the HeadCacheSpec law, so this oracle replays the
    * batch headInfo ∘ staleness composition.
    */
  val headCacheDecision: String = s"""${ActionLog.oracleCte},
    wm AS (
      SELECT topic, part_no,
             CAST(floor(MAX(koffset) * 0.8) AS BIGINT) AS wm
      FROM actions GROUP BY topic, part_no
    ),
    ends AS (
      SELECT topic, part_no, MAX(koffset) + 1 AS end_offset
      FROM actions GROUP BY topic, part_no
    ),
    tail AS (
      SELECT a.* FROM actions a
      JOIN wm USING (topic, part_no)
      WHERE koffset > wm
    ),
    tl AS (
      SELECT *,
             MAX(CASE WHEN action = 'purge' THEN koffset END)
               OVER (PARTITION BY topic, id) AS lp
      FROM tail
    ),
    tl2 AS (
      SELECT *, (lp IS NULL OR koffset > lp) AS after_purge FROM tl
    ),
    heads AS (
      SELECT topic, id, MIN(part_no) AS part_no,
             MIN(CASE WHEN action = 'append' AND after_purge THEN koffset END)
               AS head_offset,
             MAX(CASE WHEN action = 'append' AND after_purge THEN seq_nr END)
               AS head_seq_nr,
             CASE
               WHEN MAX(CASE WHEN action = 'append' AND after_purge THEN seq_nr END)
                    IS NOT NULL THEN 'append'
               WHEN MAX(CASE WHEN action = 'delete' AND after_purge THEN delete_to END)
                    IS NOT NULL THEN 'delete'
               WHEN MAX(CASE WHEN action = 'purge' THEN 1 ELSE 0 END) = 1
                    THEN 'purge'
               ELSE 'empty'
             END AS kind
      FROM tl2
      GROUP BY topic, id
    )
    SELECT h.topic, h.id, h.part_no, h.kind, h.head_offset, h.head_seq_nr,
           e.end_offset - w.wm - 1 AS lag,
           h.kind = 'empty' AS tail_skippable
    FROM heads h
    JOIN wm w ON h.topic = w.topic AND h.part_no = w.part_no
    JOIN ends e ON h.topic = e.topic AND h.part_no = e.part_no
    ORDER BY h.topic, h.id
  """

  /** Java String.hashCode as portable SQL: Horner sum in BIGINT (exact for
    * ids up to 8 chars), wrapped to int32 once at the end (mod 2^32 is a
    * ring homomorphism, so one wrap equals per-step int overflow).
    */
  private val javaHashSql: String = {
    val terms = (1 to 8).map { i =>
      s"CASE WHEN length(id) >= $i THEN CAST(ascii(substr(id, $i, 1)) AS BIGINT) * CAST(power(31, length(id) - $i) AS BIGINT) ELSE 0 END"
    }
    val sum = terms.mkString("(", " + ", ")")
    s"(((($sum % 4294967296) + 6442450944) % 4294967296) - 2147483648)"
  }

  val segments: String = s"""$annCte,
    surv AS (
      SELECT topic, id,
             CAST(floor((seq_nr - 1) / 10) AS BIGINT) AS seg
      FROM ann3
      WHERE action = 'append' AND after_purge AND seq_nr > COALESCE(dt, 0)
    )
    SELECT topic, id,
           CAST(abs($javaHashSql) % 100 AS INT) AS meta_segment,
           COUNT(DISTINCT seg) AS n_segments,
           MAX(seg) AS max_segment
    FROM surv
    GROUP BY topic, id
    ORDER BY topic, id
  """

  val codecRoundtrip: String = s"""$annCte
    SELECT topic, id, COUNT(*) AS n_events, TRUE AS codec_ok
    FROM ann3
    WHERE action = 'append' AND after_purge AND seq_nr > COALESCE(dt, 0)
    GROUP BY topic, id
    ORDER BY topic, id
  """

  val actionCounts: String = s"""${ActionLog.oracleCte}
    SELECT action, COUNT(*) AS n
    FROM actions
    GROUP BY action
    ORDER BY action
  """

  /** C7 — the wire roundtrip must reproduce the IR's typed payload,
    * tags and metadata exactly; the oracle reads them straight off the
    * derivation (what went in must come out).
    */
  val payloadRoundtrip: String = s"""${ActionLog.oracleCte}
    SELECT topic, id, seq_nr, payload_type, payload_txt,
           hex(payload_bin) AS payload_bin_hex, tags_csv, metadata
    FROM actions
    WHERE action = 'append'
    ORDER BY topic, id, seq_nr
  """

  val tagReplay: String = s"""$annCte
    SELECT topic, id, seq_nr, koffset,
           tags_csv AS tags, payload_txt
    FROM ann3
    WHERE action = 'append' AND after_purge AND seq_nr > COALESCE(dt, 0)
      AND list_contains(string_split(tags_csv, ','), 'tag-b')
    ORDER BY topic, id, seq_nr
  """

  val actionHeader: String = s"""${ActionLog.oracleCte}
    SELECT action, COUNT(*) AS n, TRUE AS header_ok
    FROM actions
    GROUP BY action
    ORDER BY action
  """

  val snapshotCriteria: String = s"""$annCte
    SELECT topic, id, buffer_nr, seq_nr, koffset, payload
    FROM (
      SELECT s.*,
             ROW_NUMBER() OVER (PARTITION BY topic, id ORDER BY seq_nr DESC)
               AS rn
      FROM (
        SELECT topic, id, CAST(seq_nr / 10 AS INT) AS buffer_nr,
               seq_nr, koffset, payload
        FROM ann3
        WHERE action = 'append' AND after_purge
          AND seq_nr > COALESCE(dt, 0) AND seq_nr % 10 = 0
          AND seq_nr BETWEEN 15 AND 40
      ) s
    ) t
    WHERE rn = 1
    ORDER BY topic, id
  """

  val purgeExpiredApply: String = s"""$annCte,
    ids AS (
      SELECT DISTINCT topic, id FROM ann2
      WHERE action <> 'mark' AND after_purge
    ),
    meta AS ($metaBody),
    expired AS (
      SELECT topic, id FROM meta WHERE expire_on <= DATE '2024-02-15'
    )
    SELECT topic, id FROM (
      SELECT topic, id FROM ids
      EXCEPT
      SELECT topic, id FROM expired
    ) r
    ORDER BY topic, id
  """

  /** S10c — ring-buffer save path (bufferSize 3) + delete-by-criteria
    * (maxSeqNr 20): slot = save-ordinal % size, later saves overwrite, so
    * only each journal's last 3 snapshots survive; then the delete box.
    */
  val snapshotLifecycle: String = s"""$annCte,
    snaps AS (
      SELECT topic, id, seq_nr, koffset, payload
      FROM ann3
      WHERE action = 'append' AND after_purge
        AND seq_nr > COALESCE(dt, 0) AND seq_nr % 10 = 0
    ),
    ord AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY topic, id ORDER BY seq_nr) - 1
               AS ordinal,
             COUNT(*) OVER (PARTITION BY topic, id) AS total
      FROM snaps
    )
    SELECT topic, id, CAST(ordinal % 3 AS INT) AS buffer_nr,
           seq_nr, koffset, payload
    FROM ord
    WHERE ordinal >= total - 3 AND seq_nr > 20
    ORDER BY topic, id, buffer_nr
  """

  val snapshotLoad: String = s"""$annCte
    SELECT topic, id, seq_nr, koffset, payload
    FROM (
      SELECT s.*,
             ROW_NUMBER() OVER (PARTITION BY topic, id ORDER BY seq_nr DESC)
               AS rn
      FROM (
        SELECT topic, id, seq_nr, koffset, payload
        FROM ann3
        WHERE action = 'append' AND after_purge
          AND seq_nr > COALESCE(dt, 0) AND seq_nr % 10 = 0
      ) s
    ) t
    WHERE rn = 1
    ORDER BY topic, id
  """

  /** S10e — the snapshot maintainer's debt report (Snapshots.debtReport):
    * A2 pointer vs latest fixture snapshot, fire flag at threshold 5.
    */
  val snapshotDebt: String = s"""$annCte,
    ptr AS (
      SELECT topic, id, MAX(seq_nr) AS pointer
      FROM ann3
      WHERE action = 'append' AND after_purge
      GROUP BY topic, id
    ),
    snaps AS (
      SELECT topic, id, MAX(seq_nr) AS snap_seq
      FROM ann3
      WHERE action = 'append' AND after_purge
        AND seq_nr > COALESCE(dt, 0) AND seq_nr % 10 = 0
      GROUP BY topic, id
    )
    SELECT p.topic, p.id, p.pointer, s.snap_seq,
           p.pointer - COALESCE(s.snap_seq, 0) AS debt,
           p.pointer - COALESCE(s.snap_seq, 0) > 5 AS snapshot_recommended
    FROM ptr p LEFT JOIN snaps s ON p.topic = s.topic AND p.id = s.id
    ORDER BY p.topic, p.id
  """

  /** s10d — snapshot-accelerated recovery (Snapshots.recovery): latest
    * surviving snapshot per journal, then the replay suffix strictly above
    * its seq_nr; journals without a snapshot replay in full.
    */
  val snapshotRecovery: String = s"""$annCte,
    surv AS (
      SELECT topic, id, seq_nr, koffset, payload
      FROM ann3
      WHERE action = 'append' AND after_purge AND seq_nr > COALESCE(dt, 0)
    ),
    snap AS (
      SELECT topic, id, seq_nr, koffset, payload
      FROM (
        SELECT s.*,
               ROW_NUMBER() OVER (PARTITION BY topic, id
                                  ORDER BY seq_nr DESC) AS rn
        FROM (SELECT * FROM surv WHERE seq_nr % 10 = 0) s
      ) t WHERE rn = 1
    )
    SELECT topic, id, src, seq_nr, koffset, payload FROM (
      SELECT topic, id, 'snapshot' AS src, seq_nr, koffset, payload FROM snap
      UNION ALL
      SELECT e.topic, e.id, 'event' AS src, e.seq_nr, e.koffset, e.payload
      FROM surv e
      LEFT JOIN snap sn ON sn.topic = e.topic AND sn.id = e.id
      WHERE sn.seq_nr IS NULL OR e.seq_nr > sn.seq_nr
    ) u
    ORDER BY topic, id, seq_nr
  """
}
