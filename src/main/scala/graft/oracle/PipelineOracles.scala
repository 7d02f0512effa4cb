package graft.oracle

/** DuckDB oracles for the LLM-data-pipeline operators that are expressible
  * in portable SQL (length/replace arithmetic, md5, double list math).
  * MinHash/SimHash/LSH use Spark's xxhash64 and are covered by ScalaTest
  * invariants instead (rows-only check driver-side).
  */
object PipelineOracles {

  private def occ(needle: String, len: Int): String =
    s"(length(text) - length(replace(text, '$needle', ''))) / $len"

  private val words = "(length(text) - length(replace(text, ' ', '')) + 1)"

  val quality: String = s"""
    SELECT doc_id, lang, source,
           length(text) AS n_chars_actual,
           n_chars,
           CAST($words AS BIGINT) AS n_words,
           CAST(length(text) AS DOUBLE) / $words AS avg_word_len,
           CAST(${occ(".", 1)} AS BIGINT) AS n_periods,
           CAST(${occ(" the ", 5)} AS BIGINT) AS n_the,
           ${occ(" the ", 5)} / $words AS stopword_ratio
    FROM documents
    ORDER BY doc_id
  """

  private def padOcc(w: String): String = {
    val n = w.length + 2
    s"(length(p) - length(replace(p, ' $w ', ''))) / $n"
  }

  val langIdConfusion: String = s"""
    SELECT lang, predicted, COUNT(*) AS n
    FROM (
      SELECT lang,
             CASE WHEN zh_s > 0 THEN 'zh'
                  WHEN en_s = mx THEN 'en'
                  WHEN de_s = mx THEN 'de'
                  WHEN es_s = mx THEN 'es'
                  ELSE 'fr' END AS predicted
      FROM (
        SELECT lang, en_s, fr_s, es_s, de_s, zh_s,
               GREATEST(en_s, fr_s, es_s, de_s) AS mx
        FROM (
          SELECT lang,
                 ${padOcc("the")} + ${padOcc("and")} + ${padOcc("of")} + ${padOcc("is")} AS en_s,
                 ${padOcc("le")} + ${padOcc("la")} + ${padOcc("et")} + ${padOcc("les")} AS fr_s,
                 ${padOcc("el")} + ${padOcc("los")} + ${padOcc("y")} + ${padOcc("de")} AS es_s,
                 ${padOcc("der")} + ${padOcc("die")} + ${padOcc("und")} + ${padOcc("das")} AS de_s,
                 CAST(length(text) - length(regexp_replace(text, '[ -~]', '', 'g'))
                   AS DOUBLE) AS zh_s
          FROM (SELECT lang, text, ' ' || text || ' ' AS p FROM documents) b
        ) s
      ) m
    ) t
    GROUP BY lang, predicted
    ORDER BY lang, predicted
  """

  val tokenStats: String = s"""
    SELECT doc_id, lang,
           CAST($words AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             AS BIGINT) AS bpe_tokens,
           CAST(length(text) AS DOUBLE) /
             len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             AS chars_per_token
    FROM documents
    ORDER BY doc_id
  """

  val fingerprint: String = """
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''),
                 c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) AS fp,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(substr(text, 1, 64), ''),
                 c -> CAST(ascii(c) AS BIGINT))),
             (a, b) -> (a * 31 + b) % 1000000007) AS prefix_fp
    FROM documents
    ORDER BY doc_id
  """

  val lengthHistogram: String = """
    SELECT lang,
           CAST(floor(n_chars / 100) * 100 AS BIGINT) AS bucket,
           COUNT(*) AS n_docs
    FROM documents
    GROUP BY lang, bucket
    ORDER BY lang, bucket
  """

  val sourceQuality: String = s"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST($words AS BIGINT)) AS DOUBLE) / COUNT(*)
             AS avg_words,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(SUM(CAST(${occ(" the ", 5)} AS BIGINT)) AS BIGINT)
             AS total_the
    FROM documents
    GROUP BY source
    ORDER BY source
  """

  val corpusStats: String = s"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM($words) AS BIGINT) AS total_words,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
  """

  val dedupExact: String = """
    SELECT doc_id, canonical_id, in_dup_group,
           doc_id <> canonical_id AS is_dup
    FROM (
      SELECT doc_id,
             MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
             COUNT(*) OVER (PARTITION BY md5(text)) > 1 AS in_dup_group
      FROM documents
    ) d
    ORDER BY doc_id
  """

  private val cos =
    """list_dot_product(qe, ee) /
       (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ee, ee)))"""

  val knnBruteForce: String = s"""
    SELECT qid, vec_id, rank, sim
    FROM (
      SELECT qid, vec_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
               AS BIGINT) AS rank
      FROM (
        SELECT q.qid, e.vec_id, $cos AS sim
        FROM (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
              FROM embeddings WHERE vec_id < 10) q
        JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee
              FROM embeddings) e
          ON e.vec_id <> q.qid
      ) s
    ) r
    WHERE rank <= 5
    ORDER BY qid, rank
  """

  val knnIvf: String = s"""
    SELECT qid, vec_id, rank, sim
    FROM (
      SELECT qid, vec_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
               AS BIGINT) AS rank
      FROM (
        SELECT q.qid, e.vec_id, $cos AS sim
        FROM (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe, label
              FROM embeddings WHERE vec_id < 10) q
        JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ee, label
              FROM embeddings) e
          ON e.vec_id <> q.qid AND e.label = q.label
      ) s
    ) r
    WHERE rank <= 5
    ORDER BY qid, rank
  """

  val embeddingNearDup: String = s"""
    SELECT label, a, b, sim
    FROM (
      SELECT l.label, l.vec_id AS a, r.vec_id AS b,
             list_dot_product(CAST(l.embedding AS DOUBLE[]),
                              CAST(r.embedding AS DOUBLE[])) /
             (sqrt(list_dot_product(CAST(l.embedding AS DOUBLE[]),
                                    CAST(l.embedding AS DOUBLE[]))) *
              sqrt(list_dot_product(CAST(r.embedding AS DOUBLE[]),
                                    CAST(r.embedding AS DOUBLE[])))) AS sim
      FROM embeddings l
      JOIN embeddings r ON l.label = r.label AND l.vec_id < r.vec_id
    ) s
    WHERE sim >= 0.99
    ORDER BY a, b
  """

  val mediaMeta: String = """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 640 AS INT) AS width,
           CAST(strlen(text) % 480 AS INT) AS height,
           CAST(CASE WHEN doc_id % 3 = 2 THEN strlen(text) % 250 ELSE 1 END
             AS INT) AS n_frames,
           CAST(CASE WHEN doc_id % 3 <> 0 THEN strlen(text) * 10 ELSE 0 END
             AS BIGINT) AS duration_ms
    FROM documents
    ORDER BY doc_id
  """

  val mediaKnn: String = """
    SELECT qid, doc_id, rank
    FROM (
      SELECT qid, doc_id, sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, doc_id)
               AS BIGINT) AS rank
      FROM (
        SELECT q.qid, e.doc_id,
               list_dot_product(q.qe, e.ee) /
               (sqrt(list_dot_product(q.qe, q.qe)) *
                sqrt(list_dot_product(e.ee, e.ee))) AS sim
        FROM (SELECT doc_id AS qid,
                     list_transform(generate_series(1, 8),
                       k -> CAST((strlen(text) * k) % 97 + 1 AS DOUBLE)) AS qe
              FROM documents WHERE doc_id < 5) q
        JOIN (SELECT doc_id,
                     list_transform(generate_series(1, 8),
                       k -> CAST((strlen(text) * k) % 97 + 1 AS DOUBLE)) AS ee
              FROM documents) e
          ON e.doc_id <> q.qid
      ) s
    ) r
    WHERE rank <= 3
    ORDER BY qid, rank
  """

  val frameSample: String = """
    SELECT doc_id, n_frames, frame_idx, frame_idx * 40 AS frame_ts_ms
    FROM (
      SELECT doc_id,
             CAST(strlen(text) % 250 AS INT) AS n_frames
      FROM documents
      WHERE doc_id % 3 = 2
    ) v,
    LATERAL (SELECT unnest(generate_series(0, n_frames - 1, 25)) AS frame_idx) f
    WHERE n_frames > 0
    ORDER BY doc_id, frame_idx
  """

  val mediaStats: String = """
    SELECT media_type,
           COUNT(*) AS n,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           MAX(n_bytes) AS max_bytes,
           CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms
    FROM (
      SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             CAST(CASE WHEN doc_id % 3 <> 0 THEN strlen(text) * 10 ELSE 0 END
               AS BIGINT) AS duration_ms
      FROM documents
    ) m
    GROUP BY media_type
    ORDER BY media_type
  """
}
