package graft.streaming

import java.util.regex.Pattern

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental deduplication as stateful Structured Streaming — the
  * continuous-ingest side of the batch dedup plane ([[graft.pipeline.Dedup]]):
  * a crawl/ingest stream dedups documents AS THEY ARRIVE instead of
  * re-scanning the accumulated corpus per batch.
  *
  *   - [[exactDedup]]: per content-hash state holds the canonical (first
  *     seen) doc_id; every arrival is emitted with its canonical assignment
  *     and a dup flag. State is one row per DISTINCT content — the exact
  *     analogue of the batch groupBy(md5) shuffle, kept by the state store.
  *   - [[minhashCandidatePairs]]: per (band, bucket) state holds the
  *     doc_ids previously hashed into that LSH bucket; a new arrival emits
  *     one candidate pair per prior occupant. The per-document signature
  *     (word polyhash → shingle Horner → affine minhash → band bucket) is
  *     computed ROW-LOCAL in the map stage — identical arithmetic to the
  *     batch [[graft.pipeline.Dedup.bandedIndex]] (law-checked in
  *     StreamingDedupSpec), so streaming and batch produce the same
  *     candidate set.
  *
  * Chunked-stream ≡ batch laws (StreamingDedupSpec):
  *   - exact: arrivals ordered by doc_id → (canonical_id, is_dup) equals
  *     the batch [[graft.pipeline.Dedup.exact]] assignment.
  *   - minhash: the UNION of pair emissions over any chunking equals the
  *     batch candidate set — bucket membership is arrival-order-independent,
  *     so this law holds for EVERY chunking, not just ordered ones.
  *
  * Scale notes: state is partitioned by the group key (content hash /
  * bucket), so it shards across executors like any shuffle; skewed buckets
  * (boilerplate shingles) are the same keys the batch path hands to AQE
  * skew splitting — here they surface as hot state keys, capped by
  * `maxBucketOccupancy` (a bucket past the cap stops emitting pairs: at
  * that occupancy it is boilerplate, not near-duplication — the standard
  * LSH guard). Emissions may repeat across bands (batch runs `distinct`);
  * downstream consumers dedup, keeping the operator append-only.
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, text: String)
  final case class ExactOut(doc_id: Long, canonical_id: Long, is_dup: Boolean)
  final case class CandPair(a: Long, b: Long)
  final case class BandedDoc(band: Int, bucket: Long, doc_id: Long)

  private val M = 1000000007L

  /** MD5 hex of the UTF-8 text — matches Spark's `md5()` column function
    * (lowercase hex), so state keys line up with the batch groupBy key.
    */
  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  /** First-seen-wins exact dedup. With arrivals ordered by doc_id the
    * canonical is the min doc_id — the batch assignment. (The batch
    * `in_dup_group` flag is not emittable append-only: whether the FIRST
    * copy has duplicates is unknown until later arrivals.)
    */
  def exactDedup(spark: SparkSession, docs: Dataset[Doc]): Dataset[ExactOut] = {
    import spark.implicits._
    docs
      .groupByKey(d => md5Hex(d.text))
      .flatMapGroupsWithState[Long, ExactOut](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (_: String, ds: Iterator[Doc], state: GroupState[Long]) =>
        // micro-batch iterators are unordered; doc_id order keeps the
        // law exact under chunked replay
        val sorted = ds.toArray.sortBy(_.doc_id)
        val out = Seq.newBuilder[ExactOut]
        var canonical = state.getOption.getOrElse(-1L)
        sorted.foreach { d =>
          if (canonical < 0) canonical = d.doc_id
          out += ExactOut(d.doc_id, canonical, d.doc_id != canonical)
        }
        state.update(canonical)
        out.result().iterator
      }
  }

  // ---- row-local signature: the batch band index arithmetic, scalar form

  /** Spark's `split(text, " ")` keeps trailing empty strings (Java
    * `Pattern.split` with limit -1) — `String.split` (limit 0) does NOT;
    * the law needs the exact token stream.
    */
  private val Space = Pattern.compile(" ")

  private def polyHash(s: String, base: Long, mod: Long): Long = {
    var acc = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** The (band, bucket) rows of one document — scalar mirror of
    * [[graft.pipeline.Dedup.shingles]] + [[graft.pipeline.Dedup.bandedIndex]]
    * (word polyhash, n-word Horner shingles incl. the short-doc partial
    * slice, affine minhash per perm, Horner band bucket).
    */
  def bandsOf(
      text: String,
      n: Int = 3,
      numPerms: Int = 16,
      rowsPerBand: Int = 4
  ): IndexedSeq[(Int, Long)] = {
    val wh = Space.split(text, -1).map(w => polyHash(w, 31L, M))
    val nShingles = math.max(wh.length - n, 0) + 1
    val mh = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < nShingles) {
      var s = 0L
      var j = i
      val end = math.min(i + n, wh.length)
      while (j < end) { s = (s * 31L + wh(j)) % M; j += 1 }
      var p = 0
      while (p < numPerms) {
        val h = ((2L * p + 1) * s + (7919L * p + 12345L)) % M
        if (h < mh(p)) mh(p) = h
        p += 1
      }
      i += 1
    }
    val numBands = numPerms / rowsPerBand
    (0 until numBands).map { b =>
      var acc = mh(b * rowsPerBand)
      var k = b * rowsPerBand + 1
      while (k < (b + 1) * rowsPerBand) { acc = (acc * 31L + mh(k)) % M; k += 1 }
      (b, acc)
    }
  }

  /** Incremental MinHash-LSH candidate pairs: new arrivals pair against
    * every prior occupant of any shared (band, bucket). Emits (min, max)
    * ordered pairs; repeats across bands — downstream dedups (batch runs
    * `distinct` at the same spot).
    */
  def minhashCandidatePairs(
      spark: SparkSession,
      docs: Dataset[Doc],
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      maxBucketOccupancy: Int = 10000
  ): Dataset[CandPair] = {
    import spark.implicits._
    docs
      .flatMap(d => bandsOf(d.text, 3, numPerms, rowsPerBand).map {
        case (band, bucket) => BandedDoc(band, bucket, d.doc_id)
      })
      .groupByKey(bd => (bd.band, bd.bucket))
      .flatMapGroupsWithState[List[Long], CandPair](
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout()
      ) { (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[List[Long]]) =>
        var occupants = state.getOption.getOrElse(Nil)
        val out = Seq.newBuilder[CandPair]
        rows.toArray.sortBy(_.doc_id).foreach { bd =>
          // redelivered doc_ids are no-ops (idempotent under at-least-once)
          if (occupants.size < maxBucketOccupancy &&
              !occupants.contains(bd.doc_id)) {
            occupants.foreach { prior =>
              out += CandPair(math.min(prior, bd.doc_id), math.max(prior, bd.doc_id))
            }
            occupants = bd.doc_id :: occupants
          }
        }
        state.update(occupants)
        out.result().iterator
      }
  }
}
