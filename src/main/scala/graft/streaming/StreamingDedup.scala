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
  *     seen) doc_id plus the doc_ids already emitted under that hash —
  *     every NEW arrival is emitted with its canonical assignment and a
  *     dup flag; a REDELIVERED doc_id is a no-op, so output is idempotent
  *     under at-least-once delivery. State is one row per DISTINCT
  *     content (seen-set size = that content's duplicate count) — the
  *     exact analogue of the batch groupBy(md5) shuffle, kept by the
  *     state store.
  *   - [[minhashCandidatePairs]]: per (band, bucket) state holds the
  *     doc_ids previously hashed into that LSH bucket; a new arrival emits
  *     one candidate pair per prior occupant. The per-document signature
  *     (word polyhash → shingle Horner → affine minhash → band bucket) is
  *     computed ROW-LOCAL in the map stage — identical arithmetic to the
  *     batch [[graft.pipeline.Dedup.bandedIndex]] (law-checked in
  *     StreamingDedupSpec), so streaming and batch produce the same
  *     candidate set.
  *   - [[embeddingNearDup]]: the streaming form of the batch sign-LSH
  *     near-dup ([[graft.pipeline.Similarity.embeddingNearDupOn]], d4).
  *     Each arriving vector fans out to its own sign bucket plus every
  *     1-bit flip (multiprobe); per-bucket state holds the vectors whose
  *     OWN bucket this is. A row pairs against the earlier-admitted
  *     owners of its bucket, and only own rows are admitted — so every
  *     Hamming≤1 pair is found exactly once (via the later arrival's
  *     probe into the earlier arrival's own bucket), both vectors are in
  *     hand, and the exact cosine is emitted directly: the output IS the
  *     batch near-dup answer, not a candidate set.
  *
  * Chunked-stream ≡ batch laws (StreamingDedupSpec):
  *   - exact: arrivals ordered by doc_id → (canonical_id, is_dup) equals
  *     the batch [[graft.pipeline.Dedup.exact]] assignment.
  *   - minhash: the UNION of pair emissions over any chunking equals the
  *     batch candidate set — bucket membership is arrival-order-independent,
  *     so this law holds for EVERY chunking, not just ordered ones.
  *
  * Scale contract (100 TB continuous ingest):
  *   - State is partitioned by the group key (content hash / bucket), so
  *     it shards across executors like any shuffle; deploy with the
  *     RocksDB state store (`spark.sql.streaming.stateStore.providerClass`
  *     = `...RocksDBStateStoreProvider`) so per-executor state spills to
  *     local disk instead of heap — exact dedup's one-row-per-distinct-
  *     content state is corpus-sized and MUST NOT live on-heap.
  *   - Occupant state is a SORTED array: the redelivery-guard membership
  *     test is a binary search (O(log k), not the O(k) list scan) and the
  *     cap check is O(1) on length. Skewed buckets (boilerplate shingles)
  *     are the same keys the batch path hands to AQE skew splitting — here
  *     they surface as hot state keys, capped by `maxBucketOccupancy` (a
  *     bucket past the cap stops admitting occupants: at that occupancy it
  *     is boilerplate, not near-duplication — the standard LSH guard; the
  *     cap path is spec'd to leave prior state intact).
  *   - Optional `ttl` arms `GroupStateTimeout.ProcessingTimeTimeout`:
  *     groups idle past the horizon are evicted, bounding state on
  *     unbounded streams at the cost of re-admitting (re-pairing) content
  *     that returns after the horizon — the standard windowed-dedup
  *     tradeoff; `None` keeps exact global semantics (the batch law).
  *
  * Emissions may repeat across bands (batch runs `distinct`); downstream
  * consumers dedup, keeping the operator append-only.
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, text: String)
  final case class ExactOut(doc_id: Long, canonical_id: Long, is_dup: Boolean)
  final case class CandPair(a: Long, b: Long)
  final case class BandedDoc(band: Int, bucket: Long, doc_id: Long)

  /** Per-content exact-dedup state: first-seen canonical + every doc_id
    * already emitted under this content hash (sorted for binary search).
    */
  final case class ExactState(canonical: Long, seen: Array[Long])

  private val M = 1000000007L

  private def member(sorted: Array[Long], x: Long): Boolean =
    java.util.Arrays.binarySearch(sorted, x) >= 0

  /** Merges a sorted prior array with a batch of additions (sorted input)
    * into a new sorted array — one O(k + n) pass per group per batch,
    * replacing per-arrival insertion.
    */
  private def mergeSorted(prior: Array[Long], added: Array[Long]): Array[Long] = {
    val out = new Array[Long](prior.length + added.length)
    var i = 0; var j = 0; var k = 0
    while (i < prior.length && j < added.length) {
      if (prior(i) <= added(j)) { out(k) = prior(i); i += 1 }
      else { out(k) = added(j); j += 1 }
      k += 1
    }
    while (i < prior.length) { out(k) = prior(i); i += 1; k += 1 }
    while (j < added.length) { out(k) = added(j); j += 1; k += 1 }
    out
  }

  private def timeoutOf(ttl: Option[java.time.Duration]): GroupStateTimeout =
    if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
    else GroupStateTimeout.NoTimeout()

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
    * copy has duplicates is unknown until later arrivals.) Redelivered
    * doc_ids are skipped (idempotent under at-least-once delivery);
    * `ttl` evicts content idle past the horizon (see scale contract).
    */
  def exactDedup(
      spark: SparkSession,
      docs: Dataset[Doc],
      ttl: Option[java.time.Duration] = None
  ): Dataset[ExactOut] = {
    import spark.implicits._
    docs
      .groupByKey(d => md5Hex(d.text))
      .flatMapGroupsWithState[ExactState, ExactOut](
        OutputMode.Append(),
        timeoutOf(ttl)
      ) { (_: String, ds: Iterator[Doc], state: GroupState[ExactState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          // micro-batch iterators are unordered; doc_id order keeps the
          // law exact under chunked replay
          val sorted = ds.toArray.sortBy(_.doc_id)
          val prior = state.getOption.getOrElse(ExactState(-1L, Array.empty))
          val out = Seq.newBuilder[ExactOut]
          val added = Array.newBuilder[Long]
          var canonical = prior.canonical
          var lastAdded = Long.MinValue
          sorted.foreach { d =>
            // redelivery guard: already-emitted doc_ids are no-ops
            if (!member(prior.seen, d.doc_id) && d.doc_id != lastAdded) {
              if (canonical < 0) canonical = d.doc_id
              out += ExactOut(d.doc_id, canonical, d.doc_id != canonical)
              added += d.doc_id
              lastAdded = d.doc_id
            }
          }
          state.update(
            ExactState(canonical, mergeSorted(prior.seen, added.result()))
          )
          ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
          out.result().iterator
        }
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
    * `distinct` at the same spot). State per bucket is the sorted occupant
    * array (binary-search redelivery guard, O(1) cap check); a bucket at
    * `maxBucketOccupancy` stops admitting occupants without touching
    * prior state; `ttl` evicts buckets idle past the horizon.
    */
  def minhashCandidatePairs(
      spark: SparkSession,
      docs: Dataset[Doc],
      numPerms: Int = 16,
      rowsPerBand: Int = 4,
      maxBucketOccupancy: Int = 10000,
      ttl: Option[java.time.Duration] = None
  ): Dataset[CandPair] = {
    import spark.implicits._
    docs
      .flatMap(d => bandsOf(d.text, 3, numPerms, rowsPerBand).map {
        case (band, bucket) => BandedDoc(band, bucket, d.doc_id)
      })
      .groupByKey(bd => (bd.band, bd.bucket))
      .flatMapGroupsWithState[Array[Long], CandPair](
        OutputMode.Append(),
        timeoutOf(ttl)
      ) { (_: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[Array[Long]]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val prior = state.getOption.getOrElse(Array.empty[Long])
          val out = Seq.newBuilder[CandPair]
          // batch newcomers, kept sorted by construction (arrivals are
          // processed in doc_id order and appended monotonically)
          val added = scala.collection.mutable.ArrayBuffer.empty[Long]
          rows.toArray.sortBy(_.doc_id).foreach { bd =>
            val occupancy = prior.length + added.length
            // O(1) cap check; O(log k) redelivery guard (sorted arrays)
            if (occupancy < maxBucketOccupancy &&
                !member(prior, bd.doc_id) &&
                (added.isEmpty || added.last != bd.doc_id)) {
              prior.foreach { p =>
                out += CandPair(math.min(p, bd.doc_id), math.max(p, bd.doc_id))
              }
              added.foreach { p =>
                out += CandPair(math.min(p, bd.doc_id), math.max(p, bd.doc_id))
              }
              added += bd.doc_id
            }
          }
          // unconditional update: setTimeoutDuration requires live state,
          // and a group is only invoked when it received arrivals anyway
          state.update(
            if (added.nonEmpty) mergeSorted(prior, added.toArray) else prior
          )
          ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
          out.result().iterator
        }
      }
  }

  // ---- streaming embedding near-dup (the d4 plane, continuous form)

  final case class Vec(vec_id: Long, label: Int, embedding: Array[Float])
  final case class NearDupOut(label: Int, a: Long, b: Long, sim: Double)

  /** One multiprobe fan-out row: `own` marks the vector's own sign bucket
    * (admissible to state); flip probes only pair, never admit.
    */
  final case class ProbeRow(
      bucket: Long,
      vec_id: Long,
      label: Int,
      own: Boolean,
      embedding: Array[Float]
  )

  final case class Owner(vec_id: Long, label: Int, embedding: Array[Float])

  /** Per-bucket state: admitted owners (vectors whose own bucket this is)
    * plus the sorted vec_ids of EVERY row already processed here — the
    * redelivery guard must cover probe rows too, or a redelivered vector
    * would re-pair against the owners its probes already saw.
    */
  final case class SignState(owners: Array[Owner], seen: Array[Long])

  /** Scalar mirror of [[graft.functions.SignLshBucket.bucket]] for a float
    * vector: same LCG parity planes, same sequential dim-order double
    * accumulation — bit-identical buckets (law-checked in the spec).
    */
  def signBucketOf(vec: Array[Float], nBits: Int): Long = {
    val proj = new Array[Double](nBits)
    var d = 0
    while (d < vec.length) {
      val v = vec(d).toDouble
      var p = 0
      while (p < nBits) {
        val lcg = 1103515245L * (131L * p + d) + 12345L
        if (((lcg >> 16) & 1L) == 0L) proj(p) += v else proj(p) -= v
        p += 1
      }
      d += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nBits) {
      if (proj(p) > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Scalar mirror of [[graft.pipeline.Similarity.cosine]]: double-cast
    * products folded sequentially from 0.0 — the identical IEEE operation
    * sequence of the `aggregate(zip_with(...))` form, so similarities are
    * bit-identical. Unequal lengths yield NaN (the declarative form yields
    * null) — both fail the threshold, so the pair drops either way.
    */
  def cosineOf(x: Array[Float], y: Array[Float]): Double = {
    if (x.length != y.length) return Double.NaN
    def dot(u: Array[Float], v: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < u.length) { acc += u(i).toDouble * v(i).toDouble; i += 1 }
      acc
    }
    dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
  }

  /** Incremental embedding near-dup: emits the exact (label, a, b, sim)
    * rows of the batch d4 operator as vectors arrive.
    *
    * Exactly-once pairing, no dedup needed downstream: a pair at bucket
    * Hamming distance ≤ 1 shares exactly one (probe row → own bucket)
    * incidence — the later arrival's probe set contains the earlier
    * arrival's own bucket; the symmetric incidence (earlier probes later's
    * bucket) never fires because the earlier probe row found no owner and
    * was not admitted. Within a micro-batch the group's rows are processed
    * in vec_id order with own rows admitted as they pass, which preserves
    * the same single-incidence argument; a Hamming-0 pair meets once in the
    * shared own bucket (the two flip-probe collisions are owner-less).
    *
    * Scale contract: state per bucket holds the owner VECTORS — the corpus
    * itself, sharded by bucket key across the state store; this is the
    * streaming analogue of the batch plan's persisted `lshBuckets` index
    * and needs the RocksDB state backend at corpus scale. `maxBucketOccupancy`
    * caps degenerate buckets (a bucket at cap admits no more owners but
    * keeps pairing probes against the existing ones); `ttl` evicts idle
    * buckets, trading global recall for bounded state.
    *
    * The redelivery guard (`SignState.seen`) records every vec_id that
    * visited the bucket — owners AND probes, so it grows ~(nBits+1)·N longs
    * across the store even where `maxBucketOccupancy` caps the owners.
    * `maxSeenPerBucket` bounds it: past the cap the SMALLEST ids are
    * dropped. Under the usual contract that vec_ids are assigned
    * monotonically with arrival (Kafka-offset-derived, sequence-stamped),
    * this is a sliding window over the most recent arrivals, and is exact
    * for Structured Streaming's failure model — a crash rolls the state
    * store back with the source offsets, so only cross-batch source
    * redelivery needs the guard, and that replays recent rows. For
    * NON-monotone id sources the evicted set is arbitrary rather than
    * oldest-first, so the window guarantee weakens to best-effort; either
    * way a row redelivered from beyond the window re-pairs (dupes, never
    * corruption — downstream dedup by (label,a,b) restores exactness).
    */
  def embeddingNearDup(
      spark: SparkSession,
      vecs: Dataset[Vec],
      threshold: Double = 0.99,
      nBits: Int = 12,
      maxBucketOccupancy: Int = 10000,
      ttl: Option[java.time.Duration] = None,
      maxSeenPerBucket: Int = 100000
  ): Dataset[NearDupOut] = {
    import spark.implicits._
    vecs
      .flatMap { v =>
        val own = signBucketOf(v.embedding, nBits)
        ProbeRow(own, v.vec_id, v.label, own = true, v.embedding) +:
          (0 until nBits).map(i =>
            ProbeRow(own ^ (1L << i), v.vec_id, v.label, own = false, v.embedding)
          )
      }
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[SignState, NearDupOut](
        OutputMode.Append(),
        timeoutOf(ttl)
      ) { (_: Long, rows: Iterator[ProbeRow], state: GroupState[SignState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val prior = state.getOption.getOrElse(
            SignState(Array.empty, Array.empty)
          )
          val out = Seq.newBuilder[NearDupOut]
          val newOwners = scala.collection.mutable.ArrayBuffer.empty[Owner]
          val newSeen = scala.collection.mutable.ArrayBuffer.empty[Long]
          rows.toArray.sortBy(_.vec_id).foreach { r =>
            // redelivery guard over ALL rows (own and probe)
            if (!member(prior.seen, r.vec_id) &&
                (newSeen.isEmpty || newSeen.last != r.vec_id)) {
              newSeen += r.vec_id
              def pair(o: Owner): Unit =
                if (o.label == r.label && o.vec_id != r.vec_id) {
                  val sim = cosineOf(o.embedding, r.embedding)
                  if (sim >= threshold)
                    out += NearDupOut(
                      r.label,
                      math.min(o.vec_id, r.vec_id),
                      math.max(o.vec_id, r.vec_id),
                      sim
                    )
                }
              prior.owners.foreach(pair)
              newOwners.foreach(pair)
              if (r.own &&
                  prior.owners.length + newOwners.length < maxBucketOccupancy)
                newOwners += Owner(r.vec_id, r.label, r.embedding)
            }
          }
          val mergedSeen = mergeSorted(prior.seen, newSeen.toArray)
          state.update(
            SignState(
              prior.owners ++ newOwners,
              // bound the guard: keep the newest (largest) ids — see the
              // sliding-window contract in the scaladoc
              if (mergedSeen.length > maxSeenPerBucket)
                mergedSeen.takeRight(maxSeenPerBucket)
              else mergedSeen
            )
          )
          ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
          out.result().iterator
        }
      }
  }

  /** Media row shape the scrub stream ingests — the
    * [[graft.pipeline.Multimodal.mediaTable]] projection: opaque binary
    * payload plus its typed media_type.
    */
  final case class MediaRow(
      doc_id: Long,
      payload: Array[Byte],
      media_type: String
  )

  /** Scalar mirror of [[graft.pipeline.Multimodal.extractFeatures]]'s stub
    * arithmetic (law-checked in StreamingDedupSpec) plus the media_type →
    * label-cell mapping — the row-local map a real deployment swaps for
    * its vision/audio encoder; the batch shape around it is the contract.
    */
  def mediaVecOf(docId: Long, payload: Array[Byte], mediaType: String): Vec = {
    val n = payload.length.toLong
    Vec(
      docId,
      mediaType match { case "image" => 0; case "audio" => 1; case _ => 2 },
      Array.tabulate(8)(i => ((n * (i + 1)) % 97 + 1).toFloat)
    )
  }

  /** M6 continuous form — the perceptual media scrub stream: arriving
    * media rows are feature-extracted ROW-LOCALLY (the stub mirror) and
    * fed through [[embeddingNearDup]] with media_type as the label cell
    * at the m6 threshold. The emitted pairs ARE the scrub verdicts: a doc
    * appearing as `b` duplicates the earlier-arrived `a`, and under
    * monotone ingest ids min(a) over a doc's pairs is exactly the batch
    * keeper (keep-first — the exactDedup discipline on the perceptual
    * plane; the StreamingDedupSpec law pins streamed verdicts ≡ batch
    * [[graft.pipeline.Multimodal.mediaNearDup]] row-for-row). Same state
    * contract as [[embeddingNearDup]]: per-bucket owner vectors, sharded
    * by bucket key — the streaming analogue of the persisted LSH index.
    */
  def mediaScrubStream(
      spark: SparkSession,
      media: Dataset[MediaRow],
      threshold: Double = 0.9999999,
      nBits: Int = 12
  ): Dataset[NearDupOut] = {
    import spark.implicits._
    embeddingNearDup(
      spark,
      media.map(m => mediaVecOf(m.doc_id, m.payload, m.media_type)),
      threshold,
      nBits
    )
  }

  /** D12 continuous form — exact-substring span dedup over continuous
    * ingest: each micro-batch is CLEANED against the persisted span index
    * ([[graft.pipeline.Dedup.removeDupSpansAgainstIndex]]: stored-window
    * hits OR in-batch cross-doc dups), handed to `sink`, and then its own
    * windows are appended to the index
    * ([[graft.pipeline.Dedup.appendToSpanIndex]] — anti-joined, so the
    * stored set stays distinct). Like the batch incremental form the old
    * corpus never re-windows; per-batch cost is O(batch windows) plus one
    * fingerprint equi-join against the stored set.
    *
    * Semantics are PREFIX-dependent by design (the honest production
    * shape): a span's SECOND arrival is cleaned, its first — already
    * emitted — is not retroactively rewritten. The law
    * (StreamingDedupSpec) pins the stream to the sequential fold of the
    * batch APIs over the same chunks, and the cross-chunk case
    * non-vacuously: a chunk-2 doc duplicating a chunk-1 doc loses its
    * span.
    *
    * Clean-then-append inside one `foreachBatch` tick gives T1 ordering:
    * a replayed batch re-cleans against an index that already holds its
    * windows — its own windows now hit the index, BUT only windows shared
    * with ANOTHER doc were ever removed on first delivery… so replay
    * could remove MORE (a self-only window now reads as "stored"). Sinks
    * keyed on doc_id must therefore keep the FIRST emission per doc
    * (at-most-once adoption), the same contract as the replicator's
    * redelivery no-op.
    */
  def spanDedupStream(
      docs: org.apache.spark.sql.DataFrame,
      indexDir: String,
      checkpointDir: String,
      // continuous micro-batches: unlike searchStream this loop LIVES
      // across deliveries (AvailableNow would stop after the backlog)
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)
  )(
      sink: (org.apache.spark.sql.DataFrame, Long) => Unit
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // the batch source frame is consumed twice (clean + append):
        // pin it so the second pass can't re-pull the source
        val pinned = batch.localCheckpoint(true)
        // materialize the cleaned rows BEFORE the append mutates the
        // index — a lazy frame evaluated by the sink after the append
        // would read the batch's own windows as "stored"
        val cleaned = graft.pipeline.Eager.materialized(
          graft.pipeline.Dedup
            .removeDupSpansAgainstIndex(spark, indexDir, pinned)
        )
        sink(cleaned, batchId)
        graft.pipeline.Dedup.appendToSpanIndex(spark, indexDir, pinned)
        graft.pipeline.Eager.releaseCheckpoint(cleaned)
        graft.pipeline.Eager.releaseCheckpoint(pinned)
      }
      .start()

  /** D14's continuous form — keep-first paragraph dedup as documents
    * arrive: per micro-batch, clean against the persisted paragraph
    * index ([[graft.pipeline.Dedup.paragraphDedupAgainstIndex]] — batch
    * winners kept, index hits cut), emit, then append the batch's chunk
    * fingerprints so later batches lose to this one. Same
    * clean-then-append discipline (and the same materialize-before-
    * mutate hazard) as [[spanDedupStream]]; for doc_id-monotone arrivals
    * the fold equals the global batch keep-first, chunk boundaries
    * invisible (law in StreamingDedupSpec).
    */
  def paragraphDedupStream(
      docs: org.apache.spark.sql.DataFrame,
      indexDir: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)
  )(
      sink: (org.apache.spark.sql.DataFrame, Long) => Unit
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val pinned = batch.localCheckpoint(true)
        val cleaned = graft.pipeline.Eager.materialized(
          graft.pipeline.Dedup
            .paragraphDedupAgainstIndex(spark, indexDir, pinned)
        )
        sink(cleaned, batchId)
        graft.pipeline.Dedup.appendToParagraphIndex(spark, indexDir, pinned)
        graft.pipeline.Eager.releaseCheckpoint(cleaned)
        graft.pipeline.Eager.releaseCheckpoint(pinned)
      }
      .start()
}
