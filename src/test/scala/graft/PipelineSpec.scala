package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Sampling, Similarity, TextAnalysis}

/** Invariant specs for the pipeline operators whose hash-oracle can't be
  * expressed in DuckDB (xxhash64-based MinHash/SimHash/LSH).
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-pipeline-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // the driver testdata stores naive (isAdjustedToUTC=false) micros;
      // read them as TIMESTAMP so epoch extraction matches the DuckDB oracle
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("minhash pairs are symmetric-free, ordered, above threshold") {
    val pairs = Dedup.minhashPairs(spark, sfDir).cache()
    assert(pairs.filter(col("a") >= col("b")).count() == 0)
    assert(pairs.filter(col("jaccard") < 0.5).count() == 0)
    assert(pairs.count() > 0) // the synthetic corpus contains near-dups
  }

  test("minhash candidates contain every very-high-jaccard pair (recall)") {
    // brute-force ground truth on a small prefix of the corpus
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 200)
    val sh = Dedup.shingles(docs).cache()
    val all = sh
      .toDF("a", "shingle")
      .join(sh.toDF("b", "shingle"), Seq("shingle"))
      .filter(col("a") < col("b"))
      .distinct()
      .select("a", "b")
    val truth = Dedup
      .verifyJaccard(all, sh, 0.9)
      .select("a", "b")
    val found = Dedup
      .minhashPairs(spark, sfDir)
      .filter(col("a") < 200 && col("b") < 200)
      .select("a", "b")
    assert(truth.exceptAll(found).count() == 0)
  }

  test("connected components assign one min-label per cluster") {
    val sp = spark
    import sp.implicits._
    // two triangles + an isolated edge + a chain: known components
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // component min=1
      (10L, 11L), (11L, 12L),       // chain, min=10
      (20L, 21L),                   // pair, min=20
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 34L) // longer chain, min=30
    ).toDF("a", "b")
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L, 34L -> 30L
    )
    // driver union-find path AND distributed label-propagation path
    for (threshold <- Seq(1L << 20, 0L)) {
      val got = graft.pipeline.Dedup
        .components(pairs, localThreshold = threshold)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == want, s"threshold=$threshold")
    }
  }

  test("star-contraction CC collapses a 300-node chain (diameter >> rounds)") {
    val sp = spark
    import sp.implicits._
    // a path graph is the adversarial case for label propagation
    // (O(diameter) rounds); large-star/small-star must still converge
    // within the default iteration budget, labels = chain min
    val base = 1000L
    val pairs =
      (0L until 299L).map(i => (base + i, base + i + 1)).toDF("a", "b")
    val got = graft.pipeline.Dedup
      .components(pairs, localThreshold = 0L)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got.size == 300)
    assert(got.values.forall(_ == base))
  }

  test("near-dup clusters keep exactly one doc per cluster") {
    val cl = graft.pipeline.Dedup.nearDupClusters(spark, sfDir).cache()
    assert(cl.count() > 0)
    import org.apache.spark.sql.functions._
    val perCluster = cl.groupBy("label")
      .agg(sum(col("keep").cast("int")).as("keepers"))
    assert(perCluster.filter(col("keepers") =!= 1).count() == 0)
  }

  test("canonical selection keeps the argmax-quality member per cluster") {
    import org.apache.spark.sql.functions._
    val sel = graft.pipeline.Dedup.canonicalSelection(spark, sfDir).cache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // covers every doc exactly once
    assert(sel.count() == docs.count())
    // exactly one kept doc per cluster, and it is in the cluster
    val perCluster = sel
      .groupBy("label")
      .agg(
        sum(col("kept").cast("int")).as("keepers"),
        max(struct(col("n_words"), -col("doc_id"))).as("best"),
        first(when(col("kept"), struct(col("n_words"), -col("doc_id"))),
          ignoreNulls = true).as("chosen")
      )
    assert(perCluster.filter(col("keepers") =!= 1).count() == 0)
    // the kept member is the cluster's (n_words desc, doc_id asc) argmax
    assert(perCluster.filter(col("best") =!= col("chosen")).count() == 0)
    // cluster structure agrees with d5 (same labels), only the survivor
    // choice differs
    val d5 = graft.pipeline.Dedup.nearDupClusters(spark, sfDir)
      .select(col("doc_id"), col("label").as("l5"))
    val joined = sel.join(d5, "doc_id")
    assert(joined.filter(col("label") =!= col("l5")).count() == 0)
    sel.unpersist(false)
  }

  test("simhash: hamming distance 0 pairs are exact-signature matches") {
    val pairs = Dedup.simhashPairs(spark, sfDir).cache()
    assert(pairs.filter(col("dist") < 0).count() == 0)
    assert(pairs.filter(col("dist") > 8).count() == 0)
    assert(pairs.count() > 0)
  }

  test("lsh buckets cover every vector exactly once") {
    val buckets = Similarity.lshBuckets(spark, sfDir)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(buckets.count() == n)
    assert(buckets.select("vec_id").distinct().count() == n)
  }

  test("lsh knn finds a nonempty, exactly-scored candidate top-k") {
    import org.apache.spark.sql.functions._
    val lsh = Similarity.knnLsh(spark, sfDir, nBits = 6).cache()
    assert(lsh.count() > 0)
    // every reported neighbor's sim must equal the brute-force sim for
    // that exact pair (the approximation is only in candidate coverage)
    val brute = Similarity
      .knnBruteForce(spark, sfDir, k = 500)
      .select(col("qid"), col("vec_id"), col("sim").as("bsim"))
    val joined = lsh.join(brute, Seq("qid", "vec_id"))
    assert(joined.filter(col("sim") =!= col("bsim")).count() == 0)
  }

  test("trained ivf probing every cell IS brute force (assignment partitions the corpus)") {
    import org.apache.spark.sql.functions._
    // probing all kCentroids cells covers every vector regardless of the
    // learned centroid values, and both paths share scoring + tie-break,
    // so the outputs must be row-identical — this also proves assignment
    // is a partition (a dropped or doubled vector would break equality)
    val all = Similarity
      .knnIvfTrained(spark, sfDir, kCentroids = 8, iters = 2, nprobe = 8)
    val brute = Similarity.knnBruteForce(spark, sfDir)
    assert(all.exceptAll(brute).count() == 0)
    assert(brute.exceptAll(all).count() == 0)
  }

  test("trained ivf at nprobe=2 keeps exact per-pair sims and real recall") {
    import org.apache.spark.sql.functions._
    val ivf = Similarity
      .knnIvfTrained(spark, sfDir, kCentroids = 8, iters = 2, nprobe = 2)
      .cache()
    val brute = Similarity.knnBruteForce(spark, sfDir).cache()
    try {
      // reported sims are EXACT cosines (approximation is coverage only)
      val exact = brute.select(
        col("qid"), col("vec_id"), col("sim").as("bsim"))
      assert(
        ivf.join(exact, Seq("qid", "vec_id"))
          .filter(col("sim") =!= col("bsim"))
          .count() == 0
      )
      // recall floor: nprobe=2 of 8 cells must still find most of the
      // true top-k (the corpus is clustered; a broken quantizer would
      // send near-neighbors to unprobed cells and recall would collapse)
      val hits = ivf
        .select("qid", "vec_id")
        .intersect(brute.select("qid", "vec_id"))
        .count()
      val total = brute.count()
      assert(hits.toDouble / total >= 0.5, s"recall ${hits.toDouble / total}")
    } finally { ivf.unpersist(false); brute.unpersist(false) }
  }

  test("int8 quantization: codes bounded, dequant error within half a step") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = d.select(
      col("vec_id"),
      col("embedding"),
      Similarity.quantize(col("embedding")).as("codes")
    )
    // codes in [-127, 127]
    val outOfRange = q
      .select(explode(col("codes")).as("c"))
      .filter(col("c") > 127 || col("c") < -127)
    assert(outOfRange.count() == 0)
    // |v - c/scale| <= step/2 + eps, step = max_abs/127
    val err = q
      .withColumn(
        "max_abs",
        array_max(transform(col("embedding"), x => abs(x.cast("double"))))
      )
      .withColumn(
        "bad",
        size(
          filter(
            zip_with(
              col("embedding"),
              col("codes"),
              (v, c) =>
                abs(v.cast("double") - c * (col("max_abs") / 127.0)) >
                  (col("max_abs") / 127.0) * 0.5000001
            ),
            x => x
          )
        )
      )
      .filter(col("max_abs") > 0 && col("bad") > 0)
    assert(err.count() == 0)
  }

  test("quantized knn keeps high overlap with exact float search") {
    val exact = Similarity.knnBruteForce(spark, sfDir).select("qid", "vec_id")
    val quant = Similarity.knnQuantized(spark, sfDir).select("qid", "vec_id")
    val overlap = exact.intersect(quant).count().toDouble / exact.count()
    assert(overlap >= 0.8, s"quantized recall $overlap")
  }

  test("ivf knn results are a subset of brute-force candidate space") {
    val ivf = Similarity.knnIvf(spark, sfDir).select("qid", "vec_id")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val labels = emb.select(col("vec_id"), col("label"))
    // every ivf neighbor shares the query's label
    val bad = ivf
      .join(labels.toDF("vec_id", "nl"), "vec_id")
      .join(
        labels.toDF("qid", "ql"),
        "qid"
      )
      .filter(col("nl") =!= col("ql"))
    assert(bad.count() == 0)
  }

  test("pq: codebook vectors code to themselves at distance zero") {
    val pq = Similarity.pqCodes(spark, sfDir)
    val self = pq.filter(col("vec_id") < 16).collect()
    assert(self.length == 16 * 4)
    assert(self.forall(r => r.getAs[Long]("code") == r.getAs[Long]("vec_id")))
    assert(self.forall(_.getAs[Long]("dist") == 0L))
  }

  test("pq assignment is the true argmin: chosen dist <= every codebook dist") {
    // recompute all (vec, sub, cid) distances driver-side for a sample
    val pq = Similarity.pqCodes(spark, sfDir)
      .filter(col("vec_id") < 60)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1)) -> (r.getAs[Long]("code"), r.getAs[Long]("dist"))
      )
      .toMap
    val q8 = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q8"))
      .filter(col("vec_id") < 60)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val subDim = q8.head._2.length / 4
    def sub(v: Array[Long], s: Int) = v.slice(s * subDim, (s + 1) * subDim)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (v <- q8.keys; s <- 0 until 4) {
      val dists = (0L until 16L)
        .map(c => (d2(sub(q8(v), s), sub(q8(c), s)), c))
        .sorted
      assert(pq((v, s.toLong)) == ((dists.head._2, dists.head._1)), s"v=$v s=$s")
    }
  }

  test("adc knn reports the true bottom-k of the lookup-table distance") {
    val q8 = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q8"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val subDim = q8.head._2.length / 4
    def sub(v: Array[Long], s: Int) = v.slice(s * subDim, (s + 1) * subDim)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // driver-side PQ: codes then ADC distances
    def code(v: Long, s: Int): Long =
      (0L until 16L).map(c => (d2(sub(q8(v), s), sub(q8(c), s)), c)).min._2
    def adist(q: Long, v: Long): Long =
      (0 until 4).map(s => d2(sub(q8(q), s), sub(q8(code(v, s).toLong), s))).sum
    val got = Similarity
      .knnPq(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // every reported distance decomposes exactly, and rank r's distance is
    // the r-th smallest over the whole corpus (ties by vec_id)
    val byQ = got.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val all = q8.keys.filter(_ != q).map(v => (adist(q, v), v)).toSeq.sorted
      rows.sortBy(_._3).zip(all.take(rows.length)).foreach {
        case ((_, v, _, ad), (wantD, wantV)) =>
          assert(v == wantV && ad == wantD, s"q=$q")
      }
    }
  }

  test("ivf-pq is exactly the adc search restricted to the query's cell") {
    val base = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(
        col("vec_id"),
        col("label"),
        Similarity.quantize(col("embedding")).as("q8")
      )
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Long](2).toArray))
      .toMap
    val subDim = base.head._2._2.length / 4
    def sub(v: Array[Long], s: Int) = v.slice(s * subDim, (s + 1) * subDim)
    def d2(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def code(v: Long, s: Int): Long =
      (0L until 16L).map(c => (d2(sub(base(v)._2, s), sub(base(c)._2, s)), c)).min._2
    def adist(q: Long, v: Long): Long =
      (0 until 4)
        .map(s => d2(sub(base(q)._2, s), sub(base(code(v, s).toLong)._2, s)))
        .sum
    val got = Similarity
      .knnIvfPq(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val cell = base(q)._1
      val want = base.keys
        .filter(v => v != q && base(v)._1 == cell)
        .map(v => (adist(q, v), v))
        .toSeq
        .sorted
      rows.sortBy(_._3).zip(want.take(rows.length)).foreach {
        case ((_, v, _, ad), (wantD, wantV)) =>
          assert(v == wantV && ad == wantD, s"q=$q cell=$cell")
      }
    }
  }

  test("exact-integer trained ivf: probe-all = integer brute force, recall tracks float") {
    // ground truth: driver-side integer brute force over the q8 codes
    val q8 = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q8"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    // the fixed-point cosine key, replayed driver-side: within a query,
    // cosine order = order of sign(dot)·dot²·2²⁰ DIV ‖v‖² (query norm is
    // a common positive factor; truncation only coarsens ties)
    def key(q: Array[Long], v: Array[Long]): Long = {
      val dot = q.zip(v).map { case (a, b) => a * b }.sum
      val n2 = v.map(x => x * x).sum
      if (n2 == 0L) 0L
      else {
        val m = dot * dot * (1L << 20) / n2
        if (dot >= 0L) m else -m
      }
    }
    def bruteInt(q: Long, k: Int): Seq[Long] =
      q8.keys.filter(_ != q).map(v => (-key(q8(q), q8(v)), v)).toSeq.sorted
        .take(k).map(_._2)

    // probing every cell IS integer brute force (assignment partitions
    // the corpus whatever the centroids) — exact rows, scores included
    val all = Similarity
      .knnIvfTrainedExact(spark, sfDir, nprobe = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(all.nonEmpty)
    all.groupBy(_._1).foreach { case (q, rows) =>
      val want = bruteInt(q, rows.length)
      rows.sortBy(_._3).map(_._2).zip(want).foreach { case (got, exp) =>
        assert(got == exp, s"q=$q")
      }
      rows.foreach { case (_, v, _, s) => assert(s == key(q8(q), q8(v))) }
    }

    // recall floor at the canonical nprobe=2, against FLOAT brute cosine —
    // the same gate the float variant carries; measured values land in
    // NOTES for the k5 oracle-graduation decision
    val bruteCos = Similarity
      .knnBruteForce(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    def recallOf(rows: Array[(Long, Long)]): Double = {
      val byQ = rows.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
      val hits = bruteCos.toSeq.map { case (q, want) =>
        byQ.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
      }
      hits.sum / hits.size
    }
    val intRecall = recallOf(
      Similarity
        .knnIvfTrainedExact(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    )
    val floatRecall = recallOf(
      Similarity
        .knnIvfTrained(spark, sfDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    )
    info(f"recall@5 vs float brute cosine: int=$intRecall%.3f float=$floatRecall%.3f")
    assert(intRecall >= 0.5)
  }

  test("d10 fingerprint shuffle is row-identical to the window-text form") {
    // the 100 TB form shuffles a 16-byte dual poly-hash struct instead of
    // the L-word window text; on this corpus (collision-free by
    // construction) every output row must be bit-identical
    def rows(fp: Boolean) = Dedup
      .dupSpans(spark, sfDir, fingerprint = fp)
      .collect()
      .map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5))
      )
      .toSeq
    val text = rows(fp = false)
    val hashed = rows(fp = true)
    assert(text.nonEmpty)
    assert(hashed == text)
  }

  test("ivf-pq plan never broadcasts the unfiltered corpus") {
    // At 10⁹ vectors any broadcast whose input is the whole embeddings
    // table is a scale-killer. Disable size-based auto-broadcast so the
    // only BroadcastExchanges left are the ones knnIvfPq *hints* — each
    // must scan embeddings under a pushed vec_id bound (query set or
    // codebook prefix), never the bare corpus.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // pin the UNCACHED plan: an earlier k5/k13/k14 test may have left the
    // session train memo's codes cache alive, which re-routes the
    // embeddings legs through InMemoryRelation and hides the pushed
    // vec_id bound this spec detects on the parquet scan
    Similarity.releaseTrainMemo()
    try {
      val df = Similarity.knnIvfPq(spark, sfDir)
      val broadcasts = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      assert(broadcasts.nonEmpty)
      broadcasts.foreach { b =>
        val sub = b.child.toString
        if (sub.contains("embeddings")) {
          assert(
            sub.contains("LessThan(vec_id"),
            s"broadcast subtree scans embeddings without a vec_id bound:\n$sub"
          )
        }
      }
      // and the bounded plan still produces the oracle-checked result
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("k11 rerank = exact cosine-key order over the ivf-pq shortlist") {
    val q8 = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q8"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    def key(q: Array[Long], v: Array[Long]): Long = {
      val dot = q.zip(v).map { case (a, b) => a * b }.sum
      val n2 = v.map(x => x * x).sum
      if (n2 == 0L) 0L
      else {
        val m = dot * dot * (1L << 20) / n2
        if (dot >= 0L) m else -m
      }
    }
    // stage 1 replay: the shortlist IS knnIvfPq at k = shortlist
    val short = Similarity
      .knnIvfPq(spark, sfDir, k = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val got = Similarity
      .knnIvfPqRerank(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      // every returned row comes from the shortlist, scored by the
      // exact integer key (ADC decided membership, never the order)
      rows.foreach { case (_, v, _, s) =>
        assert(short(q).contains(v), s"q=$q v=$v not in shortlist")
        assert(s == key(q8(q), q8(v)), s"q=$q v=$v score mismatch")
      }
      // and the order is the exact-key order over the WHOLE shortlist
      val want = short(q).toSeq
        .map(v => (-key(q8(q), q8(v)), v))
        .sorted
        .take(rows.length)
        .map(_._2)
      assert(rows.sortBy(_._3).map(_._2).toSeq == want, s"q=$q")
    }
  }

  test("d12 removal invariants: word accounting and short-doc passthrough") {
    val out = Dedup.removeDupSpans(spark, sfDir).cache()
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        expr("filter(split(text, ' '), x -> x <> '')").as("ws")
      )
    // every doc with at least one word appears exactly once
    assert(out.count() == docs.filter(size(col("ws")) >= 1).count())
    // n_removed + surviving words == n_words, for every doc (kept words
    // counted from the cleaned string itself)
    val bad = out
      .withColumn(
        "kept",
        size(expr("filter(split(cleaned_text, ' '), x -> x <> '')"))
      )
      .filter(col("kept") + col("n_removed") =!= col("n_words"))
    assert(bad.count() == 0)
    // docs shorter than L have no windows: pass through verbatim
    val short = out
      .join(docs, "doc_id")
      .filter(size(col("ws")) < 10)
      .filter(
        col("n_removed") =!= 0L ||
          col("cleaned_text") =!= array_join(col("ws"), " ")
      )
    assert(short.count() == 0)
    // the corpus contains planted near-dups: something must be removed
    assert(out.filter(col("n_removed") > 0).count() > 0)
    out.unpersist()
  }

  test("d12 removes exactly the cross-doc shared span, not its context") {
    // two docs share a verbatim 12-word sentence inside distinct contexts:
    // dup windows are exactly the 3 starts inside the span, so coverage is
    // exactly the 12 shared positions — contexts survive untouched
    val span = (1 to 12).map(i => s"shared$i").mkString(" ")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-d12")
      .toString
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, s"alpha beta gamma $span tail one two", "en", "srcA", 0L),
      (2L, s"delta epsilon $span coda three four five", "en", "srcB", 0L),
      (3L, "totally unrelated words only here once", "en", "srcA", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val out = Dedup
      .removeDupSpans(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((12L, "alpha beta gamma tail one two")))
    assert(out(2L) == ((12L, "delta epsilon coda three four five")))
    assert(out(3L) == ((0L, "totally unrelated words only here once")))
  }

  test("d12 fingerprint keys are row-identical to the text form") {
    // the 16-byte dual poly-hash shuffle key must not change a single
    // output row — cleaned TEXT included (collision-free on this corpus
    // by construction, the same d10 guarantee)
    val txt = Dedup.removeDupSpans(spark, sfDir).collect().toSeq
    val fp = Dedup
      .removeDupSpans(spark, sfDir, fingerprint = true)
      .collect()
      .toSeq
    assert(txt == fp)
  }

  test("d13 keeps the first occurrence and cuts only later repeats") {
    // "menu" block repeated twice inside one doc: the SECOND copy's span
    // is removed, the first survives with its context; cross-doc repeats
    // are NOT d13's business (doc 2 shares doc 1's block, untouched)
    val block = "home about products contact"
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-d13")
      .toString
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, s"intro $block middle words here $block outro", "en", "s", 0L),
      (2L, s"other page $block different tail", "en", "s", 0L),
      (3L, "no repeats at all in this one", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val out = Dedup
      .removeRepeatedSpans(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(
      out(1L) ==
        ((4L, s"intro $block middle words here outro"))
    )
    assert(out(2L) == ((0L, s"other page $block different tail")))
    assert(out(3L) == ((0L, "no repeats at all in this one")))
    // invariant on the real corpus: accounting holds and the op is
    // non-vacuous at L=3
    val corpus = Dedup.removeRepeatedSpans(spark, sfDir).cache()
    val bad = corpus
      .withColumn(
        "kept",
        size(expr("filter(split(cleaned_text, ' '), x -> x <> '')"))
      )
      .filter(col("kept") + col("n_removed") =!= col("n_words"))
    assert(bad.count() == 0)
    assert(corpus.filter(col("n_removed") > 0).count() > 0)
    corpus.unpersist()
  }

  test("p27 report counts planted exact dups and span mass; short-only source zeroes") {
    // the gate corpora contain ZERO exact duplicates, so the d1-plane
    // columns are vacuously 0 in every oracle run — this fixture is the
    // non-vacuous check: a source with a verbatim pair (exact dup AND
    // full span dup) and a source whose docs are all shorter than L
    // (exercising the left-join-miss / coalesce path)
    val a = (1 to 15).map(i => s"w$i").mkString(" ") // 15 words → 6 windows
    val b = (1 to 12).map(i => s"u$i").mkString(" ") // 12 words → 3 windows
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-p27")
      .toString
    val sp = spark
    import sp.implicits._
    Seq(
      (1L, a, "en", "dup", 0L),
      (2L, a, "en", "dup", 0L), // exact duplicate of 1
      (3L, b, "en", "dup", 0L),
      (4L, "tiny doc", "en", "short", 0L),
      (5L, "another small one", "en", "short", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write
      .mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val got = Dedup
      .dedupReport(spark, tmp)
      .collect()
      .map(r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6)))
      )
      .toMap
    // dup: 3 docs, 1 non-canonical copy, 2 in the dup group; docs 1+2
    // contribute 6 windows each (all cross-doc dup), doc 3 adds 3 unique
    assert(got("dup") == ((3L, 1L, 2L, 15L, 12L, 12.0 / 15.0)))
    // short: no doc reaches L=10 words → span side is the coalesced zero
    assert(got("short") == ((2L, 0L, 0L, 0L, 0L, 0.0)))
    // the same vacuity applies to d1 itself on the gate corpora (zero
    // byte-identical texts there): pin its per-row assignment on the
    // planted pair — min-id canonical, only the later copy flagged
    val d1 = Dedup
      .exact(spark, tmp)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    assert(d1(1L) == ((1L, true, false)))  // canonical of the dup group
    assert(d1(2L) == ((1L, true, true)))   // the non-canonical copy
    assert(d1(3L) == ((3L, false, false)))
    assert(d1(4L) == ((4L, false, false)))
  }

  test("skew-safe window counting is row-identical for d10 and d12") {
    // the agg+join nd (AQE-splittable at a boilerplate hot key) must not
    // change a single row of either operator vs the COUNT OVER form
    val d10a = Dedup.dupSpans(spark, sfDir).collect().toSeq
    val d10b = Dedup.dupSpans(spark, sfDir, skewSafe = true).collect().toSeq
    assert(d10a == d10b)
    val d12a = Dedup.removeDupSpans(spark, sfDir).collect().toSeq
    val d12b =
      Dedup.removeDupSpans(spark, sfDir, skewSafe = true).collect().toSeq
    assert(d12a == d12b)
  }

  test("d12 coverage agrees with d10's dup-position signal") {
    // a doc loses words iff d10 sees dup window positions in it
    val removed = Dedup
      .removeDupSpans(spark, sfDir)
      .select(col("doc_id"), (col("n_removed") > 0).as("any_removed"))
    val spans = Dedup
      .dupSpans(spark, sfDir)
      .select(col("doc_id"), (col("dup_positions") > 0).as("any_dup"))
    // d10 drops docs shorter than L; join on the common support
    val joined = removed.join(spans, "doc_id")
    assert(joined.filter(col("any_removed") =!= col("any_dup")).count() == 0)
  }

  test("p26 affinity ranks the target source above its corpus share") {
    val top = graft.pipeline.Sampling.targetAffinity(spark, sfDir).cache()
    assert(top.count() == 100)
    // integer accounting holds on every row
    assert(
      top.filter(expr("avg_w <> score DIV n_tokens")).count() == 0
    )
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val srcShare = docs.filter(col("source") === "src18").count().toDouble /
      docs.count()
    val topShare = top
      .join(docs.select("doc_id", "source"), "doc_id")
      .filter(col("source") === "src18")
      .count()
      .toDouble / 100.0
    // the importance weights must pull the target domain up — strictly
    // above its base rate (DSIR's whole point), not marginally
    assert(
      topShare > srcShare * 2,
      s"topShare=$topShare srcShare=$srcShare"
    )
    top.unpersist()
  }

  test("p26 row-local scorer reproduces the join-based ranking exactly") {
    // the streaming-form scorer (frozen dense weight array, one HOF fold
    // per row, zero shuffle) must induce the same top-100 as the
    // join-based query — weights, scores, ordering, everything
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val weights = graft.pipeline.Sampling.affinityWeights(spark, d)
    val local = graft.pipeline.Sampling
      .affinityScoreLocal(d, weights)
      .orderBy(col("avg_w").desc, col("doc_id"))
      .limit(100)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val joined = graft.pipeline.Sampling
      .targetAffinity(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(local == joined)
  }

  test("p26 is invariant to input partitioning") {
    val a = graft.pipeline.Sampling
      .targetAffinity(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val spark2 = spark.newSession()
    spark2.conf.set("spark.sql.shuffle.partitions", "7")
    val b = graft.pipeline.Sampling
      .targetAffinity(spark2, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("d14 keeps the globally first paragraph occurrence, cuts every later one") {
    val sp = spark
    import sp.implicits._
    // chunkWords = 4 fixture: doc 1 owns chunk B at j=1; doc 2 repeats it
    // at j=0 (loses — doc 1 is globally first); doc 3 is a verbatim copy
    // of doc 1 (keeps NOTHING); doc 4 repeats its own chunk in-doc (the
    // later copy loses to the earlier j); doc 5's 1-word tail chunk
    // survives alongside its full head chunk
    val d = Seq(
      (1L, "a1 a2 a3 a4 b1 b2 b3 b4"),
      (2L, "b1 b2 b3 b4 c1 c2 c3 c4"),
      (3L, "a1 a2 a3 a4 b1 b2 b3 b4"),
      (4L, "d1 d2 d3 d4 d1 d2 d3 d4"),
      (5L, "e1 e2 e3 e4 e5")
    ).toDF("doc_id", "text")
    val out = Dedup
      .paragraphDedupOf(d, chunkWords = 4)
      .collect()
      .map(r =>
        r.getLong(0) ->
          ((r.getLong(2), r.getLong(3), r.getString(4)))
      )
      .toMap
    assert(out(1L) == ((2L, 2L, "a1 a2 a3 a4 b1 b2 b3 b4")))
    assert(out(2L) == ((2L, 1L, "c1 c2 c3 c4")))
    assert(out(3L) == ((2L, 0L, "")))
    assert(out(4L) == ((2L, 1L, "d1 d2 d3 d4")))
    assert(out(5L) == ((2L, 2L, "e1 e2 e3 e4 e5")))
  }

  test("d14 kept paragraphs are globally distinct and account exactly") {
    val out = Dedup.paragraphDedup(spark, sfDir).cache()
    // every tokenizable doc appears exactly once
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(expr("filter(split(text, ' '), x -> x <> '')").as("ws"))
      .filter(size(col("ws")) >= 1)
    assert(out.count() == docs.count())
    // sum(n_kept) == corpus-wide distinct paragraph count: keep-first
    // retains exactly one occurrence per distinct paragraph value
    val distinctChunks = docs
      .select(
        explode(
          expr(
            "transform(sequence(0, (size(ws) - 1) div 20), " +
              "j -> array_join(slice(ws, j * 20 + 1, 20), ' '))"
          )
        ).as("chunk")
      )
      .distinct()
      .count()
    val kept =
      out.agg(sum(col("n_kept"))).head().getLong(0)
    assert(kept == distinctChunks)
    // the corpus has planted duplicate docs: something must be cut
    assert(out.filter(col("n_kept") < col("n_chunks")).count() > 0)
    out.unpersist()
  }

  test("d14 fingerprint mode is row-identical to the paragraph-text form") {
    val txt = Dedup.paragraphDedup(spark, sfDir).collect().toSeq
    val fp =
      Dedup.paragraphDedup(spark, sfDir, fingerprint = true).collect().toSeq
    assert(txt == fp)
  }

  test("k12 recall report matches an independent set-based recomputation") {
    val report = Similarity
      .recallReport(spark, sfDir)
      .collect()
      .map(r =>
        r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getDouble(5))
      )
      .toMap
    val truth = Similarity
      .knnBruteForce(spark, sfDir)
      .select("qid", "vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val methods = Map(
      "ivf" -> Similarity.knnIvf(spark, sfDir),
      "ivfpq" -> Similarity.knnIvfPq(spark, sfDir),
      "lsh" -> Similarity.knnLsh(spark, sfDir),
      "pq" -> Similarity.knnPq(spark, sfDir)
    )
    assert(report.keySet == methods.keySet)
    for ((m, df) <- methods) {
      val got = df
        .select("qid", "vec_id")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size) // each method emits distinct rows
      val hits = got.count(truth.contains)
      val (nq, nr, nh, nt, rec) = report(m)
      assert(nq == got.map(_._1).distinct.length.toLong)
      assert(nr == got.length.toLong)
      assert(nh == hits.toLong)
      assert(nt == truth.size.toLong)
      assert(rec == hits.toDouble / truth.size)
      assert(rec > 0.0 && rec <= 1.0)
    }
  }

  test("k13 cell stats equal an independent in-memory recomputation") {
    val report = Similarity
      .ivfCellStats(spark, sfDir)
      .collect()
      .map { r =>
        r.getLong(0) -> (
          r.getLong(1),
          r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)),
          r.getLong(5)
        )
      }
      .toMap
    // independent model: same trained centroids, but assignment, cohesion
    // keys and the rollup recomputed in plain Scala from the raw codes
    val codesDf =
      Similarity.quantized(spark, sfDir).select(col("vec_id"), col("q8"))
    val cents = Similarity.trainCentroidsExact(codesDf, 16, 3)
    val codes = codesDf
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector)
    def key(v: Vector[Long], c: Seq[Long]): Long = {
      val dot = v.iterator.zip(c.iterator).map { case (a, b) => a * b }.sum
      val n2 = c.map(x => x * x).sum
      if (n2 == 0L) 0L
      else {
        val mag = dot * dot * (1L << 20) / n2
        if (dot >= 0L) mag else -mag
      }
    }
    val assigned = codes.map { case (_, v) =>
      cents
        .map { case (cid, c) => (key(v, c), -cid.toLong) }
        .max // max key, ties to the LOWEST cid via -cid
    }
    val byCell = assigned.groupBy { case (_, negCid) => -negCid }
    val nTotal = codes.length.toLong
    for (cid <- 0L until 16L) {
      val (nv, ppm, mn, mean, nt) = report(cid)
      byCell.get(cid) match {
        case Some(ks) =>
          assert(nv == ks.length.toLong)
          assert(mn.contains(ks.map(_._1).min))
          assert(mean.contains(ks.map(_._1).sum / ks.length))
        case None =>
          assert(nv == 0L && mn.isEmpty && mean.isEmpty)
      }
      assert(ppm == nv * 1000000L / nTotal)
      assert(nt == nTotal)
    }
    assert(report.values.map(_._1).sum == nTotal)
  }

  test("p30b freezes old splits and adopts new docs into their clusters") {
    val out = Sampling.leakFreeSplitIncremental(spark, sfDir).cache()
    val (oldDocs, _) = Dedup.incrementalSplit(spark, sfDir)
    val boundary = Dedup.incrementalBoundary(spark, sfDir)
    // stability: the old rows equal the assignment computed from the OLD
    // corpus alone (exercises pair-locality: restricting the combined
    // pair set to old ids ≡ running LSH on the old corpus by itself)
    val oldAlone = {
      val labels = Dedup
        .components(Dedup.pairsOf(oldDocs))
        .select(col("doc_id"), col("label"))
      oldDocs
        .select("doc_id")
        .join(labels, Seq("doc_id"), "left")
        .withColumn("label", coalesce(col("label"), col("doc_id")))
        .select(
          col("doc_id"),
          col("label"),
          Sampling.splitOf(col("label"), 300L, 300L).as("split")
        )
    }
    val oldRows = out
      .filter(!col("is_new"))
      .select("doc_id", "label", "split")
    assert(oldRows.exceptAll(oldAlone).count() == 0)
    assert(oldAlone.exceptAll(oldRows).count() == 0)
    // the planted seed copies (ids >= 1e6) are verbatim dups of old docs
    // 0..9: all adopted, and absent a reported conflict their split IS
    // the frozen split of their source doc
    val seeds = out.filter(col("doc_id") >= 1000000L).collect()
    assert(seeds.length == 10 && seeds.forall(_.getAs[Boolean]("adopted")))
    val oldSplit = oldRows
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .toMap
    for (s <- seeds if !s.getAs[Boolean]("conflict"))
      assert(s.getString(2) == oldSplit(s.getLong(0) - 1000000L))
    // old docs are never flagged adopted; every doc appears exactly once
    assert(out.filter(!col("is_new") && col("adopted")).count() == 0)
    assert(out.select("doc_id").distinct().count() == out.count())
    assert(out.filter(col("doc_id") < boundary).count() ==
      oldDocs.count())
    out.unpersist()
  }

  // independent model of the p31 loop: plain-Scala pair counting and the
  // sequential leftmost-first fold — no Spark expressions, no SQL
  private def bpeModel(
      docs: Seq[Seq[String]],
      nMerges: Int
  ): Seq[(Long, String, String, String, Long)] = {
    var st = docs
    val out =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      st.foreach(ts =>
        ts.iterator.zip(ts.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + 1L
        }
      )
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) =
          counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((step.toLong, a, b, a + " " + b, n))
        st = st.map { ts =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          ts.foreach { t =>
            if (acc.nonEmpty && acc.last == a && t == b)
              acc(acc.size - 1) = a + " " + b
            else acc += t
          }
          acc.toSeq
        }
      }
      step += 1
    }
    out.toSeq
  }

  test("p31 merge table equals an independent in-memory BPE model") {
    val corpus = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("text")
      .collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
      .toSeq
    val want = bpeModel(corpus, 8)
    val got = TextAnalysis
      .phraseMerges(spark, sfDir)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4))
      )
      .toSeq
    assert(want.nonEmpty && got == want)
  }

  test("p32 per-doc compression equals the model's final state") {
    // replay the model loop but keep the final corpus state
    def modelState(
        docs: Seq[Seq[String]],
        nMerges: Int
    ): Seq[Seq[String]] = {
      var st = docs
      for (_ <- 1 to nMerges) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        st.foreach(ts =>
          ts.iterator.zip(ts.iterator.drop(1)).foreach { p =>
            counts(p) = counts.getOrElse(p, 0L) + 1L
          }
        )
        if (counts.nonEmpty) {
          val ((a, b), _) =
            counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
          st = st.map { ts =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            ts.foreach { t =>
              if (acc.nonEmpty && acc.last == a && t == b)
                acc(acc.size - 1) = a + " " + b
              else acc += t
            }
            acc.toSeq
          }
        }
      }
      st
    }
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .sortBy(_._1)
    val toks = docs.map(_._2.split(" ").filter(_.nonEmpty).toSeq)
    val finalState = modelState(toks.toSeq, 8)
    val want = docs.map(_._1).zip(toks.map(_.size.toLong)).zip(
      finalState.map(_.size.toLong)
    ).map { case ((id, nb), na) => (id, nb, na, nb - na) }.toSeq
    val got = TextAnalysis
      .phraseCompression(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    assert(got.map(_._4).sum > 0) // the corpus actually compresses
  }

  test("p31 fold merges equal-token runs at alternating positions") {
    val ss = spark
    import ss.implicits._
    val docs =
      Seq((0L, "x x x x x"), (1L, "x x"), (2L, "y x x y"))
    val got = TextAnalysis
      .phraseMergesOf(spark, docs.toDF("doc_id", "text"), 2)
      .collect()
      .map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
          r.getLong(4))
      )
      .toSeq
    // round 1: (x,x) appears 4+1+1=6 times; "x x x x x" folds to
    // [x x, x x, x] (alternating positions, last x survives)
    // round 2: all pairs count 1; ("x x","x") wins the lexicographic
    // tie-break over ("x x","x x"), ("x x","y"), ("y","x x")
    assert(got == Seq(
      (1L, "x", "x", "x x", 6L),
      (2L, "x x", "x", "x x x", 1L)
    ))
    assert(got == bpeModel(docs.map(_._2.split(" ").toSeq), 2))
  }

  test("m4b probe-all IVF ≡ brute top-k under the same integer ranking") {
    // completeness: cell assignment partitions the media corpus whatever
    // the centroids are, so probing every cell recovers exactly the
    // brute-force top-k by the fixed-point cosine key
    val got = graft.pipeline.Multimodal
      .mediaKnnIvf(spark, sfDir, nQueries = 5, k = 3, nprobe = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // independent in-memory model: stub features -> integer cosine key
    val feats = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map { r =>
        val n = r.getString(1).getBytes("UTF-8").length.toLong
        r.getLong(0) -> (1 to 8).map(k => (n * k) % 97 + 1).toArray
      }
      .sortBy(_._1)
    def key(q: Array[Long], v: Array[Long]): Long = {
      val dot = q.zip(v).map { case (a, b) => a * b }.sum
      val n2 = v.map(x => x * x).sum
      if (n2 == 0L) 0L
      else {
        val mag = dot * dot * (1L << 20) / n2
        if (dot >= 0L) mag else -mag
      }
    }
    val want = feats.filter(_._1 < 5).flatMap { case (qid, q) =>
      feats
        .filter(_._1 != qid)
        .map { case (vid, v) => (vid, key(q, v)) }
        .sortBy { case (vid, s) => (-s, vid) }
        .take(3)
        .zipWithIndex
        .map { case ((vid, s), i) => (qid, vid, i + 1L, s) }
    }.toSeq
    assert(got == want)
    // the registered nprobe=2 form loses no query and retrieves full k
    val pruned = graft.pipeline.Multimodal.mediaKnnIvf(spark, sfDir)
    assert(pruned.count() == 15L)
  }

  test("p33 keyword retrieval equals an independent in-memory tf-idf model") {
    val got = graft.pipeline.Retrieval
      .keywordTopK(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val n = docs.size.toLong
    val tf: Map[(Long, String), Long] = docs.toSeq.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => ((id, w), g.size.toLong) }
    }.toMap
    val df: Map[String, Long] = docs.toSeq
      .flatMap { case (_, ws) => ws.distinct }
      .groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }
    val want = (0L until 5L).flatMap { qid =>
      val qws = docs(qid).distinct
      docs.keys
        .filter(_ != qid)
        .flatMap { d =>
          val s =
            qws.map(w => tf.getOrElse((d, w), 0L) * (n * 1000000L / df(w))).sum
          if (s > 0) Some((d, s)) else None // zero overlap = not a candidate
        }
        .toSeq
        .sortBy { case (d, s) => (-s, d) }
        .take(5)
        .zipWithIndex
        .map { case ((d, s), i) => (qid, d, i + 1L, s) }
    }.toSeq
    assert(got == want)
  }

  test("p35 LM familiarity equals an independent in-memory bigram model") {
    val got = graft.pipeline.QualityModel
      .lmFamiliarity(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
      .toMap
    val boundary = (docs.keys.max + 1L) * 4L / 5L
    val hist = docs.filter { case (id, _) => id < boundary }
    def bigrams(ws: Seq[String]) = ws.zip(ws.drop(1))
    val uni: Map[String, Long] = hist.values.toSeq.flatten
      .groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }
    val v = uni.size.toLong
    val bi: Map[(String, String), Long] = hist.values.toSeq
      .flatMap(bigrams)
      .groupBy(identity)
      .map { case (p, g) => (p, g.size.toLong) }
    val want = docs.keys.toSeq.filter(_ >= boundary).sorted.map { id =>
      val bs = bigrams(docs(id))
      if (bs.isEmpty) (id, 0L, 0L)
      else {
        val tot = bs.map { case (a, b) =>
          1000000L * (bi.getOrElse((a, b), 0L) + 1L) /
            (uni.getOrElse(a, 0L) + v)
        }.sum
        (id, bs.size.toLong, tot / bs.size)
      }
    }
    assert(got == want)
    // the model discriminates: in-distribution docs outscore the floor
    assert(got.exists(_._3 > 0L))
  }

  test("p36 hybrid RRF equals in-memory fusion of the two legs and actually fuses") {
    val got = graft.pipeline.Retrieval
      .hybridTopK(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    // the legs are independently oracle-checked (p33 / k2 shapes); fuse
    // their collected outputs with plain Scala integer arithmetic
    val lex = graft.pipeline.Retrieval
      .keywordTopK(spark, sfDir, nQueries = 5, k = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dense = graft.pipeline.Similarity
      .knnIvf(spark, sfDir, nQueries = 5, k = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val contrib = (lex ++ dense).map { case (q, d, rnk) =>
      ((q, d), 1000000L / (60L + rnk))
    }
    val fused = contrib
      .groupBy(_._1)
      .map { case ((q, d), cs) => (q, d, cs.map(_._2).sum, cs.size.toLong) }
      .toSeq
    val want = fused
      .groupBy(_._1)
      .toSeq
      .sortBy(_._1)
      .flatMap { case (_, rows) =>
        rows
          .sortBy { case (_, d, s, _) => (-s, d) }
          .zipWithIndex
          .take(10)
          .map { case ((q, d, s, nl), i) => (q, d, i + 1L, s, nl) }
      }
    assert(got == want)
    // fusion is non-degenerate: some result was surfaced by BOTH
    // modalities, and some top-10 result came from a single leg
    assert(got.exists(_._5 == 2L))
    assert(got.exists(_._5 == 1L))
    // every query emits exactly 10 results (pool ≥ k on this corpus)
    assert(got.groupBy(_._1).forall(_._2.size == 10))
  }

  test("p34 drift: self-drift is zero, disjoint vocabulary saturates, corpus form bounded") {
    val ss = spark
    import ss.implicits._
    val hist = Seq(
      (1L, "s1", "aa bb cc aa dd"),
      (2L, "s1", "bb cc dd ee")
    ).toDF("doc_id", "source", "text")
    val ref = graft.pipeline.Sampling.frozenProfile(hist)
    // a batch with the history's exact distribution drifts by zero —
    // identical per-bucket counts through identical integer ppm math
    val self = graft.pipeline.Sampling.driftReportOf(hist, ref).collect()
    assert(self.length == 1)
    assert(self.head.getAs[Long]("tv_ppm") == 0L, self.mkString)
    assert(self.head.getAs[Long]("max_shift_ppm") == 0L)
    // a batch sharing no vocabulary saturates toward 10⁶ ppm — BOTH
    // tails of the union lattice contribute (ref mass never re-emitted
    // + batch mass never referenced). Not exactly 10⁶: two-char tokens
    // occupy a tiny corner of the hash space, so some alien BUCKETS
    // genuinely collide with reference ones mod 8192 (verified against
    // an independent in-python replay: s1 = 937499, s2 = 812500)
    val alien = Seq(
      (3L, "s1", "xx yy zz xx"),
      (4L, "s2", "qq rr ss")
    ).toDF("doc_id", "source", "text")
    val far = graft.pipeline.Sampling
      .driftReportOf(alien, ref)
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("tv_ppm")))
      .toMap
    assert(far == Map("s1" -> 937499L, "s2" -> 812500L), far.toString)
    // the registered corpus split is non-degenerate and TV-bounded
    val full = graft.pipeline.Sampling.driftReport(spark, sfDir).collect()
    assert(full.nonEmpty)
    assert(full.forall { r =>
      val tv = r.getAs[Long]("tv_ppm"); tv >= 0L && tv <= 1000000L
    })
    assert(full.exists(_.getAs[Long]("tv_ppm") > 0L))
  }

  test("p31 fused fold: merged toks ≡ mergeFold and dels ≡ brute pair diff") {
    import org.apache.spark.sql.functions.{col, explode, expr}
    val ss = spark
    import ss.implicits._
    // adversarial shapes: equal-token runs (alternating consumption),
    // adjacent a≠b merges ("a b a b" → [m, m]), merge at doc start/end,
    // singleton and pair-free docs
    val docs = Seq(
      "x x x x x", "x x", "y x x y", "a b a b", "a b b a b",
      "b a b", "a b", "z", "a a b b a b a", "b b a a"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val cases = Seq(("x", "x"), ("a", "b"), ("b", "a"), ("b", "b"))
    def pairs(ts: Seq[String]) = ts.zip(ts.drop(1))
    def modelMerge(ts: Seq[String], a: String, b: String, m: String) = {
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      ts.foreach { t =>
        if (acc.nonEmpty && acc.last == a && t == b) acc(acc.size - 1) = m
        else acc += t
      }
      acc.toSeq
    }
    cases.foreach { case (a, b) =>
      val m = a + " " + b
      val df = docs
        .toDF("doc_id", "text")
        .select(
          col("doc_id"),
          expr("filter(split(text, ' '), x -> x != '')").as("toks")
        )
        .select(
          col("doc_id"),
          col("toks"),
          TextAnalysis
            .mergeDeltaWalk(
              col("toks"),
              org.apache.spark.sql.functions.lit(a),
              org.apache.spark.sql.functions.lit(b),
              org.apache.spark.sql.functions.lit(m)
            )
            .as("r")
        )
      val got = df
        .select(col("doc_id"), col("toks"), col("r.toks").as("nt"), col("r.dels"))
        .collect()
        .map(r =>
          (r.getLong(0), r.getSeq[String](1), r.getSeq[String](2),
            r.getSeq[org.apache.spark.sql.Row](3)
              .map(d => ((d.getString(0), d.getString(1)), d.getLong(2))))
        )
      got.foreach { case (id, old, nt, dels) =>
        assert(nt == modelMerge(old, a, b, m), s"doc $id merged toks, pair ($a,$b)")
        val want = (pairs(nt).map(_ -> 1L) ++ pairs(old).map(_ -> -1L))
          .groupMapReduce(_._1)(_._2)(_ + _)
          .filter(_._2 != 0L)
        val gotNet = dels
          .groupMapReduce(_._1)(_._2)(_ + _)
          .filter(_._2 != 0L)
        assert(gotNet == want, s"doc $id delta, pair ($a,$b)")
      }
      // and the aggregated frame view the trainer consumes
      val agg = df
        .select(explode(col("r.dels")).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(org.apache.spark.sql.functions.sum(col("p.dn")).as("dn"))
        .filter(col("dn") =!= 0L)
        .collect()
        .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
        .toMap
      val wantAgg = got
        .flatMap { case (_, old, nt, _) =>
          pairs(nt).map(_ -> 1L) ++ pairs(old).map(_ -> -1L)
        }
        .groupMapReduce(_._1)(_._2)(_ + _)
        .filter(_._2 != 0L)
      assert(agg == wantAgg, s"aggregated delta, pair ($a,$b)")
    }
  }

  test("p31 delta trainer ≡ recount trainer (merge table AND final state)") {
    def run(
        d: org.apache.spark.sql.DataFrame,
        nMerges: Int
    ): (Seq[(Long, String, String, String, Long)], Seq[(Long, Seq[String])]) = {
      def harvest(
          t: (Seq[(Long, String, String, String, Long)],
            org.apache.spark.sql.DataFrame, () => Unit)
      ) = {
        val (m, st, release) = t
        val s = st
          .collect()
          .map(r => (r.getLong(0), r.getSeq[String](1)))
          .sortBy(_._1)
          .toSeq
        release()
        (m, s)
      }
      val (mr, sr) = harvest(TextAnalysis.phraseTrain(spark, d, nMerges))
      val (md, sd) = harvest(TextAnalysis.phraseTrainDelta(spark, d, nMerges))
      assert(md == mr, "merge tables diverge")
      assert(sd == sr, "final corpus states diverge")
      (mr, sr)
    }
    // the real corpus at the registered round count
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val (m, _) = run(docs, 8)
    assert(m.size == 8)
    // equal-token runs (alternating-position consumption) AND exhaustion:
    // 10 requested rounds exceed what the fixture can supply, so both
    // trainers must stop at the same shorter merge table
    val ss = spark
    import ss.implicits._
    val fix = Seq((0L, "x x x x x"), (1L, "x x"), (2L, "y x x y"))
      .toDF("doc_id", "text")
    val (mf, sf) = run(fix, 10)
    assert(mf.size < 10 && sf.forall(_._2.size == 1))
    // non-BMP count tie: U+10000 is "𐀀" (UTF-16 code units
    // 0xD800… — sorts BELOW U+E000 in JVM String order) but encodes as
    // UTF-8 0xF0… (sorts ABOVE U+E000's 0xEE…). Both pairs tie at count
    // 2, so the delta trainer's driver-side tie-break must match the
    // engine's UTF-8 order (pick (U+E000, z) first) or the two trainers
    // diverge on the very first merge.
    val hi = "𐀀" // U+10000
    val pu = "" // U+E000
    val tie = Seq(
      (0L, s"$hi z"),
      (1L, s"$hi z"),
      (2L, s"$pu z"),
      (3L, s"$pu z")
    ).toDF("doc_id", "text")
    val (mt, _) = run(tie, 2)
    assert(
      mt.map(t => (t._2, t._3)) == Seq((pu, "z"), (hi, "z")),
      "tie-break must follow UTF-8 byte order, not UTF-16 code units"
    )
  }

  test("p30 split is constant within clusters and moves only clustered docs") {
    val out = Sampling.leakFreeSplit(spark, sfDir).cache()
    // no cluster straddles splits
    assert(
      out
        .groupBy("label")
        .agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") =!= 1)
        .count() == 0
    )
    // split_naive IS the p19 assignment at the same per-milles
    val naive = Sampling
      .assignSplits(
        spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id"),
        valPerMille = 300L,
        testPerMille = 300L
      )
      .withColumnRenamed("split", "p19_split")
    assert(
      out
        .join(naive, Seq("doc_id"))
        .filter(col("split_naive") =!= col("p19_split"))
        .count() == 0
    )
    // self-labeled docs coincide with the naive split; movers are exactly
    // the docs whose cluster label differs from their id AND whose label
    // gates into a different split — and some exist (non-vacuous)
    assert(
      out
        .filter(col("label") === col("doc_id") && col("moved"))
        .count() == 0
    )
    assert(out.filter(col("moved")).count() > 0)
    out.unpersist()
  }

  test("p37 perplexity tiers: contiguous balanced tertiles, keep rule replays in memory") {
    val out = graft.pipeline.QualityModel
      .perplexityTiers(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq

    // balanced: NTILE(3) sizes differ by at most one
    val sizes = out.groupBy(_._3).view.mapValues(_.size).toMap
    assert(sizes.keySet == Set(1L, 2L, 3L))
    assert(sizes.values.max - sizes.values.min <= 1)

    // contiguous under the ranking order (score DESC, doc_id ASC):
    // every tier-1 key precedes every tier-2 key precedes every tier-3
    def key(t: (Long, Long, Long, Long)) = (-t._2, t._1)
    for (hi <- 1L to 2L) {
      val maxHi = out.filter(_._3 == hi).map(key).max
      val minLo = out.filter(_._3 == hi + 1).map(key).min
      assert(Ordering[(Long, Long)].lt(maxHi, minLo))
    }

    // the keep rule, replayed in memory
    out.foreach { case (id, _, tier, kept) =>
      val want =
        if (tier == 1L || (tier == 2L && id % 2 == 0) ||
          (tier == 3L && id % 10 == 0)) 1L
        else 0L
      assert(kept == want, s"doc $id tier $tier")
    }
    // all three keep rates actually exercised
    assert(out.exists(t => t._3 == 2L && t._4 == 0L))
    assert(out.exists(t => t._3 == 3L && t._4 == 1L))
  }

  test("p32b tokenizer artifact: stored encode equals inline ids, OOV encodes as UNK 0") {
    val ss = spark
    import ss.implicits._
    val art = java.nio.file.Files
      .createTempDirectory("graft-tokenizer")
      .toString
    graft.pipeline.TextAnalysis.writeTokenizer(spark, sfDir, art)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
        .sortBy(t => (t._1, t._2))

    // stored-artifact encode of the training corpus ≡ the inline query
    val corpus = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val stored = rows(
      graft.pipeline.TextAnalysis.encodeWithTokenizer(spark, corpus, art))
    val inline = rows(graft.pipeline.TextAnalysis.tokenIds(spark, sfDir))
    assert(stored.nonEmpty)
    assert(stored == inline)
    // dense ids from 1, 0 never assigned (reserved for UNK)
    assert(inline.map(_._3).min >= 1L)

    // an unseen word encodes as UNK 0; in-vocabulary neighbors keep ids
    val oov = Seq((999000L, "zzz-not-in-vocab the zzz-not-in-vocab"))
      .toDF("doc_id", "text")
    val enc = rows(
      graft.pipeline.TextAnalysis.encodeWithTokenizer(spark, oov, art))
    assert(enc.count(_._3 == 0L) >= 2)
    assert(enc.exists(_._3 > 0L))
  }

  test("p32c decode: identity on normalized in-vocab text, OOV-lossy as <unk>") {
    val ss = spark
    import ss.implicits._
    val art = java.nio.file.Files
      .createTempDirectory("graft-tokenizer-dec")
      .toString
    graft.pipeline.TextAnalysis.writeTokenizer(spark, sfDir, art)
    val d = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // decode ∘ encode ≡ whitespace-normalized corpus (every token
    // in-vocab by construction — the p32c oracle's justification)
    val got = graft.pipeline.TextAnalysis
      .decodeWithTokenizer(
        spark,
        graft.pipeline.TextAnalysis.encodeWithTokenizer(spark, d, art),
        art
      )
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .toMap
    val want = d
      .select(
        col("doc_id"),
        expr("array_join(filter(split(text, ' '), x -> x != ''), ' ')")
          .as("t")
      )
      .collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.nonEmpty)
      .toMap
    assert(got == want)

    // OOV is LOSSY by design: unknown ids decode as <unk>; in-vocab
    // neighbors survive. The in-vocab probe comes from the artifact's
    // own vocabulary (a plain word, not a merged phrase).
    val inVocab = spark.read
      .parquet(s"$art/vocab")
      .filter(!col("w").contains(" "))
      .orderBy(col("n_occ").desc, col("w"))
      .head()
      .getAs[String]("w")
    val oov = Seq((999000L, s"zzz-not-in-vocab $inVocab zzz-not-in-vocab"))
      .toDF("doc_id", "text")
    val dec = graft.pipeline.TextAnalysis
      .decodeWithTokenizer(
        spark,
        graft.pipeline.TextAnalysis.encodeWithTokenizer(spark, oov, art),
        art
      )
      .head()
      .getString(1)
    assert(dec == s"<unk> $inVocab <unk>", s"got: $dec")
  }

  test("w9 funnel matches an independent in-memory event replay") {
    val ev = graft.model.ActionLog
      .normalizedEvents(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val want = byUser.map { case (u, es) =>
      def firstAfter(t: String, after: Option[Long]): Option[Long] =
        after.flatMap(a =>
          es.filter(e => e._2 == t && e._3 > a).map(_._3).sorted.headOption)
      val v = es.filter(_._2 == "view").map(_._3).sorted.headOption
      val c = firstAfter("click", v)
      val p = firstAfter("purchase", c)
      u -> (v, c, p, p.map(_ => 3L).orElse(c.map(_ => 2L)).orElse(v.map(_ => 1L)).getOrElse(0L))
    }
    val got = graft.analytics.Analytics
      .funnel(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getLong(4)))
      .toMap
    assert(got == want)
    // the dense fixture completes the funnel; the staged semantics are
    // pinned by the model equality above (the oracle covers sparse users)
    assert(got.values.exists(_._4 == 3L))
  }

  test("w10 retention cohorts match an independent in-memory replay") {
    val weekUs = 604800000000L
    val act = graft.model.ActionLog
      .normalizedEvents(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / weekUs))
      .distinct
    val cohort = act.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = act
      .groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case ((cw, off), xs) =>
        val n = xs.map(_._1).distinct.size.toLong
        (cw, off) -> (n, sizes(cw), n * 1000000L / sizes(cw))
      }
    val got = graft.analytics.Analytics
      .retentionCohorts(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == want)
    // offsets beyond 0 exist: the fixture actually measures retention
    assert(got.keys.exists(_._2 > 0L))
  }
}
