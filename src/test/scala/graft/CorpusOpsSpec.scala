package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Decontamination, Sampling}

/** Laws for the corpus-hygiene operators: decontamination (p9) and
  * deterministic weighted sampling (p10).
  */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-corpus-ops-test")
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

  private def df(rows: (Long, String)*) = {
    val sp = spark
    import sp.implicits._
    rows.toDF("doc_id", "text")
  }

  test("decontamination: verbatim eval copy is fully contaminated, disjoint text is clean") {
    val eval = df(0L -> "the quick brown fox jumps over the lazy dog")
    val train = df(
      1L -> "the quick brown fox jumps over the lazy dog", // verbatim leak
      2L -> "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz" // shares no 7-gram
    )
    val out = Decontamination
      .scan(train, eval)
      .orderBy("doc_id")
      .collect()
    assert(out.length == 2)
    val leak = out(0)
    assert(leak.getAs[Long]("doc_id") == 1L)
    assert(leak.getAs[Long]("n_hit") == leak.getAs[Long]("n_grams"))
    assert(leak.getAs[Double]("ratio") == 1.0)
    assert(leak.getAs[Boolean]("contaminated"))
    val clean = out(1)
    assert(clean.getAs[Long]("n_hit") == 0L)
    assert(clean.getAs[Double]("ratio") == 0.0)
    assert(!clean.getAs[Boolean]("contaminated"))
  }

  test("decontamination: partial leak counts only the shared distinct grams") {
    val eval = df(0L -> "shared benchmark passage here")
    // half the train doc is the eval passage, half is novel
    val train = df(1L -> "shared benchmark passage here xqjvkwpzy unrelated tail")
    val out = Decontamination.scan(train, eval).collect()(0)
    val (n, hit) = (out.getAs[Long]("n_grams"), out.getAs[Long]("n_hit"))
    assert(hit > 0L && hit < n, s"expected partial overlap, got $hit/$n")
    assert(out.getAs[Double]("ratio") == hit.toDouble / n.toDouble)
  }

  test("decontamination: short texts (< n chars) fall back to the single partial gram") {
    val eval = df(0L -> "abc")
    val train = df(1L -> "abc", 2L -> "abd")
    val out = Decontamination.scan(train, eval).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_grams") == 1L)
    assert(out(0).getAs[Double]("ratio") == 1.0)
    assert(out(1).getAs[Long]("n_hit") == 0L)
  }

  test("decontamination query: eval slice is excluded and ratios are well-formed") {
    val out = Decontamination.contaminationScan(spark, sfDir).cache()
    try {
      assert(out.filter(col("doc_id") % 50 === 0).count() == 0)
      assert(
        out
          .filter(
            col("n_hit") > col("n_grams") || col("ratio") < 0 || col("ratio") > 1
          )
          .count() == 0
      )
      val total = spark.read
        .parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") % 50 =!= 0)
        .count()
      assert(out.count() == total)
    } finally out.unpersist(false)
  }

  test("sampling: deterministic across invocations") {
    val a = Sampling.weightedSampleQuery(spark, sfDir).collect().toSeq
    val b = Sampling.weightedSampleQuery(spark, sfDir).collect().toSeq
    assert(a == b)
  }

  test("sampling: rate-0 strata vanish, rate-1 strata survive bit-for-bit") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Sampling.weightedSampleQuery(spark, sfDir).cache()
    try {
      // srcK rate = (K%5)/4: K%5==0 -> dropped entirely, K%5==4 -> all kept
      val zero = Seq("src0", "src5", "src10", "src15")
      val full = Seq("src4", "src9", "src14", "src19")
      assert(out.filter(col("source").isin(zero: _*)).count() == 0)
      val fullTotal = d.filter(col("source").isin(full: _*)).count()
      assert(out.filter(col("source").isin(full: _*)).count() == fullTotal)
    } finally out.unpersist(false)
  }

  test("sampling: raising a rate only adds rows (monotone nesting)") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val lo = Sampling
      .weightedSample(d, Map.empty, defaultRate = 0.25)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    val hi = Sampling
      .weightedSample(d, Map.empty, defaultRate = 0.5)
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(lo.subsetOf(hi), s"${(lo -- hi).size} rows lost when raising the rate")
    // and the achieved rates track the targets (this band FAILED before
    // the gate's multiplicative finalizer: raw poly-hash clustering gave
    // 0.43 at a 0.25 target on these 500 sequential ids)
    val n = d.count().toDouble
    assert(math.abs(lo.size / n - 0.25) < 0.1)
    assert(math.abs(hi.size / n - 0.5) < 0.1)
  }

  test("cluster-balanced sample: per-cluster cap, budget nesting, WindowGroupLimit") {
    import org.apache.spark.sql.functions._
    val big = Sampling.clusterBalancedSample(spark, sfDir, perCluster = 40)
    val bigRows = big.collect()
    // every vector appears at most once; per-cluster count never exceeds
    // the cap; ranks are dense 1..count within each cluster
    val perCluster =
      bigRows.groupBy(_.getAs[Long]("cid")).view.mapValues(_.length).toMap
    assert(bigRows.map(_.getAs[Long]("vec_id")).distinct.length == bigRows.length)
    assert(perCluster.values.forall(_ <= 40))
    bigRows.groupBy(_.getAs[Long]("cid")).foreach { case (cid, rows) =>
      assert(
        rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
          (1L to rows.length.toLong),
        s"ranks not dense in cluster $cid"
      )
    }
    // budget nesting: the 20-per-cluster take-set is a strict prefix of
    // the 40-per-cluster one (same gate order), so ablations nest — the
    // p10/p20 guarantee transposed to clusters
    val small = Sampling
      .clusterBalancedSample(spark, sfDir, perCluster = 20)
      .collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("vec_id")))
      .toSet
    val bigSet =
      bigRows.map(r => (r.getAs[Long]("cid"), r.getAs[Long]("vec_id"))).toSet
    assert(small.subsetOf(bigSet))
    // the rank<=k filter must plan as a WindowGroupLimit pushdown, not a
    // full window materialization — asserted on the operator's tail
    // pre-materialization (Eager.materialized returns a LogicalRDD, so
    // the returned frame's plan is just the checkpoint scan)
    val codes = graft.pipeline.Similarity
      .quantized(spark, sfDir)
      .select(col("vec_id"), col("q8"))
    val cents = graft.pipeline.Similarity.trainCentroidsExact(codes, 16, 3)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cid")
      .orderBy(col("h"), col("vec_id"))
    val tail = graft.pipeline.Similarity
      .assignCellsInt(codes, cents)
      .select(
        col("cid"),
        col("vec_id"),
        Sampling.gate("graft-balance", lit(""), col("vec_id"), 1000000L)
          .as("h")
      )
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 40)
    val plan = tail.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("sharding: every doc lands in exactly one shard, shards are balanced") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Sampling.shardAssignment(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum == d.count())
    assert(out.map(_.getAs[Long]("shard")).forall(s => s >= 0 && s < 32))
    // 500 docs over 32 shards ≈ 15.6 expected; the finalizer keeps dense
    // ids from clustering, so no shard should be wildly off
    val counts = out.map(_.getAs[Long]("n_docs"))
    assert(counts.max <= 3 * counts.min + 10, s"imbalanced: ${counts.toSeq}")
  }

  test("sharding: assignment is independent of the sampling gate") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    // the p10 sample of each shard should hit roughly the global rate —
    // i.e. shard membership must not correlate with the sample gate
    val sampled = Sampling
      .weightedSample(d, Map.empty, defaultRate = 0.5)
      .select(
        Sampling.gate("graft-shard", lit(""), col("doc_id"), 32L).as("shard")
      )
      .groupBy("shard")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val all = d
      .select(
        Sampling.gate("graft-shard", lit(""), col("doc_id"), 32L).as("shard")
      )
      .groupBy("shard")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val rates = all.map { case (s, n) => sampled.getOrElse(s, 0L).toDouble / n }
    // wide band: ~15 docs per shard, but NO shard may be empty or full
    // unless tiny — correlation would empty some shards entirely
    assert(rates.count(r => r > 0.05 && r < 0.95) >= rates.size - 3)
  }

  test("normalization: canonicalizes case/spacing, is idempotent, unifies dedup keys") {
    import graft.pipeline.TextAnalysis
    // the testdata corpus is already canonical (spec'd here because the
    // oracle query exercises only the no-op path there)
    val d = df(
      1L -> "The \tQuick \n Brown Fox ",
      2L -> "the quick brown fox",
      3L -> " THE QUICK BROWN FOX",
      4L -> "something else"
    )
    val out = TextAnalysis.normalize(d).collect()
    // 1-3 are formatting variants (case, tabs, newlines, space runs) of
    // one canonical string
    assert(out.take(3).map(_.getAs[Long]("norm_fp")).distinct.length == 1)
    assert(!out(1).getAs[Boolean]("changed")) // doc 2 already canonical
    assert(out(0).getAs[Boolean]("changed") && out(2).getAs[Boolean]("changed"))
    assert(out(3).getAs[Long]("norm_fp") != out(0).getAs[Long]("norm_fp"))
    // idempotence: normalizing normalized text changes nothing
    val once = d.select(
      col("doc_id"),
      TextAnalysis.normalizedText(col("text")).as("text")
    )
    val twice = TextAnalysis.normalize(once).collect()
    assert(twice.forall(!_.getAs[Boolean]("changed")))
    assert(
      twice.map(_.getAs[Long]("norm_fp")).toSeq ==
        out.map(_.getAs[Long]("norm_fp")).toSeq
    )
  }

  test("sampling: gate laws hold across random salts, rates, granularities") {
    val d = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source")
      .cache()
    try {
      val rnd = new scala.util.Random(20260813L)
      (1 to 8).foreach { _ =>
        val salt = "s" + rnd.nextInt(1000000)
        val g = Seq(1000L, 10000L, 1000000L)(rnd.nextInt(3))
        val (lo, hi) = {
          val a = rnd.nextDouble(); val b = rnd.nextDouble()
          (math.min(a, b), math.max(a, b))
        }
        def ids(rate: Double): Set[Long] = Sampling
          .weightedSample(d, Map.empty, salt = salt, defaultRate = rate,
            granularity = g)
          .select("doc_id")
          .collect()
          .map(_.getLong(0))
          .toSet
        val (sLo, sHi) = (ids(lo), ids(hi))
        // monotone nesting at ANY parameters, and the exact 0/1 edges
        assert(sLo.subsetOf(sHi), s"salt=$salt g=$g lo=$lo hi=$hi")
        assert(ids(0.0).isEmpty)
        assert(ids(1.0).size.toLong == d.count())
      }
    } finally d.unpersist(false)
  }

  test("splits: disjoint-exhaustive, layout-independent, unbiased by the sample gate") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val s1 = Sampling.assignSplits(d).select("doc_id", "split")
    // every doc gets exactly one split
    assert(s1.count() == d.count())
    assert(s1.select("doc_id").distinct().count() == d.count())
    // deterministic across partition layouts
    val s2 = Sampling.assignSplits(d.repartition(13)).select("doc_id", "split")
    assert(s1.exceptAll(s2).count() == 0)
    // independence: sampling half the corpus (different salt) keeps every
    // sampled doc's split assignment identical
    val sampled = Sampling.weightedSample(d, Map.empty, defaultRate = 0.5)
    val s3 = Sampling.assignSplits(sampled).select("doc_id", "split")
    assert(s3.exceptAll(s1).count() == 0)
  }

  test("sampling: a salt change redraws the sample") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val a = Sampling
      .weightedSample(d, Map.empty, defaultRate = 0.5, salt = "graft")
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    val b = Sampling
      .weightedSample(d, Map.empty, defaultRate = 0.5, salt = "other")
      .select("doc_id")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(a != b)
  }

  test("p28 source caps: exact top-cap per source vs an independent model, WindowGroupLimit") {
    val cap = 5
    val out = Sampling.sourceCaps(spark, sfDir, cap).collect()
    // independent model: plain Scala sort per source over the raw table
    val raw = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = raw
      .groupBy(_._2)
      .toSeq
      .flatMap { case (_, rows) =>
        rows
          .sortBy { case (id, _, nc) => (-nc, id) }
          .take(cap)
          .zipWithIndex
          .map { case ((id, src, nc), i) => (id, src, nc, i + 1L) }
      }
      .toSet
    assert(
      out.map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      ).toSet == want
    )
    // caps bound every source and ranks are dense
    val bySrc = out.groupBy(_.getString(1))
    assert(bySrc.values.forall(_.length <= cap))
    bySrc.foreach { case (src, rows) =>
      assert(
        rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length.toLong),
        s"ranks not dense in source $src"
      )
    }
    // the rank<=cap filter plans as a WindowGroupLimit pushdown: the
    // surplus rows of a hot source die map-side in a cap-sized heap
    val plan = Sampling
      .sourceCaps(spark, sfDir, cap)
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }

  test("p29 removes exactly the eval-overlapping span, not its context") {
    val sp = spark
    import sp.implicits._
    val eval = Seq((0L, "w1 w2 w3 w4")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "x1 x2 w1 w2 w3 w4 y1"), // one eval window inside a context
      (2L, "clean words that never overlap anything"),
      (3L, "w1 w2 w3") // shorter than L: no windows, verbatim
    ).toDF("doc_id", "text")
    val out = Decontamination
      .removeEvalSpans(train, eval, spanWords = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((4L, "x1 x2 y1")))
    assert(out(2L) == ((0L, "clean words that never overlap anything")))
    assert(out(3L) == ((0L, "w1 w2 w3")))
  }

  test("p29 fingerprint probe is row-identical to the window-text form") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = d.filter(col("doc_id") % 50 =!= 0)
    val eval = d.filter(col("doc_id") % 50 === 0)
    val txt =
      Decontamination.removeEvalSpans(train, eval).collect().toSeq
    val fp = Decontamination
      .removeEvalSpans(train, eval, fingerprint = true)
      .collect()
      .toSeq
    assert(txt == fp)
    // non-vacuous on the shipped corpus: the eval slice really overlaps
    assert(txt.exists(_.getAs[Long]("n_removed") > 0))
  }
}
