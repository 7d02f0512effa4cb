package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Retrieval

/** Sorted-dictionary stress: the p33r design claim is that a prefix
  * query's expansion cost scales with the MATCHING terms, not the
  * vocabulary — the dict member is range-partitioned and sorted on the
  * term, so the pushed `w >= pfx AND w < succ(pfx)` range lets the
  * parquet reader skip every non-overlapping row group (sorted files
  * have tight per-row-group min/max, so skipping is near-file-grain).
  * This harness makes the claim measurable: a synthetic corpus with a
  * LARGE vocabulary (≈ nDocs distinct terms — two zipf-ish shared bands
  * plus a per-doc unique suffix term), then:
  *
  *   - a selective prefix (matches a handful of terms): the rows
  *     surviving the prefix pushdown collapse from |vocab| to the
  *     matching band — measured against the dict member directly;
  *   - fuzzy via the round-16 `dictgrams` candidate path (probes the
  *     query grams' buckets) vs the full-dictionary-scan fallback on
  *     the same store with the member dropped — row-identical, and the
  *     candidate band is printed beside the vocabulary;
  *   - wall clocks for both, plus the wildcard leading-literal path;
  *   - linearity probe: the same prefix at 1× and 2× corpus — the
  *     expansion side should track matching-term count, not corpus size.
  *
  *   sbt "runMain graft.DictStress 200000"
  */
object DictStress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = GraftSession.local("graft-dict-stress")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def corpusOf(n: Long) = spark
      .range(n)
      .select(
        col("id").as("doc_id"),
        concat(
          lit("alpha"),
          lit(" shared"), pmod(col("id"), lit(1000L)).cast("string"),
          lit(" band"), pmod(col("id"), lit(50L)).cast("string"),
          // the vocabulary bomb: one near-unique term per doc
          lit(" uniq"), col("id").cast("string"),
          lit(" tail")
        ).as("text")
      )

    def timed[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[dict-stress] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    def runAt(n: Long, tag: String): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-dict-stress-$tag").toString
      val corpus = corpusOf(n)
      timed(s"[$tag] index build ($n docs, vocab ≈ ${n + 1052})") {
        Retrieval.writeInvertedIndexOf(spark, corpus, dir)
      }
      // selective prefix: "band4" matches band40..band49 + band4 → 11 terms
      val q = Seq((0L, "band4")).toDF("qid", "pfx")
      timed(s"[$tag] prefix 'band4' (11 matching terms)") {
        Retrieval.prefixTopKIndexedOf(spark, q, dir, k = 5).collect(): Unit
      }
      // fuzzy, round 16: candidate generation probes the dictgrams
      // member (the query grams' buckets), no longer the whole
      // dictionary — measured against the full-scan fallback on the
      // SAME store with the member dropped (the pre-gram shape)
      val fq = Seq((0L, "band7")).toDF("qid", "term")
      val viaGrams = timed(s"[$tag] fuzzy 'band7'±1 (gram-probed)") {
        Retrieval.fuzzyTopKIndexedOf(spark, fq, dir, k = 5, maxEdits = 1)
          .collect()
      }
      val gramsDir = graft.util.DirSwap.resolve(dir, "dictgrams")
      val gramRows = spark.read.parquet(gramsDir).count()
      // the probe set 'band7' actually sends at maxEdits=1: bigrams only
      // (qlen 5 > 2·1+1, so the unigram leg is unreachable and unprobed)
      val qGrams = Seq("ba", "an", "nd", "d7")
      val bandRows = spark.read
        .parquet(gramsDir)
        .where(col("gram").isin(qGrams: _*))
        .select("w")
        .distinct()
        .count()
      graft.util.DirSwap.drop(dir, "dictgrams")
      val viaScan = timed(s"[$tag] fuzzy 'band7'±1 (full-scan fallback)") {
        Retrieval.fuzzyTopKIndexedOf(spark, fq, dir, k = 5, maxEdits = 1)
          .collect()
      }
      assert(
        viaGrams.toSeq == viaScan.toSeq,
        "gram-probed fuzzy must be row-identical to the full scan"
      )
      println(
        s"[dict-stress] [$tag] dictgrams rows=$gramRows; terms sharing " +
          s"any query gram (the candidate band)=$bandRows")
      val wq = Seq((0L, "band4?")).toDF("qid", "pattern")
      timed(s"[$tag] wildcard 'band4?' (leading-literal pruned)") {
        Retrieval.wildcardTopKIndexedOf(spark, wq, dir, k = 5).collect(): Unit
      }
      // the pushdown's selectivity, measured on the dict member itself:
      // the prefix RANGE is min/max-prunable (row groups outside it are
      // skipped by the parquet reader; sorted files make the ranges
      // tight), so the scan collapses to the matching neighborhood; a
      // LENGTH band (fuzzy's pre-filter) is not lexicographic — that
      // side must read the whole dictionary, the documented trade
      val dictDir = graft.util.DirSwap.resolve(dir, "dict")
      val dict = spark.read.parquet(dictDir)
      val vocab = dict.select("w").distinct().count()
      val pfxRows = dict
        .where(col("w") >= "band4" && col("w") < "band5").count()
      val fzRows = dict
        .where(abs(length(col("w")) - lit(5)) <= 1).count()
      println(
        s"[dict-stress] [$tag] vocab=$vocab rows surviving pushdown: " +
          s"prefix-range=$pfxRows fuzzy-length-band=$fzRows")
      assert(
        pfxRows > 0 && pfxRows * 100 < vocab,
        s"prefix range ($pfxRows rows) must be orders of magnitude under " +
          s"the vocabulary ($vocab)"
      )
      assert(
        fzRows >= pfxRows,
        s"length band ($fzRows) at least covers the prefix band ($pfxRows)"
      )
    }

    runAt(nDocs, "1x")
    runAt(nDocs * 2, "2x")
    println("[dict-stress] OK")
    spark.stop()
  }
}
