package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sampling, Similarity, TextAnalysis}

/** Scaling harness for the round's HEAVY TAIL — the operators that
  * dominate the bench suite's runtime: the n-gram/minhash dedup plane
  * (d6, d9, d2-memo + d11), the exact-integer k-means training passes
  * (k5, k10, p24) and the BPE trainer (p31). CorpusStress covers the
  * light hygiene operators; this covers the expensive ones, at half and
  * full amplification of the sf0.1 documents AND embeddings tables.
  *
  * The claim under test is LINEAR (no super-linear term): per-row cost
  * must stay flat as the corpus doubles. Each of these is bucketed /
  * banded / bounded by construction — d6's banded index and codegen'd
  * rolling hash scan, d9's stored-index join, d11's one keyed window over
  * the memoized pair list, k-means' per-iteration broadcast of
  * kCentroids×dim means + one keyed exchange — so doubling rows must
  * double cost, nothing worse. A super-linear ratio here means a
  * quadratic candidate set or a corpus-sized driver materialization
  * crept in.
  *
  * d11 is timed as (d2 memo build) + (d11 marginal): the shared minhash
  * memo is billed to whichever query runs first in a suite, so the two
  * are separated here to see each component's own scaling.
  *
  * p31 is timed in THREE forms: the recount trainer (the oracle's
  * replayable twin — one full pair aggregation per round), the
  * delta-counted trainer at the same 8 rounds, and the delta trainer at
  * 64 rounds. The claim: delta(64)/delta(8) ≪ 8 — the per-round marginal
  * cost is NOT a corpus recount (tail merges gate down to few docs), so
  * training depth scales sub-O(rounds × corpus).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.HeavyTailStress 10"
  */
object HeavyTailStress {

  /** One measurement: wall seconds, the linearity DENOMINATOR (the
    * operator's true input rows — docs, vectors, or pairs), output rows.
    */
  private final case class M(sec: Double, inRows: Long, outRows: Long)

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    require(factor >= 2, s"need factor >= 2 for a half/full comparison, got $factor")
    val spark = GraftSession.local("graft-heavytail-stress")
    spark.sparkContext.setLogLevel("WARN")

    val baseDocs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val baseEmb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")

    def writeDir(f: Int): String = {
      val dir = s"/tmp/graft_heavytail_$f"
      (0 until f)
        .map { i =>
          baseDocs.select(
            (col("doc_id") + i.toLong * 50000L).as("doc_id"),
            col("text"), col("lang"), col("source"), col("n_chars")
          )
        }
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      (0 until f)
        .map { i =>
          baseEmb.select(
            (col("vec_id") + i.toLong * 50000L).as("vec_id"),
            col("embedding"), col("label")
          )
        }
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }

    def time(name: String, rows: Long)(f: => Long): M = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[heavytail] $name%-26s $sec%7.2f s  ($n out-rows, ${rows / sec}%.0f in-rows/s)")
      M(sec, rows, n)
    }

    // untimed warmup at base scale (JIT + codegen + parquet footers)
    locally {
      val d = "/root/testdata/sf0.1"
      Dedup.ngramJaccardPairs(spark, d).count()
      Dedup.incrementalDedupQuery(spark, d).count()
      Dedup.minhashPairs(spark, d).count()
      Dedup.canonicalSelection(spark, d).count()
      Similarity.knnIvfTrainedExact(spark, d).count()
      Similarity.knnIndexLifecycleExact(spark, d).count()
      Sampling.clusterBalancedSample(spark, d).count()
      Dedup.removeDupSpans(spark, d).count()
      Sampling.targetAffinity(spark, d).count()
      Dedup.paragraphDedup(spark, d).count()
      Sampling.leakFreeSplitIncremental(spark, d).count()
      Similarity.ivfCellStats(spark, d).count()
      TextAnalysis.phraseMerges(spark, d).count()
      Dedup.releaseMemo()
      TextAnalysis.releasePhraseMemo()
      graft.pipeline.Similarity.releaseTrainMemo()
    }

    val results = Seq(factor / 2, factor).map { f =>
      val dir = writeDir(f)
      val docRows = f.toLong * baseDocs.count()
      val vecRows = f.toLong * baseEmb.count()
      println(s"[heavytail] --- factor $f ($docRows docs, $vecRows vectors) ---")
      // d2+d11 measure FIRST in each group: d11's marginal cost is ~1 s,
      // so measuring it after d6's quarter-million-pair run in the same
      // JVM picks up that run's GC debris instead of the plan (observed:
      // 11.6 s polluted vs 1.4 s isolated at factor 10)
      val td2 = time("d2 minhash memo build", docRows) {
        Dedup.minhashPairs(spark, dir).count()
      }
      val td11 = time("d11 canonical (marginal)", docRows) {
        Dedup.canonicalSelection(spark, dir).count()
      }
      val td6 = time("d6 ngram jaccard", docRows) {
        Dedup.ngramJaccardPairs(spark, dir).count()
      }
      val td9 = time("d9 incremental dedup", docRows) {
        Dedup.incrementalDedupQuery(spark, dir).count()
      }
      // the amplified corpus is d12's worst case: every doc has f−1
      // verbatim twins, so EVERY window is a dup window and every
      // position is covered — dup-start explosion and the word-grain
      // coverage pass both run at their maximum density
      val td12 = time("d12 span removal", docRows) {
        Dedup.removeDupSpansOf(
          spark.read.parquet(s"$dir/documents.parquet")
            .select("doc_id", "text")
        ).count()
      }
      val tk5 = time("k5 exact k-means train", vecRows) {
        Similarity.knnIvfTrainedExact(spark, dir).count()
      }
      val tk10 = time("k10 lifecycle train+append", vecRows) {
        Similarity.knnIndexLifecycleExact(spark, dir).count()
      }
      val tp24 = time("p24 cluster-balanced", vecRows) {
        Sampling.clusterBalancedSample(spark, dir).count()
      }
      val tp26 = time("p26 target affinity", docRows) {
        Sampling.targetAffinity(spark, dir).count()
      }
      val td14 = time("d14 paragraph dedup", docRows) {
        Dedup.paragraphDedup(spark, dir).count()
      }
      // p30b split: the pair PLANE is a d2-class quadratic-output
      // producer on this duplication-amplified corpus (every doc gains
      // f−1 twins), so it is measured separately from the assignment
      // layer, which is linear in its own input — the PAIR plane (two CC
      // passes over it). Its linearity denominator is therefore the pair
      // count this corpus just produced, not docs: docs would misread
      // the quadratic pair amplification as the operator's own
      // super-linearity.
      val boundary = Dedup.incrementalBoundary(spark, dir)
      val (oldD, newD) = Dedup.incrementalSplitAt(spark, dir, boundary)
      var p30Pairs: org.apache.spark.sql.DataFrame = null
      val tp30p = time("p30b pair plane", docRows) {
        p30Pairs = Dedup.pairsOf(oldD.unionByName(newD))
        p30Pairs.count()
      }
      val tp30 = time("p30b assign (marginal)", tp30p.outRows) {
        Sampling
          .leakFreeSplitIncrementalFrom(boundary, oldD, newD, p30Pairs)
          .count()
      }
      val tk13 = time("k13 cell stats", vecRows) {
        Similarity.ivfCellStats(spark, dir).count()
      }
      // p31 trainer forms — see the scaladoc: recount (oracle twin) vs
      // delta at the same depth, then delta at 8× the depth
      def train(
          t: (Seq[(Long, String, String, String, Long)],
            org.apache.spark.sql.DataFrame, () => Unit)
      ): Long = { val (m, _, rel) = t; rel(); m.size.toLong }
      val docsDf = spark.read
        .parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val tp31r = time("p31 recount (8)", docRows) {
        train(TextAnalysis.phraseTrain(spark, docsDf, 8))
      }
      val tp31d = time("p31 delta (8)", docRows) {
        train(TextAnalysis.phraseTrainDelta(spark, docsDf, 8))
      }
      val tp31d64 = time("p31 delta (64)", docRows) {
        train(TextAnalysis.phraseTrainDelta(spark, docsDf, 64))
      }
      println(
        f"[heavytail] p31 depth scaling: delta(64)/delta(8) = " +
          f"${tp31d64.sec / tp31d.sec}%.2f (linear-in-rounds would be 8.00); " +
          f"delta(8)/recount(8) = ${tp31d.sec / tp31r.sec}%.2f")
      Dedup.releaseMemo()
      TextAnalysis.releasePhraseMemo()
      graft.pipeline.Similarity.releaseTrainMemo()
      (f, Seq(
        "d6" -> td6, "d9" -> td9, "d2memo" -> td2, "d11" -> td11,
        "d12" -> td12, "k5" -> tk5, "k10" -> tk10, "p24" -> tp24,
        "p26" -> tp26, "d14" -> td14, "p30b-pairs" -> tp30p,
        "p30b-assign" -> tp30, "k13" -> tk13, "p31-recount" -> tp31r,
        "p31-delta" -> tp31d, "p31-delta64" -> tp31d64
      ))
    }

    // Two ratios per operator, each normalized by the operator's OWN
    // measured input rows (docs, vectors, or — for p30b-assign — the
    // pair-plane output it consumes). Per-INPUT-row is the headline
    // linearity claim — but the duplication-amplified corpus gives the
    // PAIR producers (d6, d2) a genuinely quadratic OUTPUT (every doc
    // gains f-1 twins: pairs = n·f(f-1)/2 + f²·base), so for those the
    // honest bound is per-OUTPUT-row cost: a pair producer cannot beat
    // its output size, and flat per-output cost means the candidate
    // generation added no term beyond the pairs themselves.
    val Seq((_, half), (_, full)) = results
    half.zip(full).foreach { case ((name, h), (_, fl)) =>
      val perIn = (fl.sec / fl.inRows) / (h.sec / h.inRows)
      val perOut =
        (fl.sec / fl.outRows.max(1L)) / (h.sec / h.outRows.max(1L))
      println(
        f"[heavytail] $name%-11s per-in-row ratio (full/half): $perIn%.2f" +
          f"   per-out-row: $perOut%.2f (${h.outRows} -> ${fl.outRows} out-rows)")
    }
    Seq(factor / 2, factor).foreach { f =>
      deleteRecursively(new java.io.File(s"/tmp/graft_heavytail_$f"))
    }
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.util.Fs.deleteRecursively(f)
}
