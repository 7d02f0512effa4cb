package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Sampling, Similarity}

/** Scaling harness for the round's HEAVY TAIL — the operators that
  * dominate the bench suite's runtime: the n-gram/minhash dedup plane
  * (d6, d9, d2-memo + d11) and the exact-integer k-means training passes
  * (k5, k10, p24). CorpusStress covers the light hygiene operators; this
  * covers the expensive ones, at half and full amplification of the
  * sf0.1 documents AND embeddings tables.
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
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.HeavyTailStress 10"
  */
object HeavyTailStress {
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

    def time(name: String, rows: Long)(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[heavytail] $name%-26s $sec%7.2f s  ($n out-rows, ${rows / sec}%.0f in-rows/s)")
      (sec, n)
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
      Dedup.releaseMemo()
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
      // layer, which is linear in docs whatever the pair count did
      val boundary = Dedup.incrementalBoundary(spark, dir)
      val (oldD, newD) = Dedup.incrementalSplitAt(spark, dir, boundary)
      var p30Pairs: org.apache.spark.sql.DataFrame = null
      val tp30p = time("p30b pair plane", docRows) {
        p30Pairs = Dedup.pairsOf(oldD.unionByName(newD))
        p30Pairs.count()
      }
      // the assignment layer's dominant input is the PAIR plane (two CC
      // passes over it), so its linearity denominator is the pair count
      // this corpus just produced — docs would misread the quadratic
      // amplification of pairs as the operator's own super-linearity
      val tp30 = time("p30b assign (marginal)", tp30p._2) {
        Sampling
          .leakFreeSplitIncrementalFrom(boundary, oldD, newD, p30Pairs)
          .count()
      }
      val tk13 = time("k13 cell stats", vecRows) {
        Similarity.ivfCellStats(spark, dir).count()
      }
      val tp31 = time("p31 phrase merges", docRows) {
        graft.pipeline.TextAnalysis.phraseMerges(spark, dir).count()
      }
      Dedup.releaseMemo()
      (f, Seq(td6, td9, td2, td11, td12, tk5, tk10, tp24, tp26,
        td14, tp30p, tp30, tk13, tp31))
    }

    // Two ratios per operator. Per-INPUT-row is the headline linearity
    // claim — but the duplication-amplified corpus gives the PAIR
    // producers (d6, d2) a genuinely quadratic OUTPUT (every doc gains
    // f-1 twins: pairs = n·f(f-1)/2 + f²·base), so for those the honest
    // bound is per-OUTPUT-row cost: a pair producer cannot beat its
    // output size, and flat per-output cost means the candidate
    // generation added no term beyond the pairs themselves.
    val Seq((fHalf, half), (fFull, full)) = results
    half.zip(full).zip(
      Seq("d6", "d9", "d2memo", "d11", "d12", "k5", "k10", "p24", "p26",
        "d14", "p30b-pairs", "p30b-assign", "k13", "p31")
    ).foreach { case (((hs, hn), (fs, fn)), name) =>
      val perIn = (fs / fFull) / (hs / fHalf)
      val perOut = (fs / fn.max(1L)) / (hs / hn.max(1L))
      println(
        f"[heavytail] $name%-7s per-in-row ratio (full/half): $perIn%.2f" +
          f"   per-out-row: $perOut%.2f (${hn} -> ${fn} out-rows)")
    }
    Seq(factor / 2, factor).foreach { f =>
      deleteRecursively(new java.io.File(s"/tmp/graft_heavytail_$f"))
    }
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit =
    graft.util.Fs.deleteRecursively(f)
}
