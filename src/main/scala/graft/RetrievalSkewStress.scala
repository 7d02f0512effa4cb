package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Retrieval

/** Retrieval skew harness: the pathological lexical query is a STOPWORD —
  * a term whose posting list is the whole corpus, so candidate generation
  * explodes to one row per document for that single query while a rare
  * term touches a handful. The harness builds a stored index over a
  * synthetic corpus where `the` appears in EVERY document (plus a banded
  * power-law-ish vocabulary), then measures the stored BM25 search for a
  * hot-only, rare-only, and mixed query set, the O(batch) append claim,
  * and compaction.
  *
  * What makes the hot query survivable is Spark's two-phase top-k: the
  * rank-filter window is planned as WindowGroupLimit with a PARTIAL pass
  * that caps every input partition at k rows BEFORE the shuffle, so the
  * corpus-sized candidate set never lands on one machine — the harness
  * asserts both window modes are in the executed plan and prints the
  * measured walls. (A production lexical engine goes further with
  * impact-ordered postings/WAND; that is a ranking-internals
  * optimization, not a plan-shape gap.)
  *
  *   sbt "runMain graft.RetrievalSkewStress 200000"
  */
object RetrievalSkewStress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = GraftSession.local("graft-retrieval-skew-stress")
    spark.sparkContext.setLogLevel("WARN")

    // every doc: the stopword + 24 banded words (ids spread so low bands
    // repeat corpus-wide and high bands are near-unique — a crude zipf)
    val corpus = spark
      .range(nDocs)
      .select(
        col("id").as("doc_id"),
        concat(
          lit("the"),
          concat_ws(
            " ",
            lit(""),
            expr("transform(sequence(0, 23), j -> concat('w', " +
              "pmod(id * 31 + j * 17, 50 + pmod(j, 6) * 20000)))")
          )
        ).as("text")
      )
    val idx = java.nio.file.Files
      .createTempDirectory("graft-retrieval-skew")
      .toString
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[rskew] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    time(s"index build ($nDocs docs, positional)") {
      Retrieval.writeInvertedIndexOf(spark, corpus, idx, withPositions = true)
    }

    val ss = spark
    import ss.implicits._
    val hot = Seq((0L, "the")).toDF("qid", "w")
    val rare = Seq((1L, "w60013")).toDF("qid", "w")
    val mixed = Seq((2L, "the"), (2L, "w60013"), (2L, "w17"))
      .toDF("qid", "w")

    for ((name, qt) <- Seq("hot(stopword)" -> hot, "rare" -> rare,
        "mixed" -> mixed)) {
      val res = Retrieval.bm25TopKIndexedOf(spark, qt, idx, k = 10)
      val plan = res.queryExecution.executedPlan.toString
      val partial = plan.contains("WindowGroupLimit") &&
        plan.contains("Partial") && plan.contains("Final")
      val n = time(s"bm25 $name")(res.count())
      println(s"[rskew] $name rows=$n twoPhaseTopK=$partial")
      assert(partial, "expected partial+final WindowGroupLimit in the plan")
      assert(n > 0)
    }

    // Stopword-PHRASE probe: the pathological phrase query leads with the
    // corpus-wide term — its positions leg is one row per document — while
    // the second slot prunes the anchors. The anchor aggregation is
    // map-side combined and the final rank is the same two-phase top-k,
    // so the hot phrase stays shuffle-bounded by (matching docs), not by
    // the stopword's position list landing on one machine.
    val tok0 = corpus
      .filter(col("doc_id") === 0L)
      .select(expr("filter(split(text, ' '), x -> x != '')"))
      .head()
      .getSeq[String](0)
    val hotPhrase = Seq((10L, 1L, tok0(0)), (10L, 2L, tok0(1)))
      .toDF("qid", "j", "w") // "the <band0>": ~nDocs/50 matches
    val rarePhrase = Seq((11L, 1L, tok0(5)), (11L, 2L, tok0(6)))
      .toDF("qid", "j", "w") // high-band bigram: near-unique
    for ((name, ph) <- Seq("hot(stopword-led)" -> hotPhrase,
        "rare" -> rarePhrase)) {
      val res = Retrieval.phraseTopKIndexedOf(spark, ph, idx, k = 10)
      val plan = res.queryExecution.executedPlan.toString
      val partial = plan.contains("WindowGroupLimit") &&
        plan.contains("Partial") && plan.contains("Final")
      val n = time(s"phrase $name")(res.count())
      println(s"[rskew] phrase $name rows=$n twoPhaseTopK=$partial")
      assert(partial, "expected partial+final WindowGroupLimit in the plan")
    }

    // Stopword-BOOLEAN probe: conjunctive (AND) retrieval with the
    // corpus-wide term in the query. The stopword contributes one
    // candidate row per document, but the AND gate intersects with the
    // rare term's postings before ranking — the conjunction is bounded
    // by the RAREST term's list, the classic boolean-retrieval
    // optimization surfaced by the plan (the gate join shrinks the
    // ranking input; OR-mode BM25 ranks the whole stopword list).
    val hotAnd = Seq((20L, "the"), (20L, "w60013")).toDF("qid", "w")
    val hotOr = hotAnd
    for ((name, qt, and) <- Seq(
        ("and(stopword∧rare)", hotAnd, true),
        ("or(same terms, BM25)", hotOr, false))) {
      def run() =
        (if (and) Retrieval.booleanTopKIndexedOf(spark, qt, idx, k = 10)
         else Retrieval.bm25TopKIndexedOf(spark, qt, idx, k = 10)).count()
      run(): Unit // warm the IO/codegen path; time the second execution
      val n = time(s"boolean-vs-or $name (warm)")(run())
      println(s"[rskew] boolean-vs-or $name rows=$n")
    }

    // O(batch) append + fold: the batch is 1% of the corpus
    val batch = spark
      .range(nDocs, nDocs + nDocs / 100)
      .select(
        col("id").as("doc_id"),
        concat(lit("the w"), pmod(col("id"), lit(50)).cast("string"))
          .as("text")
      )
    time(s"append (${nDocs / 100} docs)") {
      Retrieval.appendToInvertedIndex(spark, batch, idx)
    }
    time("compact") {
      Retrieval.compactInvertedIndex(spark, idx)
    }
    val h = Retrieval.retrievalIndexHealth(spark, idx).head()
    println(
      s"[rskew] post-compact layers=${h.getAs[Long]("n_layers")} " +
        s"postingFiles=${h.getAs[Long]("n_posting_files")}"
    )
    graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(idx))
    spark.stop()
  }
}
