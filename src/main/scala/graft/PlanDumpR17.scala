package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan evidence for the round-17 optimization notes (the round-16
  * PlanDump pattern): prints the INNER plans the round's expression-level
  * claims are about, runnable at the pre-round commit (before files) and
  * at HEAD (after files) — it references only API that exists in both
  * trees.
  *
  *   sbt "runMain graft.PlanDumpR17 k5_exact_search kmeans_iteration ..."
  */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-plandump-r17")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def show(name: String)(df: => DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    val names = if (args.nonEmpty) args.toSet else Set.empty[String]
    def want(n: String) = names.isEmpty || names.contains(n)

    val codes = graft.pipeline.Similarity
      .quantized(spark, dir)
      .select(col("vec_id"), col("q8"))

    if (want("k5_exact_search")) {
      // the full exact-integer search plan: assignment, probe selection,
      // candidate scoring — the expression shapes under inspection
      val cents =
        graft.pipeline.Similarity.trainCentroidsExact(codes, 16, 3)
      show("k5_exact_search")(
        graft.pipeline.Similarity.searchCellsExact(
          graft.pipeline.Similarity.assignCellsInt(codes, cents),
          codes,
          cents,
          10,
          5,
          2
        )
      )
    }

    if (want("kmeans_iteration")) {
      // ONE Lloyd's iteration's centroid re-estimation as the superseded
      // DataFrame aggregation ran it (assignment projection → posexplode
      // → groupBy(cid, pos) EXCHANGE → agg). The round-17 form has no
      // SQL plan here at all: the iteration is one RDD treeAggregate
      // (single stage, no exchange) — so this target is captured for the
      // BEFORE file only; the after evidence is the code
      // (Similarity.trainCentroidsExact) + the kernel spec.
      val cents =
        graft.pipeline.Similarity.trainCentroidsExact(codes, 16, 0)
      show("kmeans_iteration")(
        graft.pipeline.Similarity
          .assignCellsInt(codes, cents)
          .select(col("cid"), posexplode(col("q8")))
          .groupBy("cid", "pos")
          .agg(expr("sum(col) DIV count(1)").as("v"))
      )
    }

    if (want("p31_merge_round")) {
      // one delta-trainer round's fused apply+delta expression over the
      // gated corpus (the p31/p32 hot path)
      val params = broadcast(
        Seq(("the", "of", "the of", " the of "))
          .toDF("pa", "pb", "pm", "pneedle")
      )
      val state = spark.read
        .parquet(s"$dir/documents.parquet")
        .select(
          col("doc_id"),
          expr("filter(split(text, ' '), x -> x != '')").as("toks")
        )
        .withColumn(
          "txt",
          concat(lit(" "), array_join(col("toks"), " "), lit(" "))
        )
      show("p31_merge_round")(
        state
          .crossJoin(params)
          .filter(instr(col("txt"), col("pneedle")) > 0)
          .select(
            col("doc_id"),
            graft.pipeline.TextAnalysis
              // the production round expression: mergeDeltaFold at the
              // pre-round commit (the _before capture), mergeDeltaWalk
              // at HEAD (the _after capture)
              .mergeDeltaWalk(col("toks"), col("pa"), col("pb"), col("pm"))
              .as("r")
          )
      )
    }

    if (want("p36d_text_legs")) {
      // the stored bm25 + proximity legs over a freshly built positional
      // store — the handle-sharing claim is job-structure (collect
      // count), so these plans should be operator-identical before/after
      // up to the posting scan's bucket IN-list
      val d = spark.read
        .parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("plandump-r17-text")
      try {
        graft.pipeline.Retrieval
          .writeInvertedIndexOf(spark, d, tmp.toString, withPositions = true)
        show("p36d_bm25_leg")(
          graft.pipeline.Retrieval
            .bm25TopKIndexed(spark, dir, tmp.toString, 5, 20))
        show("p36d_proximity_leg")(
          graft.pipeline.Retrieval
            .proximityTopKIndexed(spark, dir, tmp.toString, 5, 20, 3, 8))
      } finally graft.util.Fs.deleteRecursively(tmp)
    }

    if (want("m6_seeded")) {
      // the m6 harness frame: base ∪ f(base) — before: two extraction
      // branches; after: both branches over the materialized base
      show("m6_seeded")(
        graft.pipeline.Multimodal.seededMediaFeatures(spark, dir))
    }

    spark.stop()
  }
}
