package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan evidence for the round-16 optimization notes: the registered
  * lifecycle queries materialize eagerly inside their own functions, so
  * `graft.Explain` shows only a `Scan ExistingRDD` over the checkpointed
  * result. This tool prints the INNER plans the optimization claims are
  * about — the expression shapes (cosine walk, encode walk) and the
  * search legs over a freshly built store — without changing any
  * registered query.
  *
  *   sbt "runMain graft.PlanDump p32c_encode m6_cosine ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local("graft-plandump")
    spark.sparkContext.setLogLevel("WARN")
    def show(name: String)(df: => DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    val d = spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val names = if (args.nonEmpty) args.toSet else Set.empty[String]
    def want(n: String) = names.isEmpty || names.contains(n)

    if (want("p32c_encode")) {
      // the encode leg of p32c against a freshly persisted artifact —
      // the plan that carried 8 nested aggregate() folds before
      val tmp = java.nio.file.Files.createTempDirectory("plandump-tok")
      try {
        graft.pipeline.TextAnalysis.writeTokenizer(spark, dir, tmp.toString)
        show("p32c_encode")(
          graft.pipeline.TextAnalysis
            .encodeWithTokenizer(spark, d, tmp.toString))
      } finally graft.util.Fs.deleteRecursively(tmp)
    }
    if (want("m6_cosine")) {
      // the candidate-scoring projection of the m6/d4/d8/k1 family —
      // the cosine expression shape under inspection
      val feats = graft.pipeline.Multimodal
        .seededMediaFeatures(spark, dir)
        .select(
          col("doc_id").as("vec_id"),
          col("embedding"),
          col("media_type").as("label"))
      show("m6_cosine")(
        feats
          .as("l")
          .join(feats.as("r"), col("l.vec_id") < col("r.vec_id"))
          .select(
            graft.pipeline.Similarity
              .cosine(col("l.embedding"), col("r.embedding"))
              .as("sim")))
    }
    if (want("postings_tf")) {
      // the tf frame as the index build shapes it (wb repartition on
      // top) — the claim under inspection is the Exchange count below
      // the repartition: groupBy(doc_id, w) paid one, the row-local
      // term-count walk pays none
      show("postings_tf")(
        graft.pipeline.Retrieval
          .postingsWithLen(d)
          .repartition(16, col("w")))
    }
    if (want("hybrid_search")) {
      // the stored hybrid search legs over a freshly built store pair —
      // p36d/p36e's search phase (construction collects included)
      val split = graft.pipeline.Dedup.incrementalBoundary(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("plandump-hyb")
      try {
        val tIdx = s"$tmp/text"
        val vIdx = s"$tmp/vec"
        graft.pipeline.Retrieval.writeInvertedIndexOf(
          spark,
          d.filter(col("doc_id") < split),
          tIdx,
          withPositions = true)
        val codes = graft.pipeline.Similarity
          .quantized(spark, dir)
          .select("vec_id", "q8")
        graft.pipeline.Similarity.writeIvfIndexExactOf(spark, codes, vIdx)
        show("hybrid_search")(
          graft.pipeline.Retrieval
            .hybridStoredTopK(spark, dir, tIdx, vIdx))
      } finally graft.util.Fs.deleteRecursively(tmp)
    }
    spark.stop()
  }
}
