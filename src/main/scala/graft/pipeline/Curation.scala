package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** p8/p14 — end-to-end training-corpus curation: the composition a real
  * data pipeline runs before training — exact dedup, near-dup
  * clustering, optional benchmark decontamination, and a quality floor —
  * emitting one DECISION row per document with the drop reason.
  *
  * Precedence mirrors pipeline practice (cheapest-first wins the blame):
  * `exact_dup` (non-canonical md5 copy) > `near_dup` (non-canonical
  * member of a minhash cluster) > `contaminated` (p14 only) >
  * `low_quality` (word-count floor) > `kept`. Every stage is an
  * already-verified operator ([[Dedup.exact]], [[Dedup.nearDupClusters]],
  * [[Decontamination.contaminationScan]], the p1 word count) — these
  * queries pin the composition end-to-end against the DuckDB oracle.
  */
object Curation {

  /** The shared decision cascade. `contamination` (doc_id, contaminated)
    * restricts output to its docs via inner join when present — in p14
    * that is exactly the train slice: the eval slice is the benchmark
    * and is never itself curated.
    */
  private def decide(
      spark: SparkSession,
      dir: String,
      contamination: Option[DataFrame],
      minWords: Int
  ): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val exact = Dedup.exact(spark, dir).select("doc_id", "canonical_id")
    val clusters = Dedup
      .nearDupClusters(spark, dir)
      .select(col("doc_id"), col("label"))
    val words = d.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words")
    )
    val joined = contamination.foldLeft(
      words.join(exact, "doc_id").join(clusters, Seq("doc_id"), "left")
    )((acc, c) => acc.join(c, "doc_id"))
    val contaminated =
      if (contamination.isDefined) col("contaminated") else lit(false)
    joined
      .withColumn(
        "reason",
        when(col("doc_id") =!= col("canonical_id"), "exact_dup")
          .when(col("label").isNotNull && col("label") =!= col("doc_id"),
            "near_dup")
          .when(contaminated, "contaminated")
          .when(col("n_words") < minWords, "low_quality")
          .otherwise("kept")
      )
      .select(
        col("doc_id"),
        col("n_words"),
        col("reason"),
        (col("reason") === "kept").as("kept")
      )
      .orderBy("doc_id")
  }

  def curate(spark: SparkSession, dir: String, minWords: Int = 25): DataFrame =
    decide(spark, dir, None, minWords)

  /** p14 — the p8 composition with the decontamination stage spliced
    * into the precedence, curating the TRAIN slice only. Dedup structure
    * (canonical ids, cluster labels) stays corpus-wide as in p8: a train
    * doc whose exact copy IS an eval doc is dropped as a dup, which is
    * also the right contamination outcome.
    */
  def curateFull(
      spark: SparkSession,
      dir: String,
      minWords: Int = 25,
      evalMod: Int = 50
  ): DataFrame =
    decide(
      spark,
      dir,
      Some(
        Decontamination
          .contaminationScan(spark, dir, evalMod = evalMod)
          .select("doc_id", "contaminated")
      ),
      minWords
    )
}
