package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** p8 — end-to-end training-corpus curation: the composition a real
  * data pipeline runs before training — exact dedup, then near-dup
  * clustering, then a quality floor — emitting one DECISION row per
  * document with the drop reason.
  *
  * Precedence mirrors pipeline practice (cheapest-first wins the blame):
  * `exact_dup` (non-canonical md5 copy) > `near_dup` (non-canonical
  * member of a minhash cluster) > `low_quality` (word-count floor) >
  * `kept`. Every stage is an already-verified operator ([[Dedup.exact]],
  * [[Dedup.nearDupClusters]], the p1 word count) — this query pins their
  * composition end-to-end against the DuckDB oracle.
  */
object Curation {

  def curate(spark: SparkSession, dir: String, minWords: Int = 25): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val exact = Dedup.exact(spark, dir).select("doc_id", "canonical_id")
    val clusters = Dedup
      .nearDupClusters(spark, dir)
      .select(col("doc_id"), col("label"))
    val words = d.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words")
    )
    words
      .join(exact, "doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn(
        "reason",
        when(col("doc_id") =!= col("canonical_id"), "exact_dup")
          .when(col("label").isNotNull && col("label") =!= col("doc_id"),
            "near_dup")
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

  /** p14 — the p8 composition with the decontamination stage spliced
    * into the precedence (exact_dup > near_dup > contaminated >
    * low_quality > kept), curating the TRAIN slice only — the eval
    * slice is the benchmark, it is never itself curated. Dedup
    * structure (canonical ids, cluster labels) stays corpus-wide as in
    * p8: a train doc whose exact copy IS an eval doc is dropped as a
    * dup, which is also the right contamination outcome. Every stage is
    * an already-verified operator (d1, d5, p9, p1's word count); this
    * query pins the full five-way composition against the oracle.
    */
  def curateFull(
      spark: SparkSession,
      dir: String,
      minWords: Int = 25,
      evalMod: Int = 50
  ): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val exact = Dedup.exact(spark, dir).select("doc_id", "canonical_id")
    val clusters = Dedup
      .nearDupClusters(spark, dir)
      .select(col("doc_id"), col("label"))
    val contam = Decontamination
      .contaminationScan(spark, dir, evalMod = evalMod)
      .select("doc_id", "contaminated")
    val words = d.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_words")
    )
    words
      .join(exact, "doc_id")
      .join(clusters, Seq("doc_id"), "left")
      .join(contam, "doc_id") // inner: contam covers exactly the train slice
      .withColumn(
        "reason",
        when(col("doc_id") =!= col("canonical_id"), "exact_dup")
          .when(col("label").isNotNull && col("label") =!= col("doc_id"),
            "near_dup")
          .when(col("contaminated"), "contaminated")
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
}
