package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Model-based quality filtering at corpus scale — the inference half of a
  * fastText/CCNet-style quality classifier, expressed Spark-first.
  *
  * Features are the hashing trick over the shared BPE-ish pre-tokens
  * ([[TextAnalysis.bpeTokenCount]]'s segmentation — one token definition
  * across p3/p11/p22): each token maps to one of [[D]] buckets via the
  * portable polynomial hash + multiplicative finalizer (the p10/p11 gate
  * arithmetic under its own salt). The "model" is a deterministic integer
  * weight per bucket — a stand-in for trained weights in this
  * training-lib-free container; swapping in real weights is a 512-entry
  * literal map or a broadcast join, the plan shape doesn't change.
  *
  * The scoring pass is the shape that matters at 100 TB: ONE row-local
  * higher-order-function fold per document (`transform` + `aggregate`
  * over the token array), zero shuffle, zero UDF, whole-stage codegen end
  * to end — inference is embarrassingly parallel and reads a single
  * column. Every quantity is exact BIGINT (weights ∈ [−100, 100], so a
  * billion-token document stays far from overflow) except the final
  * per-token mean, a single exactly-rounded IEEE division both engines
  * agree on — the whole query hash-replays in DuckDB.
  */
object QualityModel {

  private val M = 1000000007L
  private val Fin = 6364136223L

  /** Feature buckets. 512 keeps the demo weight table readable; a real
    * fastText-style model uses 2^20 buckets — same arithmetic, no plan
    * change (the weight stays a derived column, never a lookup table
    * scan).
    */
  val D = 512

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Feature bucket of a token: finalized portable poly hash of the
    * salted token, mod [[D]]. Max intermediate (10^9+6)·Fin < 2^63.
    */
  private def bucketOf(tok: Column): Column =
    pmod(
      pmod(PolyHash.polyHash(concat(lit("graft-qm:"), tok)) * lit(Fin), lit(M)),
      lit(D)
    )

  /** Pseudo-trained weight for bucket `b`, exact-integer and centered on
    * zero: ((b+1)·2654435761 mod 1000003) mod 201 − 100 ∈ [−100, 100].
    */
  private def weightOf(b: Column): Column =
    pmod(pmod((b + lit(1L)) * lit(2654435761L), lit(1000003L)), lit(201L)) -
      lit(100L)

  /** p22 — per-document model score: summed hashed-feature weights over
    * the token stream (term frequency weighting — repeated tokens vote
    * repeatedly, as a linear bag-of-words model does), the per-token mean
    * as the length-normalized "logit", and the keep verdict at a zero
    * threshold.
    */
  def qualityModel(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextAnalysis.bpeTokens(col("text"))
    docs(spark, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        aggregate(
          transform(col("toks"), t => weightOf(bucketOf(t))),
          lit(0L),
          (a, x) => a + x
        ).as("score")
      )
      .withColumn(
        "mean_w",
        when(col("n_toks") === 0, lit(0.0))
          .otherwise(col("score").cast("double") / col("n_toks"))
      )
      .withColumn("keep", col("mean_w") >= 0)
      .orderBy("doc_id")
  }
}
