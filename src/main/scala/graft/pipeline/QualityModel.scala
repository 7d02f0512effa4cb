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

  /** P35 — bigram-LM familiarity scoring: an add-one-smoothed bigram
    * language model is "trained" (counted) on the HISTORY corpus (the d9
    * boundary split's old 80%) and each arriving document is scored by
    * its mean per-bigram familiarity — the classic perplexity-style
    * quality signal (CCNet's KenLM filter), expressed with an
    * exact-integer surrogate: weight_ppm(a,b) = (10⁶·(c(a,b)+1)) DIV
    * (c(a)+V), the add-one conditional in ppm, monotone in the real
    * probability, no floating log crossing engines. Out-of-vocabulary
    * bigrams get the smoothing floor, exactly as the model assigns them.
    *
    * Scale shape — deliberately the WORD-GRAIN complement of p26's
    * hashed-bucket broadcast profile: the unigram and bigram count
    * tables are vocabulary-sized (not broadcastable at 100 TB), so
    * scoring joins the batch's exploded bigrams AGAINST them on their
    * natural keys — two map-side-combined count aggregations at
    * training, two keyed shuffle joins at scoring, each moving only the
    * batch's bigram rows plus the counts they touch. A deployment
    * persists the count tables and appends to them; here training and
    * scoring compose into one oracle-replayable query.
    */
  def lmFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val boundary = Dedup.incrementalBoundary(spark, dir)
    val d = docs(spark, dir).select(
      col("doc_id"),
      expr("filter(split(text, ' '), x -> x != '')").as("ws")
    )
    val hist = d.filter(col("doc_id") < boundary)
    val uni = hist
      .select(explode(col("ws")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bi = hist
      .select(explode(TextAnalysis.adjPairs(col("ws"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b2"))
      .agg(count(lit(1)).as("cb"))
    val newb = d
      .filter(col("doc_id") >= boundary)
      .select(col("doc_id"), explode(TextAnalysis.adjPairs(col("ws"))).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b2"))
    val scored = newb
      .join(bi, Seq("a", "b2"), "left")
      .join(uni.withColumnRenamed("w", "a"), Seq("a"), "left")
      .crossJoin(broadcast(vocab)) // single-row vocabulary size
      .select(
        col("doc_id"),
        (lit(1000000L) * (coalesce(col("cb"), lit(0L)) + lit(1L)))
          .as("num"),
        (coalesce(col("cu"), lit(0L)) + col("v")).as("den")
      )
      .select(col("doc_id"), expr("num DIV den").as("wgt"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("wgt").as("tot"))
    d.filter(col("doc_id") >= boundary)
      .select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams") > 0, expr("tot DIV n_bigrams"))
          .otherwise(lit(0L))
          .as("score_ppm")
      )
      .orderBy("doc_id")
  }
}
