package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Similarity}

/** Media near-dup (m6) scale harness — the round-12 verdict's missing
  * figure: every other heavy plane has a recorded 5–10× measurement
  * (HeavyTailStress, RetrievalSkewStress); this measures the perceptual
  * near-dup plane's candidate mass and wall as the asset count grows.
  *
  * Two feature regimes, because the stub extractor's geometry is NOT the
  * production geometry:
  *
  *   - '''spread''' (the production shape): deterministic pseudo-random
  *     8-dim vectors — assets occupy the LSH space the way a real
  *     encoder's features do. The multiprobe candidate mass follows the
  *     LSH law: ≈ (nBits+1) · n² / (regions · labels) pairs, i.e.
  *     CANDIDATES PER ASSET grow ∝ n / regions — sub-quadratic by the
  *     bucket factor, linear only while n ≪ regions. The operational
  *     knob is nBits growing with log₂ n (the harness measures 12 vs 14
  *     bits at 5× to show the knob works); an 8-dim stub saturates at
  *     Σ_{i≤8} C(nBits, i) regions, a real 512-dim encoder does not.
  *   - '''stub-degenerate''' (the m6 fixture regime): the deployed stub
  *     derives features from byte length mod 97, so the whole corpus
  *     collapses onto 97 directions and every byte-length-congruent pair
  *     IS a true near-dup at the 0.9999999 threshold — OUTPUT mass
  *     itself is quadratic within congruence classes, no candidate
  *     strategy can be linear there. Measured at 1× only, to document
  *     why the fixture regime must not be scaled naively.
  *
  * Planted ground truth in both regimes: ×2-scaled parallel twins for
  * the lowest ids (the m6 seed protocol) — recall of the planted pairs
  * is asserted, so the measured configurations are known-correct, not
  * just fast.
  *
  *   sbt "runMain graft.MediaStress 20000"
  */
object MediaStress {

  /** Spread regime: deterministic hash-noise coordinates in [−1, 1]
    * (xxhash64 per (id, k) — a LINEAR id formula would collapse the
    * corpus onto |modulus| distinct vectors and fake the geometry).
    */
  private def spreadFeatures(spark: SparkSession, n: Long): DataFrame =
    spark
      .range(n)
      .select(
        col("id").as("vec_id"),
        expr(
          "transform(sequence(1, 8), k -> " +
            "cast(pmod(xxhash64(id, k), 2001) - 1000 as float) / 1000.0f)"
        ).as("embedding"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("id") % 3 + 1).cast("int")
        ).as("label")
      )

  /** Stub-degenerate regime: the deployed extractor's arithmetic
    * (features from a synthetic byte length, mod 97).
    */
  private def stubFeatures(spark: SparkSession, n: Long): DataFrame =
    spark
      .range(n)
      .select(
        col("id").as("vec_id"),
        expr(
          "transform(sequence(1, 8), k -> " +
            "cast((pmod(id * 31 + 50, 100000) * k) % 97 + 1 as float))"
        ).as("embedding"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (col("id") % 3 + 1).cast("int")
        ).as("label")
      )

  /** The m6 seed protocol: ×2-scaled exactly-parallel twins of the
    * lowest `nSeeds` ids, same label, ids offset far above the corpus.
    */
  private def seeded(base: DataFrame, nSeeds: Long): DataFrame =
    base.unionByName(
      base
        .filter(col("vec_id") < nSeeds)
        .select(
          (col("vec_id") + 10000000L).as("vec_id"),
          transform(col("embedding"), v => (v * lit(2.0f)).cast("float"))
            .as("embedding"),
          col("label")
        )
    )

  def main(args: Array[String]): Unit = {
    val n1 = args.headOption.map(_.toLong).getOrElse(20000L)
    val spark = GraftSession.local("graft-media-stress")
    spark.sparkContext.setLogLevel("WARN")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def measure(tag: String, feats0: DataFrame, n: Long, nBits: Int): Unit = {
      val nSeeds = math.max(n / 100, 10L)
      val feats = seeded(feats0, nSeeds).cache()
      feats.count(): Unit // isolate ingest from the measured legs
      // candidate mass: the (bucket, label) multiprobe join BEFORE the
      // cosine — the quantity whose growth decides survivability
      val corpus = feats
        .withColumn("bucket", Similarity.signBucket(col("embedding"), nBits))
        .cache()
      val probes = corpus.select(
        col("label"),
        col("vec_id").as("a"),
        explode(
          array(
            (col("bucket") +: (0 until nBits).map(i =>
              col("bucket").bitwiseXOR(shiftleft(lit(1L), i)))): _*
          )
        ).as("bucket")
      )
      val (cand, candSec) = time(
        probes
          .join(
            corpus.select(col("label"), col("vec_id").as("b"), col("bucket")),
            Seq("bucket", "label")
          )
          .filter(col("a") < col("b"))
          .count()
      )
      // the operator itself: scored pairs + transitive components
      val (pairs, pairSec) =
        time(Similarity.embeddingNearDupOn(feats, 0.9999999, nBits).cache())
      val nPairs = pairs.count()
      val (clusters, compSec) =
        time(Dedup.components(pairs.select("a", "b")).count())
      // planted-recall: every ×2 twin must pair with its original
      val planted = pairs
        .filter(col("b") === col("a") + 10000000L)
        .count()
      println(
        f"[mstress] $tag n=$n nBits=$nBits candidates=$cand " +
          f"(${cand.toDouble / (n + nSeeds)}%.1f/asset, $candSec%.2f s) " +
          f"pairs=$nPairs ($pairSec%.2f s) clusters=$clusters ($compSec%.2f s) " +
          f"planted=$planted/$nSeeds"
      )
      assert(planted == nSeeds, s"$tag: planted twin lost (recall gap)")
      pairs.unpersist(false)
      corpus.unpersist(false)
      feats.unpersist(false)
    }

    // production-shaped space: 1× and 5×, fixed bits (the LSH law's n²
    // term visible) and scaled bits at 5× (the knob that restores the
    // per-asset bound)
    measure("spread", spreadFeatures(spark, n1), n1, nBits = 12)
    measure("spread", spreadFeatures(spark, 5 * n1), 5 * n1, nBits = 12)
    measure("spread", spreadFeatures(spark, 5 * n1), 5 * n1, nBits = 14)
    // the fixture regime, documented at 1×: output mass is itself
    // quadratic within byte-length congruence classes — candidates ≈
    // true pairs, so candidate "overhead" is not the story here
    measure("stub", stubFeatures(spark, n1), n1, nBits = 12)

    spark.stop()
  }
}
