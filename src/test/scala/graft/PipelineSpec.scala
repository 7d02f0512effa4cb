package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, Similarity}

/** Invariant specs for the pipeline operators whose hash-oracle can't be
  * expressed in DuckDB (xxhash64-based MinHash/SimHash/LSH).
  */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-pipeline-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("minhash pairs are symmetric-free, ordered, above threshold") {
    val pairs = Dedup.minhashPairs(spark, sfDir).cache()
    assert(pairs.filter(col("a") >= col("b")).count() == 0)
    assert(pairs.filter(col("jaccard") < 0.5).count() == 0)
    assert(pairs.count() > 0) // the synthetic corpus contains near-dups
  }

  test("minhash candidates contain every very-high-jaccard pair (recall)") {
    // brute-force ground truth on a small prefix of the corpus
    val docs = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 200)
    val sh = Dedup.shingles(docs).cache()
    val all = sh
      .toDF("a", "shingle")
      .join(sh.toDF("b", "shingle"), Seq("shingle"))
      .filter(col("a") < col("b"))
      .distinct()
      .select("a", "b")
    val truth = Dedup
      .verifyJaccard(all, sh, 0.9)
      .select("a", "b")
    val found = Dedup
      .minhashPairs(spark, sfDir)
      .filter(col("a") < 200 && col("b") < 200)
      .select("a", "b")
    assert(truth.exceptAll(found).count() == 0)
  }

  test("simhash: hamming distance 0 pairs are exact-signature matches") {
    val pairs = Dedup.simhashPairs(spark, sfDir).cache()
    assert(pairs.filter(col("dist") < 0).count() == 0)
    assert(pairs.filter(col("dist") > 8).count() == 0)
    assert(pairs.count() > 0)
  }

  test("lsh buckets cover every vector exactly once") {
    val buckets = Similarity.lshBuckets(spark, sfDir)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(buckets.count() == n)
    assert(buckets.select("vec_id").distinct().count() == n)
  }

  test("ivf knn results are a subset of brute-force candidate space") {
    val ivf = Similarity.knnIvf(spark, sfDir).select("qid", "vec_id")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val labels = emb.select(col("vec_id"), col("label"))
    // every ivf neighbor shares the query's label
    val bad = ivf
      .join(labels.toDF("vec_id", "nl"), "vec_id")
      .join(
        labels.toDF("qid", "ql"),
        "qid"
      )
      .filter(col("nl") =!= col("ql"))
    assert(bad.count() == 0)
  }
}
