package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Retrieval

/** Randomized interleaving law for the layer-keyed inverted-index store
  * (the LM and vector stores run the identical DirSwap + dynamic-
  * partition-overwrite machinery): against a seeded random sequence of
  *
  *   - append of a FRESH batch (its own layer),
  *   - T1 REDELIVERY of the last batch (same docs, same layer),
  *   - compaction protecting the still-redeliverable layer,
  *   - crashed-swap leftovers (an orphan generation and a stale pointer
  *     tmp, swept by the next maintenance swap),
  *   - an empty batch,
  *
  * the store's merged df table and summed doc count must equal an
  * in-memory model that counts every DISTINCT batch exactly once —
  * whatever the interleaving. This is the generative complement of the
  * hand-picked cases in RetrievalIndexSpec: the unit tests pin the
  * specific crash windows, this pins the CLOSURE of the invariant under
  * composition.
  */
class StoreInterleavingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-store-interleaving-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def toDf(docs: Seq[(Long, String)]): DataFrame = {
    val ss = spark
    import ss.implicits._
    docs.toDF("doc_id", "text")
  }

  // raw store reads follow the consumer contract: resolve the live
  // generation (every production consumer does)
  private def dfTable(dir: String): Map[String, Long] = {
    Retrieval.repairInvertedIndex(dir)
    spark.read
      .parquet(graft.util.DirSwap
        .resolve(dir, "df"))
      .groupBy("w")
      .agg(sum("df").as("df"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
  }

  private def nDocs(dir: String): Long = {
    Retrieval.repairInvertedIndex(dir)
    spark.read
      .parquet(graft.util.DirSwap.resolve(dir, "stats"))
      .agg(sum("n_docs"))
      .head()
      .getLong(0)
  }

  /** The model contribution of one batch: df = docs containing the word. */
  private def contrib(docs: Seq[(Long, String)]): Map[String, Long] =
    docs
      .flatMap { case (_, t) => t.split(" ").filter(_.nonEmpty).distinct }
      .groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }

  test("seeded random interleavings: merged counts equal the count-each-batch-once model") {
    for (seed <- Seq(11, 42, 77, 1337)) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"graft-interleave-$seed").toString

      def mkBatch(n: Int, firstId: Long): Seq[(Long, String)] =
        (0 until n).map { i =>
          val words =
            (0 until 5).map(_ => s"w${rnd.nextInt(8)}").mkString(" ")
          (firstId + i, words)
        }

      var nextId = 0L
      val first = mkBatch(4, nextId); nextId += 4
      Retrieval.writeInvertedIndexOf(spark, toDf(first), dir)
      var model = contrib(first)
      var modelDocs = first.size.toLong
      var lastBatch: Option[(Seq[(Long, String)], Long)] = None
      var nextLayer = 1L

      def check(ctx: String): Unit = {
        assert(dfTable(dir) == model, s"[$seed] df mismatch after $ctx")
        assert(nDocs(dir) == modelDocs, s"[$seed] n_docs mismatch after $ctx")
      }

      for (step <- 1 to 8) {
        rnd.nextInt(5) match {
          case 0 | 1 => // fresh batch (occasionally EMPTY — a no-op ingest)
            val b = mkBatch(rnd.nextInt(4), nextId); nextId += b.size
            Retrieval.appendToInvertedIndex(spark, toDf(b), dir, nextLayer)
            model = (model.keySet ++ contrib(b).keySet).map { w =>
              w -> (model.getOrElse(w, 0L) + contrib(b).getOrElse(w, 0L))
            }.toMap
            modelDocs += b.size
            lastBatch = Some((b, nextLayer)); nextLayer += 1
            check(s"append step $step")
          case 2 => // T1 redelivery of the last (possibly uncommitted) batch
            lastBatch.foreach { case (b, layer) =>
              Retrieval.appendToInvertedIndex(spark, toDf(b), dir, layer)
              check(s"redelivery step $step")
            }
          case 3 => // maintenance folds everything but the redeliverable layer
            Retrieval.compactInvertedIndex(
              spark,
              dir,
              protectLayersAbove = nextLayer - 2L
            )
            check(s"compact step $step")
          case 4 => // crashed swap leftovers: an orphan generation and a
            // stale pointer tmp — reads unaffected, next swap sweeps
            val name = Seq("postings", "df", "stats")(rnd.nextInt(3))
            Files.createDirectories(
              Paths.get(dir, s"$name.gen-${8000000 + step}"))
            Files.write(
              Paths.get(dir, s"$name.current.tmp-${8000000 + step}"),
              s"$name.gen-${8000000 + step}".getBytes)
            check(s"crash leftovers step $step")
        }
      }
      // terminal fold of everything: one layer, model unchanged
      Retrieval.compactInvertedIndex(spark, dir)
      check("terminal compact")
      graft.util.Fs.deleteRecursively(Paths.get(dir))
    }
  }
}
