package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Dedup

/** Property specs for the span-removal plane against an INDEPENDENT
  * brute-force model. The DuckDB oracle replays the same windowed
  * derivation the operators run, so oracle agreement alone cannot catch a
  * shared misreading of the SEMANTICS (an off-by-one both sides make).
  * The model here is a direct set-comprehension transcription of the
  * definition — all-pairs, position sets, no window functions — over
  * randomized small corpora from a tiny vocabulary (which forces dense
  * window collisions, repeats, short docs, empty docs).
  */
class SpanModelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-span-model-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // --- the brute-force model -------------------------------------------

  private def windows(ws: Seq[String], l: Int): Seq[(Int, String)] =
    if (ws.size < l) Seq.empty
    else (1 to ws.size - l + 1).map(i => i -> ws.slice(i - 1, i - 1 + l).mkString(" "))

  /** covered positions given dup start positions */
  private def covered(n: Int, dupStarts: Set[Int], l: Int): Set[Int] =
    (1 to n).filter { p =>
      (math.max(1, p - l + 1) to p).exists(dupStarts.contains)
    }.toSet

  private def modelCrossDoc(
      docs: Map[Long, Seq[String]],
      l: Int
  ): Map[Long, (Long, Long, String)] = {
    val winDocs: Map[String, Set[Long]] = docs.toSeq
      .flatMap { case (id, ws) => windows(ws, l).map(w => (w._2, id)) }
      .groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    docs.collect {
      case (id, ws) if ws.nonEmpty =>
        val dupStarts = windows(ws, l).collect {
          case (i, w) if winDocs(w).size >= 2 => i
        }.toSet
        val cov = covered(ws.size, dupStarts, l)
        val cleaned =
          ws.zipWithIndex.collect { case (w, p) if !cov(p + 1) => w }
        id -> ((ws.size.toLong, cov.size.toLong, cleaned.mkString(" ")))
    }
  }

  private def modelSelfRepeat(
      docs: Map[Long, Seq[String]],
      l: Int
  ): Map[Long, (Long, Long, String)] =
    docs.collect {
      case (id, ws) if ws.nonEmpty =>
        val dupStarts = windows(ws, l)
          .groupBy(_._2)
          .values
          .collect { case occ if occ.size >= 2 => occ.map(_._1).sorted.drop(1) }
          .flatten
          .toSet
        val cov = covered(ws.size, dupStarts, l)
        val cleaned =
          ws.zipWithIndex.collect { case (w, p) if !cov(p + 1) => w }
        id -> ((ws.size.toLong, cov.size.toLong, cleaned.mkString(" ")))
    }

  // --- generators -------------------------------------------------------

  private val vocab = Vector("a", "b", "c", "d", "e")
  private val genCorpus: Gen[Map[Long, Seq[String]]] = for {
    n <- Gen.choose(3, 8)
    docs <- Gen.listOfN(
      n,
      Gen.choose(0, 22).flatMap(len => Gen.listOfN(len, Gen.oneOf(vocab)))
    )
  } yield docs.zipWithIndex.map { case (ws, i) => i.toLong -> ws.toSeq }.toMap

  private def toDf(docs: Map[Long, Seq[String]]) = {
    val sp = spark
    import sp.implicits._
    docs.toSeq
      .map { case (id, ws) => (id, ws.mkString(" ")) }
      .toDF("doc_id", "text")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    df.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  // --- properties -------------------------------------------------------

  /** Deterministic sampling (fixed seeds): scalatestplus is not on the
    * offline classpath, so the Gen is driven directly — same coverage,
    * reproducible failures (the seed is in the assertion message).
    */
  private def samples(n: Int): Seq[(Long, Map[Long, Seq[String]])] =
    (1 to n).map { i =>
      i.toLong -> genCorpus(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Map.empty)
    }

  test("d12 cross-doc removal equals the brute-force model on random corpora") {
    for ((seed, docs) <- samples(12) if docs.values.exists(_.nonEmpty)) {
      val l = 3
      val got = run(Dedup.removeDupSpansOf(toDf(docs), spanWords = l))
      assert(got == modelCrossDoc(docs, l), s"seed=$seed docs=$docs")
    }
  }

  test("d13 self-repetition removal equals the brute-force model") {
    for ((seed, docs) <- samples(12) if docs.values.exists(_.nonEmpty)) {
      val l = 2
      val got = run(Dedup.removeRepeatedSpansOf(toDf(docs), spanWords = l))
      assert(got == modelSelfRepeat(docs, l), s"seed=$seed docs=$docs")
    }
  }

  /** d10's measurement grain against the same independent model: windows
    * with multiplicities, distinct-doc counts, and the dup-position mass.
    */
  private def modelDupSpans(
      docs: Map[Long, Seq[String]],
      l: Int
  ): Map[Long, (Long, Long, Long, Long)] = {
    val winDocs: Map[String, Set[Long]] = docs.toSeq
      .flatMap { case (id, ws) => windows(ws, l).map(w => (w._2, id)) }
      .groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    docs.collect {
      case (id, ws) if ws.size >= l =>
        val occ = windows(ws, l).groupBy(_._2).view.mapValues(_.size).toMap
        val nWindows = occ.values.sum.toLong
        val distinct = occ.size.toLong
        val dupPos =
          occ.collect { case (w, c) if winDocs(w).size >= 2 => c }.sum.toLong
        val dupDistinct =
          occ.count { case (w, _) => winDocs(w).size >= 2 }.toLong
        id -> ((nWindows, distinct, dupPos, dupDistinct))
    }
  }

  test("d10 dup-span mass equals the brute-force model") {
    // d10 reads from a directory, so the random corpus round-trips
    // through parquet like the real operator input
    for ((seed, docs) <- samples(10) if docs.values.exists(_.size >= 4)) {
      val l = 4
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft-d10-model-$seed").toString
      val sp = spark
      import sp.implicits._
      docs.toSeq
        .map { case (id, ws) => (id, ws.mkString(" "), "en", "s", 0L) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val got = Dedup
        .dupSpans(spark, tmp, spanWords = l)
        .collect()
        .map(r =>
          r.getLong(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        )
        .toMap
      assert(got == modelDupSpans(docs, l), s"seed=$seed docs=$docs")
    }
  }
}
