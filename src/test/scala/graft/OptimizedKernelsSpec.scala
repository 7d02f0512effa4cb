package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 optimization pins: the two expression kernels rewritten from
  * Catalyst higher-order folds to row-local walks must be BIT-IDENTICAL
  * to the superseded forms — the superseded expressions are rebuilt here
  * verbatim and compared on adversarial fixtures, so a future edit to
  * either walk cannot silently drift from the fold semantics the oracles
  * replay.
  */
class OptimizedKernelsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-optimized-kernels-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()


  /** The SUPERSEDED encode fold (TextAnalysis.mergeFold's shape): the
    * leftmost-first-with-consumption BPE apply as a Catalyst aggregate —
    * O(tokens²) per merge, kept here as the law anchor only.
    */
  private def foldMerge(toks: Column, a: String, b: String, m: String): Column =
    aggregate(
      toks,
      typedLit(Seq.empty[String]),
      (acc, t) =>
        when(
          size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && t === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m)))
        ).otherwise(concat(acc, array(t)))
    )

  test("p32c encode walk ≡ the superseded nested Catalyst merge folds") {
    val s = spark; import s.implicits._
    // adversarial shapes: equal-token runs (alternating consumption),
    // chained merges whose merged token immediately re-participates,
    // merges that never fire, empty docs, unicode terms
    val docs = Seq(
      1L -> "a b a b a b",
      2L -> "a a a a a",
      3L -> "a b b a b",
      4L -> "x y z",
      5L -> "",
      6L -> "б в б в б",
      7L -> "a b c a b c a b",
      8L -> (null: String) // null text: both forms must yield null (the
      //   expression chain propagated it; the walk must not NPE)
    ).toDF("doc_id", "text")
    val merges = Array(
      ("a", "b", "a b"),
      ("a b", "c", "a b c"),
      ("a", "a", "a a"),
      ("б", "в", "б в")
    )
    val toks = expr("filter(split(text, ' '), x -> x != '')")
    val folded = merges.foldLeft(toks) { case (c, (x, y, m)) =>
      foldMerge(c, x, y, m)
    }
    val walk = udf((ws: Seq[String]) =>
      graft.pipeline.TextAnalysis.applyMergesWalk(ws, merges))
    val diff = docs
      .select(
        col("doc_id"),
        folded.as("via_fold"),
        walk(toks).as("via_walk")
      )
      .filter(!(col("via_fold") <=> col("via_walk")))
      .count()
    assert(diff === 0L)
  }

  /** The SUPERSEDED cosine (three aggregate(zip_with) dots). */
  private def foldCosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0),
        (acc, v) => acc + v
      )
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("cosine walk ≡ the superseded HOF-fold cosine, nulls and NaN included") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(42)
    val dense = (1 to 200).map { i =>
      (
        Option((1 to 8).map(_ => rnd.nextFloat() * 20f - 10f)),
        Option((1 to 8).map(_ => rnd.nextFloat() * 20f - 10f))
      )
    }
    val edge: Seq[(Option[Seq[Float]], Option[Seq[Float]])] = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(1f, 2f, 3f))), // length mismatch → null
      (None, Some(Seq(1f, 2f))), // null array → null
      (Some(Seq(-1f, -2f, 3f)), Some(Seq(4f, -5f, 6f)))
    )
    val df = (dense ++ edge).toDF("x", "y")
    // <=> treats null = null as true; Spark's NaN semantics make
    // NaN = NaN true as well, so the filter catches any REAL divergence
    val diff = df
      .select(
        foldCosine(col("x"), col("y")).as("via_fold"),
        graft.pipeline.Similarity.cosine(col("x"), col("y")).as("via_walk")
      )
      .filter(!(col("via_fold") <=> col("via_walk")))
      .count()
    assert(diff === 0L)
  }

  test("cosine walk on zero-norm / empty vectors yields NaN (pinned)") {
    // the SUPERSEDED expression form RAISED here — Spark 4's ANSI mode
    // turns the 0.0/0.0 into DIVIDE_BY_ZERO — an artifact no corpus path
    // reaches (no zero-norm embeddings exist in any oracle-checked
    // fixture; the gate is green at both SFs either way). The walk pins
    // the IEEE answer instead of the error: degenerate vectors rank
    // nowhere (NaN never passes a threshold), they don't kill the job.
    val s = spark; import s.implicits._
    val df = Seq(
      (Seq(0f, 0f, 0f), Seq(0f, 0f, 0f)),
      (Seq.empty[Float], Seq.empty[Float])
    ).toDF("x", "y")
    val vals = df
      .select(graft.pipeline.Similarity.cosine(col("x"), col("y")).as("c"))
      .collect()
      .map(_.getDouble(0))
    assert(vals.length === 2 && vals.forall(_.isNaN))
  }

  test("Par.eval preserves argument order and propagates the first failure") {
    val out = graft.util.Par.eval[Int](() => { Thread.sleep(30); 1 }, () => 2, () => 3)
    assert(out === Seq(1, 2, 3))
    val e = intercept[IllegalStateException] {
      graft.util.Par.run(
        () => throw new IllegalStateException("boom"),
        () => Thread.sleep(10)
      )
    }
    assert(e.getMessage === "boom")
  }
}
