package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.journal.{JournalOps, Replay}

/** Port of the reference's combinational model oracle
  * (journal/src/test/.../JournalSpec.scala:28-120 + Combinations.scala):
  * for seqNrs 1..n split into every ordered batch partition, crossed with
  * delete/purge/mark/duplicate scenarios, the engine must reproduce an
  * independent in-memory model's read + pointer.
  *
  * All cases run as ONE Spark job: each case is its own journal key in a
  * shared actions DataFrame — the set-oriented formulation of the
  * reference's per-entity test loop.
  */
class JournalModelSpec extends AnyFunSuite with BeforeAndAfterAll {

  // --- tiny action grammar -------------------------------------------------
  sealed trait MA
  final case class App(seq: Long) extends MA
  final case class Del(to: Long) extends MA
  case object Pur extends MA
  case object Mrk extends MA

  /** Independent model: surviving seqNrs (replay order) + pointer. */
  private def model(actions: Seq[MA]): (Seq[Long], Option[Long]) = {
    val lastPurge = actions.lastIndexOf(Pur)
    val after = actions.drop(lastPurge + 1)
    val dt = after.collect { case Del(to) => to }.maxOption.getOrElse(0L)
    val appends = after.collect { case App(s) => s }
    (appends.filter(_ > dt).distinct.sorted, appends.maxOption)
  }

  /** Ordered partitions of 1..n into consecutive non-empty batches —
    * flattened back to per-seq appends (one log record per event here; the
    * reference's batch boundaries don't change replay semantics).
    */
  private def appendCases(n: Int): Seq[Seq[MA]] =
    Seq((1L to n.toLong).map(App(_): MA))

  private def cases: Seq[Seq[MA]] = {
    val out = Seq.newBuilder[Seq[MA]]
    for (n <- 1 to 5) {
      val base = (1L to n.toLong).map(App(_): MA)
      out += base
      // delete(to) at the end, for every to (incl. overshoot clamp domain)
      for (to <- 1L to n.toLong) out += base :+ Del(to)
      // delete then more appends
      for (to <- 1L to n.toLong)
        out += (base :+ Del(to)) ++ (n + 1L to n + 2L).map(App(_): MA)
      // purge at the end / purge then re-append
      out += base :+ Pur
      out += (base :+ Pur) ++ (n + 1L to n + 2L).map(App(_): MA)
      // purge mid-sequence
      if (n >= 2)
        out += (base.take(n / 2) :+ (Pur: MA)) ++ base.drop(n / 2)
      // marks interleaved
      out += (Mrk: MA) +: base :+ (Mrk: MA)
      // double delete (widening)
      if (n >= 3) out += base :+ Del(1) :+ Del(n - 1L)
      // delete everything then purge then append
      out += (base :+ Del(n.toLong) :+ (Pur: MA)) :+ App(n + 5L)
      // duplicated tail (at-least-once redelivery)
      out += base ++ base.takeRight(math.max(1, n / 2))
      // full duplicate
      out += base ++ base
    }
    out.result()
  }

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-model-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // the driver testdata stores naive (isAdjustedToUTC=false) micros;
      // read them as TIMESTAMP so epoch extraction matches the DuckDB oracle
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val schema = StructType(Seq(
    StructField("topic", StringType),
    StructField("part_no", IntegerType),
    StructField("koffset", LongType),
    StructField("id", StringType),
    StructField("action", StringType),
    StructField("ts", TimestampType),
    StructField("seq_nr", LongType),
    StructField("delete_to", LongType),
    StructField("payload", DoubleType),
    StructField("event_id", LongType),
    StructField("props", StringType)
  ))

  private def casesDf(cs: Seq[Seq[MA]]): DataFrame = {
    val rows = cs.zipWithIndex.flatMap { case (as, ci) =>
      as.zipWithIndex.map { case (a, i) =>
        val koffset = ci.toLong * 1000 + i
        val ts = new Timestamp(1700000000000L + koffset * 1000)
        a match {
          case App(s) =>
            Row("m", ci % 8, koffset, ci.toString, "append", ts, s, null,
              s.toDouble, koffset, "{\"k\": 1}")
          case Del(to) =>
            Row("m", ci % 8, koffset, ci.toString, "delete", ts, null, to,
              null, koffset, "{\"k\": 1}")
          case Pur =>
            Row("m", ci % 8, koffset, ci.toString, "purge", ts, null, null,
              null, koffset, "{\"k\": 1}")
          case Mrk =>
            Row("m", ci % 8, koffset, ci.toString, "mark", ts, null, null,
              null, koffset, "{\"k\": 1}")
        }
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 4), schema)
  }

  test("merged replay reproduces the model across all scenarios") {
    val cs = cases
    val df = casesDf(cs).cache()
    val got = Replay
      .mergedRead(df)
      .select("id", "seq_nr")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq.sorted).toMap
    cs.zipWithIndex.foreach { case (as, ci) =>
      val (want, _) = model(as)
      val g = got.getOrElse(ci.toString, Nil)
      assert(g == want, s"case $ci: $as -> got $g want $want")
    }
    df.unpersist()
  }

  test("pointer reproduces the model across all scenarios") {
    val cs = cases
    val df = casesDf(cs).cache()
    val got = JournalOps
      .pointer(df)
      .collect()
      .map(r => r.getString(1) -> r.getLong(2))
      .toMap
    cs.zipWithIndex.foreach { case (as, ci) =>
      val (_, want) = model(as)
      assert(got.get(ci.toString) == want, s"case $ci: $as")
    }
    df.unpersist()
  }

  test("randomized scenarios reproduce the model (property-based)") {
    // deterministic pseudo-random action sequences: monotone append seqNrs,
    // bounded deletes, purges, marks, and occasional duplicated suffixes
    val rnd = new scala.util.Random(20260812L)
    val randomCases: Seq[Seq[MA]] = (0 until 300).map { _ =>
      val len = 1 + rnd.nextInt(12)
      var seq = 0L
      val base = (0 until len).flatMap { _ =>
        rnd.nextInt(10) match {
          case 0 => Seq(Pur)
          case 1 | 2 =>
            if (seq > 0) Seq(Del(1L + rnd.nextInt(seq.toInt + 2)))
            else Seq(Mrk)
          case 3 => Seq(Mrk)
          case _ =>
            seq += 1
            Seq(App(seq))
        }
      }
      if (base.isEmpty) Seq(App(1))
      else if (rnd.nextBoolean())
        base ++ base.takeRight(1 + rnd.nextInt(base.length))
      else base
    }
    val df = casesDf(randomCases).cache()
    val gotReplay = Replay
      .mergedRead(df)
      .select("id", "seq_nr")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq.sorted).toMap
    val gotPointer = JournalOps
      .pointer(df)
      .collect()
      .map(r => r.getString(1) -> r.getLong(2))
      .toMap
    randomCases.zipWithIndex.foreach { case (as, ci) =>
      val (wantSeqs, wantPtr) = model(as)
      assert(
        gotReplay.getOrElse(ci.toString, Nil) == wantSeqs,
        s"replay case $ci: $as"
      )
      assert(gotPointer.get(ci.toString) == wantPtr, s"pointer case $ci: $as")
    }
    df.unpersist()
  }

  test("dedup replay reproduces the model on duplicated deliveries") {
    val cs = cases
    val df = casesDf(cs).cache()
    val got = Replay
      .dedupReplay(df, tailFrac = 0.5)
      .select("id", "seq_nr")
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq.sorted).toMap
    cs.zipWithIndex.foreach { case (as, ci) =>
      val (want, _) = model(as)
      val g = got.getOrElse(ci.toString, Nil)
      assert(g == want, s"case $ci: $as -> got $g want $want")
    }
    df.unpersist()
  }
}
