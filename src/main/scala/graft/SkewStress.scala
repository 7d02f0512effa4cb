package graft

import org.apache.spark.sql.functions._

import graft.journal.{ActionRow, HeadInfo, JournalOps}

/** Skew harness: one hot journal holding `hotRows` of the log (everything
  * else uniform). Measures the window fold vs the aggregate-join fold vs
  * the salted chunked typed fold on the pathological shape the reference's
  * design notes warn about (journals too big for memory).
  *
  *   sbt "runMain graft.SkewStress 2000000"
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val hotRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = GraftSession.local("graft-skew-stress")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // hot journal: hotRows appends + sprinkled deletes; 1000 cold journals
    val hot = spark
      .range(hotRows)
      .select(
        lit("t0").as("topic"),
        lit(0).as("part_no"),
        col("id").as("koffset"),
        lit("hot").as("id"),
        when(col("id") % 1000 === 999, "delete").otherwise("append")
          .as("action"),
        when(col("id") % 1000 =!= 999, col("id") + 1).as("seq_nr"),
        when(col("id") % 1000 === 999, (col("id") / 2).cast("long"))
          .as("delete_to")
      )
    val cold = spark
      .range(hotRows / 10)
      .select(
        lit("t0").as("topic"),
        lit(1).as("part_no"),
        col("id").as("koffset"),
        concat(lit("c"), col("id") % 1000).as("id"),
        lit("append").as("action"),
        (col("id") / 1000 + 1).cast("long").as("seq_nr"),
        lit(null).cast("long").as("delete_to")
      )
    val a = hot.unionByName(cold).persist()
    println(s"[skew] rows=${a.count()} (hot journal = ${hotRows})")

    def time[T](name: String)(f: => T): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[skew] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    def force(df: org.apache.spark.sql.DataFrame) =
      df.agg(
        sum(coalesce(col("dt"), lit(0L))),
        sum(col("after_purge").cast("long"))
      ).head().getLong(1)

    time("annotate_window")(force(JournalOps.annotate(a)))
    time("annotate_agg")(force(JournalOps.annotateAgg(a)))

    implicit val enc = org.apache.spark.sql.Encoders.product[ActionRow]
    val rows = a
      .select(
        col("topic"), col("part_no"), col("koffset"), col("id"),
        col("action"),
        coalesce(col("seq_nr"), lit(0L)).as("seqNr"),
        coalesce(col("delete_to"), lit(0L)).as("deleteTo")
      )
      .as[ActionRow]
    time("headinfo_single_task")(HeadInfo.perJournal(spark, rows).count())
    time("headinfo_salted")(
      HeadInfo.perJournalSalted(spark, rows, chunkSize = 100000L).count())

    // range-join skew: ONE hot key owns most points AND most intervals.
    // The binned plan's claim is that skew is ordinary equi-join skew —
    // AQE splits the hot (key, bin) bucket like any other. points spread
    // across bins (they carry distinct times), so the worst cell is
    // hot-key x one-bin, not hot-key x everything.
    val nPts = hotRows / 4
    val pts = spark
      .range(nPts)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000)
          .as("k"),
        (col("id") * 13L % 1000000L).as("t"),
        col("id").as("pid")
      )
    val ivs = spark
      .range(nPts / 50)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 1000)
          .as("k"),
        (col("id") * 37L % 1000000L).as("lo"),
        (col("id") * 37L % 1000000L + 500L).as("hi"),
        col("id").as("iid")
      )
    time("range_join_skewed")(
      graft.analytics.RangeJoin
        .joinRange(pts, ivs, Seq("k"), "t", "lo", "hi", binWidth = 1000L)
        .count()
    )
    spark.stop()
  }
}
