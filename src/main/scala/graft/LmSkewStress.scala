package graft

import org.apache.spark.sql.functions._

import graft.pipeline.QualityModel

/** LM-plane skew harness: the pathological scoring input is a corpus
  * where a STOPWORD opens most bigrams — the unigram count-table join
  * keys on the bigram's first token, so one key carries most of the
  * batch's rows (the deliberate shuffle-join posture of p35 means this
  * skew lands in an exchange, not a broadcast). The harness trains a
  * stored model on a synthetic history, then scores a hot batch (50% of
  * bigrams open with `the`) against a uniform batch of the same size at
  * two scales, with AQE's skew-join splitting on — the measured walls
  * are the evidence the plan absorbs the hot key.
  *
  *   sbt "runMain graft.LmSkewStress 200000"
  */
object LmSkewStress {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = GraftSession.local("graft-lm-skew-stress")
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Long, hot: Boolean) = {
      // 12 words per doc; hot form alternates `the <w>` pairs so ~half
      // of all bigrams key the join on the single hot token
      val word = "concat('w', pmod(id * 31 + j * 17, 5000))"
      val tok =
        if (hot) s"IF(j % 2 = 0, 'the', $word)"
        else word
      spark
        .range(n)
        .select(
          col("id").as("doc_id"),
          expr(s"concat_ws(' ', transform(sequence(0, 11), j -> $tok))")
            .as("text")
        )
    }

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lmskew] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    for (scale <- Seq(1L, 5L)) {
      val n = nDocs * scale
      val model = java.nio.file.Files
        .createTempDirectory(s"graft-lmskew-$scale")
        .toString
      time(s"train (${n} docs, hot history)") {
        QualityModel.writeLmModelOf(spark, corpus(n, hot = true), model)
      }
      for ((name, hot) <- Seq("uniform" -> false, "hot(stopword)" -> true)) {
        val scored = QualityModel
          .scoreWithLmModel(spark, corpus(n, hot), model)
        // force the full scoring pipeline (a bare count would let the
        // optimizer prune the score columns)
        val tot = time(s"score $name ($n docs)") {
          scored.agg(sum("score_ppm"), count(lit(1))).head()
        }
        assert(tot.getLong(1) == n)
      }
      graft.util.Fs.deleteRecursively(java.nio.file.Paths.get(model))
    }
    spark.stop()
  }
}
