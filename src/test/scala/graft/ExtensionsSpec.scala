package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** The custom expression is reachable from pure SQL via
  * SparkSessionExtensions, and matches JVM String.hashCode exactly.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("java_string_hash registers and computes JVM hashCode in SQL") {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val rows = spark
        .sql(
          "SELECT s, java_string_hash(s) AS h FROM VALUES " +
            "('0'), ('14'), ('kafka-journal'), (''), ('äöü漢字') AS t(s)"
        )
        .collect()
      rows.foreach { r =>
        assert(r.getInt(1) == r.getString(0).hashCode, r.getString(0))
      }
      // codegen and interpreted paths agree
      val viaColumn = spark
        .range(1)
        .select(
          graft.functions.JavaStringHash
            .javaHash(org.apache.spark.sql.functions.lit("graft"))
            .as("h")
        )
        .head()
        .getInt(0)
      assert(viaColumn == "graft".hashCode)

      // poly_hash reaches SQL and agrees with the engine's portable fold
      val ph = spark
        .sql(
          "SELECT s, poly_hash(s) AS h, poly_hash(s, 37, 998244353) AS h2 " +
            "FROM VALUES ('abc'), (''), ('kafka journal rows'), ('漢字') AS t(s)"
        )
        .collect()
      def fold(s: String, base: Long, mod: Long): Long = {
        var acc = 0L
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          acc = (acc * base + cp) % mod
          i += Character.charCount(cp)
        }
        acc
      }
      ph.foreach { r =>
        assert(r.getLong(1) == fold(r.getString(0), 31L, 1000000007L))
        assert(r.getLong(2) == fold(r.getString(0), 37L, 998244353L))
      }

      // sign_lsh_bucket reaches SQL and matches the Column API
      val viaSql = spark
        .sql(
          "SELECT sign_lsh_bucket(array(cast(0.5 as float), " +
            "cast(-1.25 as float), cast(2.0 as float)), 12) AS b"
        )
        .head()
        .getLong(0)
      import org.apache.spark.sql.functions.{array, lit}
      val viaCol = spark
        .range(1)
        .select(
          graft.functions.SignLshBucket
            .signBucket(
              array(lit(0.5f), lit(-1.25f), lit(2.0f)),
              12
            )
            .as("b")
        )
        .head()
        .getLong(0)
      assert(viaSql == viaCol)

      // null elements null-propagate the fold like the declarative form:
      // every sign bit forces to 0 → bucket 0
      val nullBucket = spark
        .sql(
          "SELECT sign_lsh_bucket(array(cast(1.0 as double), " +
            "cast(null as double)), 12) AS b"
        )
        .head()
        .getLong(0)
      assert(nullBucket == 0L)

      // ngram_poly_hash reaches SQL; each element equals the per-window
      // substr fold (the rolling recurrence must emit identical values —
      // covers partial grams of short texts and surrogate pairs)
      val ng = spark
        .sql(
          "SELECT s, ngram_poly_hash(s, 5) AS g FROM VALUES " +
            "('the quick brown fox'), ('ab'), (''), ('ä😀漢字x😀y') AS t(s)"
        )
        .collect()
      def foldWindow(s: String, from: Int, n: Int): Long = {
        val cps = s.codePoints().toArray
        val w = cps.slice(from, math.min(from + n, cps.length))
        w.foldLeft(0L)((a, c) => (a * 31L + c) % 1000000007L)
      }
      ng.foreach { r =>
        val s = r.getString(0)
        val got = r.getSeq[Long](1)
        val nCps = s.codePoints().count().toInt
        val expect =
          (0 until math.max(nCps - 4, 1)).map(i => foldWindow(s, i, 5))
        assert(got == expect, s"'$s'")
      }

      // kmv_min_hashes reaches SQL as a GROUP BY aggregate (the analyzer
      // wraps the injected AggregateFunction)
      val kmv = spark
        .sql(
          "SELECT g, kmv_min_hashes(v, 3) AS mins FROM VALUES " +
            "('a', 5L), ('a', 1L), ('a', 9L), ('a', 1L), ('a', 7L), ('b', 2L) " +
            "AS t(g, v) GROUP BY g ORDER BY g"
        )
        .collect()
      assert(kmv(0).getSeq[Long](1) == Seq(1L, 5L, 7L))
      assert(kmv(1).getSeq[Long](1) == Seq(2L))

      // sorted_hit_count reaches SQL with a literal (foldable) dictionary
      val hits = spark
        .sql(
          "SELECT sorted_hit_count(array(1L, 2L, 3L, 9L), array(9L, 2L)) AS h"
        )
        .head()
        .getLong(0)
      assert(hits == 2L)
      val err = intercept[Exception] {
        spark
          .sql("SELECT sorted_hit_count(array(1L), array(id)) FROM range(1)")
          .collect()
      }
      assert(err.getMessage.contains("foldable") ||
        err.getMessage.toLowerCase.contains("sorted_hit_count"))
    } finally spark.stop()
  }

  test("poly_hash and sign_lsh_bucket stay inside whole-stage codegen") {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("graft-codegen-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      import org.apache.spark.sql.functions.{array, col, lit}
      val df = spark
        .range(8)
        .select(
          graft.functions.PolyHash
            .polyHash(col("id").cast("string"))
            .as("h"),
          // non-constant input: a literal array constant-folds away before
          // codegen (the expression is foldable — itself worth knowing)
          graft.functions.SignLshBucket
            .signBucket(array(col("id").cast("float"), lit(-1.0f)), 12)
            .as("b")
        )
      val gen = org.apache.spark.sql.execution.debug
        .codegenString(df.queryExecution.executedPlan)
      // doGenCode ran: the generated Java calls the static one-pass kernels.
      // An interpreted fallback (eval) would leave no trace in the codegen.
      assert(gen.contains("graft.functions.PolyHash.hash"), gen.take(500))
      assert(gen.contains("graft.functions.SignLshBucket.bucket"), gen.take(500))
      assert(!gen.contains("Found 0 WholeStageCodegen"), gen.take(200))

      // sorted_hit_count: the dictionary rides as a reference object and
      // the generated Java calls the binary-search kernel per row
      val hc = spark
        .range(8)
        .select(
          graft.functions.SortedHitCount
            .hitCount(
              array(col("id"), (col("id") * 2).cast("long")),
              Array(2L, 4L, 6L)
            )
            .as("hits")
        )
      val hcGen = org.apache.spark.sql.execution.debug
        .codegenString(hc.queryExecution.executedPlan)
      assert(hcGen.contains("graft.functions.SortedHitCount.count"), hcGen.take(500))
      // per id: [id, 2id] vs {2,4,6} → hits 0,1,2,1,1,0,1,0 = 6
      assert(hc.collect().map(_.getLong(0)).sum == 6L)
    } finally spark.stop()
  }
}
