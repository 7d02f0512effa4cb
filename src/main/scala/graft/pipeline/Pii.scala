package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before anything else sees the text: count and mask
  * emails, URLs, phone-shaped numbers, and IPv4 literals.
  *
  * Patterns stay in the Java-regex ∩ RE2 dialect (no lookaround, no
  * backrefs) so the DuckDB oracle replays them verbatim; redaction
  * applies in a fixed order (URL → EMAIL → IP → PHONE) on disjoint
  * pattern classes, so the composition is order-stable.
  *
  * The synthetic corpus contains no PII (letters-only word soup), so the
  * canonical query runs over a SEEDED harness corpus: deterministic
  * doc_id-keyed PII suffixes appended identically by the Spark side and
  * the oracle SQL — the d4 seeded-twin pattern. `scan` itself is the
  * reusable entry point for a real corpus.
  *
  * Scale shape: row-local (one codegen'd pass per document, no shuffle
  * except the presentation sort); at 100 TB this is a pure map stage that
  * fuses into whatever scan feeds it.
  */
object Pii {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlRe = "https?://[A-Za-z0-9./_-]+"
  val phoneRe = "555-[0-9]{4}"
  val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  private def countOf(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Per-doc PII counts + fully redacted text for any (doc_id, text) frame. */
  def scan(d: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, urlRe, "<URL>"),
            emailRe,
            "<EMAIL>"
          ),
          ipRe,
          "<IP>"
        ),
        phoneRe,
        "<PHONE>"
      )
    d.select(
      col("doc_id"),
      countOf(t, emailRe).as("n_emails"),
      countOf(t, urlRe).as("n_urls"),
      countOf(t, phoneRe).as("n_phones"),
      countOf(t, ipRe).as("n_ips"),
      redacted.as("redacted")
    )
  }

  /** Deterministic doc_id-keyed PII suffix — replayed verbatim by the
    * oracle's CASE expression; 4 of 5 residue classes carry PII.
    */
  def seededText(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val id = col("doc_id")
    val suffix = when(
      id % 5 === 0,
      concat(
        lit(" contact user"),
        id.cast("string"),
        lit("@example.com or admin@test.org today")
      )
    ).when(
      id % 5 === 1,
      concat(
        lit(" see https://example.com/page/"),
        id.cast("string"),
        lit(" and http://test.org/a")
      )
    ).when(
      id % 5 === 2,
      concat(
        lit(" call 555-"),
        lpad((id % 10000).cast("string"), 4, "0"),
        lit(" or 555-9999")
      )
    ).when(
      id % 5 === 3,
      concat(lit(" ip 192.168."), (id % 256).cast("string"), lit(".17 logged"))
    ).otherwise(lit(""))
    d.select(id, concat(col("text"), suffix).as("text"))
  }

  /** The canonical p16 query: scan the seeded harness corpus. */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    scan(seededText(spark, dir)).orderBy("doc_id")
}
