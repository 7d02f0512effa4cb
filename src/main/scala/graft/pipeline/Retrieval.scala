package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword (sparse) retrieval over the documents table — the lexical
  * complement of the ANN plane: where k1–k14 search by embedding
  * geometry, p33 searches by exact term overlap through an INVERTED
  * INDEX, the way a BM25/tf-idf system does. Everything integer, so the
  * whole ranking — index build included — hash-replays in DuckDB.
  */
object Retrieval {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")

  /** The posting table (doc_id, w, tf): word tokens at the corpus's
    * standard whitespace grain (the d10/d12/p31 tokenization — shared so
    * the retrieval vocabulary can't drift from the dedup/trainer
    * planes).
    */
  private[graft] def postings(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"),
      explode(expr("filter(split(text, ' '), x -> x != '')")).as("w")
    ).groupBy("doc_id", "w")
      .agg(count(lit(1)).as("tf"))

  /** P33 — tf-idf top-k retrieval through the inverted index: the
    * `nQueries` lowest doc_ids play the query set (their distinct terms
    * are the query), every other document is ranked by
    * Σ tf(t,d) · idf_ppm(t) over the shared terms, where idf_ppm =
    * (N·10⁶) DIV df — an exact-integer monotone surrogate of idf (the
    * p26 log-ratio trick; no floating log crosses an engine boundary).
    *
    * Scale shape (the reason this is an operator and not a crossJoin):
    * the posting table is TERM-KEYED — a 100 TB corpus's inverted index —
    * and the query terms with their idf weights are a broadcast-sized
    * frame (nQueries × terms), so candidate generation is one broadcast
    * hash join that touches only the probed terms' posting lists, never
    * the corpus. One (qid, doc_id)-grain aggregation scores the
    * candidates (map-side combined), one keyed window takes top-k
    * (WindowGroupLimit). df/N are corpus statistics a deployment
    * maintains incrementally with the index; here they're one
    * term-grain map-side-combined aggregation.
    */
  def keywordTopK(
      spark: SparkSession,
      dir: String,
      nQueries: Int = 5,
      k: Int = 5
  ): DataFrame = {
    val tf = postings(docs(spark, dir)).cache()
    val nDocs = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
    // query terms: DISTINCT words of the query docs, weighted by idf —
    // df joins the (tiny) query-term set, not the other way around, so
    // the vocabulary-sized df table never broadcasts
    val qt = tf
      .filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("qid"), col("w"))
      .join(df, Seq("w"))
      .crossJoin(broadcast(nDocs)) // single-row total
      .select(
        col("qid"),
        col("w"),
        expr("n_docs * 1000000 DIV df").as("idf_ppm")
      )
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))
    val out = tf
      .join(broadcast(qt), Seq("w"))
      .filter(col("doc_id") =!= col("qid"))
      .groupBy("qid", "doc_id")
      .agg(sum(col("tf") * col("idf_ppm")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "rank", "score")
      .orderBy("qid", "rank")
    Eager.materialized(out, tf)
  }

  /** P36 — hybrid retrieval: reciprocal-rank fusion (Cormack et al.,
    * SIGIR 2009) of the lexical leg (p33's tf-idf through the inverted
    * index) with the dense leg (k2's IVF-bucket cosine search) — the
    * standard two-tower RAG retrieval composition, where each modality
    * surfaces candidates the other is blind to (exact term overlap vs
    * embedding geometry). Each leg contributes its top-`poolK` ranks;
    * a candidate's fused score is Σ_legs 10⁶ DIV (rrfK + rank) — RRF
    * with the conventional dampening constant 60, in exact-integer ppm
    * so the fusion replays bit-for-bit in DuckDB (only RANKS cross the
    * fusion boundary, never floating scores, which is also why RRF
    * needs no per-leg score normalization). A doc absent from a leg's
    * pool contributes nothing for that leg, exactly as RRF defines it.
    * `n_legs` reports how many modalities surfaced each result.
    *
    * Scale shape: both candidate-generation legs are already sub-linear
    * (p33: one broadcast hash join touching only the probed terms'
    * posting lists; k2: scan pruned to the query's IVF cell), and the
    * fusion itself operates on O(nQueries × poolK × 2) rows — LEG-OUTPUT
    * sized, independent of corpus size, so the union + groupBy + window
    * here is a driver-trivial final reduce at any scale. The testdata's
    * vec_id ↔ doc_id identity is the deployment's shared document key.
    */
  def hybridTopK(
      spark: SparkSession,
      dir: String,
      nQueries: Int = 5,
      poolK: Int = 20,
      k: Int = 10,
      rrfK: Int = 60
  ): DataFrame = {
    val lex = keywordTopK(spark, dir, nQueries, poolK)
      .select(col("qid"), col("doc_id"), col("rank"))
    val dense = Similarity
      .knnIvf(spark, dir, nQueries, poolK)
      .select(col("qid"), col("vec_id").as("doc_id"), col("rank"))
    val legs = lex
      .unionByName(dense)
      .select(
        col("qid"),
        col("doc_id"),
        expr(s"1000000 DIV ($rrfK + rank)").as("c")
      )
    val w =
      Window.partitionBy("qid").orderBy(col("rrf_ppm").desc, col("doc_id"))
    legs
      .groupBy("qid", "doc_id")
      .agg(sum("c").as("rrf_ppm"), count(lit(1)).as("n_legs"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("qid", "doc_id", "rank", "rrf_ppm", "n_legs")
      .orderBy("qid", "rank")
  }
}
