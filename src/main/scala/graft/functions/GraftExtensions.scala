package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Session-extension registration: makes the engine's custom Catalyst
  * expressions available to pure SQL users
  * (`spark.sql("SELECT java_string_hash(id) ...")`) via the supported
  * injection point:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Foldable literal argument of a SQL builder (base/mod/nBits must be
    * constants — they parameterize the generated code, not the row).
    */
  private def longArg(e: Expression, what: String): Long = e match {
    case lit if lit.foldable =>
      lit.eval() match {
        case i: Int  => i.toLong
        case l: Long => l
        case other =>
          throw new IllegalArgumentException(
            s"$what must be an integer literal, got $other"
          )
      }
    case other =>
      throw new IllegalArgumentException(
        s"$what must be a foldable literal, got $other"
      )
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        new FunctionIdentifier("java_string_hash"),
        new ExpressionInfo(
          classOf[JavaStringHash].getName,
          "java_string_hash"
        ),
        (children: Seq[Expression]) => JavaStringHash(children.head)
      )
    )
    // poly_hash(s[, base, mod]) — the portable polynomial string hash every
    // dedup/fingerprint operator shares with its DuckDB oracle
    ext.injectFunction(
      (
        new FunctionIdentifier("poly_hash"),
        new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
        (children: Seq[Expression]) =>
          children match {
            case Seq(c) => PolyHash(c, 31L, 1000000007L)
            case Seq(c, b, m) =>
              PolyHash(c, longArg(b, "base"), longArg(m, "mod"))
            case _ =>
              throw new IllegalArgumentException(
                "poly_hash takes (string) or (string, base, mod)"
              )
          }
      )
    )
    // ngram_poly_hash(s, n[, base, mod]) — every char n-gram's poly_hash in
    // one rolling pass, as array<bigint>
    ext.injectFunction(
      (
        new FunctionIdentifier("ngram_poly_hash"),
        new ExpressionInfo(classOf[NgramPolyHash].getName, "ngram_poly_hash"),
        (children: Seq[Expression]) =>
          children match {
            case Seq(c, n) =>
              NgramPolyHash(c, longArg(n, "n").toInt, 31L, 1000000007L)
            case Seq(c, n, b, m) =>
              NgramPolyHash(
                c,
                longArg(n, "n").toInt,
                longArg(b, "base"),
                longArg(m, "mod")
              )
            case _ =>
              throw new IllegalArgumentException(
                "ngram_poly_hash takes (string, n) or (string, n, base, mod)"
              )
          }
      )
    )
    // sign_lsh_bucket(vec[, nBits]) — the embedding sign-LSH bucket
    ext.injectFunction(
      (
        new FunctionIdentifier("sign_lsh_bucket"),
        new ExpressionInfo(classOf[SignLshBucket].getName, "sign_lsh_bucket"),
        (children: Seq[Expression]) =>
          children match {
            case Seq(c) => SignLshBucket(c, 12)
            case Seq(c, n) =>
              SignLshBucket(c, longArg(n, "nBits").toInt)
            case _ =>
              throw new IllegalArgumentException(
                "sign_lsh_bucket takes (array<float|double>) or (array, nBits)"
              )
          }
      )
    )
    // kmv_min_hashes(hv[, k]) — the KMV distinct sketch aggregate; the
    // analyzer wraps the returned AggregateFunction in its
    // AggregateExpression, so SQL GROUP BY usage works directly
    ext.injectFunction(
      (
        new FunctionIdentifier("kmv_min_hashes"),
        new ExpressionInfo(classOf[KmvMinHashes].getName, "kmv_min_hashes"),
        (children: Seq[Expression]) =>
          children match {
            case Seq(c) => KmvMinHashes(c, 64)
            case Seq(c, k) => KmvMinHashes(c, longArg(k, "k").toInt)
            case _ =>
              throw new IllegalArgumentException(
                "kmv_min_hashes takes (bigint) or (bigint, k)"
              )
          }
      )
    )
    // bottom_k_sample(hv, v[, k]) — the mergeable uniform-sample quantile
    // sketch; same analyzer wrapping as kmv_min_hashes
    ext.injectFunction(
      (
        new FunctionIdentifier("bottom_k_sample"),
        new ExpressionInfo(classOf[BottomKSample].getName, "bottom_k_sample"),
        (children: Seq[Expression]) =>
          children match {
            case Seq(h, v) => BottomKSample(h, v, 128)
            case Seq(h, v, k) =>
              BottomKSample(h, v, longArg(k, "k").toInt)
            case _ =>
              throw new IllegalArgumentException(
                "bottom_k_sample takes (bigint, bigint) or (bigint, bigint, k)"
              )
          }
      )
    )
    // sorted_hit_count(arr, dict) — dict must be a foldable array<bigint>
    // (a literal dictionary); evaluated once at resolution into the
    // expression's reference-object dictionary
    ext.injectFunction(
      (
        new FunctionIdentifier("sorted_hit_count"),
        new ExpressionInfo(classOf[SortedHitCount].getName, "sorted_hit_count"),
        (children: Seq[Expression]) =>
          children match {
            case Seq(c, dict) if dict.foldable =>
              // a bare SQL literal like array(1,2,3) resolves as array<int>:
              // accept it by widening, and reject anything else cleanly
              // instead of letting toLongArray throw a cast error
              val ad = dict.eval(null)
              val arr =
                if (ad == null) Array.empty[Long]
                else {
                  val data = ad
                    .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
                  dict.dataType match {
                    case ArrayType(LongType, _) => data.toLongArray()
                    case ArrayType(IntegerType, _) =>
                      data.toIntArray().map(_.toLong)
                    case other =>
                      throw new IllegalArgumentException(
                        s"sorted_hit_count dictionary must be array<bigint> or array<int>, got $other"
                      )
                  }
                }
              SortedHitCount(c, arr)
            case _ =>
              throw new IllegalArgumentException(
                "sorted_hit_count takes (array<bigint>, <foldable array<bigint>>)"
              )
          }
      )
    )
  }
}
