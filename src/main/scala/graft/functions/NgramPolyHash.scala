package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing EVERY character-n-gram polynomial
  * hash of a string in one pass: element i is the [[PolyHash]] fold of the
  * length-n substring starting at code point i (texts shorter than n yield
  * their single partial gram, mirroring `substr`'s clamp).
  *
  * Replaces `transform(sequence(...), i -> poly_hash(substr(text, i, n)))`,
  * which allocates a UTF8String + java String per gram and re-folds each
  * character n times (O(n·L) with heavy allocation — this dominated the
  * d6 profile at 54 s/sf0.1). Here the fold is the Rabin–Karp rolling
  * recurrence h' = (h − cp_out·base^(n−1))·base + cp_in (mod m): one code
  * point array per document, O(L) arithmetic, zero per-gram allocation —
  * and the VALUES are identical to the per-window fold (the recurrence
  * computes the same polynomial), so the DuckDB oracle keeps replaying
  * substr+list_reduce bit-for-bit. Stays inside whole-stage codegen.
  */
final case class NgramPolyHash(child: Expression, n: Int, base: Long, mod: Long)
    extends UnaryExpression {

  require(n >= 1, s"n-gram length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}"
      )

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    NgramPolyHash.hashes(input.asInstanceOf[UTF8String], n, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.NgramPolyHash.hashes($c, $n, ${base}L, ${mod}L)"
    )

  override protected def withNewChildInternal(newChild: Expression): NgramPolyHash =
    copy(child = newChild)
}

object NgramPolyHash {

  /** All n-gram hashes of `s` in one pass. Code-point windows (surrogate
    * pairs whole — the unit `substr`/`length` count); the first window is
    * a direct fold, every subsequent one rolls in O(1).
    */
  def hashes(s: UTF8String, n: Int, base: Long, mod: Long): ArrayData = {
    val str = s.toString
    // one code-point pass (str.length is UTF-16 units, cps.length is chars)
    var cpCount = 0
    var i = 0
    while (i < str.length) { i += Character.charCount(str.codePointAt(i)); cpCount += 1 }
    val cps = new Array[Int](cpCount)
    i = 0
    var k = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      cps(k) = cp
      i += Character.charCount(cp)
      k += 1
    }

    val nGrams = math.max(cpCount - n + 1, 1)
    val out = new Array[Long](nGrams)

    // first window: direct fold over min(n, cpCount) code points (the
    // partial gram of a short text is the fold of the whole text)
    val w = math.min(n, cpCount)
    var h = 0L
    var j = 0
    while (j < w) { h = (h * base + cps(j)) % mod; j += 1 }
    out(0) = h

    if (nGrams > 1) {
      // pow = base^(n-1) mod m, the leading coefficient rolled out
      var pow = 1L
      var p = 1
      while (p < n) { pow = (pow * base) % mod; p += 1 }
      var g = 1
      while (g < nGrams) {
        var t = (h - (cps(g - 1) % mod) * pow % mod) % mod
        if (t < 0) t += mod
        h = (t * base + cps(g + n - 1)) % mod
        out(g) = h
        g += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Column API: all character n-gram hashes of a string column. */
  def ngramHashes(
      c: Column,
      n: Int,
      base: Long = 31L,
      mod: Long = 1000000007L
  ): Column =
    ColumnBridge.column(NgramPolyHash(ColumnBridge.expression(c), n, base, mod))
}
