package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's PORTABLE polynomial string
  * hash: fold `(acc * base + codePoint) % mod` over the character stream —
  * the arithmetic every dedup/fingerprint operator shares with its DuckDB
  * oracle (exact BIGINT steps both engines replay bit-for-bit).
  *
  * Semantically identical to the declarative
  * `aggregate(transform(split(s, ""), ascii), 0L, (a,x) => (a*base+x)%mod)`
  * it replaces, but one pass over the string with zero per-character
  * UTF8String allocations — the declarative form materializes an array cell
  * per character, which dominated the d2/d3/p5/p8 profiles. Stays inside
  * whole-stage codegen via `doGenCode` (SURVEY §4.3 preference order:
  * native Expression over UDF).
  */
final case class PolyHash(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}"
      )

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.PolyHash.hash($c, ${base}L, ${mod}L)"
    )

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {

  /** One pass over the string's code points. `codePointAt` keeps surrogate
    * pairs whole, matching `split(s, "")` + `ascii` per-character semantics
    * (Java's zero-width split does not break pairs).
    */
  def hash(s: UTF8String, base: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * base + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** Column API mirroring `Dedup.polyHash`'s declarative contract. */
  def polyHash(c: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c), base, mod))
}
