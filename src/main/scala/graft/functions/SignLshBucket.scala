package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the sign-LSH bucket of an embedding:
  * `nBits` hyperplanes with ±1 components derived from an LCG parity
  * (plane p, dim d: +1 iff bit 16 of `1103515245·(131·p+d)+12345` is 0),
  * sign bits of the projections packed into one long.
  *
  * Replaces `nBits` separate `aggregate(zip_with(...))` passes — each of
  * which re-evaluated the LCG and a branch per element — with ONE pass over
  * the vector accumulating all plane projections. Per-plane accumulation
  * order over dims is unchanged (sequential in d), so every projection is
  * bit-identical to the declarative form and the DuckDB oracle still
  * replays it exactly. Stays inside whole-stage codegen (`doGenCode`).
  *
  * Null ELEMENT semantics replicate the declarative fold exactly: a null
  * element nullifies the `acc + v` fold, so every plane's projection goes
  * null, `proj > 0` is null, every sign bit falls to 0 — bucket 0. (Engine
  * tables never hold null elements; the contract matters so the expression
  * stays a drop-in replacement for arbitrary inputs.)
  */
final case class SignLshBucket(child: Expression, nBits: Int)
    extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _                => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double>, got $t"
      )
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"

  private def isDouble: Boolean = elemType == DoubleType

  override protected def nullSafeEval(input: Any): Any =
    SignLshBucket.bucket(input.asInstanceOf[ArrayData], nBits, isDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.SignLshBucket.bucket($c, $nBits, $isDouble)"
    )

  override protected def withNewChildInternal(newChild: Expression): SignLshBucket =
    copy(child = newChild)
}

object SignLshBucket {

  /** One pass over the vector: accumulate all `nBits` projections, then
    * pack sign bits. Accumulation per plane is sequential in dim order —
    * float-add order identical to the declarative fold it replaces. A null
    * element null-propagates every plane's fold (declarative semantics):
    * all sign bits force to 0, so the bucket is 0.
    */
  def bucket(arr: ArrayData, nBits: Int, isDouble: Boolean): Long = {
    val proj = new Array[Double](nBits)
    val n = arr.numElements()
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return 0L
      val v =
        if (isDouble) arr.getDouble(d)
        else arr.getFloat(d).toDouble
      var p = 0
      while (p < nBits) {
        val lcg = 1103515245L * (131L * p + d) + 12345L
        if (((lcg >> 16) & 1L) == 0L) proj(p) += v else proj(p) -= v
        p += 1
      }
      d += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nBits) {
      if (proj(p) > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Column API mirroring `Similarity.signBucket`'s declarative contract. */
  def signBucket(c: Column, nBits: Int = 12): Column =
    ColumnBridge.column(SignLshBucket(ColumnBridge.expression(c), nBits))
}
