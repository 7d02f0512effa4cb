package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing Java `String.hashCode` semantics —
  * required for byte-compatibility with the reference's metajournal
  * segmentation: `segment = abs(hash(lower(id))) % segments` where `hash`
  * is Java's polynomial 31-hash
  * (reference eventual-cassandra/.../SegmentNr.scala:146-150).
  *
  * Spark's built-in `hash()` is Murmur3 — NOT equivalent — so this is a
  * genuine custom-Expression case (SURVEY §4.3). Implemented with
  * `doGenCode` so it stays inside whole-stage codegen (a Scala UDF here
  * would break the codegen pipeline and add ser/de per row).
  */
final case class JavaStringHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}"
      )
  override def dataType: DataType = IntegerType
  override def prettyName: String = "java_string_hash"

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c).toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JavaStringHash =
    copy(child = newChild)
}

object JavaStringHash {
  /** Column API: Java hashCode of a string column. */
  def javaHash(c: Column): Column =
    ColumnBridge.column(JavaStringHash(ColumnBridge.expression(c)))
}
