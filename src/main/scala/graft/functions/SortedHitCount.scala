package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression counting how many elements of an
  * `array<bigint>` column occur in a FIXED sorted dictionary: per row one
  * binary search per element, zero allocation, no per-row set build.
  *
  * This is the per-row membership primitive that makes streaming
  * decontamination STATELESS: instead of explode → join → re-aggregate
  * (which on a stream would be a stateful aggregation holding every
  * doc_id forever), the dictionary — bounded by construction, it is a
  * benchmark's gram set — rides along as a task-shared reference object
  * (`ctx.addReferenceObj`, shipped once per task like a broadcast, NOT
  * re-evaluated per row) and each document is scored in its own row.
  *
  * Null array elements count as misses; a null array yields null.
  * The dictionary is defensively re-sorted at construction, so callers
  * may pass unsorted collect() output.
  */
final case class SortedHitCount(child: Expression, dictionary: Array[Long])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got $t"
      )
  }

  @transient private lazy val sorted: Array[Long] = {
    val copy = java.util.Arrays.copyOf(dictionary, dictionary.length)
    java.util.Arrays.sort(copy)
    copy
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_hit_count"

  override protected def nullSafeEval(input: Any): Any =
    SortedHitCount.count(input.asInstanceOf[ArrayData], sorted)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dict = ctx.addReferenceObj("dict", sorted, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.SortedHitCount.count($c, $dict)")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedHitCount =
    copy(child = newChild)
}

object SortedHitCount {

  /** Elements of `arr` present in the sorted `dict` — O(|arr| log |dict|). */
  def count(arr: ArrayData, dict: Array[Long]): Long = {
    var hits = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) &&
        java.util.Arrays.binarySearch(dict, arr.getLong(i)) >= 0) hits += 1
      i += 1
    }
    hits
  }

  /** Column API: count of `c`'s elements present in `dictionary`. */
  def hitCount(c: Column, dictionary: Array[Long]): Column =
    ColumnBridge.column(SortedHitCount(ColumnBridge.expression(c), dictionary))
}
