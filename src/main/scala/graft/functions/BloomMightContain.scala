package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate `bloom_might_contain(key)` over a
  * pre-serialized `org.apache.spark.util.sketch.BloomFilter` — the
  * runtime-filter building block for cross-run joins against PERSISTED
  * index tables (d9's incremental dedup).
  *
  * Why custom: Spark's own `BloomFilterMightContain` is `internal` API
  * wired to the runtime-filter optimizer rule (InjectRuntimeFilter), which
  * only fires on shuffle-join shapes inside ONE query — it can never gate
  * a stored-table scan against a filter built from THIS batch's keys
  * across the read boundary. A Scala UDF would leave whole-stage codegen
  * and pay ser/de per row; this expression stays inside the codegen span
  * (`doGenCode` emits a direct `mightContainLong` call on a referenced
  * filter object).
  *
  * Semantics: true iff the key MIGHT be in the filter — no false
  * negatives ever (the gated plan is row-identical to the ungated one, the
  * law IndexStoreSpec pins), false positives at the filter's configured
  * fpp only cost superfluous join probes. Null keys yield null (Spark
  * UnaryExpression null propagation), matching the join they guard: a
  * null key equi-joins to nothing.
  */
final case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  // one deserialization per task (the expression object is shipped with
  // its bytes; the filter materializes lazily on first row)
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint key, got ${child.dataType}"
      )

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode
  ): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression
  ): BloomMightContain = copy(child = newChild)
}

object BloomMightContain {

  /** Serialize a built filter to the byte form the expression ships. */
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Column API: `might_contain(key)` against a serialized filter. */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(key), filterBytes)
    )
}
