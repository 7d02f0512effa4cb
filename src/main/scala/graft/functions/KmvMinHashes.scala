package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Aggregation buffer for the KMV sketch: the k smallest DISTINCT values
  * seen so far, kept in a bounded ordered set (insert is O(log k), the
  * candidate is rejected without touching the set once it exceeds the
  * current k-th minimum).
  */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def insert(v: Long): Unit =
    if (set.size < k) { set.add(v); () }
    else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
  def mergeIn(o: KmvBuffer): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) insert(it.next())
  }
}

/** KMV (k-minimum-values) distinct-count sketch as a native partial-
  * aggregable aggregate — the sketch plane of SURVEY §2.10 done the way a
  * 100 TB engine needs it: each task keeps a bounded k-min set, partial
  * buffers MERGE associatively on the combine/reduce side, and only
  * k longs per group ever cross the shuffle (a `countDistinct` shuffles
  * every distinct value; this shuffles 64).
  *
  * Because the sketch is DETERMINISTIC over the engine's portable
  * polynomial hash — no rng, no timestamp, merge-order independent (a
  * k-min set is a semilattice) — its output is exact-replayable by the
  * DuckDB oracle, unlike HLL-class sketches whose register layouts are
  * implementation-private. Estimator (uniform hashes in [0, M)):
  * distinct ≈ (k−1)·M / kth_min, exact below k.
  */
final case class KmvMinHashes(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvBuffer] {

  require(k >= 2, s"kmv_min_hashes needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): KmvMinHashes = copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint input, got ${child.dataType}"
      )

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    b.mergeIn(o)
    b
  }

  override def eval(b: KmvBuffer): Any = {
    val arr = new Array[Long](b.set.size)
    val it = b.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * b.set.size)
    bb.putInt(b.k)
    bb.putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.set.add(bb.getLong); i += 1 }
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinHashes =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "kmv_min_hashes"
}

object KmvMinHashes {

  /** Column API: sorted array of the k smallest distinct values of `c`. */
  def kmvMinHashes(c: Column, k: Int = 64): Column =
    ColumnBridge.column(
      KmvMinHashes(ColumnBridge.expression(c), k).toAggregateExpression()
    )
}
