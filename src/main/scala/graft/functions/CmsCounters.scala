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

/** Count-min sketch over pre-hashed keys as a native partial-aggregable
  * aggregate — the frequency-estimation sibling of [[KmvMinHashes]] on the
  * SURVEY §2.10 sketch plane.
  *
  * Each task keeps a d×w counter matrix (depth rows, width buckets); row i
  * buckets a key x by the pairwise-independent family
  * ((aᵢ·x + bᵢ) mod P) mod w with fixed BIGINT constants (x is the
  * engine's portable polynomial hash, < P = 10⁹+7, so every product stays
  * under 2⁶³). Update is d increments; partial buffers MERGE by
  * element-wise sum (counter matrices form a commutative monoid — merge
  * order can't matter), so only d·w longs per group cross the shuffle
  * regardless of corpus size: frequency estimation over 100 TB of tokens
  * costs one scan plus an 8 KB combine. The point estimate for x is
  * min over rows of its bucket — an overcount bound, never an undercount.
  *
  * Deterministic end to end (fixed constants, no rng, merge-order free),
  * so the DuckDB oracle replays the COUNTERS THEMSELVES bit-for-bit —
  * unlike library CMS implementations whose seeds are private.
  */
final class CmsBuffer(val depth: Int, val width: Int) {
  val counters = new Array[Long](depth * width)
  def insert(x: Long): Unit = {
    // reduce the key into [0, P) FIRST: an out-of-contract key (negative
    // or >= P — e.g. xxhash64 instead of the engine's poly hash) must
    // neither index out of range here nor overflow A(i)·x — under ANSI
    // mode the Column-side estimate would THROW on that overflow while
    // JVM arithmetic silently wraps, so the reduction is what keeps the
    // two sides in the same bucket for every possible long
    val xr = java.lang.Math.floorMod(x, CmsCounters.P)
    var i = 0
    while (i < depth) {
      val bkt =
        (((CmsCounters.A(i) * xr + CmsCounters.B(i)) % CmsCounters.P) %
          width).toInt
      counters(i * width + bkt) += 1L
      i += 1
    }
  }
  def mergeIn(o: CmsBuffer): Unit = {
    var i = 0
    while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
  }
}

final case class CmsCounters(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[CmsBuffer] {

  require(
    depth >= 1 && depth <= CmsCounters.A.length,
    s"cms_counters depth must be in [1, ${CmsCounters.A.length}], got $depth"
  )
  require(width >= 2, s"cms_counters needs width >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): CmsCounters = copy(child = newChildren.head)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a bigint input, got ${child.dataType}"
      )

  override def createAggregationBuffer(): CmsBuffer =
    new CmsBuffer(depth, width)

  override def update(b: CmsBuffer, input: InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) b.insert(v.asInstanceOf[Long])
    b
  }

  override def merge(b: CmsBuffer, o: CmsBuffer): CmsBuffer = {
    b.mergeIn(o)
    b
  }

  override def eval(b: CmsBuffer): Any = new GenericArrayData(b.counters)

  override def serialize(b: CmsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * b.counters.length)
    bb.putInt(b.depth)
    bb.putInt(b.width)
    var i = 0
    while (i < b.counters.length) { bb.putLong(b.counters(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CmsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new CmsBuffer(bb.getInt, bb.getInt)
    var i = 0
    while (i < b.counters.length) { b.counters(i) = bb.getLong; i += 1 }
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): CmsCounters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsCounters =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "cms_counters"
}

object CmsCounters {

  /** Row-hash constants: aᵢ·x ≤ 2³²·(10⁹+6) < 2⁶³ for x < P. */
  val P: Long = 1000000007L
  val A: Array[Long] =
    Array(2654435761L, 2246822519L, 3266489917L, 668265263L)
  val B: Array[Long] = Array(12345L, 67890L, 111213L, 424242L)

  /** Column API: flattened d×w counter matrix (row-major) over the
    * pre-hashed key column `c`.
    */
  def cmsCounters(c: Column, depth: Int = 4, width: Int = 256): Column =
    ColumnBridge.column(
      CmsCounters(ColumnBridge.expression(c), depth, width)
        .toAggregateExpression()
    )

  /** Point-estimate column: min over rows of x's bucket in a flattened
    * sketch column — the standard CMS overcount-bounded estimate, usable
    * anywhere the sketch array is in scope (broadcast joins, streaming
    * state output).
    */
  def cmsEstimate(
      sketch: Column,
      x: Column,
      depth: Int = 4,
      width: Int = 256
  ): Column = {
    require(
      depth >= 1 && depth <= A.length,
      s"cms_estimate depth must be in [1, ${A.length}], got $depth"
    )
    require(width >= 2, s"cms_estimate needs width >= 2, got $width")
    import org.apache.spark.sql.functions._
    // same key reduction as CmsBuffer.insert — see the comment there
    val xr = pmod(x, lit(P))
    val cells = (0 until depth).map { i =>
      element_at(
        sketch,
        (pmod(pmod(lit(A(i)) * xr + lit(B(i)), lit(P)), lit(width.toLong)) +
          lit(i.toLong * width) + lit(1L)).cast("int")
      )
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
