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

/** Buffer for the bottom-k-by-hash sample: the k entries with the smallest
  * hash keys seen so far, each carrying the sampled value. On a hash
  * collision the SMALLER value wins — (min over hash, then min over value)
  * is a semilattice, so merges stay order-independent even off-contract.
  */
final class BottomKBuffer(val k: Int) {
  val map = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
  def insert(h: Long, v: Long): Unit = {
    val prev = map.get(h)
    if (prev != null) { if (v < prev) { map.put(h, v); () } }
    else if (map.size < k) { map.put(h, v); () }
    else if (h < map.lastKey) { map.put(h, v); map.pollLastEntry(); () }
  }
  def mergeIn(o: BottomKBuffer): Unit = {
    val it = o.map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); insert(e.getKey, e.getValue) }
  }
}

/** Bottom-k-by-hash uniform sample as a native partial-aggregable
  * aggregate — the QUANTILE member of the engine's sketch plane (KMV =
  * distinct, CMS = frequency, this = rank/quantile). Hashing each row's
  * unique id through a fixed affine map and keeping the k smallest hash
  * keys IS a uniform k-sample of the group, but one that is mergeable
  * (bottom-k sets form a semilattice), deterministic (no rng — the same
  * rows always yield the same sample) and bounded: only k (hash, value)
  * pairs per group ever cross the shuffle, where an exact quantile sorts
  * the whole group and `percentile_approx` offers no replayable oracle.
  * Quantile estimate = the sample's order statistic; at 100 TB the sample
  * error is the textbook ±O(1/√k) rank error while the plan stays one
  * partial-aggregated shuffle of 16k bytes per group.
  *
  * eval returns the sampled VALUES sorted ascending, ready for
  * `element_at(smp, 1 + floor(q·(size−1)))` order-statistic extraction —
  * arithmetic every SQL engine replays bit-for-bit.
  *
  * Contract: `hash` should be distinct per row (an id through an affine
  * bijection); on collisions the smaller value wins deterministically.
  */
final case class BottomKSample(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BottomKBuffer] {

  require(k >= 1, s"bottom_k_sample needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(hash, value)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]
  ): BottomKSample = copy(hash = newChildren(0), value = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType && value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint) inputs, got " +
          s"(${hash.dataType}, ${value.dataType})"
      )

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(b: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      b.insert(h.asInstanceOf[Long], v.asInstanceOf[Long])
    b
  }

  override def merge(b: BottomKBuffer, o: BottomKBuffer): BottomKBuffer = {
    b.mergeIn(o)
    b
  }

  override def eval(b: BottomKBuffer): Any = {
    val arr = new Array[Long](b.map.size)
    val it = b.map.values().iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(b: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 16 * b.map.size)
    bb.putInt(b.k)
    bb.putInt(b.map.size)
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BottomKBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.map.put(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bottom_k_sample"
}

object BottomKSample {

  /** p25's sampling parameters — the ONE definition both the pipeline
    * (TextAnalysis.quantileSketch) and its DuckDB oracle string
    * (PipelineOracles.quantileSketch) interpolate, so the two copies
    * cannot drift. The affine map `x → (A·x + B) mod M` is a bijection on
    * [0, M) (A coprime to the prime M), so DISTINCT ids below M hash
    * collision-free — the precondition under which this buffer's
    * hash-keyed dedup matches the oracle's ROW_NUMBER multiplicity (see
    * the class note on collisions).
    */
  val DefaultK = 128
  val AffineA = 48271L
  val AffineB = 11L
  val AffineM = 1000000007L

  /** Column API: value-sorted array of the k rows with the smallest hash
    * keys — a deterministic mergeable uniform sample of the group.
    */
  def bottomKSample(hash: Column, value: Column, k: Int = DefaultK): Column =
    ColumnBridge.column(
      BottomKSample(
        ColumnBridge.expression(hash),
        ColumnBridge.expression(value),
        k
      ).toAggregateExpression()
    )
}
