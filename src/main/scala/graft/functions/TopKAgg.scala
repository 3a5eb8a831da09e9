package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k as a custom `TypedImperativeAggregate`:
  * `graft_topk(value, payload, k)` → array<struct<value, payload>> of the
  * k largest values (ties broken by smallest payload), best first.
  *
  * Why an aggregate instead of a window: `row_number() OVER (PARTITION BY
  * g ORDER BY v DESC) <= k` must shuffle and fully sort EVERY row of
  * every group. The heap aggregate is O(n log k) with partial
  * aggregation — each map task sends at most k rows per group into the
  * shuffle, so the exchange scales with groups×k, not rows. This is the
  * (b)-tier custom-aggregate pattern for 100 TB top-k.
  *
  * The buffer is a worst-at-root priority queue; merge folds one heap
  * into another, so partial/final aggregation composes associatively and
  * the result is deterministic under any partitioning (the (value,
  * payload) comparison is a total order).
  */
final case class TopKByValue(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[TopKEntry]]
    with BinaryLike[Expression] {

  require(k > 0, "graft_topk requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (double, bigint) inputs")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("value", DoubleType), StructField("payload", LongType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKEntry] =
    new java.util.PriorityQueue[TopKEntry](k + 1, TopKEntry.worstFirst)

  override def update(
      buf: java.util.PriorityQueue[TopKEntry],
      input: InternalRow): java.util.PriorityQueue[TopKEntry] = {
    val v = left.eval(input)
    val p = right.eval(input)
    if (v != null && p != null) offer(buf, v.asInstanceOf[Double], p.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[TopKEntry],
      other: java.util.PriorityQueue[TopKEntry]): java.util.PriorityQueue[TopKEntry] = {
    val it = other.iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.value, e.payload)
    }
    buf
  }

  private def offer(buf: java.util.PriorityQueue[TopKEntry], v: Double, p: Long): Unit = {
    buf.offer(TopKEntry(v, p))
    if (buf.size > k) buf.poll() // evict the worst
  }

  override def eval(buf: java.util.PriorityQueue[TopKEntry]): Any = {
    val arr = buf.toArray(new Array[TopKEntry](buf.size))
    java.util.Arrays.sort(arr, TopKEntry.bestFirst)
    new GenericArrayData(arr.map { e =>
      new GenericInternalRow(Array[Any](e.value, e.payload))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[TopKEntry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.value)
      bb.putLong(e.payload)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKEntry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.offer(TopKEntry(bb.getDouble, bb.getLong))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByValue =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByValue =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKByValue =
    copy(left = newLeft, right = newRight)
}

/** Heap entry; better = higher value, then smaller payload. */
final case class TopKEntry(value: Double, payload: Long)

object TopKEntry {
  /** Total order, best first (value desc, payload asc). */
  val bestFirst: java.util.Comparator[TopKEntry] = (a: TopKEntry, b: TopKEntry) => {
    val c = java.lang.Double.compare(b.value, a.value)
    if (c != 0) c else java.lang.Long.compare(a.payload, b.payload)
  }
  /** Eviction order for the bounded heap (worst at the root). */
  val worstFirst: java.util.Comparator[TopKEntry] = bestFirst.reversed()
}
