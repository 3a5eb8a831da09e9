package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a `TypedImperativeAggregate`:
  * `graft_freq_sketch(item, k)` → array<struct<item, count>> of at most k
  * candidate heavy hitters, count-descending (ties by item).
  *
  * The 100 TB shape: exact frequent-token counting (x1's wordcount)
  * shuffles one row per DISTINCT item — fine for small vocabularies,
  * unbounded for n-gram/URL/id domains. The MG summary is a fixed k
  * counters per map task, merged pairwise, so the exchange carries
  * O(k · tasks) regardless of domain size.
  *
  * Guarantees (Misra & Gries 1982; merging per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): with n total updates,
  * `true_count − n/(k+1) ≤ estimate ≤ true_count`, under ANY merge tree —
  * so every item with true frequency above n/(k+1) is GUARANTEED present
  * in the summary, which is the deterministic property the hh2 gate
  * checks (candidate counts/identities below that threshold may vary
  * with Spark's nondeterministic merge order; nothing downstream may
  * depend on them).
  *
  * update: hit → +1; miss with room → insert 1; miss when full → decrement
  * all by 1 and drop zeros (the O(k) case, amortized O(1) per n/(k+1)
  * misses). merge: add counters; if over k, subtract the (k+1)-th largest
  * count from all and drop non-positives.
  */
final case class FreqSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k > 0, "graft_freq_sketch requires k > 0")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("count", LongType))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_freq_sketch"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString // own copy: input buffers are reused
      val cur = buf.getOrDefault(item, 0L)
      if (cur > 0L) buf.put(item, cur + 1L)
      else if (buf.size < k) buf.put(item, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from every counter
      val counts = new Array[Long](buf.size)
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - (k + 1)))
    }
    buf
  }

  private def decrementAll(buf: java.util.HashMap[String, Long], by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    // deterministic OUTPUT ORDER (count desc, item asc) even though the
    // below-threshold contents themselves are merge-order-dependent
    java.util.Arrays.sort(entries, (a: (String, Long), b: (String, Long)) => {
      val c = java.lang.Long.compare(b._2, a._2)
      if (c != 0) c else a._1.compareTo(b._1)
    })
    new GenericArrayData(entries.map { case (item, count) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), count))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    val entries = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](buf.size)
    while (it0.hasNext) {
      val e = it0.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries += ((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.size)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketch =
    copy(child = newChild)
}
