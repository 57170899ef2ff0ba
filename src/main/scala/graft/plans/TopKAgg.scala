package graft.plans

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Bounded min-heap buffer for [[TopKDoubles]]: keeps the k largest values
  * seen, O(log k) per row, O(k) memory — independent of group size. */
final class TopKBuffer(val k: Int) {
  // min-heap: head is the SMALLEST of the current top-k, i.e. the value
  // the next larger input evicts
  val heap = scala.collection.mutable.PriorityQueue.empty[Double](
    Ordering[Double].reverse)

  def insert(v: Double): Unit =
    if (heap.size < k) heap.enqueue(v)
    else if (v > heap.head) { heap.dequeue(); heap.enqueue(v) }

  def mergeFrom(other: TopKBuffer): Unit = other.heap.foreach(insert)

  /** Values in descending order (rank order). */
  def sortedDesc: Array[Double] = heap.toArray.sorted(Ordering[Double].reverse)
}

/** Native Catalyst top-k aggregate: `topk(col, k)` returns the k largest
  * values of a double column per group, in descending order.
  *
  * Why a custom aggregate and not `row_number() <= k`: the window
  * formulation sorts EVERY group's full row set (and with a skewed group,
  * one task sorts the whole hot key) before discarding all but k rows. This
  * aggregate never materializes a group — each partition folds its rows
  * into a k-sized heap (map-side partial aggregation), and only k doubles
  * per (partition, group) cross the shuffle. At 100 TB that's the
  * difference between shuffling the fact table and shuffling k·groups
  * doubles. Spark's own WindowGroupLimit rule narrows the window plan's
  * sort input but still shuffles full rows; the heap buffer ships k values.
  *
  * Semantics note: emits VALUES (not source rows), so results are
  * deterministic under ties — any two rows sharing the boundary value
  * contribute the same double.
  */
case class TopKDoubles(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, s"topk requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc)

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.heap.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.heap.size)
    buf.heap.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(in.getInt)
    val n = in.getInt
    var i = 0
    while (i < n) { buf.insert(in.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKDoubles =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKDoubles =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKDoubles =
    copy(child = newChildren.head)
  override def prettyName: String = "topk"
}
