package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic per-group sampling: keep the k payloads with the smallest
  * sort keys (typically a content hash) — "bottom-k by hash", the
  * mergeable, one-pass uniform sample.
  *
  * Unlike rand()-based sampling this is reproducible across retries,
  * speculative tasks and re-partitioning (the sample is a pure function of
  * the data), which is what a 100 TB training-data pipeline needs from its
  * "take N examples per source" stage. Buffer is a bounded max-heap —
  * O(k) state per group, mergeable map-side, so the shuffle carries at
  * most k rows per (group, partition).
  *
  * Implemented on Spark's TypedImperativeAggregate extension API; returns
  * the payloads ordered by sort key ascending (ties by payload).
  */
case class BottomKSample(
    keyChild: Expression,
    payloadChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  override def children: Seq[Expression] = Seq(keyChild, payloadChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_sample"

  // max-heap: head is the WORST kept element (largest key, then payload)
  private val ord: Ordering[(String, Long)] = Ordering.Tuple2[String, Long]

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    new mutable.PriorityQueue[(String, Long)]()(ord)

  override def update(buf: mutable.PriorityQueue[(String, Long)],
                      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val keyVal = keyChild.eval(input)
    val payloadVal = payloadChild.eval(input)
    if (keyVal != null && payloadVal != null) {
      val e = (keyVal.asInstanceOf[UTF8String].toString, payloadVal.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(e)
      else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, Long)],
                     other: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    other.foreach { e =>
      if (buf.size < k) buf.enqueue(e)
      else if (ord.lt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(buf.toArray.sorted(ord).map(_._2))

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, p) => out.writeUTF(s); out.writeLong(p) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readUTF(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKSample =
    copy(keyChild = newChildren(0), payloadChild = newChildren(1))
}
