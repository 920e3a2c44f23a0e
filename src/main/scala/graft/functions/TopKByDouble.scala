package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k by a double score: keep the k (score, payload)
  * pairs with the LARGEST scores; the result is best-first, ties broken by
  * payload ascending so the output is a pure function of the data.
  *
  * The window-rank formulation of "top k per group" shuffles every input
  * row to its group's reducer; this aggregate's state is a bounded heap
  * (O(k) per group), merged map-side, so the shuffle carries at most k
  * pairs per (group, partition) — the difference between moving the corpus
  * and moving the sample at 100 TB. Companion to [[BottomKSample]] (which
  * keeps the SMALLEST string keys); this one keeps numeric maxima, the
  * shape priority/weighted sampling wants.
  */
case class TopKByDouble(
    scoreChild: Expression,
    payloadChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {
  require(k >= 1, s"top_k_double k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(scoreChild, payloadChild)
  // user-callable SQL function: reject non-(double, bigint) arguments at
  // ANALYSIS time instead of a runtime ClassCastException deep in the
  // aggregate (callers widen explicitly; silent implicit casts would hide
  // a lossy long→double score conversion)
  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreChild.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_double score must be DOUBLE, got ${scoreChild.dataType.sql}")
    else if (payloadChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_double payload must be BIGINT, got ${payloadChild.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_double"

  // "worse" = smaller score, then LARGER payload (so among equal scores the
  // kept set prefers small payloads). Min-heap on this ordering: head is
  // the worst kept element, evicted first. Scores compare via
  // java.lang.Double.compare — a TOTAL order (IEEE `<`/`==` both answer
  // false against NaN, making fromLessThan non-transitive and heap
  // eviction arbitrary for NaN inputs): NaN sorts as the LARGEST score
  // and -0.0 below 0.0, deterministically.
  private val ord: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)] { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c < 0 || (c == 0 && a._2 > b._2)
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(ord.reverse) // head = worst

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreChild.eval(input)
    val p = payloadChild.eval(input)
    if (s != null && p != null)
      offer(buf, (s.asInstanceOf[Double], p.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
                     other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(buf: mutable.PriorityQueue[(Double, Long)],
                    e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (ord.gt(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(ord.reverse) // best-first
    new GenericArrayData(sorted.map { case (s, p) =>
      new GenericInternalRow(Array[Any](s, p))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByDouble =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByDouble =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByDouble =
    copy(scoreChild = newChildren(0), payloadChild = newChildren(1))
}
