package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary: one pass, k counters, mergeable.
  *
  * The guarantee (Misra–Gries 1982; merge rule and bound from Agarwal,
  * Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries", PODS 2012
  * §3.1): after processing n items — across ANY tree of merges — every
  * item's counter undercounts its true frequency by at most n/(k+1).
  * Hence every item with true frequency > n/(k+1) has a positive counter
  * and is present in the summary: the summary is a guaranteed SUPERSET of
  * the φ = 1/(k+1) heavy hitters. A second, candidates-only exact count
  * then turns the superset into the exact answer (operators/HeavyHitters).
  *
  * Why not groupBy(token).count + HAVING? That shuffles the full token
  * stream — at 100 TB the vocabulary exchange IS the job. This buffer is
  * O(k) per partition, merges map-side, and the shuffle carries ≤ k
  * (string, long) pairs per partition regardless of input size.
  *
  * update: counter hit → +1; free slot → insert 1; full → decrement all
  * by 1 and drop zeros (the arriving item is absorbed by the decrement).
  * merge: add counters pointwise; if over k survive, subtract the
  * (k+1)-th largest counter value from all and keep the positive ones
  * (the PODS'12 merge — error bounds add to ≤ (n1+n2)/(k+1)).
  * eval: struct(n, candidates sorted ascending) — deterministic across
  * partitionings by the merge bound, order pinned for reproducibility:
  * the candidate SET may legitimately differ with partitioning (it is a
  * superset, not a unique set), so downstream must exact-count before
  * comparing anything. */
case class MgCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgCandidates.Buffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("candidates", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "mg_candidates"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"mg_candidates expects a STRING item column, got ${child.dataType.sql}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"mg_candidates needs k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MgCandidates.Buffer =
    new MgCandidates.Buffer(0L, mutable.HashMap.empty)

  override def update(buf: MgCandidates.Buffer, input: InternalRow): MgCandidates.Buffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.n += 1L
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buf.counters.getOrElse(key, 0L)
      if (cur > 0L) buf.counters.update(key, cur + 1L)
      else if (buf.counters.size < k) buf.counters.update(key, 1L)
      else {
        // full and item unseen: classic decrement-all step. O(k), but each
        // decrement cancels a previous increment — amortized O(1)/item.
        val dead = mutable.ArrayBuffer.empty[String]
        buf.counters.mapValuesInPlace((_, c) => c - 1L)
        buf.counters.foreach { case (t, c) => if (c <= 0L) dead += t }
        dead.foreach(buf.counters.remove)
      }
    }
    buf
  }

  override def merge(buf: MgCandidates.Buffer, other: MgCandidates.Buffer): MgCandidates.Buffer = {
    buf.n += other.n
    other.counters.foreach { case (t, c) =>
      buf.counters.update(t, buf.counters.getOrElse(t, 0L) + c)
    }
    if (buf.counters.size > k) {
      // subtract the (k+1)-th largest counter from all, keep positives —
      // at most k survive (only counters strictly above the pivot do).
      val pivot = buf.counters.valuesIterator.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.counters.mapValuesInPlace((_, c) => c - pivot)
      buf.counters.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.foreach(buf.counters.remove)
    }
    buf
  }

  override def eval(buf: MgCandidates.Buffer): Any = {
    val sorted = buf.counters.keysIterator.toArray.sorted
    new GenericInternalRow(Array[Any](buf.n,
      new GenericArrayData(sorted.map(UTF8String.fromString(_: String)))))
  }

  override def serialize(buf: MgCandidates.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counters.size)
    buf.counters.foreach { case (t, c) =>
      val b = t.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgCandidates.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readLong()
    val sz = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < sz) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      m.update(new String(b, "UTF-8"), in.readLong())
      i += 1
    }
    new MgCandidates.Buffer(n, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgCandidates =
    copy(child = newChildren.head)
}

object MgCandidates {
  /** n = items consumed (null items excluded), counters = MG state. */
  final class Buffer(var n: Long, val counters: mutable.HashMap[String, Long])
}
