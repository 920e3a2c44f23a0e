package graft.functions

import java.io.{ByteArrayInputStream, DataInputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Open-addressing hash set of Longs — the per-group distinct state of
  * [[MultiDistinctCount]]. Flat primitive array (no boxing, no nodes),
  * linear probing, power-of-two capacity, 0 reserved as the empty slot
  * with an explicit has-zero flag. ~12 ns/insert hot, 8 bytes/slot.
  */
final class CompactLongSet(initialCapacity: Int = 4) extends Serializable {
  private var keys = new Array[Long](java.lang.Integer.highestOneBit(
    math.max(initialCapacity, 4) * 2 - 1))
  private var hasZero = false
  private var n = 0

  def size: Int = n + (if (hasZero) 1 else 0)

  // Stafford mix13 finalizer: full-avalanche so sequential business keys
  // (orderkey, partkey) spread instead of clustering the probe chain
  private def slot(v: Long, mask: Int): Int = {
    var h = v
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    (h ^ (h >>> 31)).toInt & mask
  }

  def add(v: Long): Unit = {
    if (v == 0L) { hasZero = true; return }
    val mask = keys.length - 1
    var i = slot(v, mask)
    while (keys(i) != 0L) {
      if (keys(i) == v) return
      i = (i + 1) & mask
    }
    keys(i) = v
    n += 1
    if (n * 4 >= keys.length * 3) grow()
  }

  private def grow(): Unit = {
    val old = keys
    keys = new Array[Long](old.length << 1)
    val mask = keys.length - 1
    var j = 0
    while (j < old.length) {
      val v = old(j)
      if (v != 0L) {
        var i = slot(v, mask)
        while (keys(i) != 0L) i = (i + 1) & mask
        keys(i) = v
      }
      j += 1
    }
  }

  def foreachKey(f: Long => Unit): Unit = {
    if (hasZero) f(0L)
    var j = 0
    while (j < keys.length) {
      if (keys(j) != 0L) f(keys(j))
      j += 1
    }
  }
}

/** `multi_distinct_count(k1, k2, ..., kN)` — ALL N distinct counts of a
  * group in ONE pass over its rows, returned as `array<long>`.
  *
  * Why it exists: N `count(DISTINCT ...)` in one aggregate make Catalyst
  * Expand-replicate every input row ×(N+1) before aggregating — the
  * reference's customer-metric block (analytics/fact_cliente_venta.py:49-63,
  * three distincts over the order-line fact) pays the fact scan four times
  * over in CPU, and at 100 TB ×4 across the wire unless pre-partitioned.
  * This aggregate keeps one compact primitive hash set PER KEY per group
  * ([[CompactLongSet]]), so each row is touched once (three set inserts),
  * partial-aggregates map-side (the shuffle carries serialized sets =
  * exactly the deduped values, no row replication), and merges
  * set-unions. Null keys are skipped per SQL distinct-count semantics.
  *
  * Keys must be LongType — distinctness on anything narrower casts up
  * losslessly; strings/decimals should hash first (xxhash64) like every
  * other dedup path here. State is bounded by the group's distinct
  * cardinality, the same bound the Expand plan's hash aggregate pays,
  * minus the replication.
  */
case class MultiDistinctCount(
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[CompactLongSet]] {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_distinct_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("multi_distinct_count needs >= 1 key")
    else children.find(_.dataType != LongType) match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"multi_distinct_count keys must be BIGINT, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): Array[CompactLongSet] =
    Array.fill(children.length)(new CompactLongSet())

  // the hot path: after binding, the key children are BoundReferences,
  // so read the long directly off the row instead of boxing through
  // Expression.eval — 3 boxed Longs per input row is real allocation at
  // fact scale. Falls back to eval for computed keys (e.g. xxhash64).
  import org.apache.spark.sql.catalyst.expressions.BoundReference
  private lazy val directOrdinals: Array[Int] =
    children.map {
      case b: BoundReference if b.dataType == LongType => b.ordinal
      case _ => -1
    }.toArray

  override def update(buf: Array[CompactLongSet],
                      input: InternalRow): Array[CompactLongSet] = {
    val ords = directOrdinals
    var i = 0
    while (i < ords.length) {
      val o = ords(i)
      if (o >= 0) {
        if (!input.isNullAt(o)) buf(i).add(input.getLong(o))
      } else {
        val v = children(i).eval(input)
        if (v != null) buf(i).add(v.asInstanceOf[Long])
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[CompactLongSet],
                     other: Array[CompactLongSet]): Array[CompactLongSet] = {
    var i = 0
    while (i < buf.length) {
      other(i).foreachKey(buf(i).add)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[CompactLongSet]): Any =
    new GenericArrayData(buf.map(_.size.toLong))

  override def serialize(buf: Array[CompactLongSet]): Array[Byte] = {
    var size = 0
    buf.foreach(s => size += 4 + 8 * s.size)
    val bb = java.nio.ByteBuffer.allocate(size)
    buf.foreach { s =>
      bb.putInt(s.size)
      s.foreachKey(v => { bb.putLong(v); () })
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[CompactLongSet] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(children.length) {
      val k = in.readInt()
      val s = new CompactLongSet(k)
      var j = 0
      while (j < k) { s.add(in.readLong()); j += 1 }
      s
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultiDistinctCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultiDistinctCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MultiDistinctCount =
    copy(children = newChildren)
}
