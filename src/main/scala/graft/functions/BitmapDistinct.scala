package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Growable word-array bitmap — the per-group state of
  * [[BitmapDistinct]]. One bit per dense index: `set` is a shift+or
  * (no hashing, no probing), `merge` is a word-wise OR, and the
  * serialized partial is the trimmed word array — for a dense index
  * domain this is the cheapest exact-distinct state that exists.
  */
final class GrowableBitmap(initialWords: Int = 8) extends Serializable {
  private var words = new Array[Long](math.max(1, initialWords))

  /** Adopt `w` as the backing words (deserialization — no copy). */
  private[functions] def adopt(w: Array[Long]): this.type = {
    if (w.length > 0) words = w
    this
  }

  def set(i: Int): Unit = {
    val w = i >>> 6
    if (w >= words.length) {
      var cap = words.length
      while (cap <= w) cap <<= 1
      words = java.util.Arrays.copyOf(words, cap)
    }
    words(w) |= 1L << (i & 63)
  }

  def or(other: GrowableBitmap): Unit = {
    if (other.words.length > words.length)
      words = java.util.Arrays.copyOf(words, other.words.length)
    var j = 0
    while (j < other.words.length) { words(j) |= other.words(j); j += 1 }
  }

  def popCount: Long = {
    var c = 0L
    var j = 0
    while (j < words.length) { c += java.lang.Long.bitCount(words(j)); j += 1 }
    c
  }

  /** Words up to the last non-zero one (the shuffle payload). */
  def trimmedWords: Array[Long] = {
    var last = words.length - 1
    while (last >= 0 && words(last) == 0L) last -= 1
    java.util.Arrays.copyOf(words, last + 1)
  }
}

object GrowableBitmap {
  /** Addressing bound: 2^30 bits = 128 MB per group buffer. The callers
    * (dense per-label index spaces from [[graft.operators.DimLookup]])
    * sit far under this; anything above it is a misuse that would
    * otherwise allocate silently. */
  val MaxIndex: Int = (1 << 30) - 1
}

/** `bitmap_distinct(idx)` — exact distinct count of a DENSE non-negative
  * long index, held as one bitmap bit per value.
  *
  * Why it exists: `count(DISTINCT k)` over a fact compiles to two-level
  * hash aggregation whose partial state is a hash set of the group's
  * distinct keys — at 60M+ probed fact rows the per-row hash insert and
  * the serialized set exchange dominate the query wall (q2 at the 100×
  * slice). When the key domain is already a DENSE index — e.g. the
  * per-label ordinal a [[graft.operators.DimLookup]] labeled probe
  * assigns — the distinct state collapses to a bitmap: per-row update is
  * one OR, the exchanged partial is `ceil(n/64)` words regardless of row
  * count, and merge is word-wise OR. Exact, not approximate.
  *
  * NULL inputs skip (SQL distinct-count semantics). Negative or
  * over-bound indices refuse loudly — a silent mask would miscount.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GrowableBitmap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct needs a BIGINT dense index, got ${child.dataType.sql}")

  override def createAggregationBuffer(): GrowableBitmap = new GrowableBitmap()

  // bound hot path: read the long straight off the row (no boxing)
  private lazy val directOrdinal: Int = child match {
    case b: BoundReference if b.dataType == LongType => b.ordinal
    case _ => -1
  }

  private def add(buf: GrowableBitmap, v: Long): Unit = {
    require(v >= 0L && v <= GrowableBitmap.MaxIndex,
      s"bitmap_distinct: index $v outside the dense domain [0, 2^30)")
    buf.set(v.toInt)
  }

  override def update(buf: GrowableBitmap, input: InternalRow): GrowableBitmap = {
    val o = directOrdinal
    if (o >= 0) {
      if (!input.isNullAt(o)) add(buf, input.getLong(o))
    } else {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: GrowableBitmap, other: GrowableBitmap): GrowableBitmap = {
    buf.or(other)
    buf
  }

  override def eval(buf: GrowableBitmap): Any = buf.popCount

  override def serialize(buf: GrowableBitmap): Array[Byte] = {
    val w = buf.trimmedWords
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * w.length)
    bb.putInt(w.length)
    w.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GrowableBitmap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val w = new Array[Long](n)
    var j = 0
    while (j < n) { w(j) = bb.getLong(); j += 1 }
    new GrowableBitmap().adopt(w)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = newChildren.head)
}
