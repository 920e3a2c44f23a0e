package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** HyperLogLog register sketch over a 64-bit hash column: one pass,
  * 2^p byte registers, mergeable — the approximate-distinct complement
  * to the exact paths (`bitmap_distinct` for dense ordinal domains,
  * `count(DISTINCT ...)` when the key exchange is affordable).
  *
  * Why not count(DISTINCT)? That shuffles every distinct key — at
  * 100 TB the vocabulary exchange IS the job (the q89 argument, for
  * cardinality instead of frequency). This buffer is a FIXED 2^p bytes
  * per group per partition, merges map-side (register-wise max, a
  * commutative idempotent monoid — any merge tree gives the same
  * registers), and the shuffle carries one small byte array per
  * (group, partition) regardless of input size. `bitmap_distinct` is
  * exact but needs a dense long domain sized upfront; this takes ANY
  * hashable value at a fixed ~(1.04/√2^p) relative error.
  *
  * Construction (Flajolet–Fusy–Gandouet–Meunier, AofA 2007, over a
  * 64-bit hash — no 32-bit collision-regime correction needed at any
  * realistic cardinality): with Q = 64 − p,
  *   register index = top p bits of the hash,
  *   rho            = leading-zero count of the remaining Q bits + 1
  *                    (in [1, Q+1]; empty register = 0),
  *   update         = register := max(register, rho).
  *
  * The hash is the caller's column — the catalog feeds `md5_low64`
  * (TextHash.md5Low64), the md5-low-64 family every cross-engine
  * value-check in this repo uses (DuckDB: md5_number_lower), so the
  * resulting REGISTERS are bit-reproducible in SQL: bucket by integer
  * division, rho by exact bit length (length(bin(rem))), max per
  * bucket. The estimator downstream (operators/ApproxDistinct) keeps
  * the harmonic sum EXACT (Σ 2^(Q+1−M_j) is an integer ≤ 2^65, summed
  * in DECIMAL(38,0)/HUGEINT) and emits one correctly-rounded double —
  * no order-dependent float accumulation anywhere, so estimates
  * value-check bit-for-bit across engines.
  *
  * eval: ARRAY<INT> of length 2^p (the registers, index order) — kept
  * raw so the estimator, merges-of-persisted-sketches, and specs all
  * read the same state. */
case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_registers"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"hll_registers expects a LONG hash column, got ${child.dataType.sql}")
    else if (p < 4 || p > 16)
      TypeCheckResult.TypeCheckFailure(
        s"hll_registers needs 4 <= p <= 16, got $p")
    else TypeCheckResult.TypeCheckSuccess

  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val idx = (h >>> (64 - p)).toInt
      // remaining Q bits, left-aligned; rho = their leading zeros + 1,
      // = Q + 1 when they are all zero (w == 0)
      val w = h << p
      val rho = if (w == 0L) 64 - p + 1 else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllRegisters =
    copy(child = newChildren.head)
}

/** Merge PERSISTED HLL sketches: aggregates ARRAY<INT> register rows
  * (as [[HllRegisters]] emits them) by register-wise max — the
  * sketch-table pattern: materialize one register array per (day,
  * dimension) once, then answer any rollup window by MERGING the stored
  * sketches instead of rescanning the raw data. Because register-wise
  * max is the same commutative idempotent monoid HllRegisters merges
  * with, merge-of-sketches == sketch-of-union EXACTLY (register
  * equality, not approximately), so estimates off the rollup are
  * bit-identical to estimates off the raw union — spec-pinned.
  * Rows whose length differs from 2^p (a mixed-p table) fail loudly. */
case class HllMerge(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) if p >= 4 && p <= 16 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(IntegerType, _) =>
      TypeCheckResult.TypeCheckFailure(s"hll_merge needs 4 <= p <= 16, got $p")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"hll_merge expects ARRAY<INT> registers, got ${other.sql}")
  }

  private val m = 1 << p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == m,
        s"hll_merge(p=$p) expects ${m} registers, got ${arr.numElements()}")
      var i = 0
      while (i < m) {
        val r = arr.getInt(i)
        if (r > buf(i)) buf(i) = r.toByte
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllMerge =
    copy(child = newChildren.head)
}
