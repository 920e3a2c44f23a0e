package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking boundaries (FastCDC/rsync family, polynomial
  * flavor): a chunk ends wherever the Rabin-Karp rolling hash of the
  * trailing `window` bytes is ≡ 0 (mod `divisor`) — so boundaries follow
  * CONTENT, not offsets, and an insertion early in a document shifts only
  * the one chunk it lands in, leaving every later chunk hash identical.
  * That is the property that makes chunk-grain dedup shift-tolerant where
  * q40's fixed-width word windows are not.
  *
  * Returns the ascending chunk END positions (1-based, exclusive ends),
  * always terminated by the text length — so `size()` is the chunk count
  * and consecutive pairs are (start, end] spans. Expected chunk size is
  * `divisor` bytes; positions under `window` never match (the window must
  * be full). Same polynomial and mod-2^64 arithmetic as
  * [[RollingMinHash]], so the DuckDB oracle replays it in HUGEINT exactly
  * (ASCII corpus: char positions are byte positions).
  *
  * Native codegen expression for the same reason as the other kernels:
  * the boundary scan is O(n) per document and fuses into whole-stage
  * codegen — a 100 TB chunking pass stays scan-bound.
  */
case class CdcBoundariesExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunk.boundaries(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcChunk.boundaries($c, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundariesExpr =
    copy(child = newChild)
}

object CdcChunk {
  /** Chunk end positions for `s` (see [[CdcBoundariesExpr]]). `divisor`
    * must be a power of two (masked, not divided, in the hot loop). */
  def boundaries(s: UTF8String, window: Int, divisor: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val mask = divisor - 1L // power-of-two divisor -> bitmask
    val out = new java.util.ArrayList[Integer](math.max(4, n / divisor + 2))
    if (n >= window) {
      var basePow = 1L
      var i = 0
      while (i < window - 1) { basePow *= RollingMinHash.Base; i += 1 }
      var h = 0L
      i = 0
      while (i < window) { h = h * RollingMinHash.Base + (bytes(i) & 0xffL); i += 1 }
      // i is the exclusive end of the current window from here on
      if ((h & mask) == 0L && i < n) out.add(i)
      while (i < n) {
        h = (h - (bytes(i - window) & 0xffL) * basePow) * RollingMinHash.Base +
          (bytes(i) & 0xffL)
        i += 1
        if ((h & mask) == 0L && i < n) out.add(i)
      }
    }
    out.add(n) // final chunk always ends at the text end
    val arr = new Array[Any](out.size)
    var k = 0
    while (k < out.size) { arr(k) = out.get(k).intValue(); k += 1 }
    new GenericArrayData(arr)
  }
}
