package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the similarity/text hot paths.
  *
  * Spark's higher-order functions (aggregate/zip_with/transform) are
  * interpreted per element — fine for occasional array munging, ruinous for
  * a 25M-pair × 64-dim cosine pass (measured ~20× slower than this tight
  * loop). These expressions keep whole-stage codegen by emitting a static
  * call, and keep oracle parity by summing strictly left-to-right in
  * double, exactly like the interpreted form and DuckDB's list_sum.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.dotF($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDotProduct =
    copy(left = l, right = r)
}

/** Count of `[A-Za-z0-9]+|[^A-Za-z0-9\s]` matches — the BPE-ish
  * pre-tokenizer — as a single byte scan instead of a regex engine pass
  * (UTF-8 continuation bytes are skipped so multi-byte chars count once,
  * matching the regex's per-character semantics). */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    VectorMath.tokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorMath.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object VectorMath {
  /** Strict left-to-right double-accumulated dot product of float arrays. */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  private def isAlnum(c: Byte): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  def tokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    var count = 0
    var inRun = false
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i)
      if ((c & 0xc0) == 0x80) {
        // UTF-8 continuation byte: part of the char already counted
      } else if (isAlnum(c)) {
        if (!inRun) { count += 1; inRun = true }
      } else {
        inRun = false
        if (!isWs(c)) count += 1
      }
      i += 1
    }
    count
  }
}
