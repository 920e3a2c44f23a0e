package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash document fingerprint (SURVEY §2 row 25).
  *
  * Computes the minimum of a Rabin-Karp polynomial rolling hash over all
  * `window`-byte windows of the UTF-8 payload — a winnowing-style content
  * fingerprint: stable under small edits elsewhere in the document, cheap
  * to compare, and a building block for shift-tolerant near-dup detection.
  *
  * Implemented as a native Catalyst expression WITH codegen (not a Scala
  * UDF): the generated code calls a static JVM method, so the fingerprint
  * stage fuses into whole-stage codegen — no Row boxing, no serialization,
  * which is what keeps a 100 TB fingerprint pass scan-bound.
  */
case class RollingMinHashExpr(child: Expression, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingMinHash.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHashExpr =
    copy(child = newChild)
}

object RollingMinHash {
  final val Base = 1000003L

  /** Min polynomial hash over all `w`-byte windows (whole-string hash when
    * shorter). O(n) via rolling update; called from generated code. */
  def compute(s: UTF8String, w: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val win = math.min(w, n)
    // base^(win-1) for the rolling subtraction
    var basePow = 1L
    var i = 0
    while (i < win - 1) { basePow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < win) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var minH = h
    i = win
    while (i < n) {
      h = (h - (bytes(i - win) & 0xffL) * basePow) * Base + (bytes(i) & 0xffL)
      if (h < minH) minH = h
      i += 1
    }
    minH
  }
}
