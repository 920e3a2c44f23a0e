package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** All-positions rolling L-gram hash (the anchor stage of exact
  * duplicated-substring detection, SURVEY §2 row 80).
  *
  * Returns one Karp–Rabin polynomial hash per `window`-CHARACTER window of
  * the text — index i of the result hashes the gram starting at 1-based
  * character position i+1, i.e. `substring(text, i+1, window)`.
  * "Character" means Unicode CODE POINT, exactly the unit Spark's
  * `substring` (UTF8String.substringSQL) and the SQL oracle's `substr`
  * count — a byte- or UTF-16-code-unit-indexed hash would silently
  * mis-anchor documents containing multi-byte or supplementary-plane
  * characters, and the downstream substring() verify would read the
  * wrong gram. Empty array when the text is shorter than the window.
  *
  * Scale shape: this is the "hash first, materialize later" half of the
  * dup-span pipeline — the corpus-wide shuffle carries 8-byte hashes, and
  * gram STRINGS are only materialized for the (tiny) cross-document
  * collision candidate set. O(n) per document via the rolling update;
  * native codegen so the anchor pass stays scan-fused.
  *
  * Reference analog: the dedup/quality curation stages of the ingest jobs
  * (e.g. artifacts/domain/jobs py, dedup-by-content steps); the exact
  * substring formulation follows Lee et al. 2022 ("Deduplicating Training
  * Data Makes Language Models Better") re-expressed as a hash-anchored
  * Spark pipeline instead of a suffix array.
  */
case class GramHashesExpr(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1, s"gram_hashes window must be >= 1, got $window")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashes.compute(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHashes.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

object GramHashes {
  // Same polynomial family as RollingMinHash (mod 2^64 arithmetic); the
  // base is odd so multiplication by it is a bijection on Long — a
  // collision needs two genuinely different windows, not a degenerate base.
  final val Base = 1000003L

  /** One hash per w-code-point window of `s`, rolling O(n); empty when
    * the text has fewer than w code points. Called from generated code. */
  def compute(s: UTF8String, w: Int): GenericArrayData = {
    // code-point indexed: positions must match substring()/substr()
    // semantics (code points), not Java chars (UTF-16 units) or bytes
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    var basePow = 1L
    var i = 0
    while (i < w - 1) { basePow *= Base; i += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + cps(i).toLong; i += 1 }
    out(0) = h
    i = w
    while (i < n) {
      h = (h - cps(i - w).toLong * basePow) * Base + cps(i).toLong
      out(i - w + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
