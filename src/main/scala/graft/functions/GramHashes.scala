package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}
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

/** WINNOWED all-positions gram hash (Schleimer–Wilkerson–Aiken, SIGMOD
  * 2003 — "Winnowing: Local Algorithms for Document Fingerprinting"):
  * the [[GramHashesExpr]] hash stream reduced to the fingerprint subset
  * before anything leaves the scan. Per window of `w` consecutive gram
  * hashes, keep only the RIGHTMOST MINIMUM (unsigned 64-bit order);
  * emit each selected (pos, h) once. Selection is a pure function of the
  * window's hash contents, so two documents sharing any substring of
  * code-point length >= window + w - 1 (i.e. >= w consecutive shared
  * gram positions) select the SAME gram inside the shared region in
  * both — the winnowing guarantee that makes the reduced anchor set
  * sound for duplicated spans of that length. Expected density 2/(w+1):
  * the corpus-wide anchor exchange shrinks ~8× at w = 16.
  *
  * `pos` is the 1-based code-point position `substring(text, pos,
  * window)` reads back — same indexing contract as gram_hashes. Unsigned
  * comparison matches the oracle's HUGEINT replay of the mod-2^64 hash
  * values, so the selected set is engine-portable. */
case class WinnowedGramHashesExpr(child: Expression, window: Int, w: Int)
    extends UnaryExpression {
  require(window >= 1, s"gram_hashes_winnowed gram window must be >= 1, got $window")
  require(w >= 1, s"gram_hashes_winnowed winnow window must be >= 1, got $w")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "gram_hashes_winnowed"

  override protected def nullSafeEval(input: Any): Any =
    GramHashes.winnow(input.asInstanceOf[UTF8String], window, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashes.winnow($c, $window, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowedGramHashesExpr =
    copy(child = newChild)
}

object GramHashes {
  // Same polynomial family as RollingMinHash (mod 2^64 arithmetic); the
  // base is odd so multiplication by it is a bijection on Long — a
  // collision needs two genuinely different windows, not a degenerate base.
  final val Base = 1000003L

  /** One hash per w-code-point window of `s`, rolling O(n); empty when
    * the text has fewer than w code points. Called from generated code. */
  def compute(s: UTF8String, w: Int): GenericArrayData =
    new GenericArrayData(hashStream(s, w))

  /** All-positions hashes for `gramLen`-code-point grams of `s` as a raw
    * long array. Code-point indexed: positions must match
    * substring()/substr() semantics (code points), not Java chars (UTF-16
    * units) or bytes. */
  private def hashStream(s: UTF8String, gramLen: Int): Array[Long] = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < gramLen) return Array.emptyLongArray
    var basePow = 1L
    var i = 0
    while (i < gramLen - 1) { basePow *= Base; i += 1 }
    val out = new Array[Long](n - gramLen + 1)
    var h = 0L
    i = 0
    while (i < gramLen) { h = h * Base + cps(i).toLong; i += 1 }
    out(0) = h
    i = gramLen
    while (i < n) {
      h = (h - cps(i - gramLen).toLong * basePow) * Base + cps(i).toLong
      out(i - gramLen + 1) = h
      i += 1
    }
    out
  }

  /** Winnowed selection over the gram-hash stream: per window of `w`
    * consecutive hashes keep the RIGHTMOST minimum under UNSIGNED
    * comparison (matching the oracle's HUGEINT view of the mod-2^64
    * values); each selected position emitted once, ascending. Documents
    * with fewer than `w` grams winnow as one truncated window — their
    * single minimal gram still anchors, so exact short duplicates stay
    * detectable even though the length-(gramLen + w - 1) guarantee only
    * applies to full windows. Returns (pos, h) structs, pos 1-based.
    * O(chars) amortized: the selection index only moves forward; a
    * rescan happens only when the previous minimum falls out of the
    * window. Called from generated code. */
  def winnow(s: UTF8String, gramLen: Int, w: Int): GenericArrayData = {
    val hs = hashStream(s, gramLen)
    val m = hs.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val win = math.min(w, m)
    val selPos = new Array[Int](m - win + 1) // upper bound on selections
    var nSel = 0
    var cur = -1
    var j = 0
    while (j <= m - win) {
      if (cur < j) {
        // previous selection fell out: rescan this window left→right,
        // ties (unsigned-equal) go right so the RIGHTMOST min wins
        cur = j
        var t = j + 1
        while (t < j + win) {
          if (java.lang.Long.compareUnsigned(hs(t), hs(cur)) <= 0) cur = t
          t += 1
        }
      } else {
        // only the right edge is new; it wins ties (rightmost rule)
        val t = j + win - 1
        if (java.lang.Long.compareUnsigned(hs(t), hs(cur)) <= 0) cur = t
      }
      if (nSel == 0 || selPos(nSel - 1) != cur) { selPos(nSel) = cur; nSel += 1 }
      j += 1
    }
    val rows = new Array[Any](nSel)
    var i = 0
    while (i < nSel) {
      val p = selPos(i)
      rows(i) = new GenericInternalRow(Array[Any](p + 1, hs(p)))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
