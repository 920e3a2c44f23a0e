package graft.functions

import java.util.UUID

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Z-order (Morton) clustering support for multi-dimensional file skipping.
  *
  * Writing files ordered by the interleaved bit pattern of per-column rank
  * buckets keeps EVERY clustered column's min/max span narrow inside each
  * file, so a range predicate on any (or several) of the dimensions prunes
  * row groups — the multi-dim generalization of single-column sorted
  * writes. Rank buckets (not raw values) make the curve robust to skew;
  * boundaries come from approxQuantile at write time (a bounded
  * driver-side sample, the same trade a range partitioner makes).
  */
case class ZBucketExpr(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "z_bucket"

  override protected def nullSafeEval(input: Any): Any =
    ZOrder.bucketOf(input.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zBoundaries", boundaries, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.ZOrder.bucketOf((double)$c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): ZBucketExpr =
    copy(child = newChild)
}

object ZOrder {
  /** Rank bucket of `v` in `boundaries` (ascending): index of the first
    * boundary >= v via binary search; O(log n) per row, called from
    * generated code. */
  def bucketOf(v: Double, boundaries: Array[Double]): Int = {
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= boundaries(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Arrange `df` into `numFiles` range partitions ordered by the Morton
    * interleave of each `zCols` column's rank bucket, each partition
    * sorted by the curve — the one shared clustering step behind
    * [[graft.sources.LakeIO.writeZOrdered]] (write-time clustering) and
    * [[graft.sources.TxnTable.compactZOrdered]] (transactional OPTIMIZE).
    * Bucket boundaries come from approxQuantile (bounded driver-side
    * sample); columns are cast to double for ranking, the data itself is
    * returned unchanged. */
  def arrange(df: org.apache.spark.sql.DataFrame, zCols: Seq[String],
              numFiles: Int, bitsPerDim: Int = 12): org.apache.spark.sql.DataFrame = {
    require(zCols.nonEmpty, "z-order arrange needs at least one z column")
    // the curve lives in one signed long: clamp per-dimension bits so
    // dims*bits <= 63 (shiftleft past 63 wraps mod 64 on the JVM and would
    // silently collide curve bits — e.g. 6 dims at the default 12 bits)
    val bits = math.min(bitsPerDim, 63 / zCols.length)
    require(bits >= 1,
      s"z-order supports at most 63 dimensions, got ${zCols.length}")
    val nBuckets = 1 << bits
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val reg = df.sparkSession.sessionState.functionRegistry
    // per-call unique registration: two concurrent arrange() calls on one
    // session (TableOptimizer over several tables) must not clobber each
    // other's boundary arrays between registration and plan analysis
    val callId = UUID.randomUUID().toString.replace("-", "")
    val fns = zCols.indices.map(i => s"__z_bucket_${callId}_$i")
    try {
      val buckets = zCols.zipWithIndex.map { case (c, i) =>
        val bounds = df.stat.approxQuantile(c, probs, 0.01)
        // per-call registration: the boundary array rides the builder closure
        // (Spark 4 exposes no public Column.expr to wrap the expression directly)
        reg.createOrReplaceTempFunction(fns(i),
          exprs => ZBucketExpr(exprs.head, bounds), "built-in")
        call_function(fns(i), col(c).cast("double"))
      }
      // withColumn analyzes eagerly, embedding the ZBucketExpr (boundaries
      // included) in the plan — the registration is not needed after this
      df.withColumn("__z", interleave(buckets, bits))
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions(col("__z")).drop("__z")
    } finally fns.foreach(fn =>
      reg.dropFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(fn)): Unit)
  }

  /** Morton interleave of pre-bucketed rank columns (ints in
    * [0, 2^bitsPerDim)): bit b of dimension d lands at position
    * b*dims + d. Pure built-in bit arithmetic — stays in codegen.
    * Callers must keep dims*bitsPerDim <= 63 ([[arrange]] clamps). */
  def interleave(buckets: Seq[Column], bitsPerDim: Int): Column = {
    val dims = buckets.length
    require(dims * bitsPerDim <= 63,
      s"interleave overflows a long: $dims dims * $bitsPerDim bits > 63")
    val terms = for {
      (c, d) <- buckets.zipWithIndex
      b <- 0 until bitsPerDim
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)).cast("int"),
      b * dims + d).cast("long")
    terms.reduce(_ + _)
  }
}
