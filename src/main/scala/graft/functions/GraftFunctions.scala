package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration of graft's native Catalyst expressions.
  *
  * Registered once per session in the FunctionRegistry and invoked through
  * the public `functions.call_function`, so no private Column internals are
  * touched and the functions are equally available to SQL text. */
object GraftFunctions {
  val Names = Seq("float_dot", "token_count", "rolling_min_hash", "bottom_k_sample")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("float_dot",
      exprs => FloatDotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("token_count",
      exprs => TokenCount(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("rolling_min_hash",
      exprs => RollingMinHashExpr(exprs.head, 16), "built-in")
    reg.createOrReplaceTempFunction("bottom_k_sample",
      exprs => BottomKSample(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression(), "built-in")
  }

  /** Idempotent registration against the active session. */
  def ensureRegistered(): Unit = register(SparkSession.active)
}
