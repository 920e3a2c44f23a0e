package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keep-one-row-per-key dedup via ranked window.
  *
  * Reference pattern: `row_number() over (partition by id order by
  * priority asc, fecha_creacion desc) = 1`
  * (reference: artifacts/aws-glue/code/analytics/dim_cliente.py:44-64,
  * domain/t_reparto.py). One shuffle on the key; at 100 TB this is the
  * minimal-cost dedup (no join, map-side projection before the exchange).
  *
  * Callers MUST pass a total order (include a unique tiebreak column) or
  * results are nondeterministic across runs/engines.
  */
object DedupLatest {
  private val RN = "__graft_rn"

  def latest(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(RN, row_number().over(w)).filter(col(RN) === 1).drop(RN)
  }
}

/** Top-N rows per key (rank retained in `rankCol`). Same single-shuffle
  * window shape as [[DedupLatest]]; Spark's WindowGroupLimit pushes the
  * limit before the full sort materializes (rank-limit optimization). */
object TopN {
  def perGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
               n: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }
}
