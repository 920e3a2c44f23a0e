package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing N-month rollups.
  *
  * The reference computes 3-/12-month metrics with a self-join
  * (`past.periodo BETWEEN add_months(cur, -N) AND cur`, then re-aggregate —
  * reference: artifacts/aws-glue/code/analytics/fact_cliente_venta.py:86-172).
  * That is O(rows × window) and shuffles the monthly grain twice. We express
  * the same semantics as a RANGE window over an integer month index:
  * one shuffle on the keys, linear work, identical results (months with no
  * activity contribute nothing in both forms).
  */
object TrailingAgg {
  /** Adds `sum(valCol) over (partition by keys order by monthIdx
    * range between N preceding and current row)` per value column.
    * `monthIdxCol` must be an integer month index (see Periods.monthIndex). */
  def trailingSums(monthly: DataFrame, keys: Seq[String], monthIdxCol: String,
                   valCols: Seq[(String, String)], months: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(monthIdxCol))
      .rangeBetween(-months.toLong, Window.currentRow)
    valCols.foldLeft(monthly) { case (df, (in, out)) =>
      df.withColumn(out, sum(col(in)).over(w))
    }
  }
}
