package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based twins of the exact metric blocks.
  *
  * The reference's fact metric blocks lean on countDistinct
  * (fact_cliente_venta.py:58-60) — exact distinct triples the shuffle
  * (expand + two exchanges). At 100 TB the approximate twin is usually the
  * right default: HLL++ (`approx_count_distinct`) is one pass, one shuffle,
  * mergeable, with a configurable relative error. Quantiles likewise.
  */
object ApproxMetrics {
  /** Per-key approximate distinct counts: one aggregation pass, no expand. */
  def approxDistinct(df: DataFrame, keys: Seq[String],
                     cols: Seq[(String, String)], rsd: Double = 0.02): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(approx_count_distinct(col(cols.head._1), rsd).as(cols.head._2),
        cols.tail.map { case (c, out) => approx_count_distinct(col(c), rsd).as(out) }: _*)

  /** Approximate percentiles per key (GK sketch). */
  def approxQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                      percentiles: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(percentiles.map(lit): _*), lit(accuracy)).as("percentiles"))
}
