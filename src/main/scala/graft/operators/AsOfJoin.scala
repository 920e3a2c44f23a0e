package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed as-of (effective-dated) join.
  *
  * The reference resolves each sale's exchange rate by joining
  * `m_tipo_cambio` on (compania, moneda, fecha) with coalesce fallbacks
  * (reference: artifacts/aws-glue/code/domain/t_venta.py:79-119) — an
  * equality join that silently misses dates with no quote. The general
  * operator is "value in force at time t": for each left row, the latest
  * right row with rightTime <= leftTime within the same key.
  *
  * Spark-first implementation: union both sides, one window partitioned by
  * key ordered by (time, side) carrying the last non-null right value
  * forward. ONE shuffle on the key, linear scan — no range join, no
  * per-row subquery. This is the plan that survives 100 TB: the alternative
  * (theta-join on time ranges) is quadratic per key.
  */
object AsOfJoin {
  /** Attach to each left row the most recent right value at-or-before its
    * timestamp (per key). Right rows sort before left rows on time ties.
    *
    * @param valueCols right-side (name -> output name) columns to carry. */
  def lastValue(left: DataFrame, right: DataFrame, key: String, time: String,
                valueCols: Seq[(String, String)]): DataFrame = {
    val side = "__graft_side"
    val l = valueCols.foldLeft(left.withColumn(side, lit(1))) {
      case (df, (_, out)) => df.withColumn(out, lit(null))
    }
    val r0 = valueCols.foldLeft(right) { case (df, (in, out)) =>
      df.withColumn(out, col(in))
    }
    val r = r0.select((Seq(col(key), col(time), lit(0).as(side)) ++
      valueCols.map { case (_, out) => col(out) }): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col(time), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(unioned) { case (df, (_, out)) =>
      df.withColumn(out, last(col(out), ignoreNulls = true).over(w))
    }
    carried.filter(col(side) === 1).drop(side)
  }
}
