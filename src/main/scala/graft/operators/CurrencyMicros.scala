package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact currency aggregation over long micros — the codegen-speed twin of
  * `sum(CAST(x AS DECIMAL(38,6)))`.
  *
  * Business amounts in this lake (and the reference's: importes, precios,
  * KPI values — see analytics/fact_kpi_detalle.py's metric columns) are
  * currency: every stored value sits exactly on a ≤4-decimal-place grid,
  * and derived amounts are products of two such values (price × (1−disc)),
  * still on the 1e-4 grid. Spark's decimal sum pays a per-row
  * double→BigDecimal allocation for the cast plus a non-compact Decimal
  * add (any sum over p>18 inputs) — measured ~2.5× the entire scan-agg
  * floor on a 60M-row branch. This helper keeps the hot loop in whole-stage
  * codegen longs and reconstructs the decimal exactly once per GROUP:
  *
  *   micros  = rint(x · 1e6)          — one fused double multiply + round
  *   sum     = plain long sum          — codegen, map-side combined
  *   valor   = (sum AS DECIMAL(38,0)) / 1e6, cast double
  *
  * Exactness argument (why rint equals the decimal(38,6) HALF_UP cast
  * here): the stored double is within a few ulp (≤ ~6e-11 absolute at the
  * 1e5 value range) of its true grid rational t = k·1e-6 (a ≤6-dp value —
  * stored 2-dp amounts, 4-dp two-factor products like price·(1−disc),
  * 6-dp three-factor products like price·(1−disc)·(1+tax)); t·1e6 = k is
  * an integer, and x·1e6 lands within ~1e-4 of it — far inside rint's 0.5
  * window. The decimal cast of x rounds x's exact expansion at 6 dp, and
  * x sits within 6e-11 of the representable grid point t, so both paths
  * pick the same k. The final decimal division is exact (power-of-ten
  * divisor, scale grows) and the decimal→double cast is correctly rounded
  * — bit-identical to summing decimal(38,6) and casting, at plain-long
  * speed.
  *
  * NOT valid for arbitrary doubles (a value within 5e-7 of a 6-dp
  * half-boundary can round differently) — use the decimal sum for
  * non-currency measures. The margin collapses only when the value's true
  * grid is FINER than 1e-6 or the double carries accumulated error
  * approaching 5e-7 — neither happens for stored business amounts and
  * their 2-3-factor products.
  *
  * Overflow bound: the per-GROUP long sum caps at 2^63/1e6 ≈ 9.2e12 in
  * currency units — at a 1e5 max amount that is ~87 billion rows PER
  * GROUP before wrap, ~1900× headroom over a 100 TB fact's busiest
  * period. The bound is per aggregation group, not per table. */
object CurrencyMicros {
  /** x as exact long micros (x must sit on a ≤4-dp grid; see above). */
  def micros(x: Column): Column = rint(x * lit(1e6)).cast("long")

  /** Exact decimal reconstruction of a summed micros column, as DOUBLE —
    * bit-identical to `CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`. */
  def toAmount(sumMicros: Column): Column =
    (sumMicros.cast(DecimalType(38, 0)) / lit(1000000)).cast("double")
}
