package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless range join as a bin-bucketed equi-join.
  *
  * `fact.value BETWEEN dim.lo AND dim.hi` with no equality key makes
  * Spark fall back to BroadcastNestedLoopJoin — O(|fact|·|dim|) compares
  * and a driver-killing broadcast once the dim side grows (IP→geo ranges,
  * price bands, rate tables). Discretizing the value axis restores an
  * equi-key: each dim interval is exploded to every bin it overlaps, the
  * fact row computes its single bin, and an ordinary hash join on the bin
  * plus the exact BETWEEN residual filter reproduces the range semantics.
  * Cost becomes O(|fact| + |dim|·spanBins) shuffle rows — linear, AQE- and
  * skew-handling-friendly, no custom physical operator needed (SURVEY §8:
  * compose-first before a Strategy).
  *
  * `binWidth` trades dim duplication (wide intervals explode into more
  * bins) against join selectivity (coarse bins put more non-matching
  * pairs through the residual filter); pick it near the typical interval
  * width so spanBins stays O(1).
  */
object RangeJoin {
  /** Inner range join: rows of `fact` paired with every `dims` row whose
    * [lo, hi] interval contains `value` (closed bounds; strict/half-open
    * variants just change the residual predicate). Bin ids are computed
    * with floor division so negative values land consistently. */
  def byBins(fact: DataFrame, value: Column,
             dims: DataFrame, lo: Column, hi: Column,
             binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binned = fact.withColumn("__bin",
      floor(value / binWidth).cast("long"))
    val exploded = dims
      .withColumn("__lo_b", floor(lo / binWidth).cast("long"))
      .withColumn("__hi_b", floor(hi / binWidth).cast("long"))
      .withColumn("__bin", explode(sequence(col("__lo_b"), col("__hi_b"))))
      .drop("__lo_b", "__hi_b")
    binned.join(exploded, Seq("__bin"))
      .filter(value >= lo && value <= hi)
      .drop("__bin")
  }
}
