package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins and two-phase aggregation.
  *
  * AQE's skew-join handles most runtime skew, but pathological hot keys
  * (one customer = 10% of a 100 TB fact) still serialize a task. Salting
  * splits each hot key into `buckets` shuffle partitions deterministically:
  * the fact side gets a uniform salt; the dim side is exploded to all
  * salts, so `(key, salt)` equality reproduces the original join exactly.
  * Cost: dim side inflates ×buckets — use for skewed-but-small right sides.
  *
  * The salt is a deterministic hash of stable row attributes, NOT rand():
  * retries/speculative tasks must salt a row identically or results drift.
  */
object Salting {
  /** Join `fact` (skewed) with `dim` on `key`, spreading each key over
    * `buckets` partitions. Inner/left joins only (salt preserves them). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
                 saltSource: Column, joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial/final) aggregation for skewed groupBy: pre-aggregate
    * on (keys, salt), then re-aggregate on keys. For algebraic aggregates
    * Spark already does map-side combine; this helps when a single reducer
    * key still overflows (e.g. collect-heavy or high-cardinality-distinct
    * per key). `partials` maps each value column to (phase1, phase2). */
  def twoPhaseSum(df: DataFrame, keys: Seq[String], saltSource: Column,
                  buckets: Int, sumCols: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
    val renamed = sumCols.foldLeft(phase1) { (d, c) => d.withColumnRenamed(s"sum($c)", c) }
    renamed.groupBy(keys.map(col): _*)
      .agg(sumCols.head -> "sum", sumCols.tail.map(_ -> "sum"): _*)
      .select(keys.map(col) ++ sumCols.map(c => col(s"sum($c)").as(c)): _*)
  }
}
