package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement, per group
  * (SURVEY §2 row 81) — Priority Sampling (Duffield, Lund, Thorup,
  * JACM 2007): each item draws a uniform u from a hash of its id and gets
  * priority q = w / u; the sample is the k items with the LARGEST
  * priorities. Inclusion probability is proportional to weight (exactly
  * the Efraimidis–Spirakis u^(1/w) order, reparameterized), and the
  * estimator family over the sample is unbiased for arbitrary subset sums.
  *
  * Why this exact formulation:
  *  - DETERMINISTIC: u comes from integer hash arithmetic on the item id,
  *    not rand() — the sample is a pure function of the data, stable
  *    across retries, speculative tasks and repartitioning (the
  *    BottomKSample property, with weights).
  *  - ORACLE-EXACT: u = (id*2654435761 mod 2^32 + 1) / 2^33-free integer
  *    math plus two IEEE-754 divisions/multiplies, every step correctly
  *    rounded — any engine computing the same formula gets bit-identical
  *    priorities, so the selected set value-checks across engines (a
  *    pow()/ln() scheme would be at the mercy of each libm's last ulp).
  *  - BOUNDED STATE: selection runs on the `top_k_double` aggregate
  *    (graft.functions.TopKByDouble) — O(k) state per group, merged
  *    map-side, so the shuffle carries at most k (priority, id) pairs per
  *    (group, partition) instead of the whole corpus that a window-rank
  *    formulation would move.
  *
  * Reference analog: the per-source "take N examples" curation stage (the
  * deterministic-sample job family); this is its weight-aware upgrade —
  * sample probability follows document length/quality instead of being
  * uniform.
  */
object WeightedSample {
  /** Knuth multiplicative-hash constant; u lands in (0, 1]. */
  final val HashMul = 2654435761L
  final val HashMod = 4294967296L // 2^32

  /** The deterministic uniform's integer numerator: hash(id) in [1, 2^32]. */
  def hashNumerator(id: Column): Column =
    pmod(id * lit(HashMul), lit(HashMod)) + 1

  /** Priority q = w / u = (w * 2^32) / numerator — two correctly-rounded
    * double ops over exact integers; bit-portable across engines. */
  def priority(weight: Column, id: Column): Column =
    (weight.cast("double") * lit(HashMod.toDouble)) /
      hashNumerator(id).cast("double")

  /** Top-k by priority per group. Output: one row per kept item —
    * (groupCols..., rk, id, priority), rk 1-based best-first; ties on
    * priority break by id ascending (inherited from top_k_double). */
  def perGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
               weightCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered()
    val scored = df.select(
      groupCols.map(col) :+ col(idCol).cast("long").as("__id") :+
        priority(col(weightCol), col(idCol).cast("long")).as("__q"): _*)
    scored.groupBy(groupCols.map(col): _*)
      .agg(call_function("top_k_double", col("__q"), col("__id"), lit(k))
        .as("__top"))
      .select(groupCols.map(col) :+
        posexplode(col("__top")).as(Seq("__i", "__e")): _*)
      .select(groupCols.map(col) :+
        (col("__i") + 1).as("rk") :+
        col("__e.payload").as(idCol) :+
        col("__e.score").as("priority"): _*)
  }
}
