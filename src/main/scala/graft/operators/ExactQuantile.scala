package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT order statistics at scale — the q-th smallest value of a Long
  * column computed by iterative histogram refinement, never a global sort.
  *
  * The scale problem: `percentile_disc` / exact `percentile` aggregates
  * buffer every value of the group (Spark's exact percentile collects an
  * OpenHashMap of the whole column per group), and `ORDER BY` + rank is a
  * full-data range exchange — both are non-starters for a single exact
  * p99 over a 100 TB fact. Approximate sketches (percentile_approx,
  * t-digest) give ε-rank answers; a billing/SLA cut-off wants the exact
  * order statistic.
  *
  * This operator computes exact ranks in O(log_B(domain)) passes, each a
  * bounded aggregation (the classic selection-by-histogram / multi-pass
  * k-th element algorithm — Blum et al. selection adapted to scans):
  *
  *   pass 0: (min, max, count) — one row.
  *   level: bucket the CURRENT candidate range [lo, hi] into ≤ B
  *     equal-width buckets, aggregate counts per bucket (ONE exchange of
  *     ≤ B rows after map-side partial agg), walk the cumulative counts
  *     on the driver to find the bucket holding the target rank, recurse
  *     into it with the rank rebased.
  *   resolve: once a candidate range holds ≤ `resolveLimit` rows, take
  *     the r-th smallest directly (TakeOrdered — a bounded heap per
  *     partition, no exchange).
  *
  * Depth is bounded by the DOMAIN, not the row count: each level divides
  * the candidate value-range by B, so a full 64-bit domain resolves in
  * ≤ ceil(64 / log2 B) levels (4 at B = 65536) regardless of skew —
  * duplicate-heavy buckets narrow to width 1 and return immediately.
  * Every level after the first scans only `x BETWEEN lo AND hi`, which
  * parquet min/max pushdown prunes to a sliver of the files. Histograms
  * are memoized per (lo, hi) so multiple quantile targets share the
  * expensive level-1 full scan and only diverge on the (tiny) deeper
  * ranges.
  *
  * Driver state is ≤ B (bucket, count) pairs per level — the documented
  * bounded-collect pattern (same contract as DimLookup's capped builds).
  *
  * Quantile targets are BASIS POINTS (p50 = 5000) and the rank is the
  * exact rational ceil(bp·n / 10000) computed in integer arithmetic, so
  * the engine and any SQL oracle agree on the rank with zero
  * floating-point ambiguity (0.9·n in IEEE doubles vs exact decimal
  * arithmetic disagree on ceil at some n — basis points sidestep the
  * whole class).
  *
  * Reference anchor: the fact-side metric blocks (fact_cliente_venta.py
  * aggregations) publish max/avg cut-offs; an exact-percentile operator is
  * the natural extension of that block at lake scale. */
object ExactQuantile {

  /** Exact basis-point quantiles of `valueCol` (LongType). Returns
    * (bp, value) per requested bp, where value is the k-th smallest with
    * k = max(1, ceil(bp·n/10000)). Empty input → empty result. */
  def quantilesBp(df: DataFrame, valueCol: String, bps: Seq[Int],
                  buckets: Int = 65536,
                  resolveLimit: Int = 65536): Seq[(Int, Long)] = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(resolveLimit >= 1, s"resolveLimit must be >= 1, got $resolveLimit")
    require(bps.forall(bp => bp >= 1 && bp <= 10000),
      s"basis points must be in [1, 10000], got $bps")
    val base = df.select(col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val head = base.agg(min(col("x")), max(col("x")), count(lit(1))).head()
    if (head.isNullAt(2) || head.getLong(2) == 0L) return Seq.empty
    val (lo0, hi0, n) = (head.getLong(0), head.getLong(1), head.getLong(2))

    // memoized histogram per candidate range — all targets share level 1
    val hists = mutable.Map.empty[(Long, Long), Array[(Long, Long)]]
    // integer `div`, not `/`: Column./ is IEEE double division, which
    // mis-buckets once (x - lo) exceeds 2^53 — the exactness this
    // operator exists for would silently break on wide Long domains.
    def histogram(lo: Long, hi: Long, width: Long): Array[(Long, Long)] =
      hists.getOrElseUpdate((lo, hi),
        base.filter(col("x").between(lo, hi))
          .groupBy(expr(s"(x - ${lo}L) div ${width}L").as("b"))
          .agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1))

    /** r-th smallest value among rows with x in [lo, hi] (1-based;
      * caller guarantees 1 <= r <= cnt = |rows in range|). */
    def solve(lo: Long, hi: Long, r: Long, cnt: Long): Long = {
      if (lo == hi) return lo
      // span that would overflow Long (a range straddling most of the
      // 64-bit domain): split at zero, route the rank by the negative
      // side's count, recurse — at most once, both halves then fit.
      if (hi - lo < 0L) {
        val cNeg = base.filter(col("x").between(lo, -1L)).count()
        return if (r <= cNeg) solve(lo, -1L, r, cNeg)
        else solve(0L, hi, r - cNeg, cnt - cNeg)
      }
      if (cnt <= resolveLimit) {
        // bounded direct selection: TakeOrdered keeps r smallest (heap
        // per partition, no exchange), the max of those is the r-th.
        return base.filter(col("x").between(lo, hi))
          .orderBy(col("x")).limit(r.toInt)
          .agg(max(col("x"))).head().getLong(0)
      }
      val span = hi - lo // >= 1, no overflow past the guard
      val width = span / buckets + 1L // ceil((span+1)/buckets), overflow-free
      val hist = histogram(lo, hi, width)
      var cum = 0L
      var i = 0
      while (i < hist.length) {
        val (b, c) = hist(i)
        if (r <= cum + c) {
          val nLo = lo + b * width
          val nHi = math.min(hi, nLo + width - 1L)
          return solve(nLo, nHi, r - cum, c)
        }
        cum += c
        i += 1
      }
      // unreachable while base is immutable during the call (r <= cnt)
      throw new IllegalStateException(
        s"rank $r beyond histogram mass $cum in [$lo,$hi] — source mutated?")
    }

    bps.map { bp =>
      val k = math.max(1L, (bp.toLong * n + 9999L) / 10000L)
      bp -> solve(lo0, hi0, k, n)
    }
  }
}
