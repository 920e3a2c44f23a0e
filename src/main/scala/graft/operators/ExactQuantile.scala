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
  *   resolve: once a candidate range holds ≤ `resolveLimit` rows the
  *     target pends; ALL pending targets then resolve in ONE batched
  *     job (r14): ranges are identical-or-disjoint (every target walks
  *     the same memoized bucket tree), a when-chain assigns range ids,
  *     and row_number per id — each window partition ≤ resolveLimit
  *     rows by construction — selects the target ranks. One bounded
  *     exchange replaces one TakeOrdered job PER target.
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

    /** Descend the histogram tree for the r-th smallest value among rows
      * with x in [lo, hi] (1-based; caller guarantees 1 <= r <= cnt).
      * Returns Right(value) when the range narrows to one value, or
      * Left((lo, hi, r)) once the range holds <= resolveLimit rows —
      * those pend and resolve BATCHED below (r13 ran one TakeOrdered job
      * per target; targets that diverge after the shared level-1
      * histogram each paid a full job dispatch for a <=65536-row
      * selection). */
    def descend(lo: Long, hi: Long, r: Long, cnt: Long)
        : Either[(Long, Long, Long), Long] = {
      if (lo == hi) return Right(lo)
      // span that would overflow Long (a range straddling most of the
      // 64-bit domain): split at zero, route the rank by the negative
      // side's count, recurse — at most once, both halves then fit.
      if (hi - lo < 0L) {
        val cNeg = base.filter(col("x").between(lo, -1L)).count()
        return if (r <= cNeg) descend(lo, -1L, r, cNeg)
        else descend(0L, hi, r - cNeg, cnt - cNeg)
      }
      if (cnt <= resolveLimit) return Left((lo, hi, r))
      val span = hi - lo // >= 1, no overflow past the guard
      val width = span / buckets + 1L // ceil((span+1)/buckets), overflow-free
      val hist = histogram(lo, hi, width)
      var cum = 0L
      var i = 0
      while (i < hist.length) {
        val (b, c) = hist(i)
        if (r <= cum + c) {
          val nLo = lo + b * width
          // bucket top, overflow-safe: nLo + width - 1 wraps when hi sits
          // within one width of Long.MaxValue on a misaligned range (e.g.
          // domain [1, MaxValue]); hi - nLo >= 0 always, so compare spans.
          val nHi = if (hi - nLo < width) hi else nLo + width - 1L
          return descend(nLo, nHi, r - cum, c)
        }
        cum += c
        i += 1
      }
      // unreachable while base is immutable during the call (r <= cnt)
      throw new IllegalStateException(
        s"rank $r beyond histogram mass $cum in [$lo,$hi] — source mutated?")
    }

    val states = bps.map { bp =>
      val k = math.max(1L, (bp.toLong * n + 9999L) / 10000L)
      bp -> descend(lo0, hi0, k, n)
    }
    // Batched resolve: ONE bounded job for every pending target. Pending
    // ranges are identical or disjoint (every target walks the same
    // memoized bucket tree), so exact-equality dedup is complete and a
    // when-chain assigns each row its range id; row_number per rid (each
    // partition <= resolveLimit rows by construction) selects the target
    // ranks. The OR-of-BETWEENs filter keeps parquet min/max pruning —
    // the deep ranges are slivers of the domain, same pushdown the
    // per-target jobs had.
    val pend = states.collect { case (bp, Left(p)) => (bp, p) }
    val ranges = pend.map(_._2).map(p => (p._1, p._2)).distinct
    val ridOf: Map[(Long, Long), Int] = ranges.zipWithIndex.toMap
    val resolved: Map[(Int, Long), Long] = if (pend.isEmpty) Map.empty else {
      val ranksOf: Map[Int, Seq[Long]] = pend
        .groupBy(p => ridOf((p._2._1, p._2._2)))
        .map { case (i, ps) => i -> ps.map(_._2._3).distinct }
      val inRange = ranges
        .map { case (lo, hi) => col("x").between(lo, hi) }.reduce(_ || _)
      val ridCol = ranges.zipWithIndex.foldLeft(
        lit(null).cast(org.apache.spark.sql.types.LongType)) {
        case (acc, ((lo, hi), i)) =>
          when(col("x").between(lo, hi), lit(i.toLong)).otherwise(acc)
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("rid")).orderBy(col("x"))
      val keep = ranksOf.toSeq.map { case (i, rs) =>
        col("rid") === i.toLong && col("rn").isin(rs: _*) }.reduce(_ || _)
      base.filter(inRange)
        .select(col("x"), ridCol.as("rid"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(keep)
        .select(col("rid"), col("rn"), col("x"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getLong(1)) -> r.getLong(2)).toMap
    }
    states.map {
      case (bp, Right(v)) => bp -> v
      case (bp, Left((lo, hi, r))) =>
        bp -> resolved.getOrElse((ridOf((lo, hi)), r),
          throw new IllegalStateException(
            s"resolve found no rows in [$lo,$hi] for rank $r — source mutated?"))
    }
  }

  /** PER-GROUP exact basis-point quantiles — the grouped form of
    * [[quantilesBp]] (the reference's metric blocks are per-group;
    * fact_cliente_venta.py:29–84 aggregates per client grain).
    *
    * Same histogram-refinement law, batched across groups so the pass
    * count stays bounded by the DOMAIN, not by the group count:
    *
    *   - every level is ONE exchange of ≤ buckets × |active ranges|
    *     (pid, bucket, count) rows — all groups' histograms computed in
    *     the same scan (the per-group range map rides a broadcast join),
    *     map-side partial agg keeps per-partition output ≤ that bound;
    *   - ranges are deduped per level, so multiple targets (bps) of one
    *     group share histograms exactly as the global form memoizes;
    *   - ranges whose span would overflow Long split at zero into two
    *     probes of the same target, walked in order — the zero-split
    *     guard without a separate counting pass;
    *   - once a target's candidate range holds ≤ resolveLimit rows it
    *     leaves the loop; ALL such targets resolve afterwards in ONE
    *     batched pass (broadcast the ≤ |targets| range table, window
    *     row_number per range id — each window partition is
    *     ≤ resolveLimit rows by construction, never a full-group sort).
    *
    * Driver state: ≤ buckets × |active ranges| histogram rows per level
    * plus |groups| × |bps| target states — the documented bounded-
    * collect pattern, guarded by `maxGroups` (the DimLookup cap
    * contract: beyond it, per-group exact quantiles belong in the
    * window/row_number form, which shuffles the full input once instead
    * of scanning it depth-times).
    *
    * Groups are the DISTINCT non-null values of `groupCol`; rows with a
    * null group or null value are ignored (matching a SQL oracle that
    * filters both). Output: (groupCol, cuantil_bp, valor), one row per
    * group × bp, value = the group's k-th smallest with
    * k = max(1, ceil(bp·n_g/10000)). */
  def quantilesBpByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         bps: Seq[Int], buckets: Int = 4096,
                         resolveLimit: Int = 65536,
                         maxGroups: Int = 65536): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(resolveLimit >= 1, s"resolveLimit must be >= 1, got $resolveLimit")
    require(bps.forall(bp => bp >= 1 && bp <= 10000),
      s"basis points must be in [1, 10000], got $bps")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val gField = df.schema(groupCol)
    val base = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("x"))
      .filter(col("g").isNotNull && col("x").isNotNull)

    val heads = base.groupBy(col("g"))
      .agg(min(col("x")), max(col("x")), count(lit(1))).collect()
    require(heads.length <= maxGroups,
      s"${heads.length} groups exceed maxGroups=$maxGroups — use the " +
        "window/row_number form for high-cardinality grouping")

    final case class St(g: Any, bp: Int, var lo: Long, var hi: Long,
                        var r: Long, var cnt: Long)
    val done = mutable.ArrayBuffer.empty[(Any, Int, Long)]
    val toResolve = mutable.ArrayBuffer.empty[St]
    var active = mutable.ArrayBuffer.empty[St]
    heads.foreach { h =>
      val (g, lo, hi, n) = (h.get(0), h.getLong(1), h.getLong(2), h.getLong(3))
      bps.foreach { bp =>
        val k = math.max(1L, (bp.toLong * n + 9999L) / 10000L)
        val st = St(g, bp, lo, hi, k, n)
        if (lo == hi) done += ((g, bp, lo))
        else if (n <= resolveLimit) toResolve += st
        else active += st
      }
    }

    val gType = gField.dataType
    // one histogram level over ALL active ranges: broadcast the range
    // table, bucket each row by its own range's width, ONE bounded
    // exchange of (pid, bucket, count)
    def level(states: mutable.ArrayBuffer[St]): mutable.ArrayBuffer[St] = {
      // dedup ranges; overflow ranges split at zero into ordered probes
      val ranges = states.map(s => (s.g, s.lo, s.hi)).distinct
      val probeRows = mutable.ArrayBuffer.empty[Row]
      val probesOf = mutable.Map.empty[(Any, Long, Long), Seq[(Long, Long, Long, Long)]]
      var pid = 0L
      ranges.foreach { case (g, lo, hi) =>
        val subs = if (hi - lo < 0L) Seq((lo, -1L), (0L, hi)) else Seq((lo, hi))
        probesOf((g, lo, hi)) = subs.map { case (plo, phi) =>
          val width = (phi - plo) / buckets + 1L
          val p = (pid, plo, phi, width); pid += 1
          probeRows += Row(p._1, g, plo, phi, width)
          p
        }
      }
      val probeSchema = StructType(Seq(
        StructField("pid", LongType, nullable = false),
        StructField("pg", gType),
        StructField("plo", LongType, nullable = false),
        StructField("phi", LongType, nullable = false),
        StructField("pw", LongType, nullable = false)))
      val probesDf = spark.createDataFrame(
        spark.sparkContext.parallelize(probeRows.toSeq, 1), probeSchema)
      val hist: Map[Long, Array[(Long, Long)]] = base
        .join(broadcast(probesDf), col("g") === col("pg"))
        .filter(col("x").between(col("plo"), col("phi")))
        .groupBy(col("pid"), expr("(x - plo) div pw").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
        .map { case (p, rows) =>
          p -> rows.map(t => (t._2, t._3)).sortBy(_._1) }
      val still = mutable.ArrayBuffer.empty[St]
      states.foreach { st =>
        val subs = probesOf((st.g, st.lo, st.hi))
        var cum = 0L
        var found = false
        subs.foreach { case (p, plo, phi, width) =>
          if (!found) hist.getOrElse(p, Array.empty).foreach { case (b, c) =>
            if (!found && st.r <= cum + c) {
              val nLo = plo + b * width
              // overflow-safe bucket top (phi - nLo >= 0 always)
              val nHi = if (phi - nLo < width) phi else nLo + width - 1L
              st.r -= cum; st.lo = nLo; st.hi = nHi; st.cnt = c
              found = true
            } else if (!found) cum += c
          }
        }
        if (!found) throw new IllegalStateException(
          s"rank ${st.r} beyond histogram mass $cum for group ${st.g} in " +
            s"[${st.lo},${st.hi}] — source mutated?")
        if (st.lo == st.hi) done += ((st.g, st.bp, st.lo))
        else if (st.cnt <= resolveLimit) toResolve += st
        else still += st
      }
      still
    }
    while (active.nonEmpty) active = level(active)

    // batched resolve: ONE pass for every pending target — broadcast the
    // range table, row_number per rid (each partition holds
    // <= resolveLimit rows), keep the target ranks.
    // One rid per DISTINCT (g, lo, hi): targets of one group routinely
    // share a candidate range (always, when the group resolved straight
    // from the heads pass — e.g. every group at small slices), and a rid
    // per TARGET re-shipped every matching row through the join and the
    // window exchange once per bp (measured ×|bps| exchange rows at
    // sf0.1: 1.8M for 600k source rows). Ranges of one group are
    // identical or disjoint by construction (all targets descend the
    // same memoized histogram tree), so exact-equality dedup is
    // complete; the rank SET rides the broadcast row and (rid, rank)
    // maps back to its bps on the driver — two bps of a tiny group can
    // legitimately share the same rank, so the map is rank -> bps.
    if (toResolve.nonEmpty) {
      val byRange = toResolve.groupBy(st => (st.g, st.lo, st.hi)).toSeq
      val rSchema = StructType(Seq(
        StructField("rid", LongType, nullable = false),
        StructField("rg", gType),
        StructField("rlo", LongType, nullable = false),
        StructField("rhi", LongType, nullable = false),
        StructField("rranks", ArrayType(LongType, containsNull = false),
          nullable = false)))
      val rRows = byRange.zipWithIndex.map { case (((g, lo, hi), sts), i) =>
        Row(i.toLong, g, lo, hi, sts.map(_.r).distinct.sorted.toSeq) }
      val rDf = spark.createDataFrame(
        spark.sparkContext.parallelize(rRows.toSeq, 1), rSchema)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("rid")).orderBy(col("x"))
      val got = base
        .join(broadcast(rDf), col("g") === col("rg"))
        .filter(col("x").between(col("rlo"), col("rhi")))
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(array_contains(col("rranks"), col("rn")))
        .select(col("rid"), col("rn"), col("x"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      byRange.zipWithIndex.foreach { case ((_, sts), i) =>
        sts.foreach { st =>
          val v = got.getOrElse((i.toLong, st.r),
            throw new IllegalStateException(
              s"resolve found no rank-${st.r} row for group ${st.g} in " +
                s"[${st.lo},${st.hi}] — source mutated?"))
          done += ((st.g, st.bp, v))
        }
      }
    }

    val outSchema = StructType(Seq(
      gField.copy(name = groupCol),
      StructField("cuantil_bp", IntegerType, nullable = false),
      StructField("valor", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        done.map { case (g, bp, v) => Row(g, bp, v) }.toSeq, 1),
      outSchema)
  }
}
