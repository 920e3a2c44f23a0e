package graft.sources

import java.nio.file.Files

/** Clustering health of one tracked column, resolved from the manifest
  * ALONE — no data scan, no Spark job. `maxStab` is the worst-case number
  * of files a point probe on the column must open (the maximum number of
  * pairwise-overlapping [min,max] intervals); `meanStartStab` is the
  * average number of already-open intervals at each file's start — both 1
  * for a perfectly range-clustered table, and ~fileCount after
  * arrival-order appends interleave the key space. */
final case class ClusterHealth(column: String, kind: String,
                               filesWithStats: Int,
                               maxStab: Int, meanStartStab: Double)

/** What [[TableOptimizer.optimize]] measured and did. `action` is one of
  * none / compact / sort / zorder; `versionAfter == versionBefore` iff
  * the table was healthy and nothing was rewritten. */
final case class OptimizeDecision(action: String, reason: String,
                                  health: Seq[ClusterHealth],
                                  totalFiles: Int, smallFiles: Int,
                                  totalBytes: Long,
                                  versionBefore: Long, versionAfter: Long)

/** Policy layer over [[TxnTable]]'s OPTIMIZE primitives: decide WHEN a
  * rewrite pays, from driver-side metadata only.
  *
  * At 100 TB, re-clustering nightly is itself a 100 TB job — the decision
  * to run it has to be cheap and honest. Everything this object reads is
  * already on the driver: the manifest's per-file [min,max] stats (an
  * O(F log F) interval sweep gives worst- and average-case files-per-
  * point-probe) and the live files' sizes (one metadata stat each, the
  * same cost class as listing the table). The reference's lake gets the
  * equivalent loop from Delta OPTIMIZE runs scheduled by table-size
  * heuristics (common_jobs_functions.py:303-315 vacuums and manifests
  * after every write); here the trigger is the measured clustering decay
  * itself, so a table that only ever receives sorted appends is never
  * rewritten at all.
  *
  * Action choice, once degraded: two or more numeric tracked columns →
  * [[TxnTable.compactZOrdered]] (every dimension stays narrow); otherwise
  * [[TxnTable.compactSorted]] (lexicographic, works for string stats
  * too). Pure small-file fragmentation with healthy clustering rewrites
  * through the same clustered paths when stats exist — a plain
  * [[TxnTable.compact]] would destroy the pruning the stats pay for.
  */
object TableOptimizer {

  /** Per-tracked-column clustering health from the manifest (no scan).
    * Columns with fewer than 2 stat-carrying files are trivially healthy.
    * Mixed-kind stats for one column (possible after a schema change)
    * are measured per kind and the worse sweep wins. */
  def health(t: TxnTable, v: Long = -1L): Seq[ClusterHealth] = {
    val es = t.entriesFull(if (v < 0) t.version() else v)
    t.statsColumns.map { c =>
      val stats = es.flatMap(_.statFor(c))
      val byKind = stats.groupBy(_.kind)
      val sweeps = byKind.map { case (kind, ss) => (kind, sweep(kind, ss)) }
      if (sweeps.isEmpty) ClusterHealth(c, "none", 0, 1, 1.0)
      else {
        val (kind, (mx, mean)) = sweeps.maxBy(_._2._1)
        ClusterHealth(c, kind, stats.size, mx, mean)
      }
    }
  }

  /** Endpoint sweep over inclusive [min,max] intervals: returns
    * (max simultaneously open, mean open-count at interval starts).
    * Starts sort before ends at equal values so touching intervals
    * ([1,5],[5,9]) count as overlapping — a point probe at 5 opens both. */
  private def sweep(kind: String, ss: Seq[FileStat]): (Int, Double) = {
    if (ss.size < 2) return (ss.size.max(1), 1.0)
    val events: Seq[(Either[BigDecimal, String], Int)] = ss.flatMap { s =>
      def key(x: String): Either[BigDecimal, String] =
        if (kind == "num") Left(BigDecimal(x)) else Right(x)
      Seq((key(s.min), 0), (key(s.max), 1)) // 0 = start, 1 = end
    }
    implicit val ord: Ordering[(Either[BigDecimal, String], Int)] =
      Ordering.fromLessThan { case ((a, ta), (b, tb)) =>
        val c = (a, b) match {
          case (Left(x), Left(y))   => x.compare(y)
          case (Right(x), Right(y)) => x.compare(y)
          case (Left(_), Right(_))  => -1
          case (Right(_), Left(_))  => 1
        }
        if (c != 0) c < 0 else ta < tb // starts before ends at equal value
      }
    var open = 0; var maxOpen = 0; var startSum = 0L; var starts = 0
    events.sorted.foreach { case (_, typ) =>
      if (typ == 0) {
        open += 1; maxOpen = math.max(maxOpen, open)
        startSum += open; starts += 1
      } else open -= 1
    }
    (maxOpen, if (starts == 0) 1.0 else startSum.toDouble / starts)
  }

  /** Live file sizes (driver metadata stats). Unreadable/missing files
    * (concurrent vacuum, transient IO) are EXCLUDED from both the small-
    * file count and the total rather than counted as 0-byte files — a
    * handful of stat failures must not push small/total over
    * smallFileFrac and trigger a spurious full-table rewrite. */
  private def sizes(t: TxnTable): Seq[Long] =
    t.entriesFull().flatMap { e =>
      try Some(Files.size(t.filePath(e))) catch { case _: Throwable => None }
    }

  /** Measure, decide, and (when it pays) rewrite. No-op on a healthy
    * table: same version, no Spark job beyond nothing. Thresholds:
    *  - `maxStab`: rewrite when a clusterable column's worst-case point
    *    probe opens more than this many files (clustering decayed) —
    *    judged RELATIVE to what a rewrite can achieve: a z-order of F
    *    files over d dimensions equilibrates at per-dim stab ~F^(1/d)
    *    (measured ~2× that — files cut mid-curve span two cells), so
    *    the trigger is maxStab > max(maxStab, 3 × F_target^(1/d)) — the
    *    3× gives hysteresis above the measured equilibrium so the
    *    nightly loop settles. An absolute constant would re-trigger
    *    forever on an optimally clustered many-file table (a 1M-file
    *    2-D table sits at ~1000).
    *    Only columns the chosen rewrite can improve count: the z-order
    *    set, or the LEAD column of a lexicographic sort — a trailing
    *    sort column can never tighten and must not loop the optimizer.
    *  - `smallFileBytes`/`smallFileFrac`: rewrite when more than the
    *    given fraction of live files are smaller than the floor (file-
    *    open overhead dominates the scan);
    *  - `targetFileBytes` sizes the rewrite (ceil(total/target) files).
    */
  def optimize(t: TxnTable,
               maxStab: Int = 4,
               targetFileBytes: Long = 128L << 20,
               smallFileBytes: Long = 8L << 20,
               smallFileFrac: Double = 0.5,
               partitionBy: Seq[String] = Nil,
               bitsPerDim: Int = 12): OptimizeDecision = {
    val before = t.version()
    if (before == 0)
      return OptimizeDecision("none", "empty table", Nil, 0, 0, 0L, 0L, 0L)
    val h = health(t, before)
    val sz = sizes(t)
    val total = sz.size
    // a small-file floor above half the rewrite target is self-
    // contradictory: the rewrite's own output would read as fragmented
    // and the loop would never settle — clamp the floor to the target
    val smallFloor = math.min(smallFileBytes, targetFileBytes / 2)
    val small = sz.count(_ < smallFloor)
    val bytes = sz.sum
    val targetFiles = math.max(1, math.ceil(bytes.toDouble /
      targetFileBytes).toInt)
    // the columns the rewrite would cluster, and what it can achieve
    val present = h.filter(_.filesWithStats > 0)
    val numeric = present.filter(_.kind == "num")
    val clusterCols = if (numeric.size >= 2) numeric else present.take(1)
    val dims = math.max(1, clusterCols.size)
    val achievable =
      math.ceil(math.pow(targetFiles.toDouble, 1.0 / dims)).toInt
    val threshold = math.max(maxStab, achievable * 3)
    val degraded = clusterCols.filter(_.maxStab > threshold)
    val fragmented = total > targetFiles &&
      small.toDouble / math.max(total, 1) > smallFileFrac

    def recluster(reason: String): OptimizeDecision = {
      // only columns that actually carry stats can cluster: tracked-but-
      // absent columns are legal on the write path (attachStats skips
      // them) and would make repartitionByRange throw on a missing column
      val (action, after) =
        if (numeric.size >= 2)
          ("zorder", t.compactZOrdered(targetFiles,
            numeric.map(_.column), partitionBy, bitsPerDim))
        else if (present.nonEmpty)
          ("sort", t.compactSorted(targetFiles, partitionBy,
            present.map(_.column)))
        else ("compact", t.compact(targetFiles, partitionBy))
      OptimizeDecision(action, reason, h, total, small, bytes, before, after)
    }

    if (degraded.nonEmpty)
      recluster(s"clustering decayed: ${degraded.map(d =>
        s"${d.column} maxStab=${d.maxStab}").mkString(", ")} > $threshold " +
        s"(achievable ~$achievable over $dims dims at $targetFiles files)")
    else if (fragmented)
      recluster(s"$small/$total files under ${smallFloor}B " +
        s"(target $targetFiles files)")
    else
      OptimizeDecision("none", "healthy", h, total, small, bytes,
        before, before)
  }
}
