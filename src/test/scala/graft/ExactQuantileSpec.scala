package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ExactQuantile

/** ExactQuantile = the exact order statistic, pinned against a local sort
  * on every shape that breaks histogram-selection implementations: skew
  * (one dominant value), tiny domains (width-1 buckets), negative ranges,
  * full-Long ranges (the zero-split overflow guard), forced recursion
  * (buckets/resolveLimit floored), and the exact rational rank law. */
class ExactQuantileSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** brute-force k-th smallest with k = max(1, ceil(bp*n/10000)). */
  private def brute(xs: Seq[Long], bp: Int): Long = {
    val s = xs.sorted
    val k = math.max(1L, (bp.toLong * s.length + 9999L) / 10000L)
    s((k - 1).toInt)
  }

  private def check(xs: Seq[Long], bps: Seq[Int], buckets: Int = 65536,
                    resolveLimit: Int = 65536): Unit = {
    val df = xs.toDF("x")
    val got = ExactQuantile.quantilesBp(df, "x", bps, buckets, resolveLimit)
    assert(got === bps.map(bp => bp -> brute(xs, bp)),
      s"buckets=$buckets resolveLimit=$resolveLimit n=${xs.length}")
  }

  test("random longs, multiple targets, match a local sort") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(10000)(rnd.nextLong() % 1000000L)
    check(xs, Seq(1, 2500, 5000, 9000, 9900, 10000))
  }

  test("forced recursion: floored buckets and resolveLimit still exact") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(rnd.nextLong() % 100000000L)
    // buckets=4, resolveLimit=8: many histogram levels, deep recursion
    check(xs, Seq(5000, 9900), buckets = 4, resolveLimit = 8)
  }

  test("skew: one value carries 99% of the mass") {
    val xs = Seq.fill(9900)(77L) ++ (1L to 100L)
    check(xs, Seq(100, 5000, 9999, 10000), buckets = 4, resolveLimit = 8)
  }

  test("all-equal column resolves without scanning (lo == hi)") {
    check(Seq.fill(1000)(Long.MinValue), Seq(1, 5000, 10000))
  }

  test("full 64-bit span: zero-split overflow guard") {
    val xs = Seq(Long.MinValue, -5L, -1L, 0L, 3L, Long.MaxValue)
    check(xs, Seq(1, 3000, 5000, 8000, 10000), buckets = 4, resolveLimit = 2)
  }

  test("misaligned near-MaxValue domain: top-bucket bound must not wrap") {
    // domain [1, MaxValue] with small buckets: the raw top-bucket bound
    // nLo + width - 1 overflows Long (buckets·width > span when the range
    // is not bucket-aligned). Pre-fix this either mis-clamped via
    // math.min on the wrapped value or recursed with hi < lo forever
    // (the zero-split branch found cNeg = 0 and looped). bp=10000 and
    // p99-ish both land in the top bucket.
    val xs = Seq(1L, 5L) ++ (0L until 20L).map(Long.MaxValue - _)
    check(xs, Seq(1, 5000, 9900, 10000), buckets = 4, resolveLimit = 2)
  }

  test("misaligned near-MaxValue domain survives deep recursion") {
    // enough top-bucket mass that the wrapped bound would recurse, not
    // resolve — every level re-derives the bound, so each must be safe.
    val xs = Seq(1L) ++ (0L until 200L).map(i => Long.MaxValue - i * 3L)
    check(xs, Seq(9000, 10000), buckets = 4, resolveLimit = 2)
  }

  test("negative-only domain") {
    val xs = (1 to 1000).map(i => -i.toLong * 3L)
    check(xs, Seq(5000, 9900), buckets = 16, resolveLimit = 16)
  }

  test("rank law: bp=1 on tiny n still returns the minimum (rank >= 1)") {
    check(Seq(5L, 9L), Seq(1))
  }

  test("duplicate ranks across targets share one batched resolve (r14)") {
    // n=2: bps 1/2500/5000 all rank 1, bp 10000 ranks 2 — the batched
    // resolve must fan the shared (range, rank) back to every bp
    check(Seq(10L, 20L), Seq(1, 2500, 5000, 10000))
    // and the same through forced recursion where targets diverge into
    // DISJOINT pending ranges (multi-entry when-chain)
    val xs = (1L to 300L).map(_ * 1000L)
    check(xs, Seq(100, 5000, 5001, 9900), buckets = 4, resolveLimit = 8)
  }

  test("nulls ignored, empty input returns empty") {
    val df = Seq[Option[Long]](None, Some(4L), None, Some(2L)).toDF("x")
    assert(ExactQuantile.quantilesBp(df, "x", Seq(5000)) === Seq(5000 -> 2L))
    val empty = Seq.empty[Long].toDF("x")
    assert(ExactQuantile.quantilesBp(empty, "x", Seq(5000)).isEmpty)
  }

  // ---------------------------------------------------------- grouped
  private def checkGrouped(rows: Seq[(String, Long)], bps: Seq[Int],
                           buckets: Int = 4096, resolveLimit: Int = 65536,
                           maxGroups: Int = 65536): Unit = {
    val df = rows.toDF("g", "x")
    val got = ExactQuantile
      .quantilesBpByGroup(df, "g", "x", bps, buckets, resolveLimit, maxGroups)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toList
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      bps.map(bp => (g, bp, brute(rs.map(_._2), bp)))
    }.sortBy(t => (t._1, t._2)).toList
    assert(got === expect,
      s"buckets=$buckets resolveLimit=$resolveLimit n=${rows.length}")
  }

  test("grouped: equals a per-group local sort, groups at different depths") {
    val rnd = new scala.util.Random(11)
    // group a: wide domain (recurses); b: tiny domain (resolves level 1);
    // c: all-equal (lo == hi short-circuit); d: single row
    val rows =
      Seq.fill(4000)(("a", rnd.nextLong() % 1000000000L)) ++
      Seq.fill(3000)(("b", (rnd.nextInt(5) + 1).toLong)) ++
      Seq.fill(500)(("c", 42L)) ++
      Seq(("d", -7L))
    checkGrouped(rows, Seq(1, 5000, 9900, 10000), buckets = 8,
      resolveLimit = 16)
  }

  test("grouped: skewed groups — one dominant value inside one group") {
    val rows = Seq.fill(5000)(("s", 77L)) ++ (1L to 100L).map(("s", _)) ++
      (1L to 1000L).map(i => ("u", i * 3L))
    checkGrouped(rows, Seq(100, 5000, 9999), buckets = 4, resolveLimit = 8)
  }

  test("grouped: per-group near-MaxValue misaligned domain (overflow bound)") {
    val rows = (0L until 50L).map(i => ("hi", Long.MaxValue - i * 3L)) ++
      Seq(("hi", 1L)) ++ (1L to 40L).map(i => ("mix", i - 20L)) ++
      Seq(("mix", Long.MinValue), ("mix", Long.MaxValue)) // zero-split group
    checkGrouped(rows, Seq(1, 5000, 10000), buckets = 4, resolveLimit = 2)
  }

  test("grouped: batched resolve handles many targets in one pass") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 30).flatMap { gi =>
      Seq.fill(200)((s"g$gi", rnd.nextLong() % 100000L)) }
    // resolveLimit > group size: every target resolves in the single
    // batched window pass, none recurses
    checkGrouped(rows, Seq(2500, 7500), buckets = 4, resolveLimit = 400)
  }

  test("grouped: null groups and null values ignored; maxGroups guard bites") {
    val df = Seq((Some("a"), Some(1L)), (Some("a"), Some(9L)),
      (None, Some(5L)), (Some("b"), None), (Some("b"), Some(4L)))
      .toDF("g", "x")
    val got = ExactQuantile.quantilesBpByGroup(df, "g", "x", Seq(10000))
      .collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toList
    assert(got === List(("a", 9L), ("b", 4L)))
    val e = intercept[IllegalArgumentException] {
      ExactQuantile.quantilesBpByGroup(
        (1 to 10).map(i => (s"g$i", i.toLong)).toDF("g", "x"),
        "g", "x", Seq(5000), maxGroups = 3)
    }
    assert(e.getMessage.contains("maxGroups"))
  }

  test("histogram memoization shares the level-1 scan across targets") {
    // both targets start from the same (lo, hi): the full-range histogram
    // job must run once. Proxy: identical results with a 1-element target
    // list run twice vs a 2-element list run once.
    val xs = (1 to 50000).map(_.toLong * 7L)
    val df = xs.toDF("x")
    val together = ExactQuantile.quantilesBp(df, "x", Seq(5000, 9900))
    val apart = Seq(5000, 9900).map(bp =>
      ExactQuantile.quantilesBp(df, "x", Seq(bp)).head)
    assert(together === apart)
  }
}
