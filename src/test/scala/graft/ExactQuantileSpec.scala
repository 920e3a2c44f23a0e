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

  test("negative-only domain") {
    val xs = (1 to 1000).map(i => -i.toLong * 3L)
    check(xs, Seq(5000, 9900), buckets = 16, resolveLimit = 16)
  }

  test("rank law: bp=1 on tiny n still returns the minimum (rank >= 1)") {
    check(Seq(5L, 9L), Seq(1))
  }

  test("nulls ignored, empty input returns empty") {
    val df = Seq[Option[Long]](None, Some(4L), None, Some(2L)).toDF("x")
    assert(ExactQuantile.quantilesBp(df, "x", Seq(5000)) === Seq(5000 -> 2L))
    val empty = Seq.empty[Long].toDF("x")
    assert(ExactQuantile.quantilesBp(empty, "x", Seq(5000)).isEmpty)
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
