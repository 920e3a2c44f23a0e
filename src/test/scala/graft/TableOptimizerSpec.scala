package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZOrder
import graft.sources.{TableOptimizer, TxnTable}

/** Policy gate for the manifest-only OPTIMIZE loop: the decision must be
  * cheap (no data scan), honest (no spurious rewrite), and never crash on
  * a table configuration the write path accepts. */
class TableOptimizerSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def dir() = Files.createTempDirectory("graft_opt").toString

  test("healthy sorted table: action none, version unchanged") {
    val t = TxnTable(spark, dir(), statsColumns = Seq("k"))
    // sorted disjoint appends: clustering never decays
    (0 until 4).foreach { i =>
      val rows = (0 until 25).map(j => (i * 25L + j, s"v$j"))
      if (i == 0) t.overwrite(rows.toDF("k", "v").coalesce(1))
      else t.append(rows.toDF("k", "v").coalesce(1))
    }
    val v = t.version()
    val d = TableOptimizer.optimize(t, smallFileBytes = 0L)
    assert(d.action == "none" && d.versionAfter == v,
      s"sorted appends must never trigger a rewrite, got $d")
  }

  test("interleaved appends decay clustering; optimize z-orders and pruning recovers") {
    val t = TxnTable(spark, dir(), statsColumns = Seq("x", "y"))
    val rng = new scala.util.Random(3)
    val pts = rng.shuffle((0 until 24).flatMap(x => (0 until 24).map(y =>
      (x.toLong, y.toLong))).toVector)
    pts.grouped(72).zipWithIndex.foreach { case (g, i) =>
      if (i == 0) t.overwrite(g.toDF("x", "y").coalesce(1))
      else t.append(g.toDF("x", "y").coalesce(1))
    }
    val before = t.read().as[(Long, Long)].collect().toSet
    val h0 = TableOptimizer.health(t)
    assert(h0.forall(_.maxStab == 8), s"every file must overlap every other, got $h0")
    val d = TableOptimizer.optimize(t, maxStab = 4, smallFileBytes = 0L)
    assert(d.action == "zorder", s"two numeric decayed columns -> zorder, got $d")
    assert(d.versionAfter == d.versionBefore + 1)
    assert(t.read().as[(Long, Long)].collect().toSet == before,
      "OPTIMIZE must not change the data")
    val h1 = TableOptimizer.health(t)
    assert(h1.forall(_.maxStab < 8),
      s"z-order must actually improve measured clustering, got $h1")
    // and a second optimize on the now-healthy table is a no-op
    val d2 = TableOptimizer.optimize(t, maxStab = h1.map(_.maxStab).max,
      smallFileBytes = 0L)
    assert(d2.action == "none")
  }

  test("a z-ordered table at its stab equilibrium does not re-trigger") {
    // a 2-D z-order of F files equilibrates at per-dim stab ~sqrt(F):
    // the decay trigger must judge against that achievable bound, or the
    // nightly OPTIMIZE loop rewrites an optimally clustered table forever
    val t = TxnTable(spark, dir(), statsColumns = Seq("x", "y"))
    val rng = new scala.util.Random(17)
    val pts = rng.shuffle((0 until 48).flatMap(x => (0 until 48).map(y =>
      (x.toLong, y.toLong))).toVector)
    pts.grouped(96).zipWithIndex.foreach { case (g, i) =>
      if (i == 0) t.overwrite(g.toDF("x", "y").coalesce(1))
      else t.append(g.toDF("x", "y").coalesce(1))
    }
    // force a multi-file rewrite (the 100 TB shape: many files survive)
    val bytes = t.read().inputFiles.map(f => java.nio.file.Files.size(
      java.nio.file.Paths.get(new java.net.URI(f)))).sum
    val d = TableOptimizer.optimize(t, targetFileBytes = bytes / 16,
      smallFileBytes = 0L)
    assert(d.action == "zorder", s"24 interleaved files must trigger, got $d")
    val h = TableOptimizer.health(t)
    assert(h.forall(_.maxStab > 1) && h.forall(_.maxStab <= 12),
      s"multi-file z-order sits at per-dim stab ~2*sqrt(F): $h")
    // same thresholds again: the equilibrium table must be judged healthy
    val d2 = TableOptimizer.optimize(t, targetFileBytes = bytes / 16,
      smallFileBytes = 0L)
    assert(d2.action == "none",
      s"optimally clustered table must not re-trigger, got $d2")
  }

  test("tracked-but-absent column: optimize sorts by present columns, no crash") {
    // the write path accepts statsColumns naming a column the frame lacks
    // (attachStats skips it) — optimize() must not then die on
    // repartitionByRange(col("missing"))
    val t = TxnTable(spark, dir(), statsColumns = Seq("a", "missing"))
    val rng = new scala.util.Random(5)
    val vals = rng.shuffle((0L until 120L).toVector)
    vals.grouped(30).zipWithIndex.foreach { case (g, i) =>
      if (i == 0) t.overwrite(g.map(v => (v, s"r$v")).toDF("a", "v").coalesce(1))
      else t.append(g.map(v => (v, s"r$v")).toDF("a", "v").coalesce(1))
    }
    val before = t.read().as[(Long, String)].collect().toSet
    val d = TableOptimizer.optimize(t, maxStab = 1, smallFileBytes = 0L)
    assert(d.action == "sort",
      s"one present numeric column -> sorted compaction, got $d")
    assert(t.read().as[(Long, String)].collect().toSet == before)
  }

  test("string-stat column clusters through the sort path") {
    val t = TxnTable(spark, dir(), statsColumns = Seq("s"))
    val rng = new scala.util.Random(11)
    val vals = rng.shuffle((0 until 100).map(i => f"k$i%03d").toVector)
    vals.grouped(25).zipWithIndex.foreach { case (g, i) =>
      if (i == 0) t.overwrite(g.map(Tuple1(_)).toDF("s").coalesce(1))
      else t.append(g.map(Tuple1(_)).toDF("s").coalesce(1))
    }
    val d = TableOptimizer.optimize(t, maxStab = 1, smallFileBytes = 0L)
    assert(d.action == "sort", s"string stats cannot z-order, got $d")
    assert(t.readRange("k010", "k015").inputFiles.length <= 2,
      "sorted rewrite must restore string-range pruning")
  }

  test("unreadable files are excluded from the small-file decision") {
    val t = TxnTable(spark, dir(), statsColumns = Seq("k"))
    t.overwrite((0L until 50L).map(v => (v, s"v$v")).toDF("k", "v").coalesce(1))
    t.append((50L until 100L).map(v => (v, s"v$v")).toDF("k", "v").coalesce(1))
    // simulate a concurrent vacuum racing the size stat: delete one live
    // file's bytes out from under the manifest
    val victim = t.entriesFull().head
    val p = java.nio.file.Paths.get(t.root, "data", victim.file)
    Files.delete(p)
    // with a huge small-file floor every READABLE file is "small", but the
    // missing one must not count toward either side of the fraction
    val d = TableOptimizer.optimize(t, maxStab = 100,
      smallFileBytes = 1L, smallFileFrac = 0.99)
    assert(d.totalFiles == 1,
      s"missing file must be excluded, not counted as 0 bytes, got $d")
  }

  test("z-order arrange clamps bitsPerDim so 6 dims never overflow the curve long") {
    // 6 z-columns at the default 12 bits/dim would be 72 bits: shiftleft
    // wraps mod 64 and silently collides curve bits — arrange must clamp
    val df = (0 until 64).map(i =>
      (i.toLong, (i * 7 % 64).toLong, (i * 11 % 64).toLong,
       (i * 13 % 64).toLong, (i * 17 % 64).toLong, (i * 19 % 64).toLong))
      .toDF("a", "b", "c", "d", "e", "f")
    val cols = Seq("a", "b", "c", "d", "e", "f")
    val out = ZOrder.arrange(df, cols, numFiles = 4)
    assert(out.collect().toSet == df.collect().toSet, "data unchanged")
    // the raw interleave still refuses an explicit overflow loudly
    intercept[IllegalArgumentException] {
      ZOrder.interleave(cols.map(col), bitsPerDim = 12)
    }
    // and the registration is per-call and dropped afterwards: no session
    // globals for a concurrent arrange to clobber
    val leftover = spark.sessionState.functionRegistry.listFunction()
      .map(_.funcName).filter(_.startsWith("__z_bucket"))
    assert(leftover.isEmpty, s"temp z-bucket functions leaked: $leftover")
  }

  test("readWhere under stat-kind drift keeps the file instead of mispruning") {
    // a column stored as STRINGS whose values are zero-padded numerals:
    // a numeric box must not compare lexically against the str stats
    // ("020" < "10" lexically would prune a file whose row matches)
    val t = TxnTable(spark, dir(), statsColumns = Seq("k"))
    t.overwrite(Seq(("005", "a"), ("020", "b")).toDF("k", "v").coalesce(1))
    val got = t.readWhere(Seq(("k", 10, 30))).as[(String, String)].collect().toSet
    val want = t.read().filter(col("k").between(lit(10), lit(30)))
      .as[(String, String)].collect().toSet
    assert(got == want, s"readWhere must equal read().filter under kind drift")
    assert(got == Set(("020", "b")))
    // the mirror drift: num stats meeting a string bound must keep (not
    // throw NumberFormatException from BigDecimal)
    val t2 = TxnTable(spark, dir(), statsColumns = Seq("k"))
    t2.overwrite(Seq((5L, "a"), (20L, "b")).toDF("k", "v").coalesce(1))
    val got2 = t2.readWhere(Seq(("k", "10", "30"))).as[(Long, String)].collect().toSet
    val want2 = t2.read().filter(col("k").between(lit("10"), lit("30")))
      .as[(Long, String)].collect().toSet
    assert(got2 == want2)
  }
}
