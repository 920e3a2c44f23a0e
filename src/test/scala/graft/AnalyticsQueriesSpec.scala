package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.AnalyticsQueries

class AnalyticsQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("q42: SCD2 versions tile each customer's timeline without gaps") {
    val hist = AnalyticsQueries.q42Scd2History(spark, sf).cache()
    // exactly one open (current) version per customer
    val open = hist.filter(col("vigente_hasta").isNull)
      .groupBy(col("o_custkey")).count().filter(col("count") =!= 1).count()
    assert(open == 0, "each customer must have exactly one open version")
    // each closed version's end is the next version's start (no gaps,
    // no overlaps) and consecutive versions always change the attribute
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("version"))
    val seq = hist
      .withColumn("next_desde", lead(col("vigente_desde"), 1).over(w))
      .withColumn("next_prio", lead(col("prioridad"), 1).over(w))
    assert(seq.filter(col("next_desde").isNotNull &&
      col("vigente_hasta") =!= col("next_desde")).count() == 0,
      "closed versions must end exactly where the next begins")
    assert(seq.filter(col("next_prio").isNotNull &&
      col("next_prio") === col("prioridad")).count() == 0,
      "consecutive versions must differ in the tracked attribute")
    hist.unpersist()
  }

  test("q43: rollup subtotals reconcile with the grand total") {
    val r = AnalyticsQueries.q43Rollup(spark, sf).cache()
    val grand = r.filter(col("nacion").isNull && col("anio").isNull)
    assert(grand.count() == 1)
    val total = grand.head().getAs[Long]("n_pedidos")
    val perNation = r.filter(col("nacion").isNotNull && col("anio").isNull)
      .agg(sum("n_pedidos")).head().getLong(0)
    val leaves = r.filter(col("nacion").isNotNull && col("anio").isNotNull)
      .agg(sum("n_pedidos")).head().getLong(0)
    assert(perNation == total && leaves == total,
      s"rollup levels disagree: leaves=$leaves nations=$perNation total=$total")
    r.unpersist()
  }

  test("q44: pivoted priority counts sum back to the joined row count") {
    val p = AnalyticsQueries.q44Pivot(spark, sf)
    val pivotTotal = p.select(
      (coalesce(col("n_urgente"), lit(0L)) + coalesce(col("n_alta"), lit(0L)) +
        coalesce(col("n_media"), lit(0L)) + coalesce(col("n_sin_prioridad"), lit(0L)) +
        coalesce(col("n_baja"), lit(0L))).as("n"))
      .agg(sum("n")).head().getLong(0)
    val joined = graft.core.Tables.orders(spark, sf).join(
      graft.core.Tables.customer(spark, sf),
      col("o_custkey") === col("c_custkey")).count()
    assert(pivotTotal == joined,
      s"pivot cells ($pivotTotal) must partition the joined rows ($joined)")
  }

  test("range join by bins equals the naive range join, without the BNLJ") {
    import spark.implicits._
    val fact = Seq((1L, -5.0), (2L, 0.0), (3L, 7.5), (4L, 19.99), (5L, 42.0))
      .toDF("id", "v")
    // overlapping and negative intervals, plus one matching nothing
    val dims = Seq((10, -10.0, 0.0), (11, -1.0, 8.0), (12, 7.5, 20.0),
      (13, 100.0, 110.0)).toDF("dim_id", "lo", "hi")
    val binned = graft.operators.RangeJoin
      .byBins(fact, col("v"), dims, col("lo"), col("hi"), 5.0)
      .select("id", "dim_id").as[(Long, Int)].collect().toSet
    val naive = fact.crossJoin(dims)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "dim_id").as[(Long, Int)].collect().toSet
    assert(binned == naive, s"missing=${naive -- binned} extra=${binned -- naive}")
    // each pair appears exactly once even when an interval spans many bins
    val counts = graft.operators.RangeJoin
      .byBins(fact, col("v"), dims, col("lo"), col("hi"), 0.5)
      .groupBy("id", "dim_id").count().filter(col("count") > 1).count()
    assert(counts == 0, "a fact row has ONE bin — pairs can never duplicate")
    // and the catalog query's plan stays free of nested-loop joins
    val plan = graft.pipeline.AnalyticsQueries.q48BandJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("range join: randomized parity with the naive join across bin widths") {
    import spark.implicits._
    // seeded randomized sweep: 300 facts × 60 intervals (incl. negative,
    // point, and many-bin-spanning), three bin widths — one Spark job per
    // width instead of a per-case property loop
    val rnd = new scala.util.Random(20260812L)
    val fact = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 200 - 100))
      .toDF("id", "v")
    val dims = (1 to 60).map { i =>
      val lo = rnd.nextDouble() * 200 - 100
      val span = rnd.nextInt(3) match {
        case 0 => 0.0                       // point interval
        case 1 => rnd.nextDouble() * 5      // narrow
        case _ => rnd.nextDouble() * 80     // spans many bins
      }
      (i, lo, lo + span)
    }.toDF("dim_id", "lo", "hi")
    val naive = fact.crossJoin(dims)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("id", "dim_id").as[(Long, Int)].collect().toSet
    for (w <- Seq(0.7, 8.0, 300.0)) {
      val binned = graft.operators.RangeJoin
        .byBins(fact, col("v"), dims, col("lo"), col("hi"), w)
        .select("id", "dim_id").as[(Long, Int)].collect().toSet
      assert(binned == naive,
        s"width $w: missing=${(naive -- binned).take(3)} extra=${(binned -- naive).take(3)}")
    }
  }

  test("q45: rank metrics are exact rational ranks, deciles bounded") {
    val r = AnalyticsQueries.q45RankDistribution(spark, sf).cache()
    assert(r.filter(col("decil") < 1 || col("decil") > 10).count() == 0)
    assert(r.filter(col("pct_rank") < 0 || col("pct_rank") > 1).count() == 0)
    assert(r.filter(col("cume") <= 0 || col("cume") > 1).count() == 0)
    // the top customer per nation has pct_rank exactly 0
    val tops = r.groupBy(col("c_nationkey"))
      .agg(min(col("pct_rank")).as("mn")).filter(col("mn") =!= 0.0).count()
    assert(tops == 0, "each nation's top customer must sit at pct_rank 0")
    r.unpersist()
  }
}
