package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.FlowQueries
import graft.operators.{AsOfJoin, MergeSCD1}

class FlowQueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("all flow queries produce rows at sf0.001") {
    FlowQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q9 magic date roundtrips") {
    val bad = FlowQueries.q9MagicDate(spark, sf)
      .filter(col("fecha") =!= col("fecha_roundtrip")).count()
    assert(bad == 0)
  }

  test("as-of join: carried value is never from the future") {
    import spark.implicits._
    val left = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val right = Seq((1L, 9L, "a"), (1L, 15L, "b"), (2L, 6L, "c")).toDF("k", "t", "v")
    val out = AsOfJoin.lastValue(left, right, "k", "t", Seq("v" -> "vv"))
      .select("k", "t", "vv").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, null)))
  }

  test("merge: source wins, unmatched target survives") {
    import spark.implicits._
    val target = Seq((1, "old"), (2, "keep")).toDF("k", "v")
    val source = Seq((1, "new"), (3, "ins")).toDF("k", "v")
    val out = MergeSCD1.merge(target, source, Seq("k")).as[(Int, String)].collect().toSet
    assert(out == Set((1, "new"), (2, "keep"), (3, "ins")))
  }

  test("update-only merge drops unmatched source rows") {
    import spark.implicits._
    val target = Seq((1, "old"), (2, "keep")).toDF("k", "v")
    val source = Seq((1, "new"), (3, "dropped")).toDF("k", "v")
    val out = MergeSCD1.updateOnly(target, source, Seq("k")).as[(Int, String)].collect().toSet
    assert(out == Set((1, "new"), (2, "keep")))
  }

  test("q13 sessions have no internal gap > 30min across session boundary") {
    val df = FlowQueries.q13Sessionize(spark, sf)
    // session ids are dense per user starting at 1
    assert(df.filter(col("session_id") < 1).count() == 0)
  }

  test("q14 streaming equals batch rollup") {
    val streamed = FlowQueries.q14StreamTumbling(spark, sf)
    val ev = graft.core.Tables.events(spark, sf)
    val batch = ev.groupBy(date_trunc("hour", col("ts")).as("ventana"), col("event_type"))
      .agg(count(lit(1)).as("n_eventos"))
    val s = streamed.select("ventana", "event_type", "n_eventos").collect().map(_.toSeq).toSet
    val b = batch.select("ventana", "event_type", "n_eventos").collect().map(_.toSeq).toSet
    assert(s == b)
  }
}
