package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StratifiedQuota
import graft.pipeline.CurationQueries

class StratifiedQuotaSpec extends AnyFunSuite {
  import TestSpark._

  test("two-level selection is bit-identical to the single-window form") {
    val twoLevel = CurationQueries.q57TemperatureMix(spark, sf)
    val window = CurationQueries.q57WindowForm(spark, sf)
    // names + types must agree (nullability may differ: a join-derived
    // column is conservatively nullable; parquet/DuckDB see no difference)
    assert(twoLevel.schema.map(f => (f.name, f.dataType))
      == window.schema.map(f => (f.name, f.dataType)),
      s"${twoLevel.schema} vs ${window.schema}")
    assert(twoLevel.except(window).count() == 0
      && window.except(twoLevel).count() == 0)
  }

  test("quota >= group size keeps every row, with exact global ranks") {
    val d = graft.core.Tables.documents(spark, sf)
    val h = md5(col("doc_id").cast("string"))
    val out = StratifiedQuota.select(
      d.select(col("doc_id"), col("source")),
      group = Seq("source"), priority = h, bucket = substring(h, 1, 2),
      tiebreaks = Seq(col("doc_id")),
      quotaOf = n => (n + 1).cast(IntegerType)).cache()
    assert(out.count() == d.count())
    // ranks are a dense 1..n per group
    val bad = out.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rango").as("mx"),
        countDistinct("rango").as("dn"))
      .filter(col("mx") =!= col("n") || col("dn") =!= col("n"))
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("the wide window partitions on (group, bucket), not group alone") {
    val plan = CurationQueries.q57TemperatureMix(spark, sf)
      .queryExecution.executedPlan.toString
    // the row_number window's partition spec must include the bucket key —
    // that is the whole point of the rewrite (256 reducers per stratum)
    val windowLines = plan.linesIterator.filter(_.contains("row_number")).toSeq
    assert(windowLines.nonEmpty, s"no window in plan:\n$plan")
    assert(windowLines.exists(_.contains("__b")),
      s"window must partition by (lang, __b):\n${windowLines.mkString("\n")}")
  }
}
