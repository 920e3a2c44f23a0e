package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TrainingQueries

class TrainingQueriesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("all training queries produce rows at sf0.001") {
    TrainingQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("decontamination: benchmark docs excluded, near-dups of them flagged") {
    val df = TrainingQueries.q34Decontaminate(spark, sf)
    assert(df.filter(col("doc_id") % 50 === 0).count() == 0,
      "benchmark slice must not appear in the corpus output")
    // testdata contains near-duplicate doc pairs; any corpus doc that is a
    // near-dup of a benchmark doc must collide on 8-grams
    assert(df.filter(col("contaminado") === 1).count() > 0)
    assert(df.filter(col("contaminado") === 1 && col("n_colisiones") === 0).count() == 0)
  }

  test("repetition signals are in range and detect a degenerate doc") {
    val df = TrainingQueries.q35Repetition(spark, sf)
    assert(df.filter(col("frac_top_palabra") < 0 || col("frac_top_palabra") > 1).count() == 0)
    assert(df.filter(col("frac_bigrams_dup") < 0 || col("frac_bigrams_dup") > 1).count() == 0)
    val degenerate = Seq((1L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
      .createOrReplaceTempView("degenerate_docs")
    val d = spark.table("degenerate_docs")
      .select(col("doc_id"),
        size(graft.llm.Shingles.words(col("text"))).as("n"))
    assert(d.head().getInt(1) == 6)
    val _ = degenerate
  }

  test("token budget: every source stops right after crossing the budget") {
    val budget = 2000L
    val df = TrainingQueries.q36TokenBudget(spark, sf, budget)
    // all but the last admitted doc per source start under budget; the
    // running total before each admitted doc is < budget
    assert(df.filter(col("tokens_acum") - col("tokens") >= budget).count() == 0)
    // per source, at most one admitted doc ENDS at/past the budget (the
    // boundary-crossing one)
    val over = df.filter(col("tokens_acum") >= budget)
      .groupBy("source").count().filter(col("count") > 1)
    assert(over.count() == 0)
  }
}
