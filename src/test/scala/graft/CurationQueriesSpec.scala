package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.CurationQueries

class CurationQueriesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("all curation queries produce rows at sf0.001") {
    CurationQueries.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("boilerplate: fractions bounded, common grams really repeat") {
    val df = CurationQueries.q56Boilerplate(spark, sf).cache()
    assert(df.filter(col("frac_comun") < 0 || col("frac_comun") > 1).count() == 0)
    assert(df.filter(col("n_comunes") > col("n_grams")).count() == 0)
    // testdata has near-duplicate docs, so some grams must be corpus-common
    assert(df.agg(sum("n_comunes")).head().getLong(0) > 0)
    // every document of the corpus is scored exactly once
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(df.count() == docs)
    df.unpersist()
  }

  test("temperature mix: quota formula holds and languages rebalance") {
    val df = CurationQueries.q57TemperatureMix(spark, sf).cache()
    // each kept language contributes exactly min(quota, n_lang) documents
    val bad = df.groupBy("lang", "n_lang", "cuota")
      .agg(count(lit(1)).as("kept"))
      .filter(col("kept") =!= least(col("cuota"), col("n_lang"))              )
    assert(bad.count() == 0)
    // the quota is sublinear: a kept language never keeps everything once
    // n_lang outgrows 3*sqrt(n_lang) (n_lang > 9 docs)
    assert(df.filter(col("n_lang") > 9 && col("cuota") >= col("n_lang")).count() == 0)
    df.unpersist()
  }

  test("shuffle shard: dense positions, deterministic membership") {
    val df = CurationQueries.q58ShuffleShard(spark, sf).cache()
    // positions are a dense 1..n sequence inside every shard
    val bad = df.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("dn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("dn") =!= col("n"))
    assert(bad.count() == 0)
    // membership is a pure function of doc_id: recompute independently
    val again = CurationQueries.q58ShuffleShard(spark, sf)
    assert(df.except(again).count() == 0 && again.except(df).count() == 0)
    // no document is lost or duplicated
    val docs = graft.core.Tables.documents(spark, sf).count()
    assert(df.count() == docs && df.select("doc_id").distinct().count() == docs)
    df.unpersist()
  }

  test("quantization: codes bounded, scale exact, zero shuffle") {
    val df = CurationQueries.q62Quantize(spark, sf).cache()
    val e = graft.core.Tables.embeddings(spark, sf)
    assert(df.count() == e.count())
    // |codes| <= 127 per element implies |sum| <= 127 * dim
    val dim = e.selectExpr("max(size(embedding))").head().getInt(0)
    assert(df.filter(abs(col("suma_q")) > 127L * dim).count() == 0)
    // quantization is a pure map: no Exchange at any scale
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q62 must not shuffle:\n$plan")
    // deterministic: recomputation digests identically
    val again = CurationQueries.q62Quantize(spark, sf)
    assert(df.except(again).count() == 0)
    df.unpersist()
  }

  test("q56 plan: gram stream shuffles on 8-byte hashes, no string keys") {
    val df = CurationQueries.q56Boilerplate(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // exactly three exchanges: gram df agg, gram-df join side, doc agg —
    // plus nothing else (no distinct pass, no extra sort exchange)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"q56 expected <=3 exchanges, got $exchanges:\n$plan")
  }
}
