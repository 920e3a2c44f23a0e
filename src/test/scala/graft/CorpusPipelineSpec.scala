package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{CorpusPipeline, LLMQueries}

/** Cross-stage invariants of the end-to-end corpus curation flow — each
  * operator is oracle-checked individually; this pins their composition. */
class CorpusPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("corpus pipeline: curation invariants hold end to end") {
    val root = Files.createTempDirectory("graft_corpus").toString
    val lake = CorpusPipeline.run(spark, sf, root)

    val docs = graft.core.Tables.documents(spark, sf)
    val staged = lake.read(lake.layers.Stage, "corpus_stage")
    val curated = lake.read(lake.layers.Domain, "corpus_curado")
    val chunks = lake.read(lake.layers.Analytics, "corpus_chunks")

    // stage annotates every document, nothing dropped yet
    assert(staged.count() == docs.count())

    // no two curated docs share content
    assert(curated.groupBy(md5(col("text"))).count().filter(col("count") > 1).isEmpty,
      "exact duplicates must not survive curation")

    // at most one survivor per verified near-dup pair
    val ids = curated.select("doc_id").as[Long].collect().toSet
    val pairs = LLMQueries.verifiedPairs(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val bothAlive = pairs.filter { case (a, b) => ids.contains(a) && ids.contains(b) }
    assert(bothAlive.isEmpty,
      s"near-dup pairs with both endpoints curated: ${bothAlive.take(3).mkString(",")}")

    // no benchmark docs and no contaminated docs admitted
    assert(ids.forall(_ % 50 != 0), "benchmark slice must never train")
    val contaminated = graft.pipeline.TrainingQueries.q34Decontaminate(spark, sf)
      .filter(col("contaminado") === 1).select("doc_id").as[Long].collect().toSet
    assert(ids.intersect(contaminated).isEmpty, "contaminated docs must be dropped")

    // budget admission: every admitted doc STARTED inside its source budget
    val over = curated.withColumn("__acum",
        sum(col("tokens")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("__acum") - col("tokens") >= 2000L)
    assert(over.isEmpty, "no admitted doc may start past the token budget")

    // every curated doc is chunked, and chunk ids never leave the curated set
    val chunkIds = chunks.select("doc_id").distinct().as[Long].collect().toSet
    assert(chunkIds == ids, "chunk stage must cover exactly the curated docs")
    assert(chunks.count() >= curated.count())
  }
}
