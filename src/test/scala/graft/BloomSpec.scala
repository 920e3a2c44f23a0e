package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{BloomDecontaminate, Shingles}

class BloomSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = graft.core.Tables.documents(spark, sf)
  private def bench = docs.filter(col("doc_id") % 50 === 0)
  private def corpus = docs.filter(col("doc_id") % 50 =!= 0)

  test("bloom-prefiltered decontamination is bit-identical to the exact join") {
    // q34ExactForm is the plain join; the catalog q34 runs the bloom path
    val exact = graft.pipeline.TrainingQueries.q34ExactForm(spark, sf)
    val bloom = BloomDecontaminate.flag(corpus, bench)
    assert(bloom.schema.fieldNames.sorted.sameElements(exact.schema.fieldNames.sorted))
    assert(exact.except(bloom).count() == 0 && bloom.except(exact).count() == 0)
  }

  test("no false negatives: every true benchmark gram passes the filter") {
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(Shingles.shingles(col("text"), 8)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
    val benchHashes = grams(bench).distinct()
    val bf = BloomDecontaminate.buildBloom(benchHashes, "gh", 1L << 18, 1L << 22)
    val missed = benchHashes
      .filter(!BloomDecontaminate.mightContain(bf, col("gh")))
    assert(missed.count() == 0, "a bloom filter must never reject an inserted key")
  }

  test("the prefilter is selective: candidate stream shrinks before the join") {
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(Shingles.shingles(col("text"), 8)).as("g"))
      .select(xxhash64(col("g")).as("gh"))
    val bf = BloomDecontaminate.buildBloom(
      grams(bench).distinct(), "gh", 1L << 18, 1L << 22)
    val all = grams(corpus).count()
    val kept = grams(corpus)
      .filter(BloomDecontaminate.mightContain(bf, col("gh"))).count()
    // the corpus is mostly non-contaminated, so the prefilter must drop
    // the bulk of the gram stream (fp-rate + true hits only survive)
    assert(kept < all / 2, s"prefilter kept $kept of $all grams")
  }

  test("probe runs inside whole-stage codegen before any exchange") {
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), explode(Shingles.shingles(col("text"), 8)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
    val bf = BloomDecontaminate.buildBloom(
      grams(bench).select("gh").distinct(), "gh", 1L << 18, 1L << 22)
    val filtered = grams(corpus)
      .filter(BloomDecontaminate.mightContain(bf, col("gh")))
      .groupBy("doc_id").count()
    val plan = filtered.queryExecution.executedPlan.toString
    // the might_contain predicate must sit under WholeStageCodegen and
    // upstream of the aggregation's exchange
    assert(plan.contains("bloom_might_contain") || plan.contains("might_contain"),
      s"probe missing from plan:\n$plan")
    val exchangeIdx = plan.indexOf("Exchange")
    val probeIdx = math.max(plan.indexOf("bloom_might_contain"),
      plan.indexOf("might_contain"))
    assert(exchangeIdx >= 0 && probeIdx > exchangeIdx,
      "probe must appear below (after, in printed order) the exchange — " +
        s"i.e. map-side, pre-shuffle:\n$plan")
  }

  test("streaming flag: stateless plan, zero false negatives vs the exact batch form") {
    // stream the corpus docs from parquet (AvailableNow covers the file)
    val path = graft.core.Tables.path(sf, "documents")
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .parquet(path.replace("parquet", "parque[t]"))
      .filter(col("doc_id") % 50 =!= 0)
    val flagged = BloomDecontaminate.flagStream(stream, bench)
    assert(flagged.isStreaming, "flagStream must stay a streaming frame")
    val qname = s"bloom_stream_${System.nanoTime()}"
    val q = flagged.writeStream.format("memory").queryName(qname)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // stateless: the executed micro-batches keep no state store
    assert(!q.lastProgress.toString().contains("stateOperators\" : [ {"),
      "streaming bloom flag must run without state operators")
    val got = spark.table(qname)
    // bloom law: every doc the exact batch flag marks contaminated is
    // approx-flagged in the stream — over-flagging allowed, under never
    val exact = BloomDecontaminate.flag(corpus, bench)
      .filter(col("contaminado") === 1).select("doc_id")
    val missed = exact.except(
      got.filter(col("contaminado_aprox") === 1).select("doc_id"))
    assert(missed.count() == 0,
      "streaming bloom flag must never miss a truly contaminated doc")
    assert(got.count() == corpus.count())
  }

  test("streaming flag analyzes on a minimal (id, text) stream — no hidden column requirements") {
    val path = graft.core.Tables.path(sf, "documents")
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .parquet(path.replace("parquet", "parque[t]"))
      .select("doc_id", "text") // no `source` — the API only asks for (id, text)
    val flagged = BloomDecontaminate.flagStream(stream, bench)
    assert(flagged.columns.toSeq ==
      Seq("doc_id", "n_candidatas", "contaminado_aprox"))
    // and passthrough columns survive when present
    val withExtra = BloomDecontaminate.flagStream(
      spark.readStream.schema(schema).parquet(path.replace("parquet", "parque[t]")),
      bench)
    assert(withExtra.columns.contains("source"))
  }
}
