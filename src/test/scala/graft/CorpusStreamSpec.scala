package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{IvfIndex, PqIndex}
import graft.pipeline.CorpusPipeline
import graft.sources.TxnTable
import graft.streaming.CorpusStream

/** Pins the streaming corpus loop: a document stream lands exactly once
  * in the standing corpus, the maintenance artifacts (flags, IVF, PQ
  * codes) track every micro-batch, and the stated replay semantics hold
  * — replayed batches change nothing observable. */
class CorpusStreamSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"

  test("streamed increments land once; flags, index and codes ride along") {
    val docs = graft.core.Tables.documents(spark, sf).select("doc_id", "text")
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val base = docs.filter(col("doc_id") % 10 =!= 3)
    val inc = docs.filter(col("doc_id") % 10 === 3)
    val incIds = inc.select("doc_id").collect().map(_.getLong(0)).toSet
    val baseIds = base.select("doc_id").collect().map(_.getLong(0)).toSet

    // standing corpus + serving artifacts, the corpusIncrement contract
    val corpus = TxnTable(spark,
      Files.createTempDirectory("graft_cs_docs").toString)
    corpus.append(base): Unit
    val ivfRoot = Files.createTempDirectory("graft_cs_ivf").toString
    val standing = emb.join(base.select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_semi")
    IvfIndex.buildAndSave(standing, "vec_id", "embedding", ivfRoot): Unit
    PqIndex.buildCodes(spark, ivfRoot, "vec_id", "embedding",
      PqIndex.train(standing, "vec_id", "embedding", m = 8, k = 32,
        sampleN = 200, iters = 1)): Unit

    // the stream: two parquet FILES -> two micro-batches under
    // maxFilesPerTrigger=1 + AvailableNow
    val streamDir = Files.createTempDirectory("graft_cs_stream").toString
    val mid = incIds.toSeq.sorted.apply(incIds.size / 2)
    inc.filter(col("doc_id") < mid).coalesce(1)
      .write.parquet(s"$streamDir/b0")
    inc.filter(col("doc_id") >= mid).coalesce(1)
      .write.parquet(s"$streamDir/b1")
    val schema = spark.read.parquet(s"$streamDir/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/b*/part-*.parquet")

    val flags = TxnTable(spark,
      Files.createTempDirectory("graft_cs_flags").toString)
    val stateRoot = Files.createTempDirectory("graft_cs_state").toString
    val checkpoint = Files.createTempDirectory("graft_cs_ckpt").toString
    CorpusStream.ingest(stream, corpus, flags, emb, ivfRoot, stateRoot,
      checkpoint.toString)

    // every increment row landed exactly once
    val landed = corpus.read().select("doc_id")
      .collect().map(_.getLong(0))
    assert(landed.length == landed.toSet.size, "no duplicate doc rows")
    assert(landed.toSet == baseIds ++ incIds)
    // flags cover exactly the increment, across MULTIPLE batches
    val flagged = flags.read()
    assert(flagged.select("doc_id").collect().map(_.getLong(0)).toSet
      == incIds)
    // partition values type-infer from dir names (int here) — cast back
    val batches = flagged.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(batches.size >= 2,
      s"maxFilesPerTrigger must split the stream into batches: $batches")
    // the index holds the standing corpus plus exactly the survivors
    val survivors = flagged.filter(col("n_matches") === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val indexed = IvfIndex.assignmentTable(spark, ivfRoot).read()
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(indexed == baseIds ++ survivors)
    // PQ codes rode every append and the ADC serve resolves
    assert(PqIndex.codesTable(spark, ivfRoot).read().count()
      == IvfIndex.assignmentTable(spark, ivfRoot).read().count())
    assert(PqIndex.topK(emb.filter(col("vec_id") < 5), ivfRoot,
      "vec_id", "embedding", k = 5, probes = 4).count() > 0)

    // REPLAY: re-running an already-completed batch is a no-op (the
    // mark), and re-running the whole stream on the same checkpoint
    // finds no new data
    val docsV = corpus.version()
    val flagsV = flags.version()
    CorpusStream.processBatch(inc.filter(col("doc_id") < mid), 0L,
      corpus, flags, emb, ivfRoot, stateRoot, 0.8)
    assert(corpus.version() == docsV && flags.version() == flagsV,
      "a replayed completed batch must change nothing")
    CorpusStream.ingest(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$streamDir/b*/part-*.parquet"),
      corpus, flags, emb, ivfRoot, stateRoot, checkpoint.toString)
    assert(corpus.version() == docsV,
      "same checkpoint, no new files: the loop must not move")

    // CRASH-REPLAY of the append phase: intent published, append
    // committed, epoch died before the mark — the replay must see the
    // intent + advanced version and NOT append again
    val b2 = base.filter(col("doc_id") < 50)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    val v0 = corpus.version()
    val nextBatch =
      flagged.select(max(col("batch_id").cast("long"))).head.getLong(0) + 1
    CorpusStream.processBatch(b2, nextBatch, corpus, flags, emb, ivfRoot,
      stateRoot, 0.8)
    val afterFirst = corpus.read().count()
    // now force a replay of the SAME batch id with the mark rolled back
    // to before it (the crash-before-mark shape)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(stateRoot, "MARK"),
      (nextBatch - 1).toString.getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(stateRoot, "INTENT"),
      s"$nextBatch $v0".getBytes("UTF-8"))
    CorpusStream.processBatch(b2, nextBatch, corpus, flags, emb, ivfRoot,
      stateRoot, 0.8)
    assert(corpus.read().count() == afterFirst,
      "crash-replay with committed append must not re-append rows")
  }
}
