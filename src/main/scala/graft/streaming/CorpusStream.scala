package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.CorpusPipeline
import graft.sources.TxnTable

/** Streaming front door of the training-corpus maintenance loop: a
  * document stream lands in the standing corpus TxnTable and every
  * serving artifact stays current, one micro-batch at a time —
  * per batch: append the increment, run
  * [[CorpusPipeline.corpusIncrement]] (near-dup flags vs the standing
  * corpus, IVF append for survivors, PQ codes riding the same CDC), and
  * land the dedup flags. The standing corpus is never rescanned; each
  * batch costs O(batch · √N).
  *
  * Delivery semantics, stated precisely. Structured Streaming replays a
  * micro-batch whose epoch did not commit, so every step must tolerate
  * re-execution:
  *
  *  - the CORPUS APPEND is exactly-once via a two-phase guard: an
  *    INTENT file (batchId, corpus version v0) is published atomically
  *    BEFORE the append; a replay that finds its own batch's intent
  *    with the corpus already past v0 knows the append committed and
  *    skips it (single-writer contract — one streaming query owns the
  *    loop). A crash before the append leaves the version at v0 and the
  *    replay appends normally.
  *  - the FLAGS landing is idempotent by construction:
  *    overwritePartitions keyed on batch_id — a replay overwrites its
  *    own partition, never duplicates it.
  *  - the MAINTENANCE half (IVF append + PQ codes) may re-run on
  *    replay; a re-run can duplicate inverted-file rows for the batch's
  *    survivors, which is BENIGN at the serving surface: both serves
  *    collapse (query, neighbor) to one rank (the r8 duplicate-id law,
  *    spec-pinned in PqIndexSpec/IvfIndexSpec), and flags are
  *    recomputed deterministically from the same version range.
  *  - the MARK file (last completed batch id) is published atomically
  *    LAST; batches at or below it skip entirely.
  *
  * Prerequisite: the IVF index (and PQ codes, if ADC serving is wanted)
  * exist over the standing corpus — the same contract as
  * corpusIncrement itself. */
object CorpusStream {

  /** Drive `docsStream` (columns `doc_id`, `text`; a file stream in
    * production) through the loop with AvailableNow semantics — on a
    * cluster the same call with a continuous trigger runs forever. */
  def ingest(docsStream: DataFrame, docs: TxnTable, flags: TxnTable,
             embeddings: DataFrame, ivfRoot: String, stateRoot: String,
             checkpoint: String, minJ: Double = 0.8): Unit = {
    val q = docsStream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, id, docs, flags, embeddings, ivfRoot,
          stateRoot, minJ)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One batch of the loop — public to the package so the replay
    * contract is directly spec-testable without a crashed query. */
  private[graft] def processBatch(batch: DataFrame, id: Long,
      docs: TxnTable, flags: TxnTable, embeddings: DataFrame,
      ivfRoot: String, stateRoot: String, minJ: Double): Unit = {
    if (id <= readLong(stateRoot, "MARK").getOrElse(-1L)) return
    val intent = readIntent(stateRoot)
    val (v0, v1) = intent match {
      case Some((b, iv0)) if b == id && docs.version() > iv0 =>
        // the epoch that wrote this intent appended and then died:
        // the rows are in; redo only the deterministic remainder
        (iv0, docs.version())
      case _ =>
        val before = docs.version()
        writeIntent(stateRoot, id, before)
        (before, docs.append(batch.select(col("doc_id"), col("text"))))
    }
    val (flagRows, _) = CorpusPipeline.corpusIncrement(
      docs, v0, v1, embeddings, ivfRoot, minJ = minJ)
    flags.overwritePartitions(
      flagRows.withColumn("batch_id", lit(id)), Seq("batch_id")): Unit
    writeLong(stateRoot, "MARK", id)
    clearIntent(stateRoot)
  }

  // ------------------------------------------------- tiny atomic state
  // same tmp + ATOMIC_MOVE pattern as the index pins: a reader sees the
  // old value or the new value, never a torn write

  private def p(root: String, name: String) =
    java.nio.file.Paths.get(root, name)

  private def writeAtomic(root: String, name: String, s: String): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    Files.createDirectories(java.nio.file.Paths.get(root))
    val tmp = java.nio.file.Paths.get(root,
      s".$name-${java.util.UUID.randomUUID()}")
    Files.write(tmp, s.getBytes("UTF-8"))
    Files.move(tmp, p(root, name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING): Unit
  }

  private def readString(root: String, name: String): Option[String] = {
    val f = p(root, name)
    if (java.nio.file.Files.exists(f))
      Some(new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim)
    else None
  }

  private def readLong(root: String, name: String): Option[Long] =
    readString(root, name).map(_.toLong)

  private def writeLong(root: String, name: String, v: Long): Unit =
    writeAtomic(root, name, v.toString)

  private def writeIntent(root: String, id: Long, v0: Long): Unit =
    writeAtomic(root, "INTENT", s"$id $v0")

  private def readIntent(root: String): Option[(Long, Long)] =
    readString(root, "INTENT").map { s =>
      val Array(a, b) = s.split(' '); (a.toLong, b.toLong)
    }

  private def clearIntent(root: String): Unit = {
    java.nio.file.Files.deleteIfExists(p(root, "INTENT")): Unit
  }
}
