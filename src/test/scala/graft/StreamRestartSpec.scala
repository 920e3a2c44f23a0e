package graft

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Crash/restart recovery for the checkpointed streaming sinks (round-6
  * verdict item 6): the existing restart specs re-open a checkpoint whose
  * source is EXHAUSTED; these re-open checkpoints holding LIVE state —
  * open windows and un-evicted join rows — and one run is additionally
  * killed mid-stream (query.stop() between micro-batches, the in-process
  * stand-in for a driver crash: the checkpoint sees an arbitrary batch
  * boundary, exactly like a kill -9 between commits). The law in every
  * case: the final parquet output of interrupted-and-resumed runs is
  * bit-identical to one uninterrupted run over the same files, on the
  * RocksDB state store provider.
  */
class StreamRestartSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(tag: String): Path =
    Files.createTempDirectory(s"graft-restart-$tag")

  /** Split the sf events table into `n` single-file slices ordered by ts
    * (so later slices advance the watermark over earlier ones), returning
    * the part files. */
  private def eventSlices(n: Int): Seq[Path] = {
    val stage = tmp("slices")
    graft.core.Tables.events(spark, sf)
      .repartitionByRange(n, org.apache.spark.sql.functions.col("ts"))
      .write.mode("overwrite").parquet(stage.toString)
    Files.list(stage).iterator().asScala.toList
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
  }

  /** Copy `files` into `dir`/events.parquet (the lake layout rawStream
    * globs). */
  private def feed(dir: Path, files: Seq[Path]): Unit = {
    val d = dir.resolve("events.parquet")
    Files.createDirectories(d)
    files.foreach(f =>
      Files.copy(f, d.resolve(f.getFileName), StandardCopyOption.REPLACE_EXISTING))
  }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Drive `frame(dir)` to a parquet sink with AvailableNow; when
    * `killAfterBatch`, stop the query after its first data batch instead
    * of letting the run drain — the in-flight/pending work is simply not
    * committed, like a crash between commits. */
  private def runSink(frame: String => DataFrame, dir: Path, out: Path,
                      ckpt: Path, killAfterBatch: Boolean = false): Unit = {
    val q = frame(dir.toString).writeStream
      .outputMode("append").format("parquet")
      .option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow()).start()
    if (killAfterBatch) {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q.isActive && q.recentProgress.forall(_.numInputRows == 0) &&
             System.nanoTime() < deadline) Thread.sleep(20)
      q.stop()
    }
    q.awaitTermination()
  }

  private def readOut(out: Path): Set[String] =
    spark.read.parquet(out.toString).collect()
      .map(_.mkString("|")).toSet

  // A killed run loses its in-memory event-time stats, so the recovered
  // watermark is the last COMMITTED one and windows the dead run had
  // in flight stay open until LATER DATA advances the watermark again —
  // which is exactly how a continuous deployment recovers (the next
  // events push the watermark). The scenarios therefore always feed a
  // post-kill slice; the law is end-state equality with one uninterrupted
  // run over the same files, which holds only if the recovered RocksDB
  // state (open windows / un-evicted join rows) is intact.

  test("tumbling sink: open-state restart + mid-run kill equals one continuous run") {
    withRocksDb {
      val slices = eventSlices(6)
      val frame = (d: String) =>
        EventsStream.tumblingFrame(spark, d, "1 hour", "1 minute")

      // continuous reference run over all files at once
      val (cDir, cOut, cCkpt) = (tmp("c-src"), tmp("c-out"), tmp("c-ck"))
      feed(cDir, slices)
      runSink(frame, cDir, cOut, cCkpt)

      // phased: drain 1-2; KILL during 3-4; recover; feed 5-6, drain
      val (pDir, pOut, pCkpt) = (tmp("p-src"), tmp("p-out"), tmp("p-ck"))
      feed(pDir, slices.take(2))
      runSink(frame, pDir, pOut, pCkpt)
      val afterPhase1 = readOut(pOut).size
      feed(pDir, slices.slice(2, 4))
      runSink(frame, pDir, pOut, pCkpt, killAfterBatch = true)
      runSink(frame, pDir, pOut, pCkpt) // recover from the kill
      feed(pDir, slices.drop(4))
      runSink(frame, pDir, pOut, pCkpt) // next events re-advance the watermark
      val continuous = readOut(cOut)
      val phased = readOut(pOut)
      assert(phased == continuous,
        "killed-and-resumed output must equal the uninterrupted run")
      // the restarts genuinely closed windows ACROSS boundaries: phase 1
      // left open windows (watermark behind) that later phases emitted
      assert(afterPhase1 < continuous.size,
        "phase 1 should leave open windows for the restarts to close")
    }
  }

  test("interval-join sink: open join state survives restart, exactly-once") {
    withRocksDb {
      val slices = eventSlices(6)
      // a short watermark so early phases hold un-evicted A rows whose
      // matches arrive after the kill
      val frame = (d: String) =>
        EventsStream.intervalJoinFrame(spark, d, "view", "purchase",
          windowSeconds = 7200, watermarkDelay = "10 minutes")

      val (cDir, cOut, cCkpt) = (tmp("jc-src"), tmp("jc-out"), tmp("jc-ck"))
      feed(cDir, slices)
      runSink(frame, cDir, cOut, cCkpt)

      val (pDir, pOut, pCkpt) = (tmp("jp-src"), tmp("jp-out"), tmp("jp-ck"))
      feed(pDir, slices.take(2))
      runSink(frame, pDir, pOut, pCkpt)
      feed(pDir, slices.slice(2, 4))
      runSink(frame, pDir, pOut, pCkpt, killAfterBatch = true)
      runSink(frame, pDir, pOut, pCkpt)
      feed(pDir, slices.drop(4))
      runSink(frame, pDir, pOut, pCkpt)
      assert(readOut(pOut) == readOut(cOut),
        "restarted interval join must emit exactly the continuous run's pairs")
    }
  }
}
