package graft.sources

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Lake maintenance + ops metadata: the reference's vacuum/manifest and
  * DynamoDB status-tracking concerns, parquet-native.
  *
  * reference: common_jobs_functions.py:303-315 (vacuum + manifest after
  * every write), 575-672 (LOGGING_UTILS status updates / job logs).
  */
object Maintenance {
  /** Small-file compaction — the parquet analog of vacuum. Streaming
    * appends and per-period upserts accumulate small files; at 100 TB the
    * scan cost is dominated by file-open overhead once files fall under
    * ~100 MB. Rewrites each partition into `filesPerPartition` files via a
    * staging dir (same isolation pattern as LakeIO.upsert). */
  def compact(lake: LakeIO, layer: String, table: String,
              partitionBy: Seq[String] = Nil, filesPerPartition: Int = 1): Unit = {
    val spark = lake.spark
    val df = lake.read(layer, table)
    val staging = lake.tablePath(layer, s"__compact_$table")
    val squeezed =
      if (partitionBy.isEmpty) df.coalesce(filesPerPartition)
      else df.repartition(partitionBy.map(col): _*).coalesce(
        math.max(filesPerPartition, 1))
    val w = squeezed.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(staging)
    val back = spark.read.parquet(staging)
    val w2 = back.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w2.partitionBy(partitionBy: _*) else w2)
      .parquet(lake.tablePath(layer, table))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(staging))
  }

  def fileCount(lake: LakeIO, layer: String, table: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(lake.tablePath(layer, table)))
  }
}

/** Notification hook for job failures/warnings — the reference publishes
  * SNS error messages per job (common_jobs_functions.py:575-594); here the
  * transport is injected so the lake core stays cloud-agnostic: wire an
  * SNS/Slack/pager implementation in production, a collector in tests. */
trait Alerter {
  def alert(table: String, layer: String, status: String, message: String): Unit
}

object Alerter {
  /** Default: no transport (JobLog still records everything). */
  val Silent: Alerter = (_, _, _, _) => ()

  /** Stderr transport for local runs. */
  val Stderr: Alerter = (table, layer, status, message) =>
    System.err.println(s"[graft-alert] $layer.$table $status: $message")
}

/** Job status log — the reference's DynamoDB STATUS tracking re-expressed
  * as an append-only JSONL log under the lake's _meta dir; non-success
  * transitions also fan out through the [[Alerter]].
  * reference: common_jobs_functions.py:99-107 (STATUS), 575-654. */
final case class JobLog(root: String, alerter: Alerter = Alerter.Silent) {
  import java.nio.file.{Files, Paths, StandardOpenOption}
  private val dir = Paths.get(root, "_meta")

  object Status {
    val InProgress = "IN_PROGRESS"; val Succeeded = "SUCCEEDED"
    val Failed = "FAILED"; val Warning = "WARNING"
  }

  def log(table: String, layer: String, status: String, message: String = "",
          atMillis: Long = System.currentTimeMillis()): Unit = {
    Files.createDirectories(dir)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val line = s"""{"table":${q(table)},"layer":${q(layer)},"status":${q(status)},"message":${q(message)},"ts":$atMillis}""" + "\n"
    Files.writeString(dir.resolve(s"$table.jsonl"), line,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND): Unit
    if (status == Status.Failed || status == Status.Warning)
      alerter.alert(table, layer, status, message)
  }

  /** Most recent status for a table (drives orchestration decisions). */
  def lastStatus(table: String): Option[String] = {
    val p = dir.resolve(s"$table.jsonl")
    if (!Files.exists(p)) None
    else {
      val lines = Files.readAllLines(p)
      if (lines.isEmpty) None
      else {
        val last = lines.get(lines.size - 1)
        "\"status\":\"([A-Z_]+)\"".r.findFirstMatchIn(last).map(_.group(1))
      }
    }
  }

  /** Wrap a job body with IN_PROGRESS/SUCCEEDED/FAILED transitions. */
  def tracked[T](table: String, layer: String)(body: => T): T = {
    log(table, layer, Status.InProgress)
    try { val r = body; log(table, layer, Status.Succeeded); r }
    catch { case e: Throwable =>
      log(table, layer, Status.Failed, Option(e.getMessage).getOrElse(e.getClass.getName))
      throw e
    }
  }
}

/** Advisory job lock — the reference's "is another run active for this
  * country" guard (reference: artifacts/aws-lambda/code/analytics/get_data/
  * lambda_function.py:36-53), via atomic lock-file creation. */
final case class JobLock(root: String) {
  import java.nio.file.{Files, Paths}
  private def lockPath(name: String) = Paths.get(root, "_locks", s"$name.lock")

  /** Try to acquire; true on success, false if a live lock exists. */
  def tryAcquire(name: String): Boolean = {
    Files.createDirectories(Paths.get(root, "_locks"))
    try { Files.createFile(lockPath(name)); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  def release(name: String): Unit = { Files.deleteIfExists(lockPath(name)): Unit }

  /** Run `body` only if the lock is free (skip semantics, like the
    * reference's wait/skip response). Returns None when skipped. */
  def exclusively[T](name: String)(body: => T): Option[T] =
    if (!tryAcquire(name)) None
    else try Some(body) finally release(name)
}
