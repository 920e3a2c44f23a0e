package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.MergeSCD1

/** Minimal version-file transaction log: the crash-safe commit protocol the
  * reference gets from Delta (`common_jobs_functions.py:279-304` upsert via
  * `DeltaTable.merge`), rebuilt on two filesystem primitives — immutable
  * uniquely-named data files, and one atomic rename of a manifest.
  *
  * Layout:
  * {{{
  *   <table>/
  *     _graft_log/v<20-digit>.manifest   one text line per live file:
  *                                       "<partitionDir>\t<fileName>"
  *     data/[<partitionDir>/]<uuid>.parquet
  * }}}
  *
  * Invariants:
  *  - Data files are never overwritten or rewritten; a write stages new
  *    files under fresh UUID names, then publishes a NEW manifest listing
  *    the complete live set. The manifest move is the commit point.
  *  - Readers resolve the highest manifest version and read exactly the
  *    files it lists (basePath keeps partition-column inference). A crash
  *    before the manifest move leaves orphan data files and the previous
  *    version fully intact — no torn table states, ever.
  *  - Commits carry the version they were based on; a concurrent commit of
  *    the same version loses with a [[TxnConflictException]] (optimistic
  *    concurrency). Cross-process writers should additionally take the
  *    Maintenance JobLock; the log's job is crash atomicity.
  *  - [[vacuum]] deletes unreferenced files older than a grace period —
  *    the retention analog of the reference's vacuum
  *    (`common_jobs_functions.py:303-315`).
  */
final class TxnConflictException(msg: String) extends RuntimeException(msg)

final case class TxnTable(spark: SparkSession, root: String) {
  private val logDir: Path = Paths.get(root, "_graft_log")
  private val dataDir: Path = Paths.get(root, "data")

  // ------------------------------------------------------------ log state
  private def manifestPath(v: Long): Path =
    logDir.resolve(f"v$v%020d.manifest")

  private def listDir(p: Path): List[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  private def walkFiles(p: Path): List[Path] = {
    val s = Files.walk(p)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).toList finally s.close()
  }

  /** Highest committed version, or 0 if the table has never been written. */
  def version(): Long =
    if (!Files.isDirectory(logDir)) 0L
    else listDir(logDir)
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".manifest") =>
        s.stripPrefix("v").stripSuffix(".manifest").toLong }
      .foldLeft(0L)(math.max)

  def exists(): Boolean = version() > 0

  /** Live (partitionDir, fileName) entries of a version ("" = root). */
  def entries(v: Long = version()): Seq[(String, String)] =
    if (v == 0) Nil
    else Files.readAllLines(manifestPath(v)).asScala.toSeq.filter(_.nonEmpty)
      .map { line =>
        val i = line.indexOf('\t')
        (line.substring(0, i), line.substring(i + 1))
      }

  private def filePath(e: (String, String)): Path =
    if (e._1.isEmpty) dataDir.resolve(e._2) else dataDir.resolve(e._1).resolve(e._2)

  // ------------------------------------------------------------- reading
  def read(): DataFrame = readVersion(version())

  /** Time-travel read of a specific committed version. Valid as long as
    * [[vacuum]] has not reclaimed that version's files (vacuum keeps only
    * the current version's referenced files). */
  def readVersion(v: Long): DataFrame = {
    val es = entries(v)
    require(es.nonEmpty, s"table $root has no committed version $v")
    spark.read.option("basePath", dataDir.toString)
      .parquet(es.map(e => filePath(e).toString): _*)
  }

  // ------------------------------------------------------------- writing
  /** Stage `df`'s files into data/ under fresh names WITHOUT committing.
    * Returns the staged entries; visible to no reader until [[commit]]. */
  private[graft] def stage(df: DataFrame, partitionBy: Seq[String]): Seq[(String, String)] = {
    val tmp = Paths.get(root, s"_staging_${UUID.randomUUID()}")
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    val staged = walkFiles(tmp)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val partDir = tmp.relativize(p.getParent).toString
        val fresh = s"${UUID.randomUUID().toString}.parquet"
        val destDir = if (partDir.isEmpty) dataDir else dataDir.resolve(partDir)
        Files.createDirectories(destDir)
        // same-volume move: cheap rename, file becomes immutable once placed
        Files.move(p, destDir.resolve(fresh), StandardCopyOption.ATOMIC_MOVE)
        (partDir, fresh)
      }.toList
    deleteRecursively(tmp)
    staged
  }

  /** Publish `newEntries` as version `basedOn + 1`. The single atomic
    * manifest rename is the commit point. */
  private[graft] def commit(newEntries: Seq[(String, String)], basedOn: Long): Long = {
    Files.createDirectories(logDir)
    val next = basedOn + 1
    val target = manifestPath(next)
    if (Files.exists(target))
      throw new TxnConflictException(
        s"version $next already committed at $root (concurrent writer)")
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, newEntries.map(e => s"${e._1}\t${e._2}").asJava)
    // createLink is the atomic one-winner primitive: unlike rename (which
    // silently REPLACES an existing target on POSIX), linking to an
    // existing path fails — so of N same-version committers exactly one
    // publishes and the rest get a conflict.
    try Files.createLink(target, tmp)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw new TxnConflictException(
        s"version $next already committed at $root (concurrent writer)")
    }
    Files.deleteIfExists(tmp)
    next
  }

  /** Atomic full replace. */
  def overwrite(df: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    val base = version()
    commit(stage(df, partitionBy), base)
  }

  /** Atomic append: new files join the live set, nothing is rewritten. */
  def append(df: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    val base = version()
    commit(entries(base) ++ stage(df, partitionBy), base)
  }

  /** Crash-safe SCD1 upsert scoped to the partitions the source touches
    * (the reference's Delta merge, partition-pruned). Untouched partitions'
    * files carry over into the new manifest by reference — zero rewrite. */
  def upsert(df: DataFrame, keys: Seq[String], partitionBy: Seq[String] = Nil): Long = {
    val base = version()
    if (base == 0) return commit(stage(df, partitionBy), base)
    val current = read()
    val merged =
      if (partitionBy.isEmpty)
        MergeSCD1.merge(current, df.select(current.columns.toIndexedSeq.map(col): _*), keys)
      else {
        val parts = df.select(partitionBy.map(col): _*).distinct().collect()
        val cond = parts.map { r =>
          partitionBy.zipWithIndex.map { case (c, i) => col(c) <=> lit(r.get(i)) }
            .reduce(_ && _)
        }.reduceOption(_ || _).getOrElse(lit(false))
        MergeSCD1.merge(current.filter(cond),
          df.select(current.columns.toIndexedSeq.map(col): _*), keys)
      }
    val staged = stage(merged, partitionBy)
    // merged rows live exactly in the touched partitions, so the staged
    // partition dirs (Spark's own escaping) name what must be replaced
    val touched = staged.map(_._1).toSet
    val kept = entries(base).filterNot(e => touched.contains(e._1))
    commit(kept ++ staged, base)
  }

  /** Rewrite the live set into ~`targetFiles` files per partition
    * (compaction); readers switch to the compacted files atomically. */
  def compact(targetFiles: Int = 1, partitionBy: Seq[String] = Nil): Long = {
    val base = version()
    val compacted = read().repartition(targetFiles)
    commit(stage(compacted, partitionBy), base)
  }

  /** Publish a symlink-format manifest of the CURRENT version — one
    * absolute data-file path per line under
    * `_symlink_format_manifest/manifest` — the standard handshake for
    * external engines (Redshift Spectrum / Trino / Presto) reading a
    * versioned table, mirroring the reference's post-write manifest
    * generation (common_jobs_functions.py:303-315). Atomic via the same
    * tmp-then-rename protocol as the log itself. */
  def writeSymlinkManifest(): Path = {
    val dir = Paths.get(root, "_symlink_format_manifest")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, entries().map(e => filePath(e).toAbsolutePath.toString).asJava)
    val target = dir.resolve("manifest")
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    target
  }

  /** Delete data files no manifest-of-record references (crash orphans,
    * superseded versions) once older than `retainMs`. Keeps only the
    * CURRENT version's files referenced — time travel is out of scope. */
  def vacuum(retainMs: Long = 0L): Seq[String] = {
    if (!Files.isDirectory(dataDir)) return Nil
    val live = entries().map(filePath).map(_.toAbsolutePath.toString).toSet
    val cutoff = System.currentTimeMillis() - retainMs
    val removed = walkFiles(dataDir)
      .filter(p => !live.contains(p.toAbsolutePath.toString))
      .filter(p => Files.getLastModifiedTime(p).toMillis <= cutoff)
    removed.foreach(Files.delete(_))
    removed.map(_.toString)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p): Unit
  }
}
