package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.MergeSCD1

/** Layered parquet lake: the reference's SPARK_CONTROLLER storage surface
  * (reference: artifacts/aws-glue/layer/common_jobs_functions.py:109-356)
  * re-expressed on plain parquet + Spark-native merge.
  *
  * Layers mirror the reference (stage → domain → analytics); tables are
  * directories of parquet partitioned by business keys (the reference
  * partitions facts by id_pais/id_periodo). Writes use DYNAMIC partition
  * overwrite so a periodic job rewrites only the partitions it produced —
  * at 100 TB that is the difference between touching this month's
  * partitions and rewriting years of history.
  *
  * The reference gets transactional upsert from Delta; on raw parquet we
  * scope the merge to affected partitions (partition pruning on read,
  * dynamic overwrite on write) with a staging dir for read/write isolation.
  * Swapping in a transactional table format changes only this class.
  */
final case class LakeIO(spark: SparkSession, root: String) {
  object layers {
    val Stage = "stage"; val Domain = "domain"; val Analytics = "analytics"
  }

  def tablePath(layer: String, table: String): String = s"$root/$layer/$table"

  /** Transactional variant of this table: version-file log with atomic
    * manifest commits (crash-safe upsert/compact/overwrite) — the parity
    * analog of the reference's Delta tables. Plain-parquet read/write
    * below stays for layer interop; new mutable tables should prefer txn.
    * Pass `statsColumns` (normally the merge keys / probe dimensions) to
    * record per-file min/max in the manifest and get file-pruned upserts
    * plus [[TxnTable.readWhere]] box pruning. */
  def txn(layer: String, table: String,
          statsColumns: Seq[String] = Nil): TxnTable =
    TxnTable(spark, tablePath(layer, table), statsColumns)

  def exists(layer: String, table: String): Boolean =
    new java.io.File(tablePath(layer, table)).exists()

  /** Reads any table format in the lake: a directory carrying a
    * `_graft_log` is a transactional table (resolved through its
    * committed manifest), one carrying only a `_delta_log` is a Delta
    * table (resolved through [[DeltaInterop]] — the reference's native
    * format, so its existing lake opens as-is), and plain directories
    * read as raw parquet. Downstream jobs never care which is which.
    * `_graft_log` wins when both logs exist (a txn table exported via
    * DeltaInterop.exportTxn carries both; the graft log is richer). */
  def read(layer: String, table: String): DataFrame = {
    val p = tablePath(layer, table)
    if (new java.io.File(p, "_graft_log").isDirectory) TxnTable(spark, p).read()
    else if (DeltaInterop.isDeltaTable(p)) DeltaInterop.read(spark, p)
    // mergeSchema: after a schema-evolving upsert, untouched partitions
    // lack the new columns — the union schema keeps them visible
    else spark.read.option("mergeSchema", "true").parquet(p)
  }

  /** External CSV read, reference: common_jobs_functions.py:227-229. */
  def readCsv(path: String, sep: String = ";"): DataFrame =
    spark.read.option("sep", sep).option("header", "true").csv(path)

  /** Overwrite write; with partition columns, only partitions present in
    * `df` are replaced (dynamic mode), like the reference's
    * partitionOverwriteMode=dynamic (common_jobs_functions.py:312). */
  def write(df: DataFrame, layer: String, table: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath(layer, table))
  }

  /** Range-partitioned sorted write: repartitionByRange + in-partition sort
    * on `sortCols` before writing, so each parquet file covers a narrow
    * value range and row-group min/max stats prune scans (z-order-lite for
    * one dimension). At 100 TB, sorting facts by date inside each period
    * partition turns date-range queries from full-partition scans into a
    * handful of row groups. */
  def writeSorted(df: DataFrame, layer: String, table: String,
                  sortCols: Seq[String], numFiles: Int,
                  partitionBy: Seq[String] = Nil): Unit = {
    val arranged = df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val w = arranged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath(layer, table))
  }

  /** Z-order-clustered write: rows are range-partitioned and sorted by the
    * Morton interleave of each `zCols` column's rank bucket, so EVERY
    * clustered column's min/max span stays narrow in every file — a range
    * predicate on any of the dimensions prunes row groups.
    * [[writeSorted]] is the 1-D special case; use this when two or more
    * columns are queried independently. Bucket boundaries come from
    * approxQuantile (bounded driver-side sample). */
  def writeZOrdered(df: DataFrame, layer: String, table: String,
                    zCols: Seq[String], numFiles: Int,
                    partitionBy: Seq[String] = Nil,
                    bitsPerDim: Int = 12): Unit = {
    val arranged = graft.functions.ZOrder.arrange(df, zCols, numFiles, bitsPerDim)
    val w = arranged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath(layer, table))
  }

  def append(df: DataFrame, layer: String, table: String,
             partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tablePath(layer, table))
  }

  /** SCD1 upsert scoped to the partitions the source touches.
    *
    * 1. Find the source's partition values (tiny aggregate).
    * 2. Read ONLY those target partitions (partition pruning).
    * 3. Merge (source wins per key) — single shuffle on the keys.
    * 4. Stage the merged slice, then dynamically overwrite just those
    *    partitions.
    * Unpartitioned tables fall back to a full-table merge.
    * reference: common_jobs_functions.py:279-304 (Delta merge upsert). */
  def upsert(df: DataFrame, layer: String, table: String, keys: Seq[String],
             partitionBy: Seq[String] = Nil): Unit = {
    if (!exists(layer, table)) { write(df, layer, table, partitionBy); return }
    val target = read(layer, table)
    val scopedTarget =
      if (partitionBy.isEmpty) target
      else {
        val parts = df.select(partitionBy.map(col): _*).distinct().collect()
        val cond = parts.map { r =>
          partitionBy.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
            .reduce(_ && _)
        }.reduceOption(_ || _).getOrElse(lit(false))
        target.filter(cond)
      }
    // source schema may drift; MergeSCD1.merge applies Delta autoMerge
    // semantics (new columns appended, source-missing columns keep the
    // target's value on matched rows)
    val merged = MergeSCD1.merge(scopedTarget, df, keys)
    val staging = tablePath(layer, s"__staging_$table")
    val w0 = merged.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0).parquet(staging)
    val stagedBack = spark.read.parquet(staging)
    if (partitionBy.isEmpty) {
      // full replace: the staging copy isolates the read path
      stagedBack.write.mode(SaveMode.Overwrite).parquet(tablePath(layer, table))
    } else {
      stagedBack.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partitionBy: _*).parquet(tablePath(layer, table))
    }
    deleteRecursively(new java.io.File(staging))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }
}
