package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.ConformanceRunner.Params

/** Storage-backed execution of the conformance workload — the flow the
  * REFERENCE actually runs: every Glue job writes its layer table to the
  * lake and downstream jobs read those tables back from storage
  * (common_jobs_functions.py:222 read_table / :279–356 write+upsert), as
  * opposed to [[ConformanceLake]]'s in-memory plan resolution (the
  * oracle-gate fast path, value-equal by ConformanceStorageSpec).
  *
  * Each job lands in a [[TxnTable]] at `lakeRoot/<layer>/<name>` through
  * its transcribed write mode:
  *   - `write`  -> [[TxnTable.overwritePartitions]] (the reference's
  *     dynamic partition overwrite: only the run's periods rewrite,
  *     untouched partitions carry by reference) or full overwrite when
  *     the job is unpartitioned;
  *   - `upsert` -> [[TxnTable.upsert]] on the job's id columns (the
  *     reference's Delta SCD1 merge).
  *
  * This is where partition-scoping and schema-drift bugs live at 100 TB:
  * the spec drives a whole fact closure through storage, pins bit-equality
  * with the in-memory engine, and proves the incremental-period re-run
  * rewrites ONLY the touched partitions (manifest file identity on the
  * untouched ones).
  *
  * Everything (reads, writes, plans) runs in the memoized ANSI-off
  * conformance clone, so lake frames never mix sessions with stage views.
  */
object ConformanceStorage {

  def table(spark: SparkSession, lakeRoot: String, layer: String,
            name: String): TxnTable =
    TxnTable(spark, s"$lakeRoot/$layer/$name")

  /** Write `df` as `job` declares. Returns the committed version. */
  def write(t: TxnTable, job: ConformanceJobs.Job, df: DataFrame): Long =
    job.writeMode match {
      case "upsert" if job.idColumns.nonEmpty =>
        t.upsert(df, job.idColumns, job.partitionColumns)
      case _ if job.partitionColumns.nonEmpty =>
        t.overwritePartitions(df, job.partitionColumns)
      case _ =>
        t.overwrite(df)
    }

  /** Run `rootJob`'s whole dependency closure through the lake in
    * dependency order — each job's upstream reads resolve FROM STORAGE —
    * and return the root job's table. Stage reads come from the
    * registered synth views (the raw-zone stand-in). */
  def runToLake(spark0: SparkSession, dir: String, lakeRoot: String,
                rootJob: String, params: Params = Params()): TxnTable = {
    val clone = ConformanceLake.session(spark0, dir)
    val closure = mutable.LinkedHashSet[String]()
    def visit(name: String): Unit = {
      ConformanceJobs.byName(name).dependencies.foreach { case (_, d) => visit(d) }
      closure += name
    }
    visit(rootJob)

    closure.foreach { name =>
      val job = ConformanceJobs.byName(name)
      val resolve: (String, String) => DataFrame = {
        case ("BIGMAGIC", t) => clone.table(s"stage_$t")
        case (_, t) =>
          // address the upstream table under ITS OWN layer directory
          // (source layer tokens are the reference's data_paths names)
          table(clone, lakeRoot, ConformanceJobs.byName(t).layer, t).read()
      }
      // multiply-referenced steps persist through the shared registry
      // (released by ConformanceLake.clearCaches), so a single job write
      // never re-executes a shared aggregate per downstream reference
      val out = ConformanceRunner.run(job, resolve, params,
        persistShared = ConformanceLake.persistShared)
      write(table(clone, lakeRoot, job.layer, name), job, out): Unit
    }
    table(clone, lakeRoot, ConformanceJobs.byName(rootJob).layer, rootJob)
  }
}
