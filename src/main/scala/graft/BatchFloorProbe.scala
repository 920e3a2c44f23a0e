package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Batch dispatch-floor decomposition (round-12 verdict item 3 — the
  * batch analog of StreamFloorProbe): for ~1 s catalog queries whose
  * Spark-vs-DuckDB ratio rows keep needing prose adjudication, measure
  * WHERE the wall goes, so sub-2 s flag rows are floor-adjudicated by
  * measurement instead of narrative.
  *
  * Per query run (same noop-sink materialization as Bench), the wall
  * decomposes from listener events into:
  *
  *   - plan_s: t0 → first job start — driver-side analysis/optimization
  *     plus any bounded build-side collects a query runs during
  *     construction (DimLookup builds, quantile levels). Pure driver
  *     work, invariant in data size.
  *   - stage_span_s: the union of [stage submission, stage completion]
  *     intervals — the window in which executors are actually running
  *     tasks. This is the DATA cost; it is what a 1000-executor cluster
  *     would parallelize further.
  *   - gap_s: wall − plan − stage_span — DAG-scheduler dispatch, task
  *     serialization, inter-job driver bookkeeping (AQE replanning
  *     between stages lands here). With task_s (Σ executorRunTime)
  *     reported alongside, dispatch floor = plan + gap: the part of the
  *     wall that does NOT scale with data and double-counts against a
  *     sub-100 ms DuckDB wall at bench SF.
  *
  * A trivial-job floor (spark.range count after warmup) is measured in
  * the same session as the irreducible per-job constant.
  *
  * Usage: runMain graft.BatchFloorProbe <sfDir> <out.json> <q1,q2,..> [runs]
  * Aggregation: the run with the MINIMUM wall per query is reported
  * (the bench-gotcha rule: environment smear inflates, never deflates).
  */
object BatchFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val wanted = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val runs = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.tuned(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.graft.stream.statePartitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Ev(kind: String, t0: Long, t1: Long, taskMs: Long)
    val events = new ConcurrentLinkedQueue[Ev]()
    val listener = new SparkListener {
      private val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobStarts.put(j.jobId, j.time): Unit
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = Option(jobStarts.get(j.jobId)).getOrElse(j.time)
        events.add(Ev("job", s, j.time, 0L)): Unit
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        events.add(Ev("stage",
          si.submissionTime.getOrElse(0L),
          si.completionTime.getOrElse(0L),
          si.taskMetrics.executorRunTime)): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)

    /** Total length of the union of [t0, t1] intervals — concurrent
      * stages must not double-count wall time. */
    def unionMs(iv: Seq[(Long, Long)]): Long = {
      val s = iv.filter(p => p._2 > p._1).sortBy(_._1)
      var tot = 0L; var lo0 = 0L; var hi0 = -1L; var started = false
      s.foreach { case (lo, hi) =>
        if (!started) { lo0 = lo; hi0 = hi; started = true }
        else if (lo > hi0) { tot += hi0 - lo0; lo0 = lo; hi0 = hi }
        else if (hi > hi0) hi0 = hi
      }
      if (started) tot += hi0 - lo0
      tot
    }

    def measure(body: => Unit): (Double, Double, Double, Double, Double, Int) = {
      events.clear()
      val wall0 = System.currentTimeMillis()
      val t0 = System.nanoTime()
      body
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener events are async
      import scala.jdk.CollectionConverters._
      val evs = events.asScala.toSeq
      val stages = evs.filter(_.kind == "stage")
      val jobs = evs.filter(_.kind == "job")
      val firstJob = jobs.map(_.t0).minOption.getOrElse(wall0)
      val planS = math.max(0L, firstJob - wall0) / 1e3
      val stageSpanS = unionMs(stages.map(e => (e.t0, e.t1))) / 1e3
      val taskS = stages.map(_.taskMs).sum / 1e3
      val gapS = math.max(0.0, wallS - planS - stageSpanS)
      (wallS, planS, stageSpanS, gapS, taskS, stages.length)
    }

    // warm the session (file listing, codegen, JIT) on a trivial job
    (1 to 3).foreach(_ => spark.range(1000000L).selectExpr("sum(id)").head())
    // irreducible per-job constant in this session
    val floorRuns = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1000000L).selectExpr("sum(id)").head()
      (System.nanoTime() - t0) / 1e9
    }
    val trivialFloorS = floorRuns.min

    def j(d: Double): String = f"$d%.4f"
    val rows = wanted.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val all = (1 to runs).map { _ =>
        measure(fn(spark, dir).write.format("noop").mode("overwrite").save())
      }
      val best = all.minBy(_._1)
      val (wallS, planS, stageSpanS, gapS, taskS, nStages) = best
      val dispatchS = planS + gapS
      s""""$name":{"wall_s":${j(wallS)},"plan_s":${j(planS)},""" +
        s""""stage_span_s":${j(stageSpanS)},"gap_s":${j(gapS)},""" +
        s""""dispatch_s":${j(dispatchS)},"task_s":${j(taskS)},""" +
        s""""n_stages":$nStages,""" +
        s""""walls_all_runs":[${all.map(r => j(r._1)).mkString(",")}]}"""
    }
    val doc = s"""{"sf_dir":"$dir","runs_per_query":$runs,"agg":"min-wall run",
"trivial_job_floor_s":${j(trivialFloorS)},
"note":"wall = plan_s (driver: analysis/optimization + bounded build collects, t0->first job) + stage_span_s (union of stage intervals: the DATA cost a bigger cluster would parallelize) + gap_s (DAG dispatch, task serialization, AQE replans between stages). dispatch_s = plan_s + gap_s is the per-query floor that does not scale with data; floor-adjusted ratio = stage_span_s vs the DuckDB wall.",
"queries":{${rows.mkString(",")}}}""".stripMargin.replace("\n", " ")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), doc + "\n")
    println(doc)
    spark.stop()
  }
}
