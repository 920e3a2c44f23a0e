package graft

import graft.core.GraftSession
import graft.sources.{ConformanceJobs, ConformanceLake, StageSynth}

/** Dev smoke runner: executes every transcribed job at a small SF and
  * prints row counts (Test/runMain graft.ConformanceSmoke [sfDir]). */
object ConformanceSmoke {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local()
    val missing = StageSynth.missingColumns(spark, dir)
    println(s"MISSING STAGE COLUMNS: ${missing.size}")
    missing.foreach { case (t, c) => println(s"  $t.$c") }
    // focused debug: print per-step counts (and dup-id samples) for one job
    sys.env.get("GRAFT_DEBUG_JOB").foreach { jn =>
      val job = ConformanceJobs.byName(jn)
      val params = graft.sources.ConformanceRunner.Params()
      val memo = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame]()
      lazy val resolve: (String, String) => org.apache.spark.sql.DataFrame = {
        case ("BIGMAGIC", t) => spark.table(s"stage_$t")
        case (_, t) => memo.getOrElseUpdate(t,
          graft.sources.ConformanceRunner.run(ConformanceJobs.byName(t), resolve, params))
      }
      // rerun prefixes of the job to get each step's frame
      job.steps.indices.foreach { i =>
        val partial = job.copy(steps = job.steps.take(i + 1),
          result = job.steps(i).name)
        val df = graft.sources.ConformanceRunner.run(partial, resolve, params)
        println(s"STEP ${job.steps(i).name}: ${df.count()} rows")
      }
      val out = graft.sources.ConformanceRunner.run(job, resolve, params)
      if (job.idColumns.nonEmpty) {
        val dups = out.groupBy(job.idColumns.map(org.apache.spark.sql.functions.col): _*)
          .count().filter("count > 1").limit(5).collect()
        dups.foreach(r => println(s"DUP: $r"))
        if (dups.nonEmpty) {
          val key = dups.head.get(0).toString
          out.filter(org.apache.spark.sql.functions.col(job.idColumns.head) === key)
            .show(5, truncate = false)
        }
      }
      spark.stop(); sys.exit(0)
    }
    val outs = ConformanceLake.run(spark, dir)
    var failures = 0
    ConformanceJobs.ordered.foreach { j =>
      val t0 = System.nanoTime()
      val res =
        try {
          val n = outs(j.name).count()
          val dupIds =
            if (j.idColumns.nonEmpty)
              outs(j.name).groupBy(j.idColumns.map(org.apache.spark.sql.functions.col): _*)
                .count().filter("count > 1").count()
            else 0L
          f"rows=$n%8d dupIds=$dupIds%6d"
        } catch {
          case e: Throwable =>
            failures += 1
            s"ERROR ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}"
        }
      val ms = (System.nanoTime() - t0) / 1000000
      println(f"${j.layer}%9s ${j.name}%-34s $res (${ms}ms)")
    }
    println(s"failures=$failures")
    spark.stop()
  }
}
