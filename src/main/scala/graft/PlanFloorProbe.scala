package graft

/** Dev probe: split a query's wall into Catalyst phases vs execution.
  *
  * The r13 floor analysis showed the catalog is driver-floor-bound, and
  * the conformance closures carry 6,000+-line plans — this harness
  * answers "how much of that wall is ANALYSIS/OPTIMIZATION/PLANNING
  * (per-run, never cached across runs because every run builds a fresh
  * DataFrame) vs actual execution". Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.PlanFloorProbe q75_conf_fact_cli_venta[,q76...]"
  *
  * Prints one line per run per query: build/analyzed/optimized/physical/
  * exec seconds. Not part of the bench contract; measurement only.
  */
object PlanFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q75_conf_fact_cli_venta"))
    val spark = graft.core.GraftSession.tuned(
      org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .appName("plan-floor-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    for (name <- names; fn = SparkEntry.queries(name); run <- 1 to 3) {
      val (df, tBuild) = t(fn(spark, sfDir))
      val qe = df.queryExecution
      val (_, tAna) = t(qe.analyzed)
      val (_, tOpt) = t(qe.optimizedPlan)
      val (_, tPhy) = t(qe.executedPlan)
      val (_, tExe) = t(df.write.format("noop").mode("overwrite").save())
      println(f"PROBE $name%s run=$run%d build=$tBuild%.3f analyzed=$tAna%.3f " +
        f"optimized=$tOpt%.3f physical=$tPhy%.3f exec=$tExe%.3f " +
        f"total=${tBuild + tAna + tOpt + tPhy + tExe}%.3f")
    }
    spark.stop()
  }
}
