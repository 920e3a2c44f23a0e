package graft

/** Dev probe: split a query's wall into Catalyst phases vs execution.
  *
  * The r13 floor analysis showed the catalog is driver-floor-bound, and
  * the conformance closures carry 6,000+-line plans — this harness
  * measures how much of a wall is ANALYSIS/OPTIMIZATION/PLANNING vs
  * execution, and equally whether those phases are CACHED between runs:
  * catalog entries that memoize their built DataFrame (the conformance
  * closures via ConformanceRunner's (session, dir) plan cache) return
  * the same frame on runs 2–3, whose lazy phase vals are then already
  * computed — exactly the conclusion recorded in OPTIMIZATION_r13.md
  * (warm analysis/optimization ≈ 0 for memoized closures). Queries that
  * build a fresh DataFrame per call pay the phases every run. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.PlanFloorProbe q75_conf_fact_cli_venta[,q76...]"
  *
  * Prints one line per run per query: build/analyzed/optimized/physical/
  * exec seconds. Caveats: Dataset construction runs analysis eagerly, so
  * the analyzed column reads ~0 and analysis cost is folded into build.
  * Not part of the bench contract; measurement only.
  */
object PlanFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q75_conf_fact_cli_venta"))
    // validate BEFORE the session spins up: a typo would otherwise throw
    // a bare NoSuchElementException mid-list and abort the rest
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — valid names: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
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
      val (_, tAna) = t(qe.analyzed) // ~0 by construction: see header
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
