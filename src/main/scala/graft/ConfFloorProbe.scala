package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement harness for the conformance scheduling floor
  * (round-9 verdict item 2): for the overhead-class jobs (t_venta,
  * m_estructura_comercial) and the data-class control
  * (fact_cliente_venta), report the served closure's file-leaf bytes
  * and A/B wall under candidate runtime configs — default AQE vs
  * AQE-off/narrow-shuffle vs AQE with size-first coalescing. Evidence
  * for picking the serve-path config, kept as a runnable artifact.
  *
  * Usage: runMain graft.ConfFloorProbe <dir> [runs]
  */
object ConfFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scaled_10x")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("conf-floor-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "32m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = Seq("t_venta", "m_estructura_comercial", "fact_cliente_venta")

    def bench(label: String)(configureClone: SparkSession => Unit): Unit = {
      val s = spark.newSession()
      configureClone(graft.sources.ConformanceLake.session(s, dir))
      jobs.foreach { name =>
        val df = graft.sources.ConformanceLake.serveJob(s, dir, name)
        // leaf file bytes of the optimized closure
        import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
        val leaves = df.queryExecution.optimizedPlan.collectLeaves()
        val bytes = leaves.map {
          case l: LogicalRelation => l.relation match {
            case fs: HadoopFsRelation => fs.location.sizeInBytes
            case r => r.sizeInBytes.toLong
          }
          case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            m.cachedPlan.collectLeaves().map {
              case f: org.apache.spark.sql.execution.FileSourceScanExec =>
                f.relation.location.sizeInBytes
              case _ => 0L
            }.sum
          case _ => 0L
        }.sum
        val walls = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        // post-materialization closure size: file leaves + exact cached
        // bytes (InMemoryRelation stats are real once materialized)
        val cacheBytes = df.queryExecution.optimizedPlan.collectLeaves().map {
          case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
            m.stats.sizeInBytes.toLong
          case _ => 0L
        }.sum
        println(f"PROBE $label $name leafMB=${bytes / 1e6}%.1f " +
          f"cacheMB=${cacheBytes / 1e6}%.1f min=${walls.min}%.2fs " +
          f"walls=${walls.map(w => f"$w%.2f").mkString(",")} " +
          s"session_aqe=${df.sparkSession.conf.get("spark.sql.adaptive.enabled")}")
        if (sys.env.contains("GRAFT_PROBE_LEAVES"))
          leaves.foreach {
            case l: LogicalRelation => println(
              s"LEAF $name LogicalRelation ${l.relation.getClass.getSimpleName} " +
                s"size=${l.relation.sizeInBytes}")
            case other => println(s"LEAF $name ${other.getClass.getSimpleName} " +
              s"size=${other.stats.sizeInBytes}")
          }
      }
    }

    bench("default")(_ => ())
    graft.sources.ConformanceLake.clearCaches()
    bench("aqeoff_p4") { c =>
      c.conf.set("spark.sql.adaptive.enabled", "false")
      c.conf.set("spark.sql.shuffle.partitions", "4")
    }
    graft.sources.ConformanceLake.clearCaches()
    bench("aqeoff_p1") { c =>
      c.conf.set("spark.sql.adaptive.enabled", "false")
      c.conf.set("spark.sql.shuffle.partitions", "1")
    }
    spark.stop()
  }
}
