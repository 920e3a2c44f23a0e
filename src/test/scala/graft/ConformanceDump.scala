package graft

import graft.core.GraftSession
import graft.sources._

/** Dev parity dump: writes every conformance twin's normalized output as
  * parquet plus its rendered DuckDB SQL, for scripts/conformance_check.py
  * to value-compare ALL 52 jobs (the catalog gates a sampled subset
  * through the driver; this loop proves the rest).
  *
  * Usage: Test/runMain graft.ConformanceDump <sfDir> <outDir> [job...]
  *
  * `--freeze` instead re-renders the q70–q73 catalog oracles and
  * overwrites the frozen copies under
  * src/main/resources/graft/conformance/oracles/ (run after any change
  * to job metadata, stage synthesis, or the SQL renderer; ConformanceSpec
  * pins runtime == frozen).
  */
object ConformanceDump {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--freeze")) {
      val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
      val spark = GraftSession.local()
      graft.pipeline.ConformanceQueries.sampledJobs.foreach { case (_, job) =>
        val sql = graft.pipeline.ConformanceQueries.renderOracle(spark, dir, job)
        val p = java.nio.file.Paths.get(
          s"src/main/resources/graft/conformance/oracles/$job.sql")
        java.nio.file.Files.write(p, sql.getBytes("UTF-8"))
        println(s"froze $p (${sql.length} chars)")
      }
      spark.stop()
      return
    }
    val dir = args(0)
    val out = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else ConformanceJobs.ordered.map(_.name)
    val spark = GraftSession.local()
    val outs = ConformanceLake.run(spark, dir, names)
    val sqlMap = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { n =>
      val df = outs(n)
      ConformanceGate.normalize(df)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n.parquet")
      sqlMap(n) = ConformanceSql.render(n, ConformanceGate.finalSelect(df.schema),
        exactOps = ConformanceExact.templates(spark, dir, n))
    }
    val json = sqlMap.map { case (k, v) =>
      s""""$k": ${com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().writeValueAsString(v)}"""
    }.mkString("{\n", ",\n", "\n}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$out/conformance_sql.json"),
      json.getBytes("UTF-8"))
    println(s"dumped ${names.size} jobs to $out")
    spark.stop()
  }
}
