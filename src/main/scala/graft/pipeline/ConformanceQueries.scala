package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.{ConformanceExact, ConformanceGate, ConformanceLake, ConformanceSql}

/** Catalog entries that drive whole reference jobs through the
  * declarative conformance engine and value-check them with the driver's
  * own oracle gate — the sampled end of the 52-job parity sweep
  * (scripts/conformance_check.py covers the full set; these four put the
  * engine itself under the per-round CORRECTNESS gate).
  *
  * Sample picks one job per layer/shape:
  *   - t_venta: the widest domain transactional build (9-way join,
  *     as-of exchange-rate lookup, period filters; t_venta.py:25–165)
  *   - dim_cliente: dedup-latest + hierarchy conform (dim_cliente.py:44)
  *   - m_estructura_comercial: multi-level hierarchy union
  *     (m_estructura_comercial.py:20–196)
  *   - fact_reparto_detalle: analytics star join over domain outputs
  *
  * The oracle SQL is the ConformanceSql rendering of each job's full
  * dependency closure (stage synthesis + upstream domain jobs) as one
  * DuckDB query, frozen under resources/graft/conformance/oracles/ —
  * ConformanceSpec pins the runtime rendering against the frozen copy so
  * metadata drift fails sbt test rather than the driver gate.
  *
  * Round 6: the decimal-heavy fact jobs (q74–q76) joined the exact gate.
  * Their numeric(38,12) chains round at Catalyst's rescale points where
  * DuckDB's native decimal ops compute in double, so their oracles splice
  * ExactDecimalSql templates — HUGEINT scaled-integer replays of the
  * resolved Catalyst trees (ConformanceExact) — making the comparison
  * bit-exact instead of rounding-tolerant.
  */
object ConformanceQueries {

  val sampledJobs: Seq[(String, String)] = Seq(
    "q70_conf_t_venta"        -> "t_venta",
    "q71_conf_dim_cliente"    -> "dim_cliente",
    "q72_conf_estructura"     -> "m_estructura_comercial",
    "q73_conf_fact_reparto"   -> "fact_reparto_detalle",
    "q74_conf_fact_venta_det" -> "fact_venta_detalle",
    "q75_conf_fact_cli_venta" -> "fact_cliente_venta",
    "q76_conf_fact_kpi"       -> "fact_kpi_detalle")

  private def run(job: String)(spark: SparkSession, dir: String): DataFrame =
    ConformanceLake.serveJob(spark, dir, job)

  /** Runtime rendering of a sampled job's oracle (what the frozen
    * resource must equal — see ConformanceSpec). Needs a session because
    * the final select list derives from the job's output schema. */
  def renderOracle(spark: SparkSession, dir: String, job: String): String =
    ConformanceSql.render(job,
      ConformanceGate.finalSelect(ConformanceLake.runJob(spark, dir, job).schema),
      exactOps = ConformanceExact.templates(spark, dir, job))

  private def frozenOracle(job: String): String = {
    val in = getClass.getResourceAsStream(s"/graft/conformance/oracles/$job.sql")
    require(in != null, s"missing frozen oracle for $job")
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sampledJobs.map { case (key, job) =>
      key -> ((s: SparkSession, dir: String) => run(job)(s, dir))
    }.toMap

  def oracles: Map[String, String] =
    sampledJobs.map { case (key, job) => key -> frozenOracle(job) }.toMap
}
