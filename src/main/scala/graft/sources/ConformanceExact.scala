package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Project}

import graft.sources.ConformanceJobs._
import graft.sources.ConformanceRunner.Params
import graft.sources.ExactDecimalSql.{Ctx, ExactOp}

/** Pre-pass for the exact-decimal oracle rendering: replays every job in
  * `rootJob`'s dependency closure through [[ConformanceRunner]] with the
  * trace hook, lifts the RESOLVED Catalyst trees of each Select/GroupBy
  * op, and — where the tree contains decimal arithmetic DuckDB cannot
  * replay natively ([[ExactDecimalSql.needsExact]]) — renders the op as
  * an exact HUGEINT template for [[ConformanceSql.render]] to splice in
  * place of the string-dialect translation.
  *
  * Using the analyzed plan as the source of truth means Spark itself
  * decides every decimal precision/scale (the reference executes on
  * Spark, so Catalyst's typing IS the reference semantics); this pass
  * never re-implements the decimal typing rules.
  *
  * Plan-time only: nothing here executes a job — resolution goes through
  * ConformanceLake's memoized analyzed plans and the registered stage
  * views, so the cost is one analysis pass per closure job.
  */
object ConformanceExact {

  /** (jobName, stepName, opIndex) -> exact template for that op. */
  def templates(spark0: SparkSession, dir: String, rootJob: String,
                params: Params = Params()): Map[(String, String, Int), ExactOp] = {
    val clone = ConformanceLake.session(spark0, dir)
    val closure = mutable.LinkedHashSet[String]()
    def visit(name: String): Unit = {
      ConformanceJobs.byName(name).dependencies.foreach { case (_, d) => visit(d) }
      closure += name
    }
    visit(rootJob)

    val resolve: (String, String) => DataFrame = {
      case ("BIGMAGIC", t) => clone.table(s"stage_$t")
      case (_, t)          => ConformanceLake.runJob(spark0, dir, t, params)
    }

    val out = mutable.Map[(String, String, Int), ExactOp]()
    closure.foreach { name =>
      val job = ConformanceJobs.byName(name)
      // replay the step-level alias state renderStep tracks: aliases are
      // valid qualifiers only until the level closes with a projection
      var aliases = Set.empty[String]
      val trace: (Step, Int, Op, DataFrame) => Unit = (step, opIdx, op, df) =>
        op match {
          case From(_, a) => aliases = if (a.nonEmpty) Set(a) else Set.empty
          case Join(_, a, _, _, _) =>
            if (a.nonEmpty) aliases += a
            df.queryExecution.analyzed match {
              case j: org.apache.spark.sql.catalyst.plans.logical.Join
                if j.condition.exists(ExactDecimalSql.needsExact) =>
                throw new IllegalArgumentException(
                  s"$name/${step.name}: join condition contains decimal " +
                    "rescale arithmetic — exact rendering only covers " +
                    "select/groupBy ops")
              case _ => ()
            }
          case Select(_) =>
            df.queryExecution.analyzed match {
              case p: Project if p.projectList.exists(ExactDecimalSql.needsExact) =>
                out((name, step.name, opIdx)) =
                  ExactDecimalSql.renderProject(p.projectList, Ctx(aliases))
              case _ => ()
            }
            aliases = Set.empty
          case GroupBy(_, _) =>
            df.queryExecution.analyzed match {
              case ag: Aggregate
                if (ag.groupingExpressions ++ ag.aggregateExpressions)
                  .exists(ExactDecimalSql.needsExact) =>
                out((name, step.name, opIdx)) = ExactDecimalSql.renderAggregate(
                  ag.groupingExpressions, ag.aggregateExpressions, Ctx(aliases))
              case _ => ()
            }
            aliases = Set.empty
          // decimal arithmetic in any op the exact renderer does NOT
          // cover must fail loudly here — a silent string rendering
          // would hash-diverge at the gate with no hint why
          case WithColumn(n, _) =>
            df.queryExecution.analyzed match {
              case p: Project
                if p.projectList.exists(e =>
                  e.name == n && ExactDecimalSql.needsExact(e)) =>
                throw new IllegalArgumentException(
                  s"$name/${step.name}: withColumn($n) contains decimal " +
                    "rescale arithmetic — exact rendering only covers " +
                    "select/groupBy ops; restructure the transcription")
              case _ => ()
            }
          case Filter(_) =>
            df.queryExecution.analyzed match {
              case f: org.apache.spark.sql.catalyst.plans.logical.Filter
                if ExactDecimalSql.needsExact(f.condition) =>
                throw new IllegalArgumentException(
                  s"$name/${step.name}: filter contains decimal rescale " +
                    "arithmetic — exact rendering only covers select/groupBy")
              case _ => ()
            }
          case _ => ()
        }
      ConformanceRunner.run(job, resolve, params, trace)
    }
    out.toMap
  }
}
