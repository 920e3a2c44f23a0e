package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-regression gate: no catalog query may degrade to a quadratic join.
  * A refactor that loses an equi-key (or a literal type mismatch that
  * defeats it) silently turns a shuffled/broadcast hash join into a
  * CartesianProduct / BroadcastNestedLoopJoin — fine at sf0.001, fatal at
  * 100 TB. Pin the absence here. */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  test("no query plans a cartesian product or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
        Some(name)
      else None
    }
    assert(offenders.isEmpty, s"quadratic joins in: $offenders")
  }
}
