package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-surface physical-plan lint: NO declared query may plan a
  * `CartesianProduct` — the unbroadcast all-pairs operator that turns
  * a 100 TB join into N² I/O. The declared O(N·Q) baselines (q34/q77/
  * q87/q94/q132, the ANN stats joins) are `BroadcastNestedLoopJoin`s:
  * one side is a size-bounded broadcast by construction, which is the
  * deliberate contract — so the lint bans exactly the operator with
  * no size bound, with an EMPTY whitelist. A future query (or an
  * optimizer-rule regression in HammingJoinRewrite/RangeJoinRewrite,
  * whose whole point is keeping declarative theta-joins off the
  * product path) that plans a cartesian fails here by name before any
  * bench or oracle ever runs it.
  */
class PlanLintSpec extends AnyFunSuite {
  import TestSpark._

  test("no declared query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning a cartesian product: ${offenders.mkString(", ")}")
  }
}
