package graft

import graft.queries.AdvancedQ

/** The typed WeightedMean Aggregator (UDAF API surface) must be
  * result-identical to the registered codegen'd decimal-expression plan
  * (q47). The expression plan is what ships on the bench hot path; the
  * Aggregator stays as the demonstration of the custom-UDAF surface. */
class WeightedMeanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("expression plan and Aggregator plan agree row-for-row") {
    val events = Tables.t(spark, dir, "events")
    val expr = AdvancedQ.weightedMeanExpr(events).collect().toSeq
    val agg = AdvancedQ.weightedMeanUdaf(events).collect().toSeq
    assert(expr.nonEmpty)
    assert(expr == agg)
  }

  test("registered q47 plan avoids the object-buffer aggregate") {
    val events = Tables.t(spark, dir, "events")
    val physical = AdvancedQ.weightedMeanExpr(events)
      .queryExecution.executedPlan.toString
    assert(!physical.contains("ObjectHashAggregate"),
      "q47 must hash-aggregate in whole-stage codegen, not via an " +
        "object buffer:\n" + physical)
    assert(physical.contains("HashAggregate"))
  }
}
