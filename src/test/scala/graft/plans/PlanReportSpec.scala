package graft.plans

import graft.SparkSpec
import graft.operators.{Relational, RelationalPlus}

class PlanReportSpec extends SparkSpec {

  test("q5 report: broadcasts for every dim, no cartesian, filters pushed") {
    val r = PlanReport.of(Relational.q5LocalSupplier(spark, sf001))
    assert(r.cartesianProducts == 0)
    assert(r.broadcasts >= 3, r.summary)
    assert(r.parquetScans >= 2 && r.scansWithPushdown >= 1, r.summary)
    assert(r.shuffles <= 2, r.summary) // lineitem⋈orders is the only shuffled join
  }

  test("pushdown showcase reports a pushed scan and zero shuffles") {
    val r = PlanReport.of(Relational.qFilterPushdown(spark, sf001))
    assert(r.scansWithPushdown == 1, r.summary)
    assert(r.cartesianProducts == 0 && r.broadcasts == 0)
  }

  test("scale-safe skyline plans no unpartitioned window over fact rows") {
    // the two-pass skyline's only unpartitioned window runs over the
    // bucket-aggregate frame; PlanReport still counts it, so assert the
    // count is exactly that one
    val r = PlanReport.of(graft.operators.Analytics.qSkyline(spark, sf001))
    assert(r.unpartitionedWindows <= 1, r.summary)
    assert(r.cartesianProducts == 0)
  }

  test("waiting-supplier reports shuffle joins and no fact broadcast explosion") {
    val r = PlanReport.of(RelationalPlus.qWaitingSupplier(spark, sf001))
    assert(r.cartesianProducts == 0)
    assert(r.shuffles >= 2, r.summary) // the semi/anti chain rides hash exchanges
  }
}
