package graft.operators

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("q1 aggregates into return-flag/status groups with the contract columns") {
    val rows = Relational.q1PricingSummary(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val schema = Relational.q1PricingSummary(spark, sf001).schema.fieldNames.toSeq
    assert(schema == Seq("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "sum_charge", "avg_qty", "avg_disc", "count_order"))
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= 6000)
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = Relational.q3ShippingPriority(spark, sf001).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 plan broadcasts every dimension (lineitem-orders is the only shuffle join)") {
    val plan = Relational.q5LocalSupplier(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // customer, supplier, nation(+region) all arrive via broadcast
    assert("BroadcastExchange".r.findAllIn(plan).size >= 3, plan)
  }

  test("filter pushdown reaches the parquet scan") {
    val plan = Relational.qFilterPushdown(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), plan)
    // projection pruned to the 5 referenced columns (4 output + filter col)
    assert(!plan.contains("l_returnflag"))
  }

  test("sessionize counts every event exactly once") {
    val rows = Relational.qSessionize(spark, sf001).collect()
    val events = rows.map(_.getAs[Long]("n_events")).sum
    assert(events == graft.sources.Tables.events(spark, sf001).count())
    assert(rows.forall(r => r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events")))
  }
}
