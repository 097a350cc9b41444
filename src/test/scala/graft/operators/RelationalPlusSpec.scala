package graft.operators

import graft.SparkSpec

/** Invariant + plan-shape coverage for the deep TPC-H-shape batch.
  * Cross-engine value equality is the oracle gate's job; these specs pin
  * the semantic invariants a refactor could silently break and the
  * plan shapes the 100× scale argument rests on.
  */
class RelationalPlusSpec extends SparkSpec {

  test("priority-exists: every priority bucket is bounded by its unfiltered order count") {
    val withEx = RelationalPlus.qPriorityExists(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(withEx.nonEmpty)
    val all = graft.sources.Tables.orders(spark, sf001)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    withEx.foreach { case (p, n) => assert(n > 0 && n <= all(p), s"$p: $n") }
  }

  test("region-trade plan shuffles only the fact join; all dims broadcast") {
    val plan = RelationalPlus.qRegionTrade(spark, sf001)
      .queryExecution.executedPlan.toString
    assert("BroadcastExchange".r.findAllIn(plan).size >= 4, plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("market share and promo share are valid ratios in [0, 1]") {
    Seq(
      RelationalPlus.qMarketShare(spark, sf001).collect().map(_.getDouble(1)),
      RelationalPlus.qPromoShare(spark, sf001).collect().map(_.getDouble(1))
    ).foreach { shares =>
      assert(shares.nonEmpty)
      shares.foreach(v => assert(v >= 0.0 && v <= 1.0, v))
    }
  }

  test("small-qty decorrelation joins the per-part average by shuffle, never broadcast") {
    val plan = RelationalPlus.qSmallQtyRevenue(spark, sf001)
      .queryExecution.executedPlan.toString
    // the fact-derived avg frame must not be broadcast (r1 driver-build cliff)
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"), plan)
    // every kept lineitem is strictly below a fifth of its part's average,
    // so per-brand counts are a strict subset of the brand's lineitems
    val out = RelationalPlus.qSmallQtyRevenue(spark, sf001).collect()
    assert(out.forall(_.getLong(2) > 0))
  }

  test("large orders all exceed the quantity threshold and arrive price-descending") {
    val rows = RelationalPlus.qLargeOrders(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getDouble(4) > 150.0))
    val prices = rows.map(_.getDouble(3))
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
  }

  test("waiting-supplier: sole-late-supplier semantics hold on a replay") {
    import spark.implicits._
    val late = graft.sources.Tables.lineitem(spark, sf001)
      .join(graft.sources.Tables.orders(spark, sf001).select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"l_shipdate" > $"o_orderdate" + org.apache.spark.sql.functions.expr("INTERVAL 60 DAYS"))
      .select($"l_orderkey", $"l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lateByOrder = late.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val suppsByOrder = graft.sources.Tables.lineitem(spark, sf001)
      .select($"l_orderkey", $"l_suppkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // replay: per supplier, count orders where it is late, the order has
    // another supplier, and no other supplier is late
    val expect = late.filter { case (ord, s) =>
      suppsByOrder(ord).size >= 2 && lateByOrder(ord) == Set(s)
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = RelationalPlus.qWaitingSupplier(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // top-10 rows must each match the replay exactly
    got.foreach { case (name, n) =>
      val suppkey = name.stripPrefix("Supplier#").toLong
      assert(expect.getOrElse(suppkey, 0L) == n, s"$name: $n vs ${expect.get(suppkey)}")
    }
  }

  test("idle-rich customers are all above the positive-balance mean with no recent orders") {
    val thr = graft.sources.Tables.customer(spark, sf001)
      .filter(org.apache.spark.sql.functions.col("c_acctbal") > 0.0)
      .agg(org.apache.spark.sql.functions.avg("c_acctbal")).collect()(0).getDouble(0)
    val segs = RelationalPlus.qIdleRichCustomers(spark, sf001).collect()
    assert(segs.nonEmpty)
    // every reported segment's mean balance is above the threshold by construction
    segs.foreach { r =>
      assert(r.getDouble(2) / r.getLong(1) > thr * 0.99, r.toString)
    }
  }

  test("forecast revenue pushes every predicate to the parquet scan") {
    val df = RelationalPlus.qForecastRevenue(spark, sf001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_discount") && plan.contains("l_quantity"), plan)
    val r = df.collect()(0)
    assert(r.getDouble(0) > 0 && r.getLong(1) > 0)
  }

  test("customer distribution conserves customers including the zero-order bucket") {
    val rows = RelationalPlus.qCustDistribution(spark, sf001).collect()
    val nCust = graft.sources.Tables.customer(spark, sf001).count()
    assert(rows.map(_.getLong(1)).sum == nCust)
  }

  test("top supplier returns every max-revenue tie and nothing below it") {
    val rows = RelationalPlus.qTopSupplier(spark, sf001).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getDouble(2)).distinct
    assert(revs.length == 1) // all returned rows share the maximum
  }

  test("min-price supplier picks the argmin with deterministic suppkey tie-break") {
    val best = RelationalPlus.qMinPriceSupplier(spark, sf001).collect()
    assert(best.nonEmpty)
    // recompute per-part minimum average unit price from raw lineitem
    import spark.implicits._
    val units = graft.sources.Tables.lineitem(spark, sf001)
      .select($"l_partkey", $"l_suppkey", ($"l_extendedprice" / $"l_quantity").as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPartSupp = units.groupBy(t => (t._1, t._2)).view
      .mapValues(v => v.map(_._3).sum / v.length).toMap
    best.foreach { r =>
      val (pk, got) = (r.getLong(0), r.getDouble(4))
      val minAvg = byPartSupp.collect { case ((p, _), a) if p == pk => a }.min
      assert(math.abs(got - minAvg) < 1e-2, s"part $pk: $got vs $minAvg")
    }
  }
}
