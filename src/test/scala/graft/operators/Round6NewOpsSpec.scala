package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Round-6 additions: certified-approx corpus heavies and the
  * rank-from-counts rewrites' semantic invariants.
  */
class Round6NewOpsSpec extends SparkSpec {

  test("compress ratio approx: certified within bound, exact twin matches the exact op") {
    val apx = PipelineOps.qCompressRatioApprox(spark, sf001).collect()
    assert(apx.nonEmpty)
    apx.foreach { r =>
      assert(r.getBoolean(4), s"sketch out of bound: $r")
      assert(r.getLong(2) <= r.getLong(1), "unique cannot exceed total")
    }
    // the exact columns are the exact operator's result, bit for bit
    val exact = PipelineOps.qCompressRatio(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val twin = apx
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(twin.sameElements(exact))
  }

  test("cond entropy approx: certified within bound, exact twin matches the exact op") {
    val a = TextAnalysis.qCondEntropyApprox(spark, sf001).collect().head
    assert(a.getBoolean(5), s"sampled entropy out of bound: $a")
    val e = TextAnalysis.qCondEntropy(spark, sf001).collect().head
    assert(a.getLong(0) == e.getLong(0) && a.getLong(1) == e.getLong(1) &&
      a.getLong(2) == e.getLong(2))
    assert(a.getDouble(3) == e.getDouble(3) && a.getDouble(4) == e.getDouble(4))
    // entropies are positive and conditioning can only reduce entropy
    assert(e.getDouble(4) > 0.0 && e.getDouble(4) <= e.getDouble(3))
  }

  test("participation: tiers partition the user base and shares sum to 1") {
    val rows = Behavioral.qParticipation(spark, sf001).collect()
    val users = rows.map(_.getLong(1)).sum
    val events = rows.map(_.getLong(2)).sum
    val exact = Tables.events(spark, sf001)
    val nUsers = exact.select("user_id").distinct().count()
    val nEvents = exact.count()
    assert(users == nUsers && events == nEvents)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    // tier-1 holds ~1% of users but (heavy tail) a larger event share
    val t1 = rows.find(_.getString(0) == "1_top1pct").get
    assert(t1.getLong(1) <= math.ceil(nUsers / 100.0).toLong)
  }

  test("cf coverage: gini in [0,1], coverage consistent with the CF table") {
    val r = Recsys.qCfCoverage(spark, sf001).collect().head
    val (nItems, nRec, nSlots) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val cf = Recsys.qItemCf(spark, sf001)
    assert(nRec == cf.select("neighbor").distinct().count())
    assert(nSlots == cf.count())
    assert(r.getDouble(3) > 0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
  }

  test("abc class: classes partition parts, shares sum to 1, A is densest") {
    val rows = Analytics.qAbcClass(spark, sf001).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    // Pareto: A's revenue share exceeds its count share
    val a = rows.head
    assert(a.getDouble(2) > a.getDouble(3))
  }
}
