package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BehavioralSpec extends SparkSpec {

  test("funnel stages are ordered and bounded") {
    val rows = Behavioral.qFunnel(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val stage = r.getAs[Long]("stage")
      assert(stage >= 1L && stage <= 3L)
      val view = r.getAs[Long]("view_us")
      if (!r.isNullAt(r.fieldIndex("click_us"))) {
        assert(r.getAs[Long]("click_us") > view)
        assert(stage >= 2L)
      } else assert(stage == 1L)
      if (!r.isNullAt(r.fieldIndex("purchase_us"))) {
        assert(r.getAs[Long]("purchase_us") > r.getAs[Long]("click_us"))
        assert(stage == 3L)
      }
    }
  }

  test("retention cohort has a day-zero row per cohort covering all its users") {
    val df = Behavioral.qRetentionCohort(spark, sf001)
    val perCohort = df.groupBy(col("cohort_day"))
      .agg(min(col("day_offset")).as("min_off"), max(col("n_users")).as("peak"))
      .collect()
    assert(perCohort.nonEmpty)
    // every user is active on their own first day, so offset 0 exists and
    // is the cohort's peak
    perCohort.foreach { r =>
      assert(r.getAs[Long]("min_off") == 0L)
      assert(r.getAs[Long]("peak") >= 1L)
    }
  }

  test("interval join keeps one row per purchase with non-negative counts") {
    val nPurchases = graft.sources.Tables.events(spark, sf001)
      .filter(col("event_type") === "purchase").count()
    val rows = Behavioral.qIntervalJoin(spark, sf001).collect()
    assert(rows.length == nPurchases)
    assert(rows.forall(_.getAs[Long]("n_errors") >= 0L))
  }

  test("cube grouping sets are mutually consistent") {
    val rows = Behavioral.qCubeAgg(spark, sf001).collect()
    val leaf = rows.filter(r => r.getString(0) != "ALL" && r.getString(1) != "ALL")
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length == 1)
    assert(leaf.map(_.getAs[Long]("n_orders")).sum == grand.head.getAs[Long]("n_orders"))
  }

  test("dedup clusters label every document and respect near-dup edges") {
    val labels = Dedup.qDedupCluster(spark, sf001)
    val nDocs = graft.sources.Tables.documents(spark, sf001).count()
    assert(labels.count() == nDocs)
    val lab = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // canonical representative is never larger than the member id
    assert(lab.forall { case (id, c) => c <= id })
    // both endpoints of every near-dup pair land in the same cluster
    val pairs = Dedup.qDedupNgramJaccard(spark, sf001)
      .select(col("doc_a"), col("doc_b")).collect()
    pairs.foreach { r =>
      assert(lab(r.getLong(0)) == lab(r.getLong(1)))
    }
  }
}
