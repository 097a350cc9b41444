package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  test("exactPercentiles ignores nulls like quantile_cont") {
    import spark.implicits._
    val df = Seq[(String, Option[Double])](
      ("g", None), ("g", Some(10.0)), ("g", Some(20.0)),
      ("h", Some(1.0)), ("h", None), ("h", Some(3.0)), ("h", Some(5.0)))
      .toDF("grp", "v")
    val rows = Analytics.exactPercentiles(df, "grp", "v", Seq(0.5 -> "p50"))
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("p50")).toMap
    // medians over the non-null values only: (10,20) -> 15, (1,3,5) -> 3
    assert(rows("g") == 15.0, s"null inflated g's rank: ${rows("g")}")
    assert(rows("h") == 3.0)
  }

  test("exactPercentiles matches Spark's percentile aggregate on null-free data") {
    val li = graft.sources.Tables.lineitem(spark, sf001)
      .select(col("l_returnflag").as("grp"), col("l_quantity").as("v"))
    val ours = Analytics.exactPercentiles(li, "grp", "v",
      Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))).toMap
    val ref = li.groupBy("grp")
      .agg(expr("percentile(v, 0.25)").as("p25"), expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.75)").as("p75"))
      .collect().map(r => r.getAs[String]("grp") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))).toMap
    assert(ours.keySet == ref.keySet)
    ours.foreach { case (g, (a, b, c)) =>
      val (x, y, z) = ref(g)
      assert(math.abs(a - x) < 1e-9 && math.abs(b - y) < 1e-9 && math.abs(c - z) < 1e-9)
    }
  }
}
