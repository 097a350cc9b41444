package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StableAggRuleSpec extends SparkSpec {

  import spark.implicits._

  test("round(avg(double)) in a group-by lowers to the decimal form") {
    val df = Seq((1, 0.1), (1, 0.2), (2, 0.30004), (2, 0.1)).toDF("g", "x")
      .groupBy("g").agg(round(avg(col("x")), 4).as("m"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("decimal(38,12)"),
      s"expected decimal-stabilized aggregate, got:\n$optimized")
    // and the values are exactly the NumFns form
    val viaRule = df.orderBy("g").collect().map(_.getDouble(1)).toSeq
    val byHand = Seq((1, 0.1), (1, 0.2), (2, 0.30004), (2, 0.1)).toDF("g", "x")
      .groupBy("g")
      .agg(graft.functions.NumFns.stableMean(col("x"), count(col("x")), 4).as("m"))
      .orderBy("g").collect().map(_.getDouble(1)).toSeq
    assert(viaRule == byHand)
  }

  test("round(sum(double)) in a group-by lowers to the decimal form") {
    val df = Seq((1, 1.1), (1, 2.2), (2, 3.3)).toDF("g", "x")
      .groupBy("g").agg(round(sum(col("x")), 2).as("s"))
    assert(df.queryExecution.optimizedPlan.toString.contains("decimal(38,12)"))
    assert(df.orderBy("g").collect().map(_.getDouble(1)).toSeq == Seq(3.3, 3.3))
  }

  test("window round-aggs and non-double aggs are left alone") {
    // window agg: sequential frame order needs no stabilization
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("x").rowsBetween(Long.MinValue, 0)
    val win = Seq((1, 0.5), (1, 0.7)).toDF("g", "x")
      .select(col("g"), round(avg(col("x")).over(w), 4).as("m"))
    assert(!win.queryExecution.optimizedPlan.toString.contains("decimal(38,12)"),
      "window aggregate must not be rewritten")
    // long sum: already exact, no decimal detour
    val lng = Seq((1, 5L), (1, 6L)).toDF("g", "x")
      .groupBy("g").agg(round(sum(col("x")), 2).as("s"))
    assert(!lng.queryExecution.optimizedPlan.toString.contains("decimal(38,12)"))
    assert(lng.collect().head.get(1).toString.toDouble == 11.0)
  }

  test("the rewrite is order-independent where raw doubles may not be") {
    // 2000 values spread over magnitudes; the decimal sum is identical
    // under any partitioning of the input
    val vals = (1 to 2000).map(i => math.pow(-1, i) * math.exp(i % 17) * 1e-3)
    val a = vals.toDF("x").repartition(1)
      .agg(round(avg(col("x")), 6)).collect().head.getDouble(0)
    val b = vals.reverse.toDF("x").repartition(13)
      .agg(round(avg(col("x")), 6)).collect().head.getDouble(0)
    assert(a == b, s"decimal-stabilized mean must not depend on layout: $a vs $b")
  }
}
