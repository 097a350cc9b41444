package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RollingHashSpec extends SparkSpec {

  test("rolling_hash resolves via session extensions and matches the reference loop") {
    import spark.implicits._
    val inputs = Seq("", "a", "abc", "the quick brown fox", "ü unicode ✓")
    val got = inputs.toDF("s")
      .select(expr("rolling_hash(s)").as("h"))
      .collect().map(_.getLong(0))
    val want = inputs.map(x => RollingHash.hashBytes(x.getBytes("UTF-8")))
    assert(got.toSeq == want)
  }

  test("rolling_hash stays inside whole-stage codegen") {
    val plan = graft.sources.Tables.documents(spark, sf001)
      .select(expr("rolling_hash(text)"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [rolling_hash"), plan)
  }

  test("rolling_hash distributes over the corpus without collisions at sf0.001") {
    val n = graft.sources.Tables.documents(spark, sf001)
      .select(expr("rolling_hash(text)").as("h"))
      .distinct().count()
    assert(n == graft.sources.Tables.documents(spark, sf001).count())
  }
}
