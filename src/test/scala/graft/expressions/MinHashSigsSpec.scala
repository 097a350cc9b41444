package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

class MinHashSigsSpec extends SparkSpec {

  test("minhash_sigs matches the composable array_min(transform) form") {
    val base = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        transform(TextFns.shingles(col("t")), TextFns.hash28(_)).as("h0s"))
    val both = base.select(
      col("doc_id"),
      expr("minhash_sigs(h0s, 32)").as("native"),
      array((0 until 32).map(j => TextFns.minhash(col("h0s"), j)): _*).as("composed"))
    val mismatches = both.filter(col("native") =!= col("composed")).count()
    assert(mismatches == 0L)
    assert(both.count() > 0L)
  }

  test("minhash_sigs stays inside whole-stage codegen") {
    // child must itself be codegen-able (higher-order transform never is:
    // it forces the whole Project interpreted regardless of this
    // expression), so probe with a CreateArray child
    val plan = graft.sources.Tables.documents(spark, sf001)
      .select(expr("minhash_sigs(array(cast(length(text) as bigint), cast(doc_id as bigint)), 8)"))
      .queryExecution.executedPlan.toString
    // "*(1) Project" marks the projection inside whole-stage-codegen stage 1
    assert(plan.contains("*(1) Project [minhash_sigs"))
  }
}
