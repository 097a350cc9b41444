package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFns

class VecDotSpec extends SparkSpec {

  test("vec_dot is the sequential double fold on equal-length arrays") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
    val d = df.select(VectorFns.dot(col("a"), col("b")).as("d"))
      .collect().head.getDouble(0)
    assert(d == 1.0 * 4 + 2.0 * 5 + 3.0 * 6)
  }

  test("vec_dot returns NULL for mismatched lengths, not a truncated product") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0)),
      (Array(1.0), Array(2.0))).toDF("a", "b")
    val rows = df.select(VectorFns.dot(col("a"), col("b")).as("d")).collect()
    assert(rows(0).isNullAt(0), "mismatched lengths must yield NULL")
    assert(rows(1).getDouble(0) == 2.0)
  }

  test("vec_dot propagates NULL inputs") {
    val df = spark.sql(
      "SELECT vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS d")
    assert(df.collect().head.isNullAt(0))
  }

  test("vec_dot stays inside whole-stage codegen") {
    // non-literal input so constant folding can't collapse the projection
    val df = spark.range(1, 4)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(col("a"), col("b"), VectorFns.dot(col("a"), col("b")).as("d"))
    val inCodegen = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(inCodegen.nonEmpty, df.queryExecution.executedPlan.toString)
    val r1 = df.collect().find(_.getSeq[Double](0).head == 1.0).get
    assert(r1.getDouble(2) == 1.0 * 3.0 + 2.0 * 1.0)
  }
}
