package graft.dev
import graft.GraftSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    val dir = "/root/testdata/sf0.1"
    println("=== qEmbedNeardup ===")
    println(graft.operators.Similarity.qEmbedNeardup(spark, dir).queryExecution.executedPlan.toString.take(2500))
    println("=== qDedupNgramJaccard ===")
    println(graft.operators.Dedup.qDedupNgramJaccard(spark, dir).queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
