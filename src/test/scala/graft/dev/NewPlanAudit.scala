package graft.dev

import graft.GraftSession

/** Dev-only: exchange/codegen census for the newest operators. */
object NewPlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- Seq("q_tfidf", "q_corpus_filter", "q_retention_cohort", "q_funnel",
        "q_interval_join", "q_skew_salted_join", "q_full_outer", "q_argmax_agg")) {
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      val nEx = "Exchange hashpartitioning".r.findAllIn(plan).length
      val nBc = "BroadcastExchange".r.findAllIn(plan).length
      val nSort = "Sort ".r.findAllIn(plan).length
      val cart = plan.contains("CartesianProduct")
      println(f"[audit] $q%-22s shuffles=$nEx broadcasts=$nBc sorts=$nSort cartesian=$cart")
    }
    spark.stop()
  }
}
