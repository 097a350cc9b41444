package graft.dev

import graft.{GraftSession, SparkEntry}

/** Dev-only plan-shape sweep: `Test/runMain graft.dev.PlanSummary <out>`
  * writes ONE line per declared query — plan-string size plus the
  * PlanReport counters — so plan pathologies (expression-tree blowups,
  * redundant scans, unexpected exchanges) are findable by sorting a
  * 424-line file instead of dumping 424 full plans. Building a plan
  * executes any eager localCheckpoint stages, so this sweep costs
  * minutes, not hours; it performs no timed actions.
  */
object PlanSummary {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("dev/plan_summary.tsv")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val report = graft.plans.PlanReport.of(df).summary
        val line = s"$name\tplanBytes=${formatted.length}\t$report"
        println(s"[plansummary] $line")
        line
      } catch { case e: Throwable =>
        val line = s"$name\tERROR\t${e.getClass.getSimpleName}: ${e.getMessage}"
        println(s"[plansummary] $line")
        line
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (rows.mkString("\n") + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
