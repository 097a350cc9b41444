package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Programmatic plan audit — the scale-critical facts of a physical plan
  * as data instead of explain-string grepping:
  *
  * {{{
  *   val r = PlanReport.of(df)
  *   assert(r.shuffles <= 2 && r.cartesianProducts == 0)
  *   assert(r.scansWithPushdown > 0)      // filters reached parquet
  *   assert(r.unpartitionedWindows == 0)  // nothing funnels one task
  * }}}
  *
  * This is the library form of the repo's own plan discipline (see
  * PlanAuditSpec): CI gates on shuffle counts and broadcast shapes stay
  * robust against explain-format drift, and an operator author can
  * assert the plan they designed is the plan they got.
  */
object PlanReport {

  final case class Report(
      shuffles: Int,
      broadcasts: Int,
      cartesianProducts: Int,
      unpartitionedWindows: Int,
      parquetScans: Int,
      scansWithPushdown: Int,
      wholeStageCodegenSpans: Int) { // 0 pre-execution under AQE: codegen
                                     // collapses per stage at materialization
    def summary: String =
      s"shuffles=$shuffles broadcasts=$broadcasts cartesian=$cartesianProducts " +
        s"unpartitionedWindows=$unpartitionedWindows parquetScans=$parquetScans " +
        s"pushedScans=$scansWithPushdown codegenSpans=$wholeStageCodegenSpans"
  }

  /** Audit the EXECUTED plan (post-AQE-planning, pre-execution). */
  def of(df: DataFrame): Report = {
    val plan = df.queryExecution.executedPlan
    var shuffles, broadcasts, cartesian, unpartWin, scans, pushed, codegen = 0
    def visit(p: SparkPlan): Unit = {
      p match {
        case _: ShuffleExchangeExec => shuffles += 1
        case _: BroadcastExchangeExec => broadcasts += 1
        case _: CartesianProductExec => cartesian += 1
        case w: WindowExec if w.partitionSpec.isEmpty => unpartWin += 1
        case _: org.apache.spark.sql.execution.WholeStageCodegenExec => codegen += 1
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          scans += 1
          if (f.metadata.get("PushedFilters").exists(v => v != "[]")) pushed += 1
        case _ =>
      }
      p.children.foreach(visit)
      // descend into subqueries and AQE-wrapped fragments
      p.subqueries.foreach(visit)
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          visit(a.executedPlan)
        case _ =>
      }
    }
    visit(plan)
    Report(shuffles, broadcasts, cartesian, unpartWin, scans, pushed, codegen)
  }
}
