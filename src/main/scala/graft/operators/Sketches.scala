package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate sketch operators — the 100 TB versions of exact
  * aggregates. Sketch VALUES are engine-specific, so the driver-gated
  * forms ([[qSketchDistinct]], [[qSketchPercentile]]) emit the
  * self-certifying contract instead: the exact twin (which DuckDB
  * recomputes independently) plus a `within_bound` boolean stating the
  * sketch landed within its error budget of that exact value. The oracle
  * asserts `TRUE` — a sketch drifting out of bound flips the column and
  * reds the row, so the contract is oracle-enforced, not ScalaTest-only.
  */
object Sketches {

  /** approx_count_distinct at rsd=0.02 — certify at 5% (≈2.5σ). */
  val DistinctBound = 0.05

  /** percentile_approx at accuracy=1000 — certify p50 at 2% relative. */
  val PercentileBound = 0.02

  def qSketchDistinct(s: SparkSession, dir: String): DataFrame =
    approxDistinctParts(s, dir)
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * DistinctBound).as("within_bound"))
      .orderBy(col("l_returnflag"))

  val qSketchDistinctOracle: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_bound
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  def qSketchPercentile(s: SparkSession, dir: String): DataFrame =
    approxPercentiles(s, dir)
      .select(col("l_returnflag"),
        round(col("exact_p50"), 4).as("p50_price"),
        (abs(col("approx_p50") - col("exact_p50")) <=
          col("exact_p50") * PercentileBound).as("within_bound"))
      .orderBy(col("l_returnflag"))

  val qSketchPercentileOracle: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
      |  TRUE AS within_bound
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** HyperLogLog++ distinct counts per group (vs countDistinct's
    * expand+two-phase shuffle: one pass, fixed 1.5 KB state per group,
    * mergeable across partitions — the only distinct count that works on
    * a 100 TB key column).
    */
  def approxDistinctParts(s: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))

  /** t-digest quantiles (percentile_approx) vs the exact sort-based
    * percentile — bounded memory at any cardinality.
    */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx_p50"),
        expr("percentile(l_extendedprice, 0.5)").as("exact_p50"))
      .orderBy(col("l_returnflag"))
}
