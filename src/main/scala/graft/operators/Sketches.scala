package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate sketch operators — the 100 TB versions of exact
  * aggregates. Not oracle-gated (sketch outputs are engine-specific);
  * ScalaTest bounds them against their exact twins instead.
  */
object Sketches {

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
