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

  /** HyperLogLog++ distinct counts per group (fixed ~KB state per group,
    * mergeable across partitions — the only distinct count that works on
    * a 100 TB key column) beside the exact twin. Both are computed over
    * the SAME deduped (group, key) frame: an HLL sketch depends only on
    * the value SET, not multiplicities, so deduping first changes nothing
    * for the estimate and turns the exact side into a plain count —
    * mixing countDistinct with another aggregate in one agg planned an
    * Expand (per-aggregate row multiplication) + interpreted fallback,
    * measured 5.1s at sf0.1 vs ~0.6s for this shape.
    */
  def approxDistinctParts(s: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"), col("l_partkey"))
      .distinct()
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"),
        count(lit(1)).as("exact_parts"))
      .orderBy(col("l_returnflag"))

  /** t-digest quantiles (percentile_approx, bounded memory at any
    * cardinality) vs the sort-based exact percentile
    * (Analytics.exactPercentiles — NOT the O(rows)-state `percentile`
    * aggregate; see that scaladoc).
    */
  def approxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("approx_p50"))
    val exact = Analytics.exactPercentiles(li, "l_returnflag", "l_extendedprice",
      Seq(0.5 -> "exact_p50"))
    approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("approx_p50"), col("exact_p50"))
      .orderBy(col("l_returnflag"))
  }

  /** Mergeable-sketch rollup — THE 100 TB distinct-count architecture:
    * fine-grained (returnflag, linestatus) shards each build an
    * independent HLL sketch (Datasketches binary, one pass), and the
    * coarser per-returnflag answer comes from UNIONING shard sketches —
    * never re-scanning rows. This is what makes pre-aggregated daily
    * sketch tables answer arbitrary-range distinct queries at interactive
    * cost. Certified like the other sketches: the merged estimate must
    * land within bound of the exact twin, oracle-enforced. lgConfigK=12
    * → rsd ≈ 1.6%, certified at 5%.
    */
  def qSketchMerge(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val shardSketches = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
    val merged = shardSketches
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_shards"),
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("approx_parts"))
    val exact = li.select(col("l_returnflag"), col("l_partkey")).distinct()
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
    merged.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("n_shards"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts") * DistinctBound).as("within_bound"))
      .orderBy(col("l_returnflag"))
  }

  val qSketchMergeOracle: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_linestatus) AS n_shards,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS within_bound
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin
}
