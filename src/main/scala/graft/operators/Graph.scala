package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph operators beyond connected components (which lives with its
  * consumer in [[Dedup.connectedComponents]]). Graphs are plain edge
  * DataFrames — iterative algorithms are join+aggregate rounds with
  * per-round `localCheckpoint` lineage truncation, the same discipline as
  * the cluster-propagation loop.
  */
object Graph {

  val Damping = 0.85

  /** One PageRank power-iteration over the customer→supplier purchase
    * graph (distinct (c_custkey, l_suppkey) pairs from orders⋈lineitem):
    * rank(s) = 0.15 + 0.85 · Σ_{c→s} 1/outdeg(c), from uniform initial
    * customer mass. Shape: the edge list is built with one distinct
    * (hash agg, map-side combined), out-degrees are one grouped count
    * joined back on the source key, and the scatter is one sum per
    * target — every shuffle carries bare (key, double) pairs. Full
    * PageRank iterates exactly this plan with the rank frame fed back
    * (localCheckpoint per round, like Dedup.connectedComponents);
    * one audited step keeps the oracle exact instead of
    * convergence-approximate.
    */
  def qPagerankIter(s: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("su"))
      .distinct()
    val outdeg = edges.groupBy(col("c")).agg(count(lit(1)).as("outdeg"))
    edges.join(outdeg, Seq("c"))
      .groupBy(col("su").as("s_suppkey"))
      .agg(count(lit(1)).as("n_in"),
        round(lit(1.0 - Damping) + lit(Damping) * sum(lit(1.0) / col("outdeg")), 6)
          .as("rank"))
      .orderBy(col("s_suppkey"))
  }

  val qPagerankIterOracle: String =
    s"""WITH e AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS su
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |),
       |d AS (SELECT c, count(*) AS outdeg FROM e GROUP BY c)
       |SELECT e.su AS s_suppkey, count(*) AS n_in,
       |  round(${1.0 - Damping} + $Damping * sum(1.0 / d.outdeg), 6) AS rank
       |FROM e JOIN d USING (c)
       |GROUP BY e.su
       |ORDER BY s_suppkey""".stripMargin
}
