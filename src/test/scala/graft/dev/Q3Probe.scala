package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Dev-only: profile q3/q5 stages to find the bench outlier. */
object Q3Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"[q3probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < to_timestamp(lit("1998-06-01")))
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > to_timestamp(lit("1998-06-01")))
    time("cust filter") { cust.count() }
    time("ord filter") { ord.count() }
    time("li filter") { li.count() }
    time("li join ord") { li.join(ord, col("l_orderkey") === col("o_orderkey")).count() }
    val j2 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    time("+ broadcast cust") { j2.count() }
    val agg = j2.groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
    time("+ agg") { agg.count() }
    val withSel = agg.select(col("l_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
      col("o_orderpriority"), col("revenue"))
    time("+ date_format select") { withSel.count() }
    time("+ orderBy.limit(10)") {
      withSel.orderBy(col("revenue").desc, col("l_orderkey")).limit(10).count()
    }
    val shj = li.join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey")).limit(10)
    time("q3 with shuffle_hash ord") { shj.count() }
    time("full q3") { graft.operators.Relational.q3ShippingPriority(spark, dir).count() }
    time("full q5") { graft.operators.Relational.q5LocalSupplier(spark, dir).count() }
    println(graft.operators.Relational.q3ShippingPriority(spark, dir)
      .queryExecution.executedPlan.toString.take(3500))
    spark.stop()
  }
}
