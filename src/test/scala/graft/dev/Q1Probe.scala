package graft.dev

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.GraftSession
import graft.functions.NumFns
import graft.sources.Tables

/** Dev-only: where does q1's time go — the scan, or the DECIMAL(38,12)
  * aggregation discipline? Compares the shipped decimal form against a
  * raw-double form (unsafe, for cost reference only) and an int64
  * micro-unit quantized form (the PCA trick).
  */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val D = DecimalType(38, 12)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q1probe] $name%-24s min=${ts.min}%6.2f med=${ts.sorted.apply(1)}%6.2f")
    }
    def base = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
    val revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

    time("scan_only") {
      noop(base.select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax")))
    }
    time("double_sums") {
      noop(base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("a"),
          round(sum(col("l_extendedprice")), 2).as("b"),
          round(sum(revenue), 2).as("c"),
          round(sum(revenue * (lit(1.0) + col("l_tax"))), 2).as("d"),
          round(avg(col("l_quantity")), 6).as("e"),
          round(avg(col("l_discount")), 6).as("f"),
          count(lit(1)).as("n")))
    }
    // NOTE: double_sums goes through StableAggRule -> decimal anyway;
    // bypass it by summing unrounded (rule only fires on round(sum))
    time("double_sums_norule") {
      noop(base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("a"),
          sum(col("l_extendedprice")).as("b"),
          sum(revenue).as("c"),
          sum(revenue * (lit(1.0) + col("l_tax"))).as("d"),
          avg(col("l_quantity")).as("e"),
          avg(col("l_discount")).as("f"),
          count(lit(1)).as("n")))
    }
    time("decimal_sums (shipped)") {
      noop(graft.operators.Relational.q1PricingSummary(spark, dir))
    }
    time("int64_micro_sums") {
      noop(base.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(NumFns.roundAwayLong(col("l_quantity") * 1e6)).as("a"),
          sum(NumFns.roundAwayLong(col("l_extendedprice") * 1e6)).as("b"),
          sum(NumFns.roundAwayLong(revenue * 1e6)).as("c"),
          sum(NumFns.roundAwayLong((revenue * (lit(1.0) + col("l_tax"))) * 1e6)).as("d"),
          avg(col("l_quantity")).as("e"),
          avg(col("l_discount")).as("f"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("l_linestatus"),
          round(col("a") / 1e6, 2), round(col("b") / 1e6, 2),
          round(col("c") / 1e6, 2), round(col("d") / 1e6, 2),
          col("e"), col("f"), col("n")))
    }
    spark.stop()
  }
}
