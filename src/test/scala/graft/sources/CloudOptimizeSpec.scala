package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CloudOptimizeSpec extends SparkSpec {

  test("re-encode produces partitioned, sorted, prunable parquet") {
    val out = Files.createTempDirectory("graft_opt").toString
    val li = Tables.lineitem(spark, sf001)
      .withColumn("ship_year", year(col("l_shipdate")))
    CloudOptimize.write(li, out,
      partitionCols = Seq("ship_year"), sortCols = Seq("l_orderkey"))

    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
    // partition pruning: a year filter must scan only that directory
    val plan = back.filter(col("ship_year") === 1997)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("PartitionFilters: []"), plan)
    // directories exist per year
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("ship_year=")))
  }
}
