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

  test("ORC re-encode round-trips with the same partition layout and pruning") {
    val out = Files.createTempDirectory("graft_orc").toString
    val li = Tables.lineitem(spark, sf001)
      .withColumn("ship_year", year(col("l_shipdate")))
    CloudOptimize.write(li, out,
      partitionCols = Seq("ship_year"), sortCols = Seq("l_orderkey"),
      format = "orc")
    val back = spark.read.orc(out)
    assert(back.count() == li.count())
    val plan = back.filter(col("ship_year") === 1997)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FileScan orc"), plan)
    assert(!plan.contains("PartitionFilters: []"), plan)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("ship_year=")))
  }

  test("a hot partition value spreads over multiple sorted files (no one-task skew)") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_skew").toString
    // 9k rows on one date, 10 on the other: hash-by-partition-value would
    // write the hot date as ONE task / ONE file
    val skewed = spark.range(0, 9010)
      .select(
        when(col("id") < 9000, "2024-01-01").otherwise("2024-01-02").as("dt"),
        (col("id") * 7919 % 9010).as("k"))
    // pin 4 range tasks: at toy scale AQE would coalesce the 9k-row
    // shuffle to one partition (at real scale it splits by advisory size)
    CloudOptimize.write(skewed, out, partitionCols = Seq("dt"), sortCols = Seq("k"),
      numPartitions = Some(4))

    val hotDir = new java.io.File(s"$out/dt=2024-01-01")
    val files = hotDir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length > 1,
      s"hot partition written as ${files.length} file(s) — still one-task skew")
    // each file is internally sorted and files cover disjoint key ranges
    val ranges = files.map { f =>
      val ks = spark.read.parquet(f.getAbsolutePath).select("k").as[Long].collect()
      assert(ks.sameElements(ks.sorted), s"${f.getName} not sorted by k")
      (ks.head, ks.last)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, "file key ranges overlap")
      case _ =>
    }
    assert(spark.read.parquet(out).count() == 9010)
  }

  test("sort-less writes salt-spread a hot partition value across tasks") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_sortless").toString
    // one hot partition value, NO sort columns: the write must still
    // spread it (the first cut silently skipped the repartition when
    // sortCols was empty, reintroducing one-task skew)
    val skewed = spark.range(0, 4010)
      .select(
        when(col("id") < 4000, "2024-01-01").otherwise("2024-01-02").as("dt"),
        col("id").as("k"))
    CloudOptimize.write(skewed, out, partitionCols = Seq("dt"), sortCols = Nil,
      numPartitions = Some(4))
    val hotDir = new java.io.File(s"$out/dt=2024-01-01")
    val files = hotDir.listFiles().filter(_.getName.endsWith(".parquet"))
    // the content-hash salt spreads the hot value over the pinned tasks
    assert(files.length > 1,
      s"hot value written as ${files.length} file(s) — sort-less skew remains")
    assert(spark.read.parquet(out).count() == 4010)
  }
}
