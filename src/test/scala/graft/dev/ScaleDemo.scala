package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.operators.{Catalog, Sketches}
import graft.plans.Salt
import graft.sources.{CloudOptimize, Tables}

/** Dev entrypoint exercising the scale-tool APIs through the public
  * package surface (salted join, bucketed co-located join, incremental
  * chunks, sketches).
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_quantity")
    val supp = Tables.supplier(spark, dir).withColumnRenamed("s_suppkey", "l_suppkey")
    println(s"salted=${Salt.saltedJoin(li, supp, "l_suppkey", 8).count()} plain=${li.join(supp, "l_suppkey").count()}")

    CloudOptimize.writeBucketed(Tables.orders(spark, dir), "demo_orders", Seq("o_orderkey"), 8)
    CloudOptimize.writeBucketed(Tables.lineitem(spark, dir), "demo_lineitem", Seq("l_orderkey"), 8)
    val j = spark.table("demo_lineitem").hint("merge")
      .join(spark.table("demo_orders"), col("l_orderkey") === col("o_orderkey"))
    println(s"bucketed-join exchanges=${"Exchange".r.findAllIn(j.queryExecution.executedPlan.toString).size} rows=${j.count()}")

    val listing = Catalog.qManifestDiscovery(spark, dir)
      .select(concat(col("model"), lit("/"), col("scenario")).as("key"), col("memberid"))
    val first = Catalog.nextChunk(listing, "key", None)
    val second = first.flatMap { case (_, c) => Catalog.nextChunk(listing, "key", Some(c)) }
    println(s"chunk1=${first.map(_._2).orNull} chunk2=${second.map(_._2).orNull}")

    Sketches.approxDistinctParts(spark, dir).show(3)
    spark.stop()
  }
}
