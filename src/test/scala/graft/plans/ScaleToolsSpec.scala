package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Catalog, Sketches}
import graft.sources.{CloudOptimize, Tables}

class ScaleToolsSpec extends SparkSpec {

  test("salted join returns exactly the rows of the unsalted join") {
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_suppkey", "l_quantity")
    val supp = Tables.supplier(spark, sf001).withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(supp, "l_suppkey").count()
    val salted = Salt.saltedJoin(li, supp, "l_suppkey", salts = 8).count()
    assert(salted == plain)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    CloudOptimize.writeBucketed(
      Tables.orders(spark, sf001), "orders_b", Seq("o_orderkey"), 8, Seq("o_orderkey"))
    CloudOptimize.writeBucketed(
      Tables.lineitem(spark, sf001), "lineitem_b", Seq("l_orderkey"), 8, Seq("l_orderkey"))
    val j = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(j.count() == Tables.lineitem(spark, sf001).count())
  }

  test("incremental chunk API walks the whole listing exactly once") {
    val listing = Catalog.qManifestDiscovery(spark, sf001)
      .select(concat(col("model"), lit("/"), col("scenario")).as("key"), col("memberid"))
    var cursor: Option[String] = None
    var chunks = 0
    var rows = 0L
    var last = ""
    var done = false
    while (!done && chunks < 1000) {
      Catalog.nextChunk(listing, "key", cursor) match {
        case Some((chunk, k)) =>
          assert(k > last); last = k
          rows += chunk.count(); chunks += 1; cursor = Some(k)
        case None => done = true
      }
    }
    assert(chunks == 25 * 4) // model x scenario keys
    assert(rows == listing.count())
  }

  test("HLL distinct counts land within 5% of exact") {
    Sketches.approxDistinctParts(spark, sf001).collect().foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"$approx vs $exact")
    }
  }

  test("approx percentiles land within 2% of exact") {
    Sketches.approxPercentiles(spark, sf001).collect().foreach { r =>
      val exact = r.getAs[Double]("exact_p50")
      val approx = r.getAs[Double]("approx_p50")
      assert(math.abs(approx - exact) / exact <= 0.02, s"$approx vs $exact")
    }
  }
}
