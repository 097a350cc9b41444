package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InterchangeSpec extends SparkSpec {

  test("documents round-trip through gzipped JSONL bit-for-bit") {
    val docs = Tables.documents(spark, sf001)
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl").toString + "/docs"
    Interchange.writeJsonl(docs, out)
    val shards = new java.io.File(out).listFiles().filter(_.getName.endsWith(".json.gz"))
    assert(shards.nonEmpty, "expected gzipped JSONL shards")
    val back = Interchange.readJsonl(spark, out, docs.schema).cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() == 0L)
    val a = docs.orderBy(col("doc_id")).collect()
    val b = back.drop("_corrupt_record").select(docs.columns.map(col): _*)
      .orderBy(col("doc_id")).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("partitioned JSONL export lays out one directory per partition value") {
    val docs = Tables.documents(spark, sf001).limit(50)
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl_part").toString + "/docs"
    Interchange.writeJsonl(docs, out, partitionCols = Seq("lang"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("lang=")))
  }

  test("malformed lines surface in _corrupt_record instead of failing the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_bad").toString
    val f = new java.io.PrintWriter(s"$dir/part-000.json")
    f.println("""{"doc_id": 1, "text": "ok"}""")
    f.println("""{"doc_id": oops not json""")
    f.close()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val df = Interchange.readJsonl(spark, dir, schema).cache()
    assert(df.count() == 2L)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1L)
    assert(df.filter(col("doc_id") === 1L && col("text") === "ok").count() == 1L)
  }

  test("orders round-trip through gzipped CSV with typed schema") {
    val ord = Tables.orders(spark, sf001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    val out = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/orders"
    Interchange.writeCsv(ord, out)
    val shards = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(shards.nonEmpty, "expected gzipped CSV shards")
    val back = Interchange.readCsv(spark, out, ord.schema)
    val (clean, bad) = Interchange.quarantine(back)
    assert(bad.count() == 0L)
    val a = ord.orderBy(col("o_orderkey")).collect()
    val b = clean.select(ord.columns.map(col): _*).orderBy(col("o_orderkey")).collect()
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("CSV quarantine catches type-broken rows and keeps the raw line") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_bad").toString
    val f = new java.io.PrintWriter(s"$dir/part-000.csv")
    f.println("id,price")
    f.println("1,9.99")
    f.println("2,not_a_number")
    f.close()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("price", org.apache.spark.sql.types.DoubleType)))
    val (clean, bad) = Interchange.quarantine(Interchange.readCsv(spark, dir, schema))
    assert(clean.count() == 1L && bad.count() == 1L)
    assert(bad.collect()(0).getAs[String]("_corrupt_record").contains("not_a_number"))
  }
}
