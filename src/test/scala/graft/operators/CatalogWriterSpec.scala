package graft.operators

import graft.SparkSpec

class CatalogWriterSpec extends SparkSpec {

  test("writeCatalog emits header'd CSV rows and a JSON column spec") {
    val out = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    val catalog = Catalog.qCatalogParse(spark, sf001)
    Catalog.writeCatalog(catalog, out)

    val back = spark.read.option("header", "true").csv(s"$out/catalog.csv")
    assert(back.count() == catalog.count())
    assert(back.columns.toSeq ==
      Seq("variable", "model", "scheme", "experiment_id", "time_range", "path"))

    val spec = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"$out/_spec.json")), "UTF-8")
    assert(spec.contains("\"name\":\"experiment_id\""))
    assert(spec.contains(s""""row_count":${catalog.count()}"""))
  }
}
