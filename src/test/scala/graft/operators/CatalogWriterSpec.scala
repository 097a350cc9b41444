package graft.operators

import graft.SparkSpec

class CatalogWriterSpec extends SparkSpec {

  private def readText(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  test("writeCatalog emits header'd CSV rows and a JSON column spec") {
    val out = java.nio.file.Files.createTempDirectory("graft_catalog").toString
    val catalog = Catalog.qCatalogParse(spark, sf001)
    Catalog.writeCatalog(catalog, out)

    val back = spark.read.option("header", "true").csv(s"$out/catalog.csv")
    assert(back.count() == catalog.count())
    assert(back.columns.toSeq ==
      Seq("variable", "model", "scheme", "experiment_id", "time_range", "path"))

    val spec = readText(s"$out/_spec.json")
    assert(spec.contains("\"name\":\"experiment_id\""))
    assert(spec.contains(s""""row_count":${catalog.count()}"""))
  }

  // Reference vectors: tests/assets/test_loca2_esm_catalog.py
  // test_generate_catalog_zarr — three bucket keys (two children of one
  // ACCESS-CM2 store + one MIROC6 store child) must collapse to a
  // 2-row catalog, and the collection spec must carry the intake-ESM
  // fields the reference's ESMCatalogModel serializes.
  test("esmCatalog replays the reference's zarr catalog vector") {
    import spark.implicits._
    val listing = Seq(
      "zarr/LOCA2/monthly/ACCESS-CM2/historical/tasmin.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr/time/0",
      "zarr/LOCA2/monthly/ACCESS-CM2/historical/tasmin.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr/lon/0",
      "zarr/LOCA2/monthly/MIROC6/ssp370/pr.MIROC6.ssp370.r2i1p1f1.2045-2074.LOCA_16thdeg_v20240915.cent.monthly.zarr/pr_tavg/3.0.1cent.zarr"
    ).toDF("key")
    val config = Catalog.EsmCatalogConfig(
      "loca2_zarr_monthly_esm_catalog", "LOCA2 zarr data catalog", "zarr", "test_bucket")
    val cat = Catalog.esmCatalog(listing, "key", "zarr/LOCA2/monthly", config)
    val rows = cat.collect()
    assert(rows.length == 2 && cat.columns.length == 6)

    val r31 = rows.filter(_.getAs[String]("experiment_id") == "r3i1p1f1").head
    assert(r31.getAs[String]("variable") == "tasmin")
    assert(r31.getAs[String]("model") == "ACCESS-CM2")
    assert(r31.getAs[String]("scheme") == "historical")
    assert(r31.getAs[String]("time_range") == "1950-2014")
    assert(r31.getAs[String]("path") ==
      "s3://test_bucket/zarr/LOCA2/monthly/ACCESS-CM2/historical/tasmin.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr")

    val out = java.nio.file.Files.createTempDirectory("graft_esm").toString
    Catalog.writeCatalog(cat, out, config)
    val spec = readText(s"$out/${config.id}.json")
    assert(spec.contains(""""esmcat_version":"0.1.0""""))
    assert(spec.contains(""""id":"loca2_zarr_monthly_esm_catalog""""))
    assert(spec.contains(""""description":"LOCA2 zarr data catalog""""))
    assert(spec.contains(""""catalog_file":"s3://test_bucket/loca2_zarr_monthly_esm_catalog.csv""""))
    Seq("variable", "model", "scheme", "experiment_id", "time_range", "path").foreach(c =>
      assert(spec.contains(s"""{"column_name":"$c","vocabulary":""}""")))
    assert(spec.contains(""""assets":{"column_name":"path","format":"zarr"}"""))
    val csv = spark.read.option("header", "true").csv(s"$out/${config.id}.csv")
    assert(csv.count() == 2)
  }

  // Reference vector: test_generate_catalog_netcdf — raw keys are their
  // own base paths; format stamp flips to netcdf.
  test("esmCatalog replays the reference's netcdf catalog vector") {
    import spark.implicits._
    val listing = Seq(
      "netcdf/LOCA2/monthly/ACCESS-CM2/ssp585/tasmin.ACCESS-CM2.ssp585.r3i1p1f1.2075-2100.LOCA_16thdeg_v20220413.monthly.cent.nc",
      "netcdf/LOCA2/monthly/ACCESS-ESM1-5/historical/tasmin.ACCESS-ESM1-5.historical.r5i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.nc"
    ).toDF("key")
    val config = Catalog.EsmCatalogConfig(
      "loca2_raw_monthly_esm_catalog", "LOCA2 raw data catalog", "netcdf", "test_bucket")
    val cat = Catalog.esmCatalog(listing, "key", "netcdf/LOCA2/monthly", config)
    val rows = cat.collect()
    assert(rows.length == 2 && cat.columns.length == 6)

    val r31 = rows.filter(_.getAs[String]("experiment_id") == "r3i1p1f1").head
    assert(r31.getAs[String]("variable") == "tasmin")
    assert(r31.getAs[String]("model") == "ACCESS-CM2")
    assert(r31.getAs[String]("scheme") == "ssp585")
    assert(r31.getAs[String]("time_range") == "2075-2100")
    assert(r31.getAs[String]("path") ==
      "s3://test_bucket/netcdf/LOCA2/monthly/ACCESS-CM2/ssp585/tasmin.ACCESS-CM2.ssp585.r3i1p1f1.2075-2100.LOCA_16thdeg_v20220413.monthly.cent.nc")

    assert(Catalog.esmCollectionSpec(cat, config)
      .contains(""""assets":{"column_name":"path","format":"netcdf"}"""))
  }

  // The reference skips keys whose shape raises IndexError in parse_key
  // (loca2.py:220-224); malformed listing entries must vanish, not fail.
  test("esmCatalog skips structurally unparseable keys") {
    import spark.implicits._
    val listing = Seq(
      "netcdf/LOCA2/monthly/ACCESS-CM2/ssp585/tasmin.ACCESS-CM2.ssp585.r3i1p1f1.2075-2100.LOCA_16thdeg_v20220413.monthly.cent.nc",
      "stray-root-file.nc", // one path segment
      "netcdf/LOCA2/monthly/MODEL-X/truncated.file" // too few dot-parts
    ).toDF("key")
    val config = Catalog.EsmCatalogConfig("c", "d", "netcdf", "b")
    val cat = Catalog.esmCatalog(listing, "key", "netcdf/LOCA2/monthly", config)
    assert(cat.collect().map(_.getAs[String]("model")).toSeq == Seq("ACCESS-CM2"))
  }
}
