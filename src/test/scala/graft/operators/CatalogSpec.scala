package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** parse_key fidelity is checked against the reference's own test vectors
  * (tests/assets/test_loca2_esm_catalog.py).
  */
class CatalogSpec extends SparkSpec {

  private val refKey =
    "ACCESS-CM2/historical/tasmin.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr"

  test("parseKey reproduces the reference test vector") {
    import spark.implicits._
    val df = Seq(refKey).toDF("key")
      .select(Catalog.parseKey(col("key"), "test-bucket",
        concat(lit("zarr/LOCA2/monthly/"), col("key"))).as("p"))
      .select("p.*")
    val r = df.collect().head
    assert(r.getAs[String]("variable") == "tasmin")
    assert(r.getAs[String]("model") == "ACCESS-CM2")
    assert(r.getAs[String]("scheme") == "historical")
    assert(r.getAs[String]("experiment_id") == "r3i1p1f1")
    assert(r.getAs[String]("time_range") == "1950-2014")
    assert(r.getAs[String]("path") == "s3://test-bucket/zarr/LOCA2/monthly/" + refKey)
  }

  test("parseKey drops empty path segments like the reference") {
    import spark.implicits._
    val r = Seq("//ACCESS-ESM1-5//historical/tasmin.ACCESS-ESM1-5.historical.r5i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr")
      .toDF("key")
      .select(Catalog.parseKey(col("key"), "b", col("key")).as("p"))
      .select("p.*").collect().head
    assert(r.getAs[String]("model") == "ACCESS-ESM1-5")
    assert(r.getAs[String]("scheme") == "historical")
  }

  test("manifest discovery emits one record per model/scenario/member") {
    val n = Catalog.qManifestDiscovery(spark, sf001).count()
    assert(n == 25L * 4 * 3) // 25 nations x 4 scenarios x 3 members
  }

  test("regex filter excludes non-data files and classifies frequency") {
    val rows = Catalog.qManifestRegex(spark, sf001).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("daily", "monthly")(r.getAs[String]("frequency"))))
    // monthly naming must never be classified daily (the reference's
    // trap: ".monthly.cent.nc" ends with ".cent.nc" as a substring)
    rows.filter(_.getAs[String]("filename").contains("monthly"))
      .foreach(r => assert(r.getAs[String]("frequency") == "monthly"))
  }

  test("zarr base collapse produces keys ending at the store marker") {
    val rows = Catalog.qCatalogDedupBases(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[String]("base_path")
      assert(p.endsWith("monthly.cent.zarr") || p.endsWith("cent.monthly.zarr"), p)
    }
  }

  test("cursor picks the smallest key strictly greater than the cursor") {
    val r = Catalog.qSensorCursor(spark, sf001).collect().head
    val key = r.getAs[String]("next_model") + "/" + r.getAs[String]("next_scenario")
    assert(key > "MODEL-3/ssp245")
  }
}
