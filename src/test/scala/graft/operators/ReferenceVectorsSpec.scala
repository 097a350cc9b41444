package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The reference's own test vectors, replayed against this engine's
  * operators — inputs and expected outputs are verbatim from
  * tests/assets/test_loca2_esm_catalog.py and
  * tests/sensors/test_local2_sensors.py in
  * atmsillinois/DownscaledClimateData.
  */
class ReferenceVectorsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def df1(colName: String, values: String*) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      values.map(org.apache.spark.sql.Row(_)).asJava,
      StructType(Seq(StructField(colName, StringType))))
  }

  test("parse_key vectors from test_loca2_esm_catalog.py:32-57") {
    val keys = Seq(
      "ACCESS-CM2/historical/tasmin.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr",
      "ACCESS-ESM1-5/historical/tasmin.ACCESS-ESM1-5.historical.r5i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr")
    val parsed = df1("key", keys: _*)
      .select(Catalog.parseKey(col("key"), "test-bucket",
        concat(lit("zarr/LOCA2/monthly/"), col("key"))).as("p"))
      .select(col("p.*"))
      .orderBy(col("model"))
      .collect()
    assert(parsed.length == 2)
    val r0 = parsed(0)
    assert(r0.getAs[String]("variable") == "tasmin")
    assert(r0.getAs[String]("model") == "ACCESS-CM2")
    assert(r0.getAs[String]("scheme") == "historical")
    assert(r0.getAs[String]("experiment_id") == "r3i1p1f1")
    assert(r0.getAs[String]("time_range") == "1950-2014")
    assert(r0.getAs[String]("path") == "s3://test-bucket/zarr/LOCA2/monthly/" + keys(0))
    val r1 = parsed(1)
    assert(r1.getAs[String]("experiment_id") == "r5i1p1f1")
    assert(r1.getAs[String]("path") == "s3://test-bucket/zarr/LOCA2/monthly/" + keys(1))
  }

  test("zarr catalog flow from test_generate_catalog_zarr (3 child keys -> 2 rows)") {
    val listing = df1("full_key",
      "zarr/LOCA2/monthly/ACCESS-CM2/historical/tasmin.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr/time/0",
      "zarr/LOCA2/monthly/ACCESS-CM2/historical/tasmin.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr/lon/0",
      "zarr/LOCA2/monthly/MIROC6/ssp370/pr.MIROC6.ssp370.r2i1p1f1.2045-2074.LOCA_16thdeg_v20240915.cent.monthly.zarr/pr_tavg/3.0.1cent.zarr")
    val catalog = listing
      .select(Catalog.zarrBasePath(col("full_key")).as("base"))
      .distinct()
      .select(Catalog.parseKey(
        regexp_replace(col("base"), "^zarr/LOCA2/monthly/", ""),
        "test_bucket", col("base")).as("p"))
      .select(col("p.*"))
      .orderBy(col("model"))
      .collect()
    assert(catalog.length == 2)
    val r31 = catalog.filter(_.getAs[String]("experiment_id") == "r3i1p1f1").head
    assert(r31.getAs[String]("variable") == "tasmin")
    assert(r31.getAs[String]("model") == "ACCESS-CM2")
    assert(r31.getAs[String]("scheme") == "historical")
    assert(r31.getAs[String]("time_range") == "1950-2014")
    assert(r31.getAs[String]("path") ==
      "s3://test_bucket/zarr/LOCA2/monthly/ACCESS-CM2/historical/tasmin.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.zarr")
  }

  // the exact model/scenario catalog from the sensors fixture
  private def modelScenarios = df1("key",
    "ACCESS-ESM1-5/historical", "ACCESS-ESM1-5/ssp245", "ACCESS-ESM1-5/ssp585",
    "ACCESS-CM2/ssp245", "ACCESS-CM2/historical", "ACCESS-CM2/ssp370",
    "ACCESS-CM2/ssp585")

  test("cursor vectors from test_local2_sensors.py (fresh, mid, exhausted)") {
    // fresh cursor -> first sorted key
    val first = Catalog.nextChunk(modelScenarios, "key", None)
    assert(first.map(_._2).contains("ACCESS-CM2/historical"))
    // mid-stream cursor -> next sorted key
    val mid = Catalog.nextChunk(modelScenarios, "key", Some("ACCESS-CM2/historical"))
    assert(mid.map(_._2).contains("ACCESS-CM2/ssp245"))
    // exhausted cursor -> no work
    val end = Catalog.nextChunk(modelScenarios, "key", Some("ACCESS-ESM1-5/ssp585"))
    assert(end.isEmpty)
  }

  test("downloadable-files vectors from test_loca2_dataset") {
    import org.apache.spark.sql.types._
    val members = Seq("r1i1p1f1", "r2i1p1f1", "r3i1p1f1")
    val rows = members.flatMap { m =>
      Seq(
        // the real data file for this member
        ("ACCESS-CM2", "historical", m,
          s"tasmax.ACCESS-CM2.historical.$m.1950-2014.LOCA_16thdeg_v20220413.cent.nc"),
        // directory-page noise the regex must drop
        ("ACCESS-CM2", "historical", m, "index.html"),
        ("ACCESS-CM2", "historical", m,
          s"tasmax.ACCESS-CM2.historical.$m.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.nc"))
    }
    val listing = spark.createDataFrame(
      rows.map { case (a, b, c, d) => org.apache.spark.sql.Row(a, b, c, d) }.asJava,
      StructType(Seq("model", "scenario", "memberid", "filename")
        .map(StructField(_, StringType))))

    val daily = Catalog.downloadableFiles(listing, "tasmax", monthly = false).collect()
    assert(daily.length == 3)
    val r3 = daily.filter(_.getAs[String]("memberid") == "r3i1p1f1").head
    assert(r3.getAs[String]("s3_key") ==
      "/ACCESS-CM2/historical/tasmax.ACCESS-CM2.historical.r3i1p1f1.1950-2014.LOCA_16thdeg_v20220413.cent.nc")
    assert(r3.getAs[String]("url").startsWith("https://cirrus.ucsd.edu"))
    assert(r3.getAs[String]("url").endsWith(".nc"))
    assert(r3.getAs[String]("url").contains("LOCA_16thdeg_v20220413"))
    assert(r3.getAs[String]("variable") == "tasmax")

    val monthly = Catalog.downloadableFiles(listing, "tasmax", monthly = true).collect()
    assert(monthly.length == 3)
    assert(monthly.forall(_.getAs[String]("url").contains("monthly")))

    // run_request key shape (loca2_sensor.py:116-134): the dedup run_key
    // is the raw s3_key, the ingest config key gets the "/monthly"
    // namespace prefix for monthly runs and stays raw for daily runs
    val monthlyReqs = Catalog.runRequests(
      Catalog.downloadableFiles(listing, "tasmax", monthly = true), monthly = true)
      .collect()
    assert(monthlyReqs.length == 3)
    monthlyReqs.foreach { r =>
      val runKey = r.getAs[String]("run_key")
      assert(!runKey.startsWith("/monthly/"))
      assert(r.getAs[String]("ingest_key") == "/monthly" + runKey)
      assert(r.getAs[String]("variable") == "tasmax")
    }
    val dailyReqs = Catalog.runRequests(
      Catalog.downloadableFiles(listing, "tasmax", monthly = false), monthly = false)
      .collect()
    assert(dailyReqs.length == 3)
    dailyReqs.foreach(r =>
      assert(r.getAs[String]("ingest_key") == r.getAs[String]("run_key")))
  }

  test("all six sensor wrappers (loca2_sensor.py:166-278) are one parameterization") {
    // The reference ships six @sensor functions — {tasmax, tasmin, pr} ×
    // {daily, monthly} — that all delegate to sensor_implementation with
    // only (variable, monthly) varying. Replay the whole grid through the
    // ONE library path (downloadableFiles → runRequests) and assert each
    // wrapper's observable contract: the variable filter, the
    // daily-vs-monthly filename regex, the tag columns, and the
    // run_key/ingest_key namespace split.
    import org.apache.spark.sql.types._
    val variables = Seq("tasmax", "tasmin", "pr")
    val members = Seq("r1i1p1f1", "r2i1p1f1")
    val rows = for {
      v <- variables; m <- members
      f <- Seq(
        s"$v.ACCESS-CM2.historical.$m.1950-2014.LOCA_16thdeg_v20220413.cent.nc",
        s"$v.ACCESS-CM2.historical.$m.1950-2014.LOCA_16thdeg_v20220413.monthly.cent.nc",
        "index.html")
    } yield ("ACCESS-CM2", "historical", m, f)
    val listing = spark.createDataFrame(
      rows.map { case (a, b, c, d) => org.apache.spark.sql.Row(a, b, c, d) }.asJava,
      StructType(Seq("model", "scenario", "memberid", "filename")
        .map(StructField(_, StringType))))
    for (v <- variables; monthly <- Seq(false, true)) {
      val reqs = Catalog.runRequests(
        Catalog.downloadableFiles(listing, v, monthly = monthly),
        monthly = monthly).collect()
      assert(reqs.length == members.length,
        s"sensor($v, monthly=$monthly) emitted ${reqs.length} requests")
      reqs.foreach { r =>
        assert(r.getAs[String]("variable") == v)
        val runKey = r.getAs[String]("run_key")
        assert(runKey.contains(s"/$v.") &&
          runKey.contains(if (monthly) ".monthly.cent.nc" else ".cent.nc") &&
          (monthly || !runKey.contains(".monthly.")),
          s"sensor($v, monthly=$monthly) leaked key $runKey")
        assert(r.getAs[String]("ingest_key") ==
          (if (monthly) "/monthly" + runKey else runKey))
        assert(r.getAs[String]("model") == "ACCESS-CM2")
        assert(r.getAs[String]("scenario") == "historical")
      }
    }
  }
}
