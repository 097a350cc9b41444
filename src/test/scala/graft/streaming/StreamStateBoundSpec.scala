package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Scale probes for the streaming state-size claims (r7 verdict #6):
  * the 12 streaming APIs were batch-parity tested at toy scale, but the
  * O(open sessions) / O(live users) / O(dedup horizon) STATE bounds —
  * the whole reason these operators survive unbounded input — were
  * asserted only in prose. Here the sf0.1 tables (100k events / 1500
  * users / 5k docs) replay as a time-ordered multi-batch file stream
  * (maxFilesPerTrigger=1, so the watermark advances and eviction
  * actually runs between batches) and the bound is read off
  * `lastProgress.stateOperators.numRowsTotal` — the engine's own state
  * accounting, not an estimate.
  */
class StreamStateBoundSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.1"

  /** Write `df` as `nChunks` single-file parquets in ascending `tsCol`
    * order (chunk i's max ts ≤ chunk i+1's min ts, and file modification
    * times increase with i, which is the file source's default order) so
    * a maxFilesPerTrigger=1 stream sees in-order batches and each batch
    * advances the watermark past the previous one.
    */
  private def chunkedDir(df: DataFrame, tsCol: String, nChunks: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_chunks").toString
    val n = df.count()
    // on a single coalesced partition monotonically_increasing_id IS the
    // 0..n-1 sort rank, which makes the chunk cuts exact
    val seq = df.orderBy(col(tsCol)).coalesce(1)
      .withColumn("_rk", monotonically_increasing_id())
      .localCheckpoint()
    (0 until nChunks).foreach { i =>
      val lo = i * n / nChunks
      val hi = (i + 1) * n / nChunks
      seq.filter(col("_rk") >= lo && col("_rk") < hi).drop("_rk")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  private def stateRows(q: StreamingQuery): Long = {
    val withState = q.recentProgress.filter(_.stateOperators.nonEmpty)
    assert(withState.nonEmpty, "no stateful progress recorded")
    withState.last.stateOperators.map(_.numRowsTotal).sum
  }

  test("sessionWindows state is O(open sessions), not O(all sessions), at sf0.1") {
    val events = graft.sources.Tables.events(spark, sf01)
      .select(col("ts"), col("user_id"))
    val dir = chunkedDir(events, "ts", 20)
    val st = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventPipeline.sessionWindows(st)
      .writeStream.format("memory").queryName("ssb_sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // total sessions by the batch definition (gap > 30 min per user)
      val gapUs = 30L * 60 * 1000000
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"))
      val totalSessions = events
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .agg(sum(when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
          .otherwise(0L)))
        .head().getLong(0)
      val state = stateRows(q)
      val emitted = spark.table("ssb_sessions").count()
      // the watermark (2h) evicted closed sessions as batches advanced:
      // final state holds only sessions near the stream's tail (the last
      // ~1.5-day chunk + 2h horizon), a small fraction of the month
      assert(state > 0 && totalSessions > 1000)
      assert(state < totalSessions / 4,
        s"state $state did not stay bounded vs $totalSessions total sessions")
      // and the evicted sessions were EMITTED, not dropped
      assert(emitted > totalSessions / 2,
        s"only $emitted of ~$totalSessions sessions were finalized")
    } finally q.stop()
  }

  test("cdcCompact state is exactly one row per live key at sf0.1") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf01)
    val dir = chunkedDir(events, "ts", 10)
    val st = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value"))
      .as[EventPipeline.CdcOp]
    val q = EventPipeline.cdcCompact(st)
      .writeStream.format("memory").queryName("ssb_cdc")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val nUsers = events.select(countDistinct(col("user_id"))).head().getLong(0)
      val state = stateRows(q)
      // the O(live keys) claim is exact: one CdcState per user_id,
      // independent of the 100k ops folded through it
      assert(state == nUsers, s"state $state != $nUsers live keys")
    } finally q.stop()
  }

  test("bandIndexStream dedup state is O(watermark horizon), not O(corpus), at sf0.1") {
    val docs = graft.sources.Tables.documents(spark, sf01)
      // 10s per doc: 5000 docs span 50 000 s, ~14× the 1h dedup horizon,
      // so eviction must keep state well under the corpus size
      .withColumn("ingest_ts", timestamp_micros((col("doc_id") + 1) * 10000000L))
    val dir = chunkedDir(docs, "ingest_ts", 25)
    val st = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = CorpusStream.bandIndexStream(st)
      .writeStream.format("memory").queryName("ssb_bandidx")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val nDocs = docs.count()
      val state = stateRows(q)
      // per 200-doc batch the fingerprint horizon holds ≤ (chunk span +
      // 1h) / 10s ≈ 560 keys; assert the order-of-magnitude claim
      assert(state > 0 && state < nDocs / 4,
        s"dedup state $state did not stay bounded vs $nDocs docs")
      // completeness under the honest WithinWatermark semantics: a
      // duplicate is suppressed ONLY if it arrives within the horizon of
      // a previous family member (state may live a little longer — lazy
      // eviction at batch boundaries — never shorter), so
      //   families ≤ indexed ≤ nDocs − (dups within the strict horizon)
      val indexed = spark.sql("SELECT count(DISTINCT doc_id) FROM ssb_bandidx")
        .head().getLong(0)
      val fam = docs
        .select(col("doc_id"), unix_micros(col("ingest_ts")).as("us"),
          md5(graft.functions.TextFns.normalized(col("text"))).as("fp"))
      val families = fam.select(col("fp")).distinct().count()
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("us"))
      val strictWithin = fam
        .withColumn("prev", lag(col("us"), 1).over(wPrev))
        .filter(col("prev").isNotNull &&
          col("us") - col("prev") <= 3600L * 1000000)
        .count()
      assert(indexed >= families && indexed <= nDocs - strictWithin,
        s"indexed $indexed outside [$families, ${nDocs - strictWithin}]")
    } finally q.stop()
  }

  test("wauStream state is exactly one fixed-size HLL per anchor day at sf0.1") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf01)
      .select(col("ts"), col("user_id"))
    val dir = chunkedDir(events, "ts", 20)
    val st = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("2020-01-01")).cast("long").as("day"))
      .as[EventPipeline.DayVisit]
    val q = EventPipeline.wauStream(st)
      .writeStream.format("memory").queryName("ssb_wau")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // the O(calendar)·O(1) claim is exact: one 2^12-register HLL per
      // anchor day (each visit day fans to 7 anchors), NEVER a row per
      // user — state keys == distinct anchor days, independent of the
      // 100k visits / 1500 users folded through them
      val anchorDays = events
        .select(datediff(to_date(col("ts")), lit("2020-01-01"))
          .cast("long").as("day"), col("user_id"))
        .select(explode(sequence(col("day"),
          col("day") + (EventPipeline.WauWindow - 1))).as("anchor"))
        .agg(countDistinct(col("anchor"))).head().getLong(0)
      val dayUserPairs = events
        .select(datediff(to_date(col("ts")), lit("2020-01-01"))
          .cast("long").as("day"), col("user_id"))
        .distinct().count()
      val state = stateRows(q)
      assert(state == anchorDays, s"state $state != $anchorDays anchor days")
      // and the sketch state is far below the exact-distinct alternative
      // (a row per live (window-day, user) pair)
      assert(state < dayUserPairs / 10,
        s"state $state not an order below the $dayUserPairs exact-state rows")
    } finally q.stop()
  }
}
