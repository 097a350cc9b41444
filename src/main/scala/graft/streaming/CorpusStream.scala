package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Curation

/** Streaming corpus curation — the continuous-ingest mirror of the batch
  * [[graft.operators.Curation]] path. A training corpus at 100 TB is not
  * re-scored from scratch per crawl drop: new documents arrive as a
  * stream, get quality-scored scan-side in the micro-batch (the same
  * Column expressions as the batch query — parity by construction), and
  * exact duplicates are suppressed with watermark-bounded state.
  */
object CorpusStream {

  /** Quality-curate a streaming documents frame: score with the shared
    * classifier projection and keep only passing rows. Stateless — every
    * micro-batch is one codegen'd map, so this scales with input rate,
    * not corpus size.
    */
  def curated(docs: DataFrame): DataFrame =
    Curation.withQuality(docs)
      .filter(col("keep"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        round(col("score"), 4).as("quality_score"))

  /** Watermarked streaming exact-dedup: fingerprint on the normalized
    * text, keep the first arrival, evict fingerprint state once the
    * watermark passes — state is bounded by the duplicate-arrival
    * horizon (same contract as EventPipeline.dedupedStream), never the
    * stream length.
    */
  def dedupedStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", md5(TextFns.normalized(col("text"))))
      .withWatermark("ingest_ts", horizon)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Batch-equivalent entry used by tests: stream the documents parquet
    * through a file source, stamping a deterministic per-document ingest
    * time (content-addressed, like everything in Curation) so watermark
    * semantics are reproducible.
    */
  def streamDocumentsFrom(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .withColumn("ingest_ts", timestamp_micros(col("doc_id") * 1000000L))
  }
}
