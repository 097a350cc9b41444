package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.{Curation, Packing, TextAnalysis}
import graft.sources.{CloudOptimize, Interchange, Tables}

/** The end-to-end curation run a user of this library actually executes:
  * raw documents → exact-dedup keepers → PII scrub → quality filter →
  * CCNet-style perplexity tail-drop (the corpus's own bigram LM scores
  * every survivor; the worst third is cut) → deterministic
  * train/val/test split → cloud-optimized parquet (+ JSONL for
  * downstream tokenizers, + the sequence-packing manifest a trainer
  * consumes). Every stage is one of the library's oracle-gated
  * primitives composed lazily — one fingerprint aggregation + semi-join,
  * one LM pass over the persisted curated frame, scan-side everything
  * else, then each write's range repartition. The curated frame feeds
  * the LM and three sinks, so it is persisted once: the corpus is
  * scanned and curated once, everything downstream reads the cached
  * partitions. Nothing is collected; the returned counts are aggregate
  * scalars read back from the written output (one metadata-cheap job),
  * so the pipeline itself is 100 TB-shaped end to end.
  */
object CuratePipeline {

  case class Summary(nInput: Long, nWritten: Long, bySplit: Map[String, Long],
      nTailDropped: Long, nSequences: Long)

  /** The dedup→scrub→quality→split stage as one lazy frame — extracted
    * so the sf1 harness ([[graft.dev.Sf1Pipeline]]) can PlanReport-audit
    * the exact plan [[run]] executes.
    */
  private[graft] def curatedFrame(spark: SparkSession, dir: String) = {
    val docs = Tables.documents(spark, dir)
    // keep one document per normalized-text fingerprint (first writer wins)
    val keepers = docs
      .select(md5(TextFns.normalized(col("text"))).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    Curation
      .withQuality(
        docs.join(keepers, Seq("doc_id"), "left_semi")
          .withColumn("text",
            regexp_replace(col("text"), Curation.EmailRe, "<EMAIL>")))
      .filter(col("keep"))
      .withColumn("split", Curation.splitCol)
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("n_tokens"), round(col("score"), 4).as("quality_score"), col("split"))
  }

  def run(spark: SparkSession, dir: String, outDir: String): Summary = {
    val docs = Tables.documents(spark, dir)
    val curated = curatedFrame(spark, dir).persist()
    try {
      // perplexity tail-drop: the LM is built on the CURATED corpus
      // (post-dedup — duplicate mass would otherwise dominate the
      // model), scores read the persisted frame, and only doc_ids
      // travel through the anti-join. Unscorable docs (< 2 tokens)
      // have no perplexity and are kept.
      val scored = TextAnalysis.bigramScores(curated)
        .localCheckpoint() // bucket cells + tail filter both read it
      val tailIds = scored
        .join(broadcast(TextAnalysis.pplBuckets(scored)), Seq("avg_logp"))
        .filter(col("bucket") === "tail")
        .select(col("doc_id"))
      val kept = curated.join(tailIds, Seq("doc_id"), "left_anti").persist()
      val nTail = try {
        CloudOptimize.write(kept, s"$outDir/corpus",
          partitionCols = Seq("split"), sortCols = Seq("doc_id"))
        Interchange.writeJsonl(kept, s"$outDir/jsonl", partitionCols = Seq("split"))
        // the trainer-facing packing manifest over the kept corpus
        CloudOptimize.write(
          Packing.packOffsets(kept.select(col("doc_id"),
            col("n_tokens").cast("long").as("n_toks"))),
          s"$outDir/pack_manifest", partitionCols = Seq(), sortCols = Seq("doc_id"))
        tailIds.count()
      } finally kept.unpersist()
      // explicit schema: an all-filtered (empty) corpus writes no data
      // files, and schema inference on the bare directory would throw
      val written = spark.read.schema(curated.schema).parquet(s"$outDir/corpus")
      val bySplit = written.groupBy(col("split")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val manifestSchema = Packing.packOffsets(
        curated.select(col("doc_id"), col("n_tokens").cast("long").as("n_toks"))).schema
      val nSeqs = spark.read.schema(manifestSchema)
        .parquet(s"$outDir/pack_manifest")
        .agg(coalesce(max(col("last_seq")) + 1, lit(0L))).collect()(0).getLong(0)
      Summary(docs.count(), bySplit.values.sum, bySplit, nTail, nSeqs)
    } finally curated.unpersist()
  }
}
