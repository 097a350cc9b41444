package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.operators.Curation
import graft.sources.{CloudOptimize, Interchange, Tables}

/** The end-to-end curation run a user of this library actually executes:
  * raw documents → exact-dedup keepers → PII scrub → quality filter →
  * deterministic train/val/test split → cloud-optimized parquet (+ JSONL
  * for downstream tokenizers). Every stage is one of the library's
  * oracle-gated primitives composed into ONE lazy plan — one fingerprint
  * aggregation + semi-join, scan-side everything else, then each write's
  * range repartition. The curated frame feeds two sinks (parquet + JSONL),
  * so it is persisted across them: the corpus is scanned and curated once,
  * both writes read the cached partitions. Nothing is collected; the
  * returned counts are aggregate scalars read back from the written
  * output (one metadata-cheap job), so the pipeline itself is 100
  * TB-shaped end to end.
  */
object CuratePipeline {

  case class Summary(nInput: Long, nWritten: Long, bySplit: Map[String, Long])

  def run(spark: SparkSession, dir: String, outDir: String): Summary = {
    val docs = Tables.documents(spark, dir)
    // keep one document per normalized-text fingerprint (first writer wins)
    val keepers = docs
      .select(md5(TextFns.normalized(col("text"))).as("fp"), col("doc_id"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val curated = Curation
      .withQuality(
        docs.join(keepers, Seq("doc_id"), "left_semi")
          .withColumn("text",
            regexp_replace(col("text"), Curation.EmailRe, "<EMAIL>")))
      .filter(col("keep"))
      .withColumn("split", Curation.splitCol)
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        col("n_tokens"), round(col("score"), 4).as("quality_score"), col("split"))
      .persist()
    try {
      CloudOptimize.write(curated, s"$outDir/corpus",
        partitionCols = Seq("split"), sortCols = Seq("doc_id"))
      Interchange.writeJsonl(curated, s"$outDir/jsonl", partitionCols = Seq("split"))
    } finally curated.unpersist()
    // explicit schema: an all-filtered (empty) corpus writes no data
    // files, and schema inference on the bare directory would throw
    val written = spark.read.schema(curated.schema).parquet(s"$outDir/corpus")
    val bySplit = written.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Summary(docs.count(), bySplit.values.sum, bySplit)
  }
}
