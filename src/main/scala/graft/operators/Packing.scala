package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.sources.Tables

/** Training-sequence assembly operators — the step between a curated
  * corpus and the tensors a trainer reads: packing documents into
  * fixed-length token sequences and slicing long documents into
  * overlapping context windows. Both are pure integer arithmetic over
  * token counts, so they are bit-identical across engines and across
  * runs — a packing plan that changes between runs would silently
  * re-shuffle every training batch.
  *
  * Scale shape: the packing offset is a GLOBAL running sum, which Spark
  * would naively plan as a single-partition window over the whole
  * corpus. [[qSeqPack]] instead uses the two-pass prefix form (the
  * skyline/deciles trick): per-block token totals (map-side combined,
  * dimension-sized) → exclusive prefix sum over the block frame →
  * broadcast offsets back → block-partitioned running sum. No task ever
  * sees more than one block's rows.
  */
object Packing {

  private val toksSql = TextFns.toksSql

  /** Tokens per packed training sequence. */
  val SeqLen = 512L

  /** Documents per prefix block: at 100 TB this is whatever makes the
    * block frame dimension-sized (e.g. one block per input file — the
    * natural unit, since file order IS the deterministic corpus order).
    */
  val PackBlock = 64L

  /** Concatenate-and-chunk sequence packing: documents in doc_id order
    * are laid end to end on a global token tape and cut every
    * [[SeqLen]] tokens. Emits each document's tape offset, its first and
    * last sequence index, and whether it straddles a cut — the exact
    * assignment a sequence-packing writer executes, and the input to
    * "what fraction of documents are split across training sequences"
    * packing-quality reports.
    */
  def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_toks"),
        expr(s"doc_id div $PackBlock").as("block"))
    val blockTotals = docs.groupBy(col("block"))
      .agg(sum(col("n_toks")).as("block_toks"))
    // exclusive prefix sum over the dimension-sized block frame (an
    // unpartitioned window is safe here: #blocks = #docs / PackBlock)
    val wPrefix = Window.orderBy(col("block"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = blockTotals
      .withColumn("offset", coalesce(sum(col("block_toks")).over(wPrefix), lit(0L)))
      .select(col("block"), col("offset"))
    val wIn = Window.partitionBy(col("block")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(offsets), "block")
      .withColumn("start_off",
        col("offset") + coalesce(sum(col("n_toks")).over(wIn), lit(0L)))
      .withColumn("first_seq", expr(s"start_off div $SeqLen"))
      .withColumn("last_seq", expr(s"(start_off + n_toks - 1) div $SeqLen"))
      .select(col("doc_id"), col("n_toks"), col("start_off"),
        col("first_seq"), col("last_seq"),
        (col("last_seq") > col("first_seq")).as("crosses"))
      .orderBy(col("doc_id"))
  }

  val qSeqPackOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_toks
       |  FROM documents
       |), c AS (
       |  SELECT doc_id, n_toks,
       |    CAST(COALESCE(sum(n_toks) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS start_off
       |  FROM t
       |)
       |SELECT doc_id, n_toks, start_off,
       |  start_off // $SeqLen AS first_seq,
       |  (start_off + n_toks - 1) // $SeqLen AS last_seq,
       |  (start_off + n_toks - 1) // $SeqLen > start_off // $SeqLen AS crosses
       |FROM c
       |ORDER BY doc_id""".stripMargin

  /** Context-window length and stride for document chunking. */
  val ChunkLen = 64L
  val ChunkStride = 48L

  /** Sliding-window document chunking: each document is sliced into
    * [[ChunkLen]]-token windows every [[ChunkStride]] tokens (16-token
    * overlap carries context across cuts) — the long-document side of
    * sequence assembly, where [[qSeqPack]] is the short-document side.
    * Pure per-row explode: no shuffle at all until the final ORDER BY,
    * so at 100 TB this is one scan emitting ~n_toks/stride rows per
    * document.
    */
  def qDocChunk(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_chunks",
        when(col("n_toks") <= ChunkLen, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(n_toks - $ChunkLen + ${ChunkStride - 1}) div $ChunkStride")))
    docs
      .select(col("doc_id"), col("toks"), col("n_toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * ChunkStride)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        least(lit(ChunkLen), col("n_toks") - col("start_tok")).as("chunk_toks"),
        element_at(col("toks"), (col("start_tok") + 1).cast("int")).as("first_tok"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val qDocChunkOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, $toksSql AS toks
       |  FROM documents
       |), n AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n_toks,
       |    CASE WHEN CAST(len(toks) AS BIGINT) <= $ChunkLen THEN 1
       |         ELSE 1 + (CAST(len(toks) AS BIGINT) - $ChunkLen + ${ChunkStride - 1})
       |                   // $ChunkStride END AS n_chunks
       |  FROM t
       |)
       |SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
       |  CAST(u.i * $ChunkStride AS BIGINT) AS start_tok,
       |  least($ChunkLen, n_toks - u.i * $ChunkStride) AS chunk_toks,
       |  toks[CAST(u.i * $ChunkStride + 1 AS INTEGER)] AS first_tok
       |FROM n, unnest(range(0, n_chunks)) AS u(i)
       |ORDER BY doc_id, chunk_idx""".stripMargin
}
