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
  def qSeqPack(s: SparkSession, dir: String): DataFrame =
    packOffsets(Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_toks")))
      .orderBy(col("doc_id"))

  /** Frame-form packing plan behind [[qSeqPack]] and the pipeline's
    * manifest sink: (doc_id, n_toks) → each document's tape offset and
    * sequence span under [[SeqLen]]-token packing in doc_id order.
    */
  def packOffsets(docCounts: DataFrame): DataFrame = {
    val docs = docCounts
      .withColumn("block", expr(s"doc_id div $PackBlock"))
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

  /** Candidate context lengths for the packing-efficiency audit. */
  val PackLens = Seq(128L, 512L, 2048L)

  /** Packing-efficiency audit: for each candidate context length, the
    * three numbers that decide how a trainer should consume this corpus
    * — pad waste under naive one-doc-per-sequence batching
    * (Σ ceil(n/L)·L vs Σ n), the sequence count under concatenated
    * packing (ceil(Σn / L), [[qSeqPack]]'s layout, waste ≈ 0 by
    * construction), and the token share retained if every document is
    * truncated to one sequence (Σ min(n, L) / Σ n). The choice of L is
    * a real training cost lever: too small truncates long documents,
    * too large pads short ones — this query IS the decision table.
    * Shape: the corpus scans ONCE; each doc's token count fans out to
    * |PackLens| literal rows scan-side, and one map-side-combined agg
    * produces the 3-row report. All arithmetic is exact int64; the two
    * ratios are single IEEE divisions rounded at 6.
    */
  def qPackingEfficiency(s: SparkSession, dir: String): DataFrame = {
    val lens = array(PackLens.map(lit): _*)
    Tables.documents(s, dir)
      .select(size(TextFns.tokens(col("text"))).cast("long").as("n_toks"))
      .select(col("n_toks"), explode(lens).as("ctx_len"))
      .groupBy(col("ctx_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_toks"),
        sum(expr("(n_toks + ctx_len - 1) div ctx_len")).as("padded_seqs"),
        sum(expr("(n_toks + ctx_len - 1) div ctx_len") * col("ctx_len") - col("n_toks"))
          .as("pad_toks"),
        sum(least(col("n_toks"), col("ctx_len"))).as("kept_if_trunc"))
      .select(col("ctx_len"), col("n_docs"), col("total_toks"), col("padded_seqs"),
        expr("(total_toks + ctx_len - 1) div ctx_len").as("packed_seqs"),
        round(col("pad_toks") / (col("padded_seqs") * col("ctx_len")).cast("double"), 6)
          .as("pad_waste"),
        round(col("kept_if_trunc") / col("total_toks").cast("double"), 6)
          .as("trunc_retained"))
      .orderBy(col("ctx_len"))
  }

  val qPackingEfficiencyOracle: String =
    s"""WITH d AS (
       |  SELECT CAST(len($toksSql) AS BIGINT) AS n_toks FROM documents
       |),
       |x AS (
       |  SELECT n_toks, CAST(u.l AS BIGINT) AS ctx_len
       |  FROM d, unnest([${PackLens.mkString(", ")}]) AS u(l)
       |),
       |a AS (
       |  SELECT ctx_len, count(*) AS n_docs,
       |    CAST(sum(n_toks) AS BIGINT) AS total_toks,
       |    CAST(sum((n_toks + ctx_len - 1) // ctx_len) AS BIGINT) AS padded_seqs,
       |    CAST(sum((n_toks + ctx_len - 1) // ctx_len * ctx_len - n_toks) AS BIGINT)
       |      AS pad_toks,
       |    CAST(sum(least(n_toks, ctx_len)) AS BIGINT) AS kept_if_trunc
       |  FROM x GROUP BY ctx_len
       |)
       |SELECT ctx_len, n_docs, total_toks, padded_seqs,
       |  (total_toks + ctx_len - 1) // ctx_len AS packed_seqs,
       |  round(pad_toks / CAST(padded_seqs * ctx_len AS DOUBLE), 6) AS pad_waste,
       |  round(kept_if_trunc / CAST(total_toks AS DOUBLE), 6) AS trunc_retained
       |FROM a
       |ORDER BY ctx_len""".stripMargin

  /** Span-corruption geometry: stanza width, masked-span length, and the
    * offset range (width − span) that keeps every span inside its
    * stanza. 3/20 ⇒ the canonical ~15% corruption rate.
    */
  val StanzaLen = 20L
  val SpanLen = 3L

  /** T5-style span-corruption mask accounting: the corpus token tape is
    * cut into [[StanzaLen]]-token stanzas per document; each stanza
    * masks ONE [[SpanLen]]-token span at a content-addressed offset
    * (md5 of doc_id:stanza — the same determinism contract as the
    * split/sample family: re-running the pipeline reproduces the exact
    * mask, so a resumed training run sees the same data). Emits per doc
    * the masked-token count, the sentinel (span) count, and the
    * realized corruption ratio — what the objective actually sees, ~15%
    * by construction but lower on short tails (a span is clipped when
    * the last partial stanza is shorter than offset+span). Pure
    * scan-side integer arithmetic: stanza fan-out via sequence+explode,
    * one doc-keyed map-side-combined agg, no joins.
    */
  def qSpanCorrupt(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(TextFns.tokens(col("text"))).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    docs
      .select(col("doc_id"), col("n_toks"),
        explode(sequence(lit(0L), expr(s"(n_toks - 1) div $StanzaLen"))).as("stanza"))
      .withColumn("off",
        TextFns.hash28(concat(col("doc_id"), lit(":"), col("stanza")))
          % (StanzaLen - SpanLen))
      .withColumn("span_start", col("stanza") * StanzaLen + col("off"))
      .withColumn("masked",
        greatest(lit(0L),
          least(col("span_start") + SpanLen, col("n_toks")) - col("span_start")))
      .groupBy(col("doc_id"))
      .agg(max(col("n_toks")).as("n_toks"),
        sum(col("masked")).as("n_masked"),
        sum(when(col("masked") > 0, 1L).otherwise(0L)).as("n_spans"))
      .select(col("doc_id"), col("n_toks"), col("n_masked"), col("n_spans"),
        round(col("n_masked") / col("n_toks").cast("double"), 6).as("mask_ratio"))
      .orderBy(col("doc_id"))
  }

  val qSpanCorruptOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_toks
       |  FROM documents
       |  WHERE len($toksSql) > 0
       |),
       |st AS (
       |  SELECT doc_id, n_toks, CAST(u.i AS BIGINT) AS stanza
       |  FROM d, unnest(range(0, (n_toks - 1) // $StanzaLen + 1)) AS u(i)
       |),
       |m AS (
       |  SELECT doc_id, n_toks,
       |    greatest(0, least(stanza * $StanzaLen
       |        + ${TextFns.hash28Sql("doc_id || ':' || stanza")}
       |          % ${StanzaLen - SpanLen} + $SpanLen, n_toks)
       |      - (stanza * $StanzaLen
       |        + ${TextFns.hash28Sql("doc_id || ':' || stanza")}
       |          % ${StanzaLen - SpanLen})) AS masked
       |  FROM st
       |)
       |SELECT doc_id, max(n_toks) AS n_toks,
       |  CAST(sum(masked) AS BIGINT) AS n_masked,
       |  CAST(sum(CASE WHEN masked > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
       |  round(sum(masked) / CAST(max(n_toks) AS DOUBLE), 6) AS mask_ratio
       |FROM m GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
}
