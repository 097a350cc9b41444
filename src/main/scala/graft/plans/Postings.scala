package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.row_number

/** Deterministic per-block bound for inverted-index posting lists.
  *
  * Every blocked candidate generator in the engine (containment index,
  * fuzzy title bands, eval-overlap train index) shares one hazard: a
  * popular block key — a boilerplate shingle, a stop-word first token —
  * collects a posting list whose length grows LINEARLY with the corpus,
  * so the candidate join over it emits a row count that grows
  * QUADRATICALLY. The r10/r11 scaling curves measured exactly this
  * (α 1.27 containment, 1.56→1.17 fuzzy) until each site independently
  * hand-rolled the same fix: keep only a block's `cap` smallest ids
  * (row_number over the block key, ordered by id), turning per-block
  * work from |block|² into cap·|block| — total candidate work linear in
  * the corpus BY CONSTRUCTION, at any scale.
  *
  * The cap is deterministic (smallest ids win, ties impossible on a key
  * column), so it can be — and at every call site MUST be — mirrored in
  * the DuckDB oracle with the equivalent
  * `QUALIFY row_number() OVER (PARTITION BY block ORDER BY id) <= cap`,
  * keeping hash parity exact even when the cap binds. [[cappedSql]]
  * renders that mirror so the two sides cannot drift.
  */
object Postings {

  /** Keep only the `cap` smallest `idCol` rows of each block, where a
    * block is one combination of `blockKeys`. Deterministic: ordering is
    * by id, and the helper is only sound when (blockKeys, idCol) pairs
    * are unique in `df` (true for every inverted index — one posting per
    * (key, doc)).
    */
  def capped(df: DataFrame, cap: Int, idCol: Column, blockKeys: Column*): DataFrame =
    df.withColumn("__post_rn", row_number().over(
        Window.partitionBy(blockKeys: _*).orderBy(idCol)))
      .filter(org.apache.spark.sql.functions.col("__post_rn") <= cap)
      .drop("__post_rn")

  /** The oracle-side mirror: a QUALIFY clause to append inside the
    * subquery that builds the posting list.
    */
  def cappedSql(cap: Int, idCol: String, blockKeys: String*): String =
    s"QUALIFY row_number() OVER (PARTITION BY ${blockKeys.mkString(", ")} " +
      s"ORDER BY $idCol) <= $cap"
}
