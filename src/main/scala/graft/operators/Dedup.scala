package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NumFns, TextFns}
import graft.sources.Tables

/** Deduplication operators (SURVEY.md §2, table 3).
  *
  * Scale design: none of these is O(n²) over the corpus.
  *  - exact: map-side-combined hash aggregate on a 128-bit fingerprint —
  *    the shuffle carries (fingerprint, id) pairs, not documents.
  *  - n-gram Jaccard: candidate pairs are generated per min-shingle-hash
  *    bucket (1-permutation MinHash blocking), so only documents that
  *    agree on their minimum shingle hash are ever compared.
  *  - MinHash LSH: 32 permutations, 8 bands × 4 rows; the shuffle carries
  *    (band, band_key, id) triples and pairs explode only within a bucket.
  *  - SimHash: one 64-bit fingerprint per document via explode + 60
  *    bit-bucket sums — a single aggregation, hamming-band joins downstream.
  *
  * All hash math is md5-prefix based so the DuckDB oracles reproduce it
  * bit-for-bit (see TextFns).
  */
object Dedup {

  private val P = TextFns.MinHashPrime

  /** Opening tokens hashed for [[qDedupPrefix]] (and the
    * q_bloom_decontaminate contamination key). Declared FIRST in this
    * object: `Dedup.scala:694` touches `Curation` during init, and
    * Curation's oracle strings interpolate this constant back — a
    * forward-declared val would still be 0 when that cycle re-enters
    * (the exact bug that shipped a `t[1:0]` slice into an oracle).
    */
  val PrefixTokens = 10

  val NumPerms = 32
  val NumBands = 8
  val RowsPerBand = 4
  val JaccardThreshold = 0.5

  private val toksSql = TextFns.toksSql
  private val shinglesSql =
    "list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
  private def hash28Sql(x: String) = TextFns.hash28Sql(x)
  private def hash60Sql(x: String) = TextFns.hash60Sql(x)

  /** documents → (doc_id, hs) distinct 28-bit-hashed 3-shingle sets.
    * Everything downstream (blocking, LSH, Jaccard verification) works
    * over the hashed sets: an 8-byte long per shingle instead of a ~25
    * byte string shrinks every corpus shuffle ~5-8× and makes set
    * intersection primitive-typed. Jaccard over the hashed sets is the
    * engine's similarity definition (identical on both engines — the
    * oracle hashes the same way — and within ~1e-4 of string Jaccard:
    * a 28-bit collision inside one pair's union is ~|union|²/2²⁹).
    *
    * Materialized once per query (localCheckpoint): every dedup query
    * references this table 2-3 times (self-join sides, signature +
    * verification), and without materialization each reference re-runs
    * tokenize→shingle→md5 over the corpus — the single most expensive
    * stage. The 100 TB form of the same decision is persisting the
    * fingerprint table before the pair-generation stages.
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(TextFns.shingles(col("t")), TextFns.hash28(_))).as("hs"))
      .localCheckpoint()

  private val shingledSql =
    s"""t AS (SELECT doc_id, $toksSql AS t FROM documents),
       |s0 AS (SELECT doc_id, $shinglesSql AS sh FROM t WHERE len(t) >= 3),
       |s AS (SELECT doc_id, list_distinct(list_transform(sh, x -> ${hash28Sql("x")})) AS hs FROM s0)""".stripMargin

  /** Streaming-safe LSH index rows — (doc_id, band, bkey) — of ANY
    * documents frame (batch or micro-batch): the shared shingle→
    * minhash_sigs→band pipeline WITHOUT the batch localCheckpoint, so
    * a continuous ingest can append directly to the persisted band
    * index that [[qIncrementalMinhash]] probes. One scan-side
    * projection per row; no state, no shuffle.
    */
  def bandIndexOf(docs: DataFrame): DataFrame =
    bandFrame(docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        array_distinct(transform(TextFns.shingles(col("t")), TextFns.hash28(_))).as("hs")))

  private def jaccardOut: Column =
    round(TextFns.jaccard(col("hs_a"), col("hs_b")), 6)

  private val jaccardOutSql =
    "round(len(list_intersect(x.hs, y.hs))::DOUBLE / len(list_distinct(list_concat(x.hs, y.hs))), 6)"

  /** Exact dedup: md5 of whitespace-canonicalized text, first-writer-wins. */
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(TextFns.normalized(col("text"))).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("fingerprint"))

  val qDedupExactOracle: String =
    """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  min(doc_id) AS keeper_id,
      |  count(*) AS n_copies
      |FROM documents
      |GROUP BY fingerprint
      |ORDER BY fingerprint""".stripMargin

  /** 3-gram Jaccard near-dup pairs, blocked on the (min, max) hashed
    * shingle pair — a two-constraint MinHash-style block. Selectivity is
    * ~j² for background pairs (hundreds of candidates out of 12.5M
    * possible at sf0.1) while ≥0.8-Jaccard pairs agree on both extremes
    * with ~93% probability.
    */
  def qDedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    jaccardPairs(s, dir).orderBy(col("doc_a"), col("doc_b"))

  /** (doc_a, doc_b, jaccard) near-dup pairs above [[JaccardThreshold]],
    * unordered — shared edge set for the pair query, the cluster
    * operator, and the decontamination check in [[Curation]].
    */
  private[operators] def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    jaccardPairsOf(shingled(s, dir))

  /** As [[jaccardPairs]], over an ALREADY-SHINGLED `(doc_id, hs)` frame —
    * r12 (guide §1.2): callers that also consume the shingle table
    * directly (q_minhash_recall, q_minhash_est) pass their own
    * checkpointed frame so the tokenize→shingle→md5 pipeline (the most
    * expensive stage) runs ONCE per query instead of once per call.
    */
  private[operators] def jaccardPairsOf(sh: DataFrame): DataFrame = {
    val blocked = sh
      .withColumn("mn", array_min(col("hs")))
      .withColumn("mx", array_max(col("hs")))
    val a = blocked.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"), col("mn"), col("mx"))
    val b = blocked.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"), col("mn"), col("mx"))
    // shuffle_hash, never broadcast: the build side is the whole derived
    // corpus — broadcasting it would evaluate the shingle pipeline
    // single-threaded on the driver (and is impossible at 100 TB anyway)
    val pairs = a.join(b.hint("shuffle_hash"), Seq("mn", "mx"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccardOut.as("jaccard"))
    graft.plans.Fence.filterNoPushdown(pairs, col("jaccard"), _ >= JaccardThreshold)
  }

  /** Oracle CTE producing `pj(doc_a, doc_b, jaccard)` — the SQL twin of
    * [[jaccardPairs]], shared with the decontamination oracle.
    */
  private[operators] val jaccardPairsCte: String =
    s"""$shingledSql,
       |jb AS (
       |  SELECT doc_id, hs, list_min(hs) AS mn, list_max(hs) AS mx
       |  FROM s
       |),
       |pj AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, $jaccardOutSql AS jaccard
       |  FROM jb x JOIN jb y ON x.mn = y.mn AND x.mx = y.mx AND x.doc_id < y.doc_id
       |  WHERE $jaccardOutSql >= $JaccardThreshold
       |)""".stripMargin

  val qDedupNgramJaccardOracle: String =
    s"""WITH $shingledSql,
       |b AS (
       |  SELECT doc_id, hs, list_min(hs) AS mn, list_max(hs) AS mx
       |  FROM s
       |)
       |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, $jaccardOutSql AS jaccard
       |FROM b x JOIN b y ON x.mn = y.mn AND x.mx = y.mx AND x.doc_id < y.doc_id
       |WHERE $jaccardOutSql >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** MinHash + LSH: 32-permutation signatures, 8 bands of 4 — candidate
    * pairs from band-bucket equality, then exact Jaccard verification.
    * Signatures are computed scan-side in one pass; the band join shuffles
    * (band, key, doc_id) only, and shingle sets are re-joined by id for
    * verification (never carried through the band explode).
    */
  /** LSH band frame of a shingle-set frame `(doc_id, hs)`: one row per
    * (doc_id, band, band-key). The signature bank is the native one-pass
    * `minhash_sigs` (vs 32 array_min(transform(...)) columns = 32
    * traversals + allocations per row); band keys are md5 over each
    * band's signature rows. This is the frame a 100 TB corpus PERSISTS
    * as its near-dup index — [[qIncrementalMinhash]] probes it.
    */
  private def bandFrame(base: DataFrame): DataFrame = {
    val sigs = base.select(col("doc_id"),
      expr(s"minhash_sigs(hs, $NumPerms)").as("sigs"))
    val bandStructs = (0 until NumBands).map { bnd =>
      struct(
        lit(bnd).as("band"),
        md5(concat_ws("-", (0 until RowsPerBand)
          .map(r => element_at(col("sigs"), RowsPerBand * bnd + r + 1)): _*)).as("bkey"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  def qDedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val base = shingled(s, dir)
    val bands = bandFrame(base)
    val cand = bands.as("a")
      .join(bands.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val verified = cand
      .join(base.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")).hint("shuffle_hash"), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")).hint("shuffle_hash"), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccardOut.as("jaccard"))
    graft.plans.Fence.filterNoPushdown(verified, col("jaccard"), _ >= JaccardThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle CTE chain `m, bands, cand` over an existing `s(doc_id, hs)`
    * — the SQL twin of [[bandFrame]] + the band self-join, shared by the
    * minhash dedup oracle and the recall-eval oracle (splice, never
    * copy).
    */
  private val minhashCandCteSql: String = {
    val ms = (0 until NumPerms).map { j =>
      val a = 2L * j + 3L
      val b = 101L * j + 7L
      s"list_min(list_transform(hs, hh -> ($a * hh + $b) % $P)) AS m$j"
    }.mkString(",\n    ")
    val bandSelects = (0 until NumBands).map { bnd =>
      val key = (0 until RowsPerBand)
        .map(r => s"CAST(m${RowsPerBand * bnd + r} AS VARCHAR)")
        .mkString(" || '-' || ")
      s"SELECT doc_id, $bnd AS band, md5($key) AS bkey FROM m"
    }.mkString("\n  UNION ALL\n  ")
    s"""m AS (
       |  SELECT doc_id,
       |    $ms
       |  FROM s
       |),
       |bands AS (
       |  $bandSelects
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |)""".stripMargin
  }

  val qDedupMinhashOracle: String =
    s"""WITH $shingledSql,
       |$minhashCandCteSql
       |SELECT doc_a, doc_b, $jaccardOutSql AS jaccard
       |FROM cand
       |JOIN s x ON x.doc_id = doc_a
       |JOIN s y ON y.doc_id = doc_b
       |WHERE $jaccardOutSql >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Measured precision/recall of the MinHash-LSH candidate generator
    * against the exact-Jaccard truth — the dedup counterpart of
    * q_ann_recall: q_lsh_tune PREDICTS the S-curve from the similarity
    * histogram, this op MEASURES what the deployed 8×4 band config
    * actually catches. Precision = candidates that verify at the
    * Jaccard threshold / all candidates (the wasted-verification rate);
    * recall = verified candidates ∩ blocked-exact truth / truth (what
    * the bands miss). Shape: both sides reuse the audited index frames
    * — the band self-join and the (mn, mx)-blocked exact pair set —
    * and the eval itself is two key-joins + a one-row count aggregate;
    * nothing new shuffles at corpus scale. All counts exact integers.
    */
  def qMinhashRecall(s: SparkSession, dir: String): DataFrame = {
    // r12: one shingle run feeds bands, verification AND the truth set
    // (was two — see [[jaccardPairsOf]]); shingled() already checkpoints
    val base = shingled(s, dir)
    val bands = bandFrame(base)
    val cand = bands.as("a")
      .join(bands.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val verified = cand
      .join(base.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
        .hint("shuffle_hash"), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
        .hint("shuffle_hash"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (jaccardOut >= JaccardThreshold).as("is_true"))
    val truth = jaccardPairsOf(base)
      .select(col("doc_a"), col("doc_b"), lit(1L).as("in_truth"))
      // feeds the hit join AND n_truth: one pair-join run, not two
      .localCheckpoint()
    val joined = verified.join(truth.hint("shuffle_hash"),
      Seq("doc_a", "doc_b"), "left")
    val candAgg = joined.agg(
      count(lit(1)).as("n_cand"),
      sum(col("is_true").cast("long")).as("n_verified"),
      sum(when(col("in_truth").isNotNull, 1L).otherwise(0L)).as("n_hits"))
    val truthAgg = truth.agg(count(lit(1)).as("n_truth"))
    candAgg.crossJoin(broadcast(truthAgg))
      .select(col("n_truth"), col("n_cand"), col("n_verified"), col("n_hits"),
        NumFns.roundPortable(
          col("n_verified").cast("double") / col("n_cand"), 6).as("precision"),
        NumFns.roundPortable(
          col("n_hits").cast("double") / col("n_truth"), 6).as("recall"))
  }

  val qMinhashRecallOracle: String =
    s"""WITH $shingledSql,
       |$minhashCandCteSql,
       |jb AS (
       |  SELECT doc_id, hs, list_min(hs) AS mn, list_max(hs) AS mx
       |  FROM s
       |),
       |pj AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM jb x JOIN jb y ON x.mn = y.mn AND x.mx = y.mx
       |    AND x.doc_id < y.doc_id
       |  WHERE $jaccardOutSql >= $JaccardThreshold
       |),
       |v AS (
       |  SELECT cand.doc_a, cand.doc_b,
       |    ($jaccardOutSql >= $JaccardThreshold) AS is_true
       |  FROM cand
       |  JOIN s x ON x.doc_id = cand.doc_a
       |  JOIN s y ON y.doc_id = cand.doc_b
       |),
       |ca AS (
       |  SELECT count(*) AS n_cand,
       |    CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_verified,
       |    CAST(sum(CASE WHEN pj.doc_a IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_hits
       |  FROM v LEFT JOIN pj ON pj.doc_a = v.doc_a AND pj.doc_b = v.doc_b
       |),
       |ta AS (SELECT count(*) AS n_truth FROM pj)
       |SELECT n_truth, n_cand, n_verified, n_hits,
       |  ${NumFns.roundPortableSql("CAST(n_verified AS DOUBLE) / n_cand", 6)}
       |    AS precision,
       |  ${NumFns.roundPortableSql("CAST(n_hits AS DOUBLE) / n_truth", 6)}
       |    AS recall
       |FROM ca, ta""".stripMargin

  val ContainmentThreshold = 0.8

  /** Deterministic per-hash index-block bound for containment blocking:
    * a block (one shingle hash's posting list) keeps only the
    * [[ContainmentBlockCap]] smallest doc ids. One popular (boilerplate)
    * shingle otherwise makes a hot block whose candidate count grows
    * quadratically with corpus size — the r10 scaling curve measured
    * α=1.27 on the uncapped plan. The cap is the [[graft.operators
    * .Graph.CoreMaxFanout]] discipline applied to the inverted index,
    * and it is MIRRORED in the oracle (row_number over doc_b), so
    * parity is exact even when it binds.
    */
  val ContainmentBlockCap = 1024

  /** Containment near-dup (|A∩B| / |A|): catches a document that is a
    * subset/quote of a longer one even when symmetric Jaccard is low.
    * Candidates come from an inverted index on A's MINIMUM shingle hash:
    * if A ⊆ B then min(A) ∈ B, so recall is exact for FULL containment
    * (true subsets) while the block stays un-hot. Pairs with partial
    * containment in [threshold, 1) are found best-effort — they are
    * missed iff A's single minimum shingle happens to be absent from
    * B's kept block (blocking on several of A's smallest hashes would
    * tighten recall at proportional index cost). The oracle shares the
    * same blocking scheme AND the same [[ContainmentBlockCap]], so
    * parity holds exactly.
    *
    * Scale shape (r11): ONLY bare longs ride the candidate shuffle —
    * the index side is (hash, doc_b) pairs capped per hash, and the
    * probe side is (mn, doc_a); BOTH shingle sets re-join by id for the
    * surviving candidates (the minhash trick). The previous plan
    * carried A's full shingle ARRAY through the candidate join, which
    * multiplied the hot-block skew by the payload width. shuffle_hash
    * everywhere for the usual derived-corpus reason.
    */
  def qMinhashContainment(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val probe = sh.select(col("doc_id").as("doc_a"),
      array_min(col("hs")).as("mn"))
    val index = graft.plans.Postings.capped(
        sh.select(col("doc_id").as("doc_b"), explode(col("hs")).as("h")),
        ContainmentBlockCap, col("doc_b"), col("h"))
      .select(col("doc_b"), col("h"))
    val cands = probe
      .join(index.hint("shuffle_hash"),
        col("mn") === col("h") && col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val pairs = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
        .hint("shuffle_hash"), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
        .hint("shuffle_hash"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("hs_a"), col("hs_b"))).cast("double")
          / size(col("hs_a")), 6).as("containment"))
    graft.plans.Fence.filterNoPushdown(pairs, col("containment"),
        _ >= ContainmentThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qMinhashContainmentOracle: String =
    s"""WITH $shingledSql,
       |probe AS (SELECT doc_id AS doc_a, list_min(hs) AS mn FROM s),
       |idx AS (
       |  SELECT doc_b, h FROM (SELECT doc_id AS doc_b, unnest(hs) AS h FROM s)
       |  ${graft.plans.Postings.cappedSql(ContainmentBlockCap, "doc_b", "h")}
       |),
       |cand AS (
       |  SELECT doc_a, doc_b FROM probe JOIN idx ON mn = h AND doc_a != doc_b
       |)
       |SELECT doc_a, doc_b,
       |  round(len(list_intersect(sa.hs, sb.hs))::DOUBLE / len(sa.hs), 6)
       |    AS containment
       |FROM cand
       |JOIN s sa ON cand.doc_a = sa.doc_id
       |JOIN s sb ON cand.doc_b = sb.doc_id
       |WHERE round(len(list_intersect(sa.hs, sb.hs))::DOUBLE / len(sa.hs), 6)
       |  >= $ContainmentThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Near-dup clusters: connected components over the Jaccard near-dup
    * graph, labeling every document with the minimum doc_id reachable
    * through near-dup edges (its canonical representative — "keep one
    * doc per cluster" is the downstream dedup action). Pregel-style
    * min-label propagation: each round joins current labels to the edge
    * list and takes the per-node min, converging in O(graph diameter)
    * rounds — near-dup components are tiny chains in practice, so this
    * is 2-4 rounds of (edges ⋈ labels) equi-joins, each one shuffle on
    * id. `localCheckpoint` truncates the growing lineage per round so
    * plan size stays constant at any round count. The driver-side loop
    * only ever moves a single `count` — never rows.
    */
  def qDedupCluster(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(s, dir).select(col("doc_a"), col("doc_b"))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val labels = connectedComponents(edges)
    Tables.documents(s, dir).select(col("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .orderBy(col("doc_id"))
  }

  /** Min-label connected components over an (src, dst) edge list
    * (both directions present). Returns (id, cluster) for every edge
    * endpoint; callers left-join singletons back as self-labeled.
    *
    * Each round does TWO lowering steps before re-checking the fixpoint:
    * (1) neighbor propagation — per-node min over adjacent labels (one
    * edges ⋈ labels shuffle); (2) pointer doubling — label := min(label,
    * label(label)) (one labels ⋈ labels shuffle), which halves pointer
    * chains so a path of length L converges in O(log L) rounds instead of
    * O(L). A 10k-link chain is ~14 rounds, not 10k (the r1 one-hop loop
    * was O(diameter) — degenerate exactly on long chains).
    *
    * Convergence via the label-sum: both steps only ever lower a node's
    * label, so an unchanged sum ⟺ a fixpoint — one tiny aggregate per
    * round (a single scalar to the driver, the documented exception) and
    * the sum is coalesced so an empty graph reads 0 instead of NPE-ing on
    * a null aggregate. Each round is localCheckpoint'ed so round k never
    * re-executes rounds 1..k-1. `maxRounds` is a loud safety net, not a
    * semantics change: pointer doubling converges in ≤ log2(diameter)+1
    * rounds, so 64 covers any graph that fits in storage; hitting the cap
    * means a logic bug and throws rather than returning partial labels.
    */
  def connectedComponents(edgesIn: DataFrame, maxRounds: Int = 64): DataFrame = {
    // NOTE (r12): an "unrolled" variant (r lazy pointer-doubling rounds as
    // one plan, no per-round checkpoint) was tried for the dimension-bounded
    // MST caller and REVERTED: each doubling round references the previous
    // round's plan twice, so r lazy rounds build a 2^r-leaf plan tree that
    // wedges Catalyst analysis long before execution. The per-round
    // localCheckpoint below is load-bearing — it is what keeps plan growth
    // linear in rounds — not an overhead to optimize away.
    // edge derivation (e.g. the shingle pipeline) runs once, not per round
    val edges = edgesIn.localCheckpoint()
    // only edge endpoints participate in propagation — near-dup nodes are
    // a sliver of the corpus, so each round's joins touch the graph, not
    // the full document set
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("cluster"))
      .localCheckpoint()
    if (edges.head(1).isEmpty) return labels // no edges: nothing to propagate
    def labelSum(): Long =
      labels.agg(coalesce(sum(col("cluster")), lit(0L))).head.getLong(0)
    var sum0 = -1L
    var sum1 = labelSum()
    var round = 0
    while (sum1 != sum0) {
      if (round >= maxRounds)
        throw new IllegalStateException(
          s"connectedComponents: no fixpoint after $maxRounds doubling rounds — " +
            "impossible for any finite graph; investigate the edge list")
      // shuffle_hash fences (r10): both joins are fenced against
      // broadcast — checkpointed frames carry PLAN-ESTIMATED sizes (a
      // post-aggregate explode estimates small), and at sf1 the planner
      // read the 8·10⁷-row symmetrized edge frame as broadcastable and
      // OOM'd the driver building it. The node-domain build sides
      // shuffle as bare (id, label) longs, the function's contract.
      val prop = edges.join(labels.hint("shuffle_hash"),
          col("src") === col("id"))
        .select(col("dst").as("id"), col("cluster"))
      val hopped = labels.union(prop)
        .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
      // pointer doubling: follow my label's label (always present — every
      // cluster value is some endpoint's id) and keep the lower
      val m = hopped.select(col("id").as("m_id"), col("cluster").as("m_cluster"))
      labels = hopped.join(m.hint("shuffle_hash"),
          col("cluster") === col("m_id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("m_cluster"), col("cluster"))).as("cluster"))
        .localCheckpoint()
      sum0 = sum1
      sum1 = labelSum()
      round += 1
    }
    labels
  }

  /** MinHash accuracy certification: for every verified near-dup pair,
    * the signature-estimated Jaccard (fraction of agreeing components
    * among [[NumPerms]] permutations) beside the exact value, with the
    * binomial 3σ bound as a per-pair `within_3sd` verdict — the sketch
    * ships its measured error, the same self-certification contract as
    * `q_ann_recall` and the HLL/t-digest rows. Signatures join by id
    * (one row per doc), so certification adds two hash joins over the
    * pair sliver, nothing corpus-quadratic.
    */
  def qMinhashEst(s: SparkSession, dir: String): DataFrame = {
    // r12: one shingle run feeds signatures AND pairs (was two — see
    // [[jaccardPairsOf]])
    val base = shingled(s, dir)
    val sigs = base.select(col("doc_id"),
      expr(s"minhash_sigs(hs, $NumPerms)").as("sigs"))
    val pairs = jaccardPairsOf(base).localCheckpoint()
    val matches = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), _ + _)
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sigs").as("sa"))
        .hint("shuffle_hash"), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sigs").as("sb"))
        .hint("shuffle_hash"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        round(matches / lit(NumPerms.toDouble), 4).as("jaccard_est"))
      .withColumn("abs_err", round(abs(col("jaccard") - col("jaccard_est")), 4))
      .withColumn("within_3sd",
        col("abs_err") <= lit(3.0) * sqrt(col("jaccard") * (lit(1.0) - col("jaccard"))
          / lit(NumPerms.toDouble)) + lit(1e-9))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qMinhashEstOracle: String = {
    val ms = (0 until NumPerms).map { j =>
      val a = 2L * j + 3L
      val b = 101L * j + 7L
      s"list_min(list_transform(hs, hh -> ($a * hh + $b) % $P))"
    }.mkString("[", ",\n    ", "]")
    s"""WITH $jaccardPairsCte,
       |sig AS (SELECT doc_id, $ms AS sigs FROM s),
       |est AS (
       |  SELECT pj.doc_a, pj.doc_b, pj.jaccard,
       |    round(list_sum(list_transform(range(1, $NumPerms + 1),
       |      i -> CASE WHEN a.sigs[i] = b.sigs[i] THEN 1 ELSE 0 END))
       |      / CAST($NumPerms AS DOUBLE), 4) AS jaccard_est
       |  FROM pj
       |  JOIN sig a ON a.doc_id = pj.doc_a
       |  JOIN sig b ON b.doc_id = pj.doc_b
       |)
       |SELECT doc_a, doc_b, jaccard, jaccard_est,
       |  round(abs(jaccard - jaccard_est), 4) AS abs_err,
       |  round(abs(jaccard - jaccard_est), 4)
       |    <= 3.0 * sqrt(jaccard * (1.0 - jaccard) / $NumPerms) + 1e-9 AS within_3sd
       |FROM est
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Boilerplate density (the flat-text analog of CCNet line-dedup):
    * a shingle occurring in ≥ [[BoilerplateDocs]] distinct documents is
    * boilerplate (template headers, navigation, legal footers); each
    * document is scored by the fraction of its shingles that are
    * boilerplate. Corpus-wide doc-frequency is one map-side-combined
    * count over exploded (hash, doc) longs; the per-doc score joins the
    * exploded shingles to that frequency table on the hash
    * (shuffle_hash — both sides derived). High-ratio docs are dropped or
    * trimmed before training.
    */
  def qBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val ex = shingled(s, dir)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    val docFreq = ex.groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"))
    ex.join(docFreq.hint("shuffle_hash"), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("n_docs") >= BoilerplateDocs, 1L).otherwise(0L)).as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_boiler"),
        round(col("n_boiler") / col("n_shingles").cast("double"), 6).as("boiler_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Doc-frequency floor for boilerplate shingles. The shingle sets are
    * distinct per document, so the count per hash IS its doc frequency.
    */
  val BoilerplateDocs = 3L

  val qBoilerplateOracle: String =
    s"""WITH $shingledSql,
       |ex AS (SELECT doc_id, unnest(hs) AS h FROM s),
       |dfq AS (SELECT h, count(*) AS n_docs FROM ex GROUP BY h)
       |SELECT ex.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN dfq.n_docs >= $BoilerplateDocs THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_boiler,
       |  round(CAST(sum(CASE WHEN dfq.n_docs >= $BoilerplateDocs THEN 1 ELSE 0 END) AS BIGINT)
       |    / CAST(count(*) AS DOUBLE), 6) AS boiler_ratio
       |FROM ex JOIN dfq USING (h)
       |GROUP BY ex.doc_id
       |ORDER BY ex.doc_id""".stripMargin

  /** Incremental (cross-corpus) exact dedup: treat doc_ids past a fixed
    * cutover as an arriving crawl batch and admit only documents whose
    * normalized-text fingerprint does not already exist in the
    * established corpus — dedup against 100 TB without rescanning it as
    * pairs. One left-anti shuffle join on the fingerprint (both sides
    * map-side-distinct first), which at scale is a join against the
    * corpus's persisted fingerprint table, not the corpus.
    */
  def qIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(s, dir)
      .select(col("doc_id"), md5(TextFns.normalized(col("text"))).as("fingerprint"))
    val cut = lit(IncrementalCutover)
    val existing = fp.filter(col("doc_id") < cut)
      .select(col("fingerprint")).distinct()
    fp.filter(col("doc_id") >= cut)
      .join(existing.hint("shuffle_hash"), Seq("fingerprint"), "left_anti")
      .select(col("doc_id"), col("fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** New-batch boundary for [[qIncrementalDedup]] — sized so every SF
    * splits into an established corpus and an arriving batch.
    */
  val IncrementalCutover = 300L

  /** Bucket count of the persisted band index — matches the session's
    * shuffle partitioning so a probe join against the index elides the
    * index-side exchange entirely (the probe batch shuffles to the
    * bucket layout; the 100 TB index never moves).
    */
  val BandIndexBuckets = 32

  private val bandIndexTables = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), String]

  /** The corpus's LSH band index as a RESIDENT-ENGINE ARTIFACT (r9
    * verdict ask #6): a parquet table bucketed+sorted on (band, bkey) in
    * the session catalog, not a session-lifetime in-memory frame.
    *
    * Refresh contract:
    *   - `persistedBandIndex(s, dir)` builds the table from the
    *     established corpus (doc_id < [[IncrementalCutover]]) on first
    *     touch and returns it from the catalog afterwards — the cheap
    *     read path every admission batch probes.
    *   - `refreshBandIndex(s, dir, docs)` APPENDS one admitted batch's
    *     band rows (same bucket spec, so appended files land in the
    *     bucket layout) — the per-batch maintenance writers run after
    *     admission; nothing ever rescans the corpus.
    *   - a full rebuild is `dropBandIndex` + `persistedBandIndex` —
    *     only needed if the band scheme itself ([[NumBands]]×
    *     [[RowsPerBand]], hash seeds) changes.
    *
    * [[qIncrementalMinhash]] consumes this table, so the oracle gate
    * proves the persisted artifact is byte-equivalent to the in-session
    * derivation every round.
    */
  def persistedBandIndex(s: SparkSession, dir: String): DataFrame = {
    val name = bandIndexTables.getOrElseUpdate((s, dir), {
      val tbl = "band_idx_" + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      if (!s.catalog.tableExists(tbl)) {
        // a warehouse directory with no catalog entry is an orphan of a
        // previous process (each JVM here gets a fresh in-memory catalog
        // over the same persistent spark-warehouse): it must move aside
        // or saveAsTable refuses with LOCATION_ALREADY_EXISTS on every
        // re-run after the first. r11 (advice): the orphan is RENAMED to
        // a timestamped quarantine path and WARNED about, never silently
        // deleted — it may hold batches a previous process appended via
        // refreshBandIndex, and the bucket spec needed to re-register it
        // as a table is not recoverable from bare parquet files. An
        // operator who wants those appends back re-reads the quarantine
        // dir as plain parquet and replays refreshBandIndex.
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), tbl)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) {
          val quarantine = new org.apache.hadoop.fs.Path(
            loc.getParent, s"${tbl}_orphan_${System.currentTimeMillis}")
          // rename returns false instead of throwing on most filesystems;
          // proceeding anyway would hit LOCATION_ALREADY_EXISTS below
          // with a misleading "moved to quarantine" already logged
          if (!fs.rename(loc, quarantine))
            throw new IllegalStateException(
              s"band index dir $loc has no catalog entry and could not be " +
                s"moved to quarantine $quarantine — refusing to rebuild " +
                "over it; move or remove the directory and retry")
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"band index dir $loc had no catalog entry (previous process?); " +
              s"moved to $quarantine instead of deleting — rebuild proceeds " +
              "from the established corpus, prior incremental appends are " +
              "preserved in the quarantine dir")
          // retention: every fresh JVM over a shared warehouse orphans
          // one dir, so keep only the 3 newest quarantines per table
          // tolerate manually renamed dirs matching the glob: skip any
          // name whose suffix isn't the numeric timestamp we stamp
          val stale = fs.globStatus(new org.apache.hadoop.fs.Path(
              loc.getParent, s"${tbl}_orphan_*"))
            .flatMap(st =>
              st.getPath.getName.split("_").last.toLongOption.map((st, _)))
            .sortBy(-_._2)
            .drop(3)
          stale.foreach { case (st, _) => fs.delete(st.getPath, true) }
        }
        bandIndexOf(Tables.documents(s, dir)
            .filter(col("doc_id") < IncrementalCutover))
          .write.format("parquet")
          .bucketBy(BandIndexBuckets, "band", "bkey").sortBy("band", "bkey")
          .mode("overwrite").saveAsTable(tbl)
      }
      tbl
    })
    s.table(name)
  }

  /** Append one admitted batch's band rows to the persisted index (see
    * the refresh contract on [[persistedBandIndex]]).
    */
  def refreshBandIndex(s: SparkSession, dir: String, docs: DataFrame): Unit = {
    persistedBandIndex(s, dir) // ensure it exists
    bandIndexOf(docs)
      .write.format("parquet")
      .bucketBy(BandIndexBuckets, "band", "bkey").sortBy("band", "bkey")
      .mode("append").saveAsTable(bandIndexTables((s, dir)))
  }

  /** Drop the persisted band index (full-rebuild path of the refresh
    * contract).
    */
  def dropBandIndex(s: SparkSession, dir: String): Unit =
    bandIndexTables.remove((s, dir)).foreach { tbl =>
      s.sql(s"DROP TABLE IF EXISTS $tbl")
    }

  val qIncrementalDedupOracle: String =
    s"""WITH fp AS (
       |  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
       |  FROM documents
       |)
       |SELECT doc_id, fingerprint
       |FROM fp
       |WHERE doc_id >= $IncrementalCutover
       |  AND fingerprint NOT IN (SELECT fingerprint FROM fp WHERE doc_id < $IncrementalCutover)
       |ORDER BY doc_id""".stripMargin

  /** Incremental NEAR-dup admission — the MinHash twin of
    * [[qIncrementalDedup]] (which only catches byte-identical text):
    * an arriving batch (doc_id ≥ [[IncrementalCutover]]) probes the
    * established corpus's PERSISTED LSH band index ([[bandFrame]] over
    * the corpus — at 100 TB a bucketed table on (band, bkey), built
    * once and appended to as batches are admitted) and every candidate
    * (batch, corpus) collision is verified with exact Jaccard. Nothing
    * ever rescans the corpus: the probe join touches index rows whose
    * band keys the BATCH produced, the verify join fetches only the
    * candidates' shingle sets by id, and all shuffles carry bare
    * (band, key, id) or (id, hs) rows. Same 8×4 band scheme as
    * [[qDedupMinhash]], so this is provably that query's pair set
    * restricted to batch×corpus crossings — the spec asserts exactly
    * that equivalence.
    */
  def qIncrementalMinhash(s: SparkSession, dir: String): DataFrame = {
    val base = shingled(s, dir)
    val cut = lit(IncrementalCutover)
    // the corpus side is the PERSISTED artifact ([[persistedBandIndex]]):
    // bucketed on (band, bkey), so the probe join shuffles only the
    // arriving batch's band rows into the bucket layout — the index-side
    // exchange is elided (at 100 TB: the index never moves)
    val index = persistedBandIndex(s, dir)
    val probe = bandFrame(base.filter(col("doc_id") >= cut))
    val cand = probe.as("a")
      .join(index.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("dup_of"))
      .dropDuplicates("doc_id", "dup_of")
    val verified = cand
      .join(base.select(col("doc_id"), col("hs").as("hs_a")).hint("shuffle_hash"), "doc_id")
      .join(base.select(col("doc_id").as("dup_of"), col("hs").as("hs_b")).hint("shuffle_hash"), "dup_of")
      .select(col("doc_id"), col("dup_of"), jaccardOut.as("jaccard"))
    graft.plans.Fence.filterNoPushdown(verified, col("jaccard"), _ >= JaccardThreshold)
      .orderBy(col("doc_id"), col("dup_of"))
  }

  val qIncrementalMinhashOracle: String = {
    val ms = (0 until NumPerms).map { j =>
      val a = 2L * j + 3L
      val b = 101L * j + 7L
      s"list_min(list_transform(hs, hh -> ($a * hh + $b) % $P)) AS m$j"
    }.mkString(",\n    ")
    val bandSelects = (0 until NumBands).map { bnd =>
      val key = (0 until RowsPerBand)
        .map(r => s"CAST(m${RowsPerBand * bnd + r} AS VARCHAR)")
        .mkString(" || '-' || ")
      s"SELECT doc_id, $bnd AS band, md5($key) AS bkey FROM m"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $shingledSql,
       |m AS (
       |  SELECT doc_id,
       |    $ms
       |  FROM s
       |),
       |bands AS (
       |  $bandSelects
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS dup_of
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bkey = b.bkey
       |  WHERE a.doc_id >= $IncrementalCutover AND b.doc_id < $IncrementalCutover
       |)
       |SELECT cand.doc_id AS doc_id, dup_of, $jaccardOutSql AS jaccard
       |FROM cand
       |JOIN s x ON x.doc_id = cand.doc_id
       |JOIN s y ON y.doc_id = dup_of
       |WHERE $jaccardOutSql >= $JaccardThreshold
       |ORDER BY cand.doc_id, dup_of""".stripMargin
  }

  /** Shared recursive-CTE prefix labeling every document with its
    * min-reachable cluster representative (`cl(doc_id, cluster)`).
    */
  private val clusterCteSql: String =
    s"""WITH RECURSIVE $shingledSql,
       |blk AS (
       |  SELECT doc_id, hs, list_min(hs) AS mn, list_max(hs) AS mx
       |  FROM s
       |),
       |pr AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b
       |  FROM blk x JOIN blk y ON x.mn = y.mn AND x.mx = y.mx AND x.doc_id < y.doc_id
       |  WHERE $jaccardOutSql >= $JaccardThreshold
       |),
       |ed AS (SELECT a, b FROM pr UNION ALL SELECT b, a FROM pr),
       |reach(id, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT ed.b, reach.r FROM ed JOIN reach ON ed.a = reach.id
       |),
       |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id)""".stripMargin

  val qDedupClusterOracle: String =
    s"""$clusterCteSql
       |SELECT doc_id, cluster
       |FROM cl
       |ORDER BY doc_id""".stripMargin

  /** Soft dedup (RefinedWeb-style): instead of dropping near-duplicates,
    * down-weight every member of a cluster by 1/|cluster| so the cluster
    * contributes one document's worth of mass to training. Reuses the
    * cluster labels; sizes come from a grouped count joined back on the
    * cluster key (partial-aggregated, skew-safe — a pathological
    * all-duplicates corpus is one hot cluster key in an agg, not a
    * buffered window partition).
    */
  def qSoftDedup(s: SparkSession, dir: String): DataFrame = {
    // r12 (guide §1.2): clusters feeds BOTH the size aggregate and the
    // weight join; without the checkpoint the documents⋈labels prefix
    // (and its sort) planned and ran twice
    val clusters = qDedupCluster(s, dir).select(col("doc_id"), col("cluster"))
      .localCheckpoint()
    val sizes = clusters.groupBy(col("cluster")).agg(count(lit(1)).as("n_cluster"))
    clusters.join(sizes, Seq("cluster"))
      .select(col("doc_id"), col("cluster"), col("n_cluster"),
        round(lit(1.0) / col("n_cluster"), 6).as("weight"))
      .orderBy(col("doc_id"))
  }

  val qSoftDedupOracle: String =
    s"""$clusterCteSql,
       |sz AS (SELECT cluster, count(*) AS n_cluster FROM cl GROUP BY cluster)
       |SELECT cl.doc_id, cl.cluster, sz.n_cluster,
       |  round(1.0 / sz.n_cluster, 6) AS weight
       |FROM cl JOIN sz USING (cluster)
       |ORDER BY cl.doc_id""".stripMargin

  /** Duplicate-cluster size distribution: how many near-dup clusters of
    * each size the corpus contains, and how many documents they bind —
    * the one-page dedup report (the size histogram is what tells you
    * whether duplication is a few giant template families or a long
    * tail of pairs, and what a dedup pass will actually delete).
    * Composition over the audited cluster engine: cluster labels →
    * dimension-sized per-cluster counts → size histogram; everything
    * after the label join is aggregate-sized.
    */
  def qDupClusterStats(s: SparkSession, dir: String): DataFrame =
    qDedupCluster(s, dir)
      .groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
      .orderBy(col("cluster_size"))

  val qDupClusterStatsOracle: String =
    s"""$clusterCteSql,
       |sz AS (SELECT cluster, count(*) AS cluster_size FROM cl GROUP BY cluster)
       |SELECT cluster_size, count(*) AS n_clusters,
       |  CAST(sum(cluster_size) AS BIGINT) AS n_docs
       |FROM sz
       |GROUP BY cluster_size
       |ORDER BY cluster_size""".stripMargin

  /** SimHash: 60-bit fingerprint from per-bit ±1 votes over the distinct
    * token set. Explode + one grouped aggregation (60 conditional sums) —
    * a single shuffle keyed by doc_id, then a pure projection folds the
    * votes into the fingerprint.
    */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val exploded = Tables.documents(s, dir)
      .select(col("doc_id"), explode(TextFns.tokenSet(col("text"))).as("tok"))
      .select(col("doc_id"), TextFns.hash60(col("tok")).as("h"))
    val votes = (0 until 60).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"s$i"))
    val fp = (0 until 60)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    exploded
      .groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Hamming-band near-dup pairs over SimHash fingerprints: split the
    * 60-bit fingerprint into `bands` chunks; docs agreeing on any chunk
    * are candidates (two fingerprints within hamming distance d collide
    * on ≥1 of b bands whenever d < b — exact, not probabilistic); verify
    * with bit_count(xor) ≤ maxHamming. The band join shuffles
    * (band, chunk-value, id) triples only — the SimHash analog of the
    * MinHash LSH layout.
    */
  def simhashPairs(fingerprints: DataFrame, maxHamming: Int = 12, bands: Int = 15): DataFrame = {
    val bits = 60 / bands
    val bandStructs = (0 until bands).map { bnd =>
      struct(lit(bnd).as("band"),
        shiftright(col("simhash"), bnd * bits).bitwiseAND((1L << bits) - 1).as("chunk"))
    }
    val banded = fingerprints
      .select(col("doc_id"), col("simhash"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.chunk").as("chunk"))
    banded.as("a")
      .join(banded.as("b").hint("shuffle_hash"),
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qDedupSimhashOracle: String = {
    val votes = (0 until 60)
      .map(i => s"sum(CASE WHEN (h >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i")
      .mkString(",\n    ")
    val fp = (0 until 60)
      .map(i => s"CASE WHEN s$i > 0 THEN ${1L << i} ELSE 0 END")
      .mkString(" + ")
    s"""WITH u AS (
       |  SELECT doc_id, unnest(list_distinct($toksSql)) AS tok FROM documents
       |),
       |hh AS (SELECT doc_id, ${hash60Sql("tok")} AS h FROM u),
       |v AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM hh GROUP BY doc_id
       |)
       |SELECT doc_id, $fp AS simhash
       |FROM v
       |ORDER BY doc_id""".stripMargin
  }

  /** Per-document n-gram novelty: the fraction of a document's distinct
    * trigram hashes that no EARLIER document (smaller doc_id — the
    * arrival order) already contains. Low novelty marks recombinations
    * of existing text (template spam, scraped aggregates) that no
    * pairwise near-dup test flags, because no single pair is similar.
    * Shape: the inverted index's first-seen table is one hash-grouped
    * min (map-side combined), joined back to the bare (hash, doc_id)
    * explosion — both shuffles carry 16-byte long pairs, never shingle
    * sets (the MinHash rule). At 100 TB the first-seen table is the
    * persisted incremental-dedup companion: admitting a new batch
    * re-scores novelty against it without touching the corpus.
    */
  def qNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir)
    val ex = sh.select(col("doc_id"), explode(col("hs")).as("h"))
    val first = ex.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    ex.join(first.hint("shuffle_hash"), Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum((col("first_doc") === col("doc_id")).cast("long")).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel") / col("n_shingles").cast("double"), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  val qNgramNoveltyOracle: String =
    s"""WITH $shingledSql,
       |x AS (SELECT doc_id, unnest(hs) AS h FROM s),
       |f AS (SELECT h, min(doc_id) AS first_doc FROM x GROUP BY h)
       |SELECT x.doc_id, count(*) AS n_shingles,
       |  CAST(sum(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  round(sum(CASE WHEN f.first_doc = x.doc_id THEN 1 ELSE 0 END)
       |    / CAST(count(*) AS DOUBLE), 6) AS novelty
       |FROM x JOIN f USING (h)
       |GROUP BY x.doc_id
       |ORDER BY x.doc_id""".stripMargin

  /** Deterministic per-hash train-posting bound for [[qEvalOverlap]] —
    * the [[ContainmentBlockCap]] discipline applied to the decontam
    * train index, mirrored in the oracle so parity is exact when it
    * binds. See the hot-block rationale on [[graft.plans.Postings]].
    */
  val EvalOverlapTrainCap = 1024

  /** Exact n-gram collision decontamination — the industry-standard
    * complement to [[graft.operators.Curation.qDecontaminate]]'s
    * near-dup form: an eval (val/test) document is contaminated if it
    * shares ANY exact hashed 3-shingle with ANY train document, however
    * dissimilar the documents are overall (the "eval question quoted
    * inside a long train page" case near-dup misses). Reports per
    * contaminated eval doc: distinct colliding shingles, distinct train
    * docs hit, and the smallest offender. Shape: the train side is an
    * inverted (hash, doc_id) index of bare longs CAPPED per hash at
    * [[EvalOverlapTrainCap]] postings (the [[graft.plans.Postings]]
    * hot-block discipline — without it one boilerplate shingle shared by
    * k train × m eval docs emits k·m candidate rows, the exact quadratic
    * mechanism r11 fixed in containment and fuzzy; this was the last
    * uncapped inverted-index join and the board's worst measured
    * exponent, α 1.04). The cap is EXACT for the detection verdict and
    * for `n_shared` and `first_train` (a hash survives iff it has ≥1
    * train posting, and the smallest train ids are the ones kept);
    * `n_train_docs` saturates at the cap for a hash hotter than it —
    * the right trade, since "how MANY train pages share this boilerplate
    * shingle" stops being decontamination signal long before 1024. The
    * eval side probes with one hash join, both aggregates combine
    * map-side — at 100 TB the train index is the persisted table, and
    * screening a new eval set costs one join on the eval set's size,
    * with per-hash join fanout now bounded BY CONSTRUCTION.
    */
  def qEvalOverlap(s: SparkSession, dir: String): DataFrame = {
    val tagged = shingled(s, dir)
      .join(Tables.documents(s, dir)
        .select(col("doc_id"), Curation.splitCol.as("split")), Seq("doc_id"))
    val trainIdx = graft.plans.Postings.capped(
      tagged.filter(col("split") === "train")
        .select(col("doc_id").as("train_doc"), explode(col("hs")).as("h")),
      EvalOverlapTrainCap, col("train_doc"), col("h"))
    val evalProbe = tagged.filter(col("split") =!= "train")
      .select(col("doc_id").as("eval_doc"), col("split").as("eval_split"),
        explode(col("hs")).as("h"))
    evalProbe.join(trainIdx.hint("shuffle_hash"), Seq("h"))
      .groupBy(col("eval_doc"), col("eval_split"))
      .agg(countDistinct(col("h")).as("n_shared"),
        countDistinct(col("train_doc")).as("n_train_docs"),
        min(col("train_doc")).as("first_train"))
      .orderBy(col("eval_doc"))
  }

  val qEvalOverlapOracle: String =
    s"""WITH $shingledSql,
       |sp AS (SELECT doc_id, ${Curation.splitCaseSql} AS split FROM documents),
       |tr AS (
       |  SELECT train_doc, h FROM (
       |    SELECT s.doc_id AS train_doc, unnest(hs) AS h
       |    FROM s JOIN sp ON s.doc_id = sp.doc_id WHERE sp.split = 'train'
       |  )
       |  ${graft.plans.Postings.cappedSql(EvalOverlapTrainCap, "train_doc", "h")}
       |),
       |ev AS (
       |  SELECT s.doc_id AS eval_doc, sp.split AS eval_split, unnest(hs) AS h
       |  FROM s JOIN sp ON s.doc_id = sp.doc_id WHERE sp.split != 'train'
       |)
       |SELECT eval_doc, eval_split,
       |  count(DISTINCT ev.h) AS n_shared,
       |  count(DISTINCT train_doc) AS n_train_docs,
       |  min(train_doc) AS first_train
       |FROM ev JOIN tr ON ev.h = tr.h
       |GROUP BY eval_doc, eval_split
       |ORDER BY eval_doc""".stripMargin

  /** Max edit distance for a fuzzy title match. */
  val FuzzyMaxEdits = 2

  /** Deterministic a-side bound per (first-token, length-band) block in
    * [[qDedupFuzzy]]: only a block's [[FuzzyBlockCap]] smallest doc ids
    * serve as the smaller-id pair member, so per-block pair work is
    * Cap·|block| instead of |block|² (the containment/[[graft.operators
    * .Graph.CoreMaxFanout]] hot-block discipline — popular first tokens
    * otherwise make block membership, and therefore pair count,
    * quadratic in corpus size; the r10/r11 curve measured α 1.56 → 1.17
    * from banding alone, and this cap removes the residual). Mirrored
    * in the oracle, so parity is exact even when it binds.
    */
  val FuzzyBlockCap = 512

  /** Edit-distance (fuzzy) near-dup over the normalized 6-token title:
    * pairs whose openings differ by ≤ [[FuzzyMaxEdits]] single-character
    * edits — the "same article, retyped headline" catcher that set-based
    * similarity misses (a one-character typo changes every shingle it
    * touches, but moves levenshtein by 1). Candidates block on the FIRST
    * token: exact recall for pairs agreeing on their first word;
    * edits inside the first token are missed best-effort (tighter
    * recall = block on several leading tokens' hashes at proportional
    * index cost — the same documented trade as containment blocking).
    * levenshtein is integer-exact on both engines, so the oracle gate is
    * a hash compare, not a tolerance. The block join shuffles
    * (first_token, doc_id, title) only; per-block pairing is bounded by
    * block size, the usual AQE-skew-handled shape.
    */
  def qDedupFuzzy(s: SparkSession, dir: String): DataFrame = {
    // localCheckpoint: both join sides read the tokenized titles, and
    // tokenization is the scan-side regex pass — materializing the
    // row-domain (doc_id, k, title, band) sliver halves the corpus
    // scans (measured 5.3s/pass at sf1, the largest single cost here)
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 6)
      .select(col("doc_id"), element_at(col("t"), 1).as("k"),
        array_join(slice(col("t"), 1, 6), " ").as("title"))
      .withColumn("band", floor(length(col("title")) / (FuzzyMaxEdits + 1)))
      .localCheckpoint()
    // three cost levers, all semantics-preserving:
    // (1) |len(a)−len(b)| ≤ k is a necessary condition for edit distance
    //     ≤ k, and it is promoted INTO the equi-key as a length band:
    //     bands of width k+1 differ by ≤ 1 for any qualifying pair, so
    //     side b emits its band ± 1 and each pair meets EXACTLY once (a
    //     emits one band; b's three emitted keys are distinct). This is
    //     what bounds the generator at scale — first-token blocks grow
    //     linearly with the corpus (the r10 sf1 sweep measured α=1.56,
    //     36× time for 10× data, pure pair enumeration), while (token,
    //     band) blocks stay length-distribution-bounded. RECONCILED
    //     RECORD (r11, closing the r10 verdict's ask #4): the in-round
    //     r10 claim of "8.1s at sf1, α≈0.9" does NOT reproduce — a
    //     single-query fresh-JVM run on a quiet r11 host measured
    //     16.2s at sf1 (vs the committed 20.2s sweep; the sweep was
    //     contention-inflated but roughly honest, the 8.1s claim was
    //     a lucky quiet-moment read). Post-banding the honest curve was
    //     ~1.1s sf0.1 → 16.2s sf1 isolated, α≈1.17: banding took α
    //     from 1.56 to ~1.17, not to 0.9. The residual superlinearity
    //     driver is the popular-first-token block (its membership grows
    //     linearly with the corpus, so its pair count grows
    //     quadratically) — structurally closed by lever (4) below. The
    //     COMMITTED r11 record (fresh-JVM isolated at BOTH scales,
    //     dev/SCALING.md + BENCH_sf1.json): 1.53s sf0.1 → 16.24s sf1,
    //     α = 1.03; at sf1 the cap's measured effect is inside the
    //     host-noise band (±30% — see dev/SLOPE_ONE_RCA.md) because
    //     sf1 blocks rarely exceed it; its value is the structural
    //     bound at 100×, not a speedup today.
    // (4) the a-side of every (token, band) block is capped at the
    //     [[FuzzyBlockCap]] smallest doc ids (row_number, deterministic)
    //     — the containment/CoreMaxFanout hot-block discipline. Work per
    //     block drops from |block|² to Cap·|block|, so TOTAL work is
    //     linear in the corpus. Recall cost: a pair is missed iff its
    //     SMALLER-id member is not among its block's Cap earliest docs —
    //     best-effort beyond that bound, same contract as containment
    //     blocking, and the cap is MIRRORED in the oracle so parity is
    //     exact even when it binds.
    // (2) the residual |len diff| ≤ k compare still prunes inside the
    //     band collisions before any DP runs.
    // (3) the THRESHOLD form of levenshtein runs the banded O(n·k) DP
    //     (returning −1 above k) instead of the full O(n·m) table — at
    //     k=2 that is ~10× fewer cells. Unbounded levenshtein here was
    //     15s of the suite's 75s (r2).
    // (a bag-of-chars L1 prefilter before the DP was tried and measured
    // a wash at sf1: zip_with/aggregate over 27-bin histograms is a
    // non-codegen higher-order expression whose per-pair cost equals the
    // banded DP it would skip)
    val probe = t.select(col("doc_id"), col("k"), col("title"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
    val aCapped = graft.plans.Postings.capped(
      t, FuzzyBlockCap, col("doc_id"), col("k"), col("band"))
    aCapped.as("a").join(probe.as("b").hint("shuffle_hash"),
        col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id") &&
          abs(length(col("a.title")) - length(col("b.title"))) <= FuzzyMaxEdits)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        levenshtein(col("a.title"), col("b.title"), FuzzyMaxEdits).cast("long").as("edits"))
      // fence: without it Catalyst substitutes the alias back into the
      // predicate and the DP runs TWICE per pair (filter + project) —
      // measured 27.4s → 15.9s at sf1
      .transform(df => graft.plans.Fence.filterNoPushdown(df, col("edits"), _ >= 0))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qDedupFuzzyOracle: String =
    s"""WITH t0 AS (SELECT doc_id, $toksSql AS t FROM documents),
       |t AS (
       |  SELECT doc_id, t[1] AS k, array_to_string(t[1:6], ' ') AS title
       |  FROM t0 WHERE len(t) >= 6
       |),
       |ta AS (
       |  SELECT doc_id, k, title FROM (
       |    SELECT doc_id, k, title,
       |      CAST(floor(length(title) / ${FuzzyMaxEdits + 1}) AS BIGINT) AS band
       |    FROM t
       |  )
       |  ${graft.plans.Postings.cappedSql(FuzzyBlockCap, "doc_id", "k", "band")}
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  levenshtein(a.title, b.title) AS edits
       |FROM ta a JOIN t b ON a.k = b.k AND a.doc_id < b.doc_id
       |WHERE levenshtein(a.title, b.title) <= $FuzzyMaxEdits
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Tokens per synthetic segment for [[qLineDedup]] (the corpus has no
    * newlines, so "lines" are fixed token windows — same role as CCNet's
    * newline-split paragraphs).
    */
  val SegmentTokens = 10

  /** Corpus-wide line-level dedup (the CCNet/RefinedWeb paragraph-dedup
    * shape): split every document into [[SegmentTokens]]-token segments,
    * keep only the FIRST occurrence of each segment across the whole
    * corpus (ordered by (doc_id, position)), and report per document how
    * much of it survives — the sub-document dedup that removes repeated
    * headers/footers/navigation exact-dedup can't see (it only drops
    * whole-identical documents). First-writer-wins is a single min-
    * aggregate over an integer position key; segments travel as 60-bit
    * md5 hashes, so the corpus-wide shuffle carries (hash, pos_key)
    * longs, never segment text. At 100 TB: one scan-side explode, one
    * hash-partitioned agg, one hash join back — the same bounded shape
    * as the shingle indexes, and the keeper table is persistable for
    * incremental admission (new batches join against it like
    * q_incremental_dedup).
    */
  def qLineDedup(s: SparkSession, dir: String): DataFrame = {
    val segs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), floor((size(col("t")) - 1) / SegmentTokens).cast("int")),
        i => concat_ws(" ", slice(col("t"), i * SegmentTokens + 1, lit(SegmentTokens))))))
      .select(col("doc_id"), col("pos").as("seg_no"),
        TextFns.hash60(col("col")).as("h"))
      .withColumn("pos_key", col("doc_id") * 100000L + col("seg_no"))
      .localCheckpoint()
    val keepers = segs.groupBy(col("h")).agg(min(col("pos_key")).as("keeper_key"))
    segs.join(keepers, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("pos_key") === col("keeper_key"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kept_frac", round(col("n_kept").cast("double") / col("n_segs"), 6))
      .orderBy(col("doc_id"))
  }

  val qLineDedupOracle: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
       |segs AS (
       |  SELECT doc_id, i AS seg_no,
       |    ${hash60Sql(s"array_to_string(t[i * $SegmentTokens + 1 : i * $SegmentTokens + $SegmentTokens], ' ')")} AS h,
       |    doc_id * 100000 + i AS pos_key
       |  FROM t, unnest(range(0, (len(t) - 1) // $SegmentTokens + 1)) AS u(i)
       |),
       |k AS (SELECT h, min(pos_key) AS keeper_key FROM segs GROUP BY h)
       |SELECT s.doc_id, count(*) AS n_segs,
       |  CAST(sum(CASE WHEN s.pos_key = k.keeper_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  round(CAST(sum(CASE WHEN s.pos_key = k.keeper_key THEN 1 ELSE 0 END) AS BIGINT)
       |    / CAST(count(*) AS DOUBLE), 6) AS kept_frac
       |FROM segs s JOIN k USING (h)
       |GROUP BY s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  /** The transformation form of [[qLineDedup]]: returns the corpus with
    * every non-first-occurrence segment REMOVED and each document
    * re-assembled from its surviving segments in order — what a curation
    * run actually writes out (qLineDedup is the audit view of the same
    * pass). Input needs (doc_id, text). The reassembly is a per-document
    * sorted collect — bounded by document length, never a corpus-wide
    * sort; the keeper resolution is the same (hash → min position-key)
    * aggregate, so the corpus-wide shuffle still carries bare longs plus
    * the segment text needed to rebuild (payload moves once, join-local).
    * A document whose every segment appeared earlier elsewhere collapses
    * to the empty string (count it, then drop it — that is the dedup).
    */
  def dedupSegments(docs: DataFrame): DataFrame = {
    val segs = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), floor((size(col("t")) - 1) / SegmentTokens).cast("int")),
        i => concat_ws(" ", slice(col("t"), i * SegmentTokens + 1, lit(SegmentTokens))))))
      .select(col("doc_id"), col("pos").as("seg_no"), col("col").as("seg"))
      .withColumn("h", TextFns.hash60(col("seg")))
      .withColumn("pos_key", col("doc_id") * 100000L + col("seg_no"))
      .localCheckpoint()
    val keepers = segs.groupBy(col("h")).agg(min(col("pos_key")).as("keeper_key"))
    val kept = segs.join(keepers, Seq("h"))
      .filter(col("pos_key") === col("keeper_key"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", expr("transform(array_sort(collect_list(struct(seg_no, seg))), t -> t.seg)"))
          .as("text_deduped"))
    docs.select(col("doc_id"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** Shared-opening near-dup pairs: documents whose FIRST
    * [[PrefixTokens]] tokens are identical — the prefix-blocking dedup
    * that catches templated openings, mirrored articles with edited
    * bodies, and truncated re-crawls (same page cut at different
    * lengths), where set similarity decays with the edit but the opening
    * stays exact. Each doc projects to one 60-bit opening hash on the
    * scan side; candidates join on the (hash, id) inverted index — bare
    * longs, linear index size, exact recall for any pair sharing the
    * full opening window, and the hash doubles as the blocking key for
    * a downstream verification stage (q_dedup_fuzzy runs levenshtein
    * inside exactly these blocks).
    */
  def qDedupPrefix(s: SparkSession, dir: String): DataFrame = {
    val t = Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= PrefixTokens)
      .select(col("doc_id"),
        TextFns.hash60(concat_ws(" ", slice(col("t"), 1, PrefixTokens))).as("head_h"))
      .localCheckpoint()
    t.as("a").join(t.as("b").hint("shuffle_hash"),
        col("a.head_h") === col("b.head_h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.head_h").as("head_h"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val qDedupPrefixOracle: String =
    s"""WITH t0 AS (SELECT doc_id, $toksSql AS t FROM documents),
       |t AS (
       |  SELECT doc_id,
       |    ${hash60Sql(s"array_to_string(t[1 : $PrefixTokens], ' ')")} AS head_h
       |  FROM t0 WHERE len(t) >= $PrefixTokens
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.head_h AS head_h
       |FROM t a JOIN t b ON a.head_h = b.head_h AND a.doc_id < b.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Cross-source duplicate FLOW — which sources copy from which:
    * 10-token opening fingerprints (the q_dedup_prefix key — exact
    * whole-document hashes rarely cross source boundaries, templated/
    * scraped OPENINGS do) present in ≥2 sources, counted per source
    * pair canonicalized src_a < src_b. The provenance question behind
    * every mirror/scraper-of-scraper cleanup, and the pair matrix that
    * drives source-level dedup ordering (dedup the copier against the
    * origin, not vice versa). Shape: the corpus collapses to the
    * DISTINCT (fingerprint, source) presence frame first; the pair join
    * runs fingerprint-keyed over presence rows (≤ sources per
    * fingerprint, so expansion is bounded by C(|sources|,2) per group,
    * not by copies); output is ≤ C(20,2) rows. All-integer.
    */
  def qDupFlow(s: SparkSession, dir: String): DataFrame = {
    val pres = Tables.documents(s, dir)
      .select(TextFns.tokens(col("text")).as("t"), col("source"))
      .filter(size(col("t")) >= PrefixTokens)
      .select(TextFns.hash60(
        concat_ws(" ", slice(col("t"), 1, PrefixTokens))).as("fp"),
        col("source"))
      .distinct()
      .localCheckpoint()
    pres.as("a")
      .join(pres.as("b").hint("shuffle_hash"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared_fps"))
      .orderBy(col("n_shared_fps").desc, col("src_a"), col("src_b"))
  }

  val qDupFlowOracle: String =
    s"""WITH t0 AS (SELECT source, $toksSql AS t FROM documents),
       |pres AS (
       |  SELECT DISTINCT
       |    ${hash60Sql(s"array_to_string(t[1 : $PrefixTokens], ' ')")} AS fp,
       |    source
       |  FROM t0 WHERE len(t) >= $PrefixTokens
       |)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  count(*) AS n_shared_fps
       |FROM pres a JOIN pres b
       |  ON a.fp = b.fp AND a.source < b.source
       |GROUP BY 1, 2
       |ORDER BY n_shared_fps DESC, src_a, src_b""".stripMargin

  /** Span width for [[qDupSpan]] (word 8-grams, the granularity of the
    * exact-substring train-data dedup literature). */
  val SpanW = 8

  /** Exact duplicated-SPAN accounting (the Lee et al. "Deduplicating
    * Training Data" measurement, re-expressed relationally): an 8-token
    * span occurring in more than one document is duplicated text, and a
    * document's dup_frac is the fraction of its token POSITIONS covered
    * by at least one such span — interval union via position explode +
    * distinct, never interval merging logic. Shape: tokenize once into a
    * positional span frame (hash60 of the span text; 1 row per position,
    * ~n_tokens rows total) materialized once — it feeds the span-count
    * aggregate AND the cover join; duplicated spans reduce to bare
    * (hash) keys; the cover join is shuffle_hash on the span hash
    * (fact-derived on both sides, never broadcast) and fans out a
    * bounded ×8 into the distinct position count. At 100 TB every
    * exchange carries (hash, doc, pos) triples — no span text, no
    * document payloads — and hot spans (boilerplate) are exactly the
    * q_join_skew salting case.
    */
  def qDupSpan(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= SpanW)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_toks"),
        col("t"))
    val spans = docs
      .select(col("doc_id"), col("n_toks"), explode(
        transform(sequence(lit(1), size(col("t")) - (SpanW - 1)), i =>
          struct(i.as("pos"),
            TextFns.hash60(concat_ws(" ", slice(col("t"), i, lit(SpanW))))
              .as("h")))).as("sp"))
      .select(col("doc_id"), col("n_toks"), col("sp.pos").as("pos"),
        col("sp.h").as("h"))
      .localCheckpoint()
    val dup = spans.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") > 1)
      .select(col("h"))
    val covered = spans
      .join(dup.hint("shuffle_hash"), Seq("h"))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (SpanW - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dup_tokens"))
    docs.select(col("doc_id"), col("n_toks"))
      .join(covered.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_toks"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        graft.functions.NumFns.roundPortable(
          coalesce(col("dup_tokens"), lit(0L)).cast("double") /
            col("n_toks"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val qDupSpanOracle: String =
    s"""WITH t0 AS (SELECT doc_id, $toksSql AS t FROM documents),
       |d AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS n_toks, t
       |  FROM t0 WHERE len(t) >= $SpanW
       |),
       |sp AS (
       |  SELECT doc_id, n_toks, i AS pos,
       |    ${hash60Sql(s"array_to_string(t[i : i + ${SpanW - 1}], ' ')")} AS h
       |  FROM d, unnest(range(1, CAST(n_toks AS INT) - ${SpanW - 2}))
       |    AS u(i)
       |),
       |dup AS (
       |  SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) > 1
       |),
       |cov AS (
       |  SELECT DISTINCT sp.doc_id, p
       |  FROM sp JOIN dup USING (h),
       |    unnest(range(pos, pos + $SpanW)) AS v(p)
       |),
       |cd AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_tokens
       |  FROM cov GROUP BY doc_id
       |)
       |SELECT d.doc_id, d.n_toks,
       |  coalesce(cd.dup_tokens, 0) AS dup_tokens,
       |  ${graft.functions.NumFns.roundPortableSql(
            "coalesce(cd.dup_tokens, 0) / CAST(d.n_toks AS DOUBLE)", 6)}
       |    AS dup_frac
       |FROM d LEFT JOIN cd USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Canonical-representative selection: within each near-dup cluster,
    * KEEP the longest member (n_chars, doc_id tie-break) and drop the
    * rest — the keep-BEST retention policy (q_dedup_exact and the
    * cluster engine keep the first/min-id member; real curation keeps
    * the most complete copy — truncated mirrors and snippet scrapes
    * are the duplicates you want dropped). Composition over the
    * audited cluster engine: labels → one max_by per cluster (no rank
    * window — the argmax collapses map-side), n_chars rides the
    * label join from the documents dim. Per-cluster report rows.
    */
  def qDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val labels = qDedupCluster(s, dir).select(col("doc_id"), col("cluster"))
    val lens = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    labels.join(lens, Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_cluster"),
        max_by(col("doc_id"),
          struct(col("n_chars"), (-col("doc_id")).as("nd"))).as("keep_doc"),
        max(col("n_chars")).as("keep_chars"),
        sum(col("n_chars")).as("total_chars"))
      .select(col("cluster"), col("n_cluster"), col("keep_doc"),
        col("keep_chars"), (col("n_cluster") - 1).as("n_dropped"),
        (col("total_chars") - col("keep_chars")).as("chars_dropped"))
      .orderBy(col("cluster"))
  }

  val qDedupKeepBestOracle: String =
    s"""$clusterCteSql,
       |j AS (
       |  SELECT cl.cluster, cl.doc_id, d.n_chars
       |  FROM cl JOIN documents d USING (doc_id)
       |),
       |rk AS (
       |  SELECT cluster, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY cluster
       |      ORDER BY n_chars DESC, doc_id) AS r,
       |    count(*) OVER (PARTITION BY cluster) AS n_cluster,
       |    sum(n_chars) OVER (PARTITION BY cluster) AS total_chars
       |  FROM j
       |)
       |SELECT cluster, n_cluster, doc_id AS keep_doc,
       |  n_chars AS keep_chars,
       |  CAST(n_cluster - 1 AS BIGINT) AS n_dropped,
       |  CAST(total_chars - n_chars AS BIGINT) AS chars_dropped
       |FROM rk WHERE r = 1
       |ORDER BY cluster""".stripMargin

  /** Transitivity audit of the near-dup pair graph: global clustering
    * coefficient (closed wedges / wedges) over the verified Jaccard
    * edges — the cluster-QUALITY number behind q_dedup_cluster's
    * labels: connected components implicitly assume near-dup is
    * transitive; a low coefficient means chains of barely-similar docs
    * are being glued into giant clusters and the threshold (or the
    * keep policy) needs tightening. Shape: the shared [[jaccardPairs]]
    * edge sliver (blocked, never all-pairs) self-joins once on the
    * wedge midpoint — pair-domain-sized, not corpus-sized; the closed
    * check is a semi-join back onto the same edge set.
    */
  def qDedupTransitivity(s: SparkSession, dir: String): DataFrame = {
    val pairs = jaccardPairs(s, dir).select(col("doc_a"), col("doc_b"))
      .localCheckpoint() // edge sliver; feeds sym, wedges AND the probe
    val sym = pairs.union(
      pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    val wedges = sym.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .join(sym.select(col("doc_a").as("v"), col("doc_b").as("w"))
        .hint("shuffle_hash"), Seq("v"))
      .filter(col("u") < col("w"))
    val closed = wedges
      .join(pairs.select(col("doc_a").as("u"), col("doc_b").as("w"))
        .hint("shuffle_hash"), Seq("u", "w"), "left_semi")
      .agg(count(lit(1)).as("n_closed"))
    val tot = wedges.agg(count(lit(1)).as("n_wedges"))
    val ne = pairs.agg(count(lit(1)).as("n_edges"))
    ne.crossJoin(broadcast(tot)).crossJoin(broadcast(closed))
      .select(col("n_edges"), col("n_wedges"), col("n_closed"),
        NumFns.roundPortable(
          when(col("n_wedges") > 0,
            col("n_closed").cast("double") / col("n_wedges")), 6)
          .as("transitivity"))
  }

  val qDedupTransitivityOracle: String =
    s"""WITH $jaccardPairsCte,
       |pe AS (SELECT doc_a, doc_b FROM pj),
       |sym AS (
       |  SELECT doc_a, doc_b FROM pe
       |  UNION ALL SELECT doc_b, doc_a FROM pe
       |),
       |wedges AS (
       |  SELECT e1.doc_a AS u, e2.doc_b AS w
       |  FROM sym e1 JOIN sym e2 ON e1.doc_b = e2.doc_a
       |  WHERE e1.doc_a < e2.doc_b
       |),
       |cl2 AS (
       |  SELECT count(*) AS n_closed
       |  FROM wedges
       |  WHERE EXISTS (SELECT 1 FROM pe
       |    WHERE pe.doc_a = wedges.u AND pe.doc_b = wedges.w)
       |),
       |tt AS (SELECT count(*) AS n_wedges FROM wedges),
       |ne AS (SELECT count(*) AS n_edges FROM pe)
       |SELECT n_edges, n_wedges, n_closed,
       |  ${NumFns.roundPortableSql(
            "CASE WHEN n_wedges > 0 THEN" +
              " CAST(n_closed AS DOUBLE) / n_wedges END", 6)}
       |    AS transitivity
       |FROM ne, tt, cl2""".stripMargin

  /** Thresholds probed by [[qDedupThresholdSweep]]. */
  val SweepThresholds = Seq(0.5, 0.6, 0.7, 0.8)

  /** Jaccard-threshold sensitivity sweep over the blocked candidate
    * pairs: edge count and affected-document count at 0.5/0.6/0.7/0.8
    * from ONE pair-scoring pass — the "what does tightening the
    * near-dup bar actually delete?" policy table (q_lsh_tune picks
    * band geometry for a GIVEN threshold; this shows what the
    * threshold itself costs), the dedup twin of
    * q_session_gap_sensitivity. Shape: the blocked pair sliver is
    * scored once; each threshold is a conditional count, and affected
    * docs stack (threshold, doc) pairs → distinct → count over the
    * sliver — nothing rescans the corpus.
    */
  def qDedupThresholdSweep(s: SparkSession, dir: String): DataFrame = {
    val blocked = shingled(s, dir)
      .withColumn("mn", array_min(col("hs")))
      .withColumn("mx", array_max(col("hs")))
    val a = blocked.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"),
      col("mn"), col("mx"))
    val b = blocked.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"),
      col("mn"), col("mx"))
    val scored = a.join(b.hint("shuffle_hash"), Seq("mn", "mx"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccardOut.as("j"))
      .localCheckpoint() // pair sliver; feeds all thresholds
    val ths = SweepThresholds
    val edges = ths.map { t =>
      scored.filter(col("j") >= t)
        .agg(count(lit(1)).as("n_pairs"))
        .select(lit(t).as("threshold"), col("n_pairs"))
    }.reduce(_ union _)
    val docs = ths.map { t =>
      scored.filter(col("j") >= t)
        .select(col("doc_a").as("d"))
        .union(scored.filter(col("j") >= t).select(col("doc_b").as("d")))
        .distinct()
        .agg(count(lit(1)).as("n_docs_affected"))
        .select(lit(t).as("threshold"), col("n_docs_affected"))
    }.reduce(_ union _)
    edges.join(broadcast(docs), Seq("threshold"))
      .orderBy(col("threshold"))
  }

  val qDedupThresholdSweepOracle: String = {
    val rows = SweepThresholds.map { t =>
      s"""SELECT $t AS threshold,
         |  (SELECT count(*) FROM sc WHERE j >= $t) AS n_pairs,
         |  (SELECT count(*) FROM (
         |     SELECT DISTINCT d FROM (
         |       SELECT doc_a AS d FROM sc WHERE j >= $t
         |       UNION ALL SELECT doc_b FROM sc WHERE j >= $t
         |     )
         |  )) AS n_docs_affected""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $shingledSql,
       |jb AS (
       |  SELECT doc_id, hs, list_min(hs) AS mn, list_max(hs) AS mx
       |  FROM s
       |),
       |sc AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, $jaccardOutSql AS j
       |  FROM jb x JOIN jb y
       |    ON x.mn = y.mn AND x.mx = y.mx AND x.doc_id < y.doc_id
       |)
       |SELECT * FROM (
       |$rows
       |) ORDER BY threshold""".stripMargin
  }
}
