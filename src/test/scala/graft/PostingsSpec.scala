package graft

import org.apache.spark.sql.functions._

/** The shared posting-list cap ([[graft.plans.Postings]]): deterministic,
  * binding exactly at `cap` smallest ids, and format-locked to its oracle
  * mirror so the three capped candidate generators (containment, fuzzy,
  * eval-overlap) cannot drift from their DuckDB twins.
  */
class PostingsSpec extends SparkSpec {

  private def blocks = {
    import spark.implicits._
    // block "hot" has 5 postings, "cold" has 2; ids arrive shuffled
    Seq(("hot", 40L), ("hot", 10L), ("cold", 7L), ("hot", 30L),
      ("hot", 20L), ("cold", 3L), ("hot", 50L))
      .toDF("h", "doc")
  }

  test("keeps exactly the cap smallest ids per block") {
    val kept = graft.plans.Postings.capped(blocks, 3, col("doc"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept === Set(("hot", 10L), ("hot", 20L), ("hot", 30L),
      ("cold", 3L), ("cold", 7L)))
  }

  test("deterministic under repartitioning and re-evaluation") {
    val once = graft.plans.Postings
      .capped(blocks, 2, col("doc"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val shuffled = graft.plans.Postings
      .capped(blocks.repartition(7, col("doc")), 2, col("doc"), col("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(once === shuffled)
    assert(once === Seq(("cold", 3L), ("cold", 7L), ("hot", 10L), ("hot", 20L)))
  }

  test("a cap above every block size is the identity") {
    assert(graft.plans.Postings.capped(blocks, 100, col("doc"), col("h"))
      .count() === blocks.count())
  }

  test("helper column does not leak into the output schema") {
    assert(graft.plans.Postings.capped(blocks, 1, col("doc"), col("h"))
      .columns.toSeq === Seq("h", "doc"))
  }

  test("the SQL mirror renders the QUALIFY the oracles embed") {
    assert(graft.plans.Postings.cappedSql(1024, "train_doc", "h") ===
      "QUALIFY row_number() OVER (PARTITION BY h ORDER BY train_doc) <= 1024")
    assert(graft.plans.Postings.cappedSql(512, "doc_id", "k", "band") ===
      "QUALIFY row_number() OVER (PARTITION BY k, band ORDER BY doc_id) <= 512")
  }
}
