package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The persisted band-index artifact (r9 verdict ask #6): the LSH band
  * index `q_incremental_minhash` probes is a bucketed catalog table with
  * a documented refresh contract, not a session-lifetime memoized frame.
  * These tests pin (a) parity between the persisted table and the
  * in-session derivation, (b) the append/rebuild refresh contract, and
  * (c) the scale property the bucketing buys: the index side of the
  * probe join reads pre-partitioned buckets, so only the arriving batch
  * shuffles.
  */
class BandIndexStoreSpec extends SparkSpec {

  private def corpusRows(dir: String) =
    Dedup.bandIndexOf(Tables.documents(spark, dir)
      .filter(col("doc_id") < Dedup.IncrementalCutover))

  test("persisted band index equals the in-session derivation row-for-row") {
    val persisted = Dedup.persistedBandIndex(spark, sf001)
    val derived = corpusRows(sf001)
    assert(persisted.exceptAll(derived).count() == 0
      && derived.exceptAll(persisted).count() == 0,
      "persisted artifact diverged from bandIndexOf(corpus)")
  }

  test("refresh contract: append admits a batch, drop+rebuild restores") {
    val batch = Tables.documents(spark, sf001)
      .filter(col("doc_id") >= Dedup.IncrementalCutover
        && col("doc_id") < Dedup.IncrementalCutover + 20)
    val before = Dedup.persistedBandIndex(spark, sf001).count()
    Dedup.refreshBandIndex(spark, sf001, batch)
    val appended = Dedup.persistedBandIndex(spark, sf001)
    val expected = corpusRows(sf001).unionAll(Dedup.bandIndexOf(batch))
    assert(appended.exceptAll(expected).count() == 0
      && expected.exceptAll(appended).count() == 0,
      "append did not produce corpus ∪ batch band rows")
    assert(appended.count() > before)
    // full rebuild path: drop, then first touch rebuilds corpus-only
    Dedup.dropBandIndex(spark, sf001)
    val rebuilt = Dedup.persistedBandIndex(spark, sf001)
    assert(rebuilt.exceptAll(corpusRows(sf001)).count() == 0
      && rebuilt.count() == before, "drop+rebuild did not restore the corpus index")
  }

  test("probe join reads the index from buckets: only the batch side shuffles") {
    val probe = Dedup.bandIndexOf(Tables.documents(spark, sf001)
      .filter(col("doc_id") >= Dedup.IncrementalCutover))
    val idx = Dedup.persistedBandIndex(spark, sf001)
    val j = probe.as("a").join(idx.as("b").hint("shuffle_hash"),
      col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"index scan is not bucketed:\n$plan")
    val nExchanges = "Exchange".r.findAllIn(plan).size
    assert(nExchanges == 1,
      s"expected exactly the probe-side exchange, found $nExchanges:\n$plan")
  }
}
