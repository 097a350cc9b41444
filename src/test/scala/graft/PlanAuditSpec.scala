package graft

/** Plan audit over the full query inventory: structural red flags that
  * would sink a 100 TB run must not appear in any operator's plan.
  */
class PlanAuditSpec extends SparkSpec {

  private lazy val plans: Map[String, String] =
    SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, sf001).queryExecution.executedPlan.toString
    }

  test("no query plans a CartesianProduct") {
    // unhinted cartesians explode at scale; the deliberate tiny
    // cross-joins (manifest expansion, IVF centroids) must arrive as
    // BroadcastNestedLoopJoin over a broadcast side instead
    plans.foreach { case (name, p) =>
      assert(!p.contains("CartesianProduct"), s"$name plans a CartesianProduct")
    }
  }

  test("every lineitem query pushes filters or prunes columns at the scan") {
    val p = plans("q_filter_pushdown")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"), p)
    // narrow projection reaches the reader
    assert(p.contains("ReadSchema: struct<l_orderkey"), p)
  }

  test("fact-dimension joins broadcast the dimension, never the fact") {
    val p = plans("q5_local_supplier")
    assert(p.contains("BroadcastHashJoin"))
    // lineitem (the fact) must not appear under a BroadcastExchange:
    // every broadcast subtree here reads customer/supplier/nation/region
    p.split("BroadcastExchange").drop(1).foreach { b =>
      val firstScan = b.split("FileScan parquet").drop(1).headOption.getOrElse("")
        .linesIterator.take(1).mkString
      assert(!firstScan.contains("lineitem.parquet"), "fact table broadcast detected")
    }
  }

  test("corpus self-joins are shuffle joins, not broadcasts") {
    Seq("q_dedup_ngram_jaccard", "q_dedup_minhash").foreach { q =>
      assert(plans(q).contains("ShuffledHashJoin"), s"$q lost its shuffle_hash hint")
    }
  }
}
