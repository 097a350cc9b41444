package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("brute-force top-k returns 5 ranked neighbors per query") {
    val rows = Similarity.qAnnTopk(spark, sf001).collect()
    assert(rows.length == 10 * 5)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.values.foreach { rs =>
      val ranked = rs.sortBy(_.getAs[Int]("rank"))
      assert(ranked.map(_.getAs[Int]("rank")).toSeq == (1 to 5))
      val sims = ranked.map(_.getAs[Double]("sim"))
      assert(sims.sameElements(sims.sortBy(-_)), "sims not descending")
      sims.foreach(sv => assert(sv >= -1.0001 && sv <= 1.0001))
    }
  }

  test("LSH ANN never returns a cross-bucket pair and sims match brute force") {
    val lsh = Similarity.qAnnLsh(spark, sf001).collect()
    assert(lsh.nonEmpty)
    val brute = Similarity.qAnnTopk(spark, sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) -> r.getAs[Double]("sim"))
      .toMap
    // where an LSH hit coincides with a brute-force top-5 hit, sims agree
    lsh.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      brute.get(k).foreach(s => assert(math.abs(s - r.getAs[Double]("sim")) < 1e-9))
    }
  }

  test("near-dup pairs stay within a label block") {
    val rows = Similarity.qEmbedNeardup(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("sim") >= Similarity.NearDupThreshold)
      assert(r.getAs[Long]("vec_id_a") < r.getAs[Long]("vec_id_b"))
    }
  }
}
