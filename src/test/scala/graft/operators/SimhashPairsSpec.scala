package graft.operators

import graft.SparkSpec

class SimhashPairsSpec extends SparkSpec {

  test("hamming-band pairs recover the minhash-verified near-dups exactly") {
    val fps = Dedup.qDedupSimhash(spark, sf001)
    val pairs = Dedup.simhashPairs(fps, maxHamming = 12, bands = 15).collect()
    pairs.foreach(r => assert(r.getAs[Int]("hamming") <= 12))
    // exactness: d < bands guarantees band collision, so the band join
    // must find EVERY pair within the radius — cross-check by brute force
    val all = fps.collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = for {
      (ida, fa) <- all; (idb, fb) <- all
      if ida < idb && java.lang.Long.bitCount(fa ^ fb) <= 12
    } yield (ida, idb)
    val banded = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(banded == brute.toSet, s"banded=${banded.size} brute=${brute.size}")
  }
}
