package graft

import graft.operators.{Graph, Recsys}

/** The session-memo eviction contract: memoized frames are reused
  * within a session and re-derived after evict (the resident-engine
  * refresh path).
  */
class SessionMemoSpec extends SparkSpec {

  test("memoized frames are reused until evicted, re-derived after") {
    val a = Graph.cappedPairEdges(spark, sf001, "l_partkey", "l_suppkey")
    val b = Graph.cappedPairEdges(spark, sf001, "l_partkey", "l_suppkey")
    assert(a eq b, "second access must return the memoized frame")
    val evicted = SessionMemo.evict(spark)
    assert(evicted.contains("graph.edgeMemo"),
      s"touched families must be registered, got $evicted")
    val c = Graph.cappedPairEdges(spark, sf001, "l_partkey", "l_suppkey")
    assert(!(a eq c), "post-evict access must re-derive the frame")
    // semantics survive the round-trip: same edge set either side
    assert(a.exceptAll(c).count() == 0 && c.exceptAll(a).count() == 0,
      "re-derived frame must equal the evicted one on unchanged tables")
  }

  test("evict clears every registered family for the session") {
    val cf = Recsys.qCfCoverage(spark, sf001)
    cf.collect() // touch the cfMemo so recsys registers + memoizes
    val evicted = SessionMemo.evict(spark)
    assert(evicted.contains("recsys.cfMemo") &&
      evicted.contains("graph.edgeMemo"),
      s"both touched families must evict, got $evicted")
  }
}
