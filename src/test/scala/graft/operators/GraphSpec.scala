package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class GraphSpec extends SparkSpec {

  import spark.implicits._

  test("pagerank conserves total rank mass on a closed graph") {
    // 4-cycle plus a chord: every node has an out-edge, so each round
    // redistributes ALL mass — Σ rank must stay n after every iteration
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    Seq(1, 3, 7).foreach { iters =>
      val ranks = Graph.pagerank(edges, iters)
      assert(ranks.count() == 4)
      val mass = ranks.agg(sum(col("rank"))).head.getDouble(0)
      assert(math.abs(mass - 4.0) < 1e-9, s"mass $mass after $iters iters")
    }
  }

  test("pagerank on a uniform cycle is the fixpoint: every rank stays 1.0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val ranks = Graph.pagerank(edges, 5).collect()
    ranks.foreach(r => assert(math.abs(r.getAs[Double]("rank") - 1.0) < 1e-12))
  }

  test("pagerank matches the hand-iterated recurrence on a star graph") {
    // a,b,c → hub; hub → a. Sources keep only teleport mass after round 1;
    // iterate the recurrence by hand and compare after 3 rounds.
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    var hub = 1.0; var a = 1.0; var bc = 1.0
    (1 to 3).foreach { _ =>
      val hubNew = 0.15 + 0.85 * (a + 2 * bc)
      val aNew = 0.15 + 0.85 * hub
      hub = hubNew; a = aNew; bc = 0.15
    }
    val got = Graph.pagerank(edges, 3).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("rank")).toMap
    assert(math.abs(got(0L) - hub) < 1e-9)
    assert(math.abs(got(1L) - a) < 1e-9)
    assert(math.abs(got(2L) - bc) < 1e-9)
    assert(math.abs(got(3L) - bc) < 1e-9)
  }

  test("the audited single step equals pagerank(iters = 1) on the purchase graph") {
    val step = Graph.qPagerankIter(spark, sf001).collect()
      .map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Double]("rank")).toMap
    val edges = graft.sources.Tables.orders(spark, sf001)
      .join(graft.sources.Tables.lineitem(spark, sf001),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
    val full = Graph.pagerank(edges, 1).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("rank")).toMap
    assert(step.nonEmpty)
    step.foreach { case (k, v) =>
      assert(math.abs(full(k) - v) < 5e-7, s"supplier $k: step=$v full=${full(k)}")
    }
  }

  test("labelProp one iteration equals the audited q_label_prop half-step") {
    val edges = Tables.orders(spark, sf001)
      .join(Tables.lineitem(spark, sf001), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey").as("left"), col("l_suppkey").as("right"))
      .agg(count(lit(1)).as("w"))
    val labels = Tables.supplier(spark, sf001)
      .select(col("s_suppkey").as("right"), col("s_nationkey").as("label"))
    val loop = Graph.labelProp(edges, labels, iters = 1).collect()
      .map(r => r.getAs[Long]("left") -> r.getAs[Long]("label")).toMap
    val step = Graph.qLabelProp(spark, sf001).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[Long]("label")).toMap
    assert(loop == step, "first half-step must reproduce the oracle-gated query")
  }

  test("labelProp converges on a separable bipartite community graph") {
    // two disconnected communities: lefts {1,2} ↔ rights {10,11} labeled 7,
    // lefts {3,4} ↔ rights {12,13} labeled 9 — any iteration count must
    // assign each left its community's label and never leak across
    val edges = Seq(
      (1L, 10L, 3L), (1L, 11L, 1L), (2L, 10L, 2L),
      (3L, 12L, 5L), (4L, 12L, 1L), (4L, 13L, 2L))
      .toDF("left", "right", "w")
    val labels = Seq((10L, 7L), (11L, 7L), (12L, 9L), (13L, 9L))
      .toDF("right", "label")
    Seq(1, 3).foreach { iters =>
      val got = Graph.labelProp(edges, labels, iters).collect()
        .map(r => r.getAs[Long]("left") -> r.getAs[Long]("label")).toMap
      assert(got == Map(1L -> 7L, 2L -> 7L, 3L -> 9L, 4L -> 9L),
        s"iters=$iters gave $got")
    }
  }

  test("edgeMemo keys on itemCol: same keyCol, different itemCol ≠ same frame") {
    // regression for the r9 verdict's latent memo-key wrinkle: the memo
    // key once omitted itemCol, so a second graph pairing an existing
    // keyCol with a DIFFERENT itemCol silently got the first graph's
    // edge set back. Same keyCol (l_orderkey), two item domains —
    // the returned edge sets must differ.
    val parts = Graph.cappedPairEdges(spark, sf001, "l_orderkey", "l_partkey")
    val supps = Graph.cappedPairEdges(spark, sf001, "l_orderkey", "l_suppkey")
    val onlyInParts = parts.exceptAll(supps).count()
    val onlyInSupps = supps.exceptAll(parts).count()
    assert(onlyInParts + onlyInSupps > 0,
      "distinct itemCols under one keyCol must yield distinct edge frames")
  }

  test("pairEdgesFrame is join-free and matches the self-join reference") {
    // r10: the shared edge derivation is collect_set + combination
    // explode — its physical plan must carry NO join (the r9 shape's
    // fan join + pair self-join were three exchanges of the fact
    // sliver). Shape pin first, then semantic parity against the
    // brute-force self-join computed inline.
    import org.apache.spark.sql.functions._
    val frame = Graph.pairEdgesFrame(spark, sf001, "l_partkey", "l_suppkey")
    val plan = frame.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"),
      s"edge derivation must be join-free, got:\n$plan")
    val li = graft.sources.Tables.lineitem(spark, sf001)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("su")).distinct()
    val fan = li.groupBy(col("p")).agg(count(lit(1)).as("f"))
      .filter(col("f") <= Graph.CoreMaxFanout)
    val capped = li.join(fan, Seq("p"))
    val ref = capped.select(col("p"), col("su").as("sa"))
      .join(capped.select(col("p"), col("su").as("sb")), Seq("p"))
      .filter(col("sa") < col("sb"))
      .select(col("sa"), col("sb")).distinct()
    assert(frame.exceptAll(ref).count() == 0 &&
      ref.exceptAll(frame).count() == 0,
      "combination-explode edges must equal the self-join reference set")
  }
}
