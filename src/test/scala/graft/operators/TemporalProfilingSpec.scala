package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Behavioral invariants for the round-3 operator batch (the DuckDB
  * oracle gate covers value-level correctness; these pin the semantic
  * properties a refactor could silently break).
  */
class TemporalProfilingSpec extends SparkSpec {

  test("range frame always includes the current row and never a future one") {
    val rows = Temporal.qRangeFrame(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_1h") >= 1L, s"frame must include self: $r")
    }
    // recompute one user's frame counts naively
    val uid = rows.head.getAs[Long]("user_id")
    val mine = rows.filter(_.getAs[Long]("user_id") == uid)
    val times = mine.map(_.getAs[Long]("us")).sorted
    mine.foreach { r =>
      val us = r.getAs[Long]("us")
      val expect = times.count(t => t >= us - 3600000000L && t <= us)
      assert(r.getAs[Long]("n_1h") == expect, s"frame count mismatch at $us")
    }
  }

  test("gapfill emits a contiguous hour spine with explicit zero gaps") {
    val rows = Temporal.qGapfill(spark, sf001).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val hours = rs.map(_.getAs[Long]("hour_epoch")).sorted
      assert(hours.length == ((hours.last - hours.head) / 3600 + 1).toInt,
        "spine must be contiguous")
      assert(hours.distinct.length == hours.length, "spine must not duplicate hours")
    }
    rows.filter(_.getAs[Boolean]("is_gap")).foreach { r =>
      assert(r.getAs[Long]("n_events") == 0L && r.getAs[Double]("sum_value") == 0.0,
        s"gap row must be zeroed: $r")
    }
    // total non-gap events equal the raw per-user event counts
    val filled = rows.filter(!_.getAs[Boolean]("is_gap")).map(_.getAs[Long]("n_events")).sum
    val raw = Tables.events(spark, sf001)
      .filter(col("user_id") < Temporal.GapfillUsers).count()
    assert(filled == raw, s"gapfill lost events: $filled != $raw")
  }

  test("sequence match agrees with a per-user replay of the event stream") {
    val got = Temporal.qSequenceMatch(spark, sf001).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_matches")).toMap
    val streams = Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
    streams.foreach { case (uid, evs) =>
      val seq = evs.sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
        .map(_.getAs[String]("event_type"))
      val expect = seq.sliding(3).count(_.sameElements(Seq("view", "click", "purchase")))
      assert(got(uid) == expect.toLong, s"user $uid: ${got(uid)} != $expect")
    }
  }

  test("unpivot emits one row per metric with the full fact count each") {
    val n = Tables.lineitem(spark, sf001).count()
    val rows = Analytics.qUnpivot(spark, sf001).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getAs[Long]("n") == n, s"melt dropped rows: $r"))
  }

  test("mode is the true per-segment maximum count") {
    val counts = Tables.orders(spark, sf001)
      .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority")).count().collect()
      .groupBy(_.getAs[String]("c_mktsegment"))
    val rows = Analytics.qModeAgg(spark, sf001).collect()
    assert(rows.length == counts.size, "one row per segment")
    rows.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      val best = counts(seg).map(_.getAs[Long]("count")).max
      assert(r.getAs[Long]("n") == best, s"mode count not maximal: $r")
    }
  }

  test("percent_rank spans [0,1] per segment and is monotone in balance") {
    val rows = Analytics.qPercentRank(spark, sf001).collect()
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r.getAs[Double]("c_acctbal"), r.getAs[Long]("c_custkey")))
      assert(sorted.head.getAs[Double]("pct_rank") == 0.0)
      assert(sorted.last.getAs[Double]("pct_rank") == 1.0)
      assert(sorted.last.getAs[Double]("cume") == 1.0)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("pct_rank") <= b.getAs[Double]("pct_rank"))
        case _ =>
      }
    }
  }

  test("summary stats are internally consistent") {
    val rows = Profiling.qSummaryStats(spark, sf001).collect()
    val n = Tables.lineitem(spark, sf001).count()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Double]("vmin") <= r.getAs[Double]("vmean"))
      assert(r.getAs[Double]("vmean") <= r.getAs[Double]("vmax"))
      assert(r.getAs[Double]("vstd") >= 0.0)
    }
  }

  test("char-class ratios are proper fractions that cannot over-count") {
    val rows = Profiling.qCharClasses(spark, sf001).collect()
    rows.foreach { r =>
      val rs = Seq("digit_ratio", "upper_ratio", "space_ratio", "symbol_ratio")
        .map(r.getAs[Double])
      rs.foreach(x => assert(x >= 0.0 && x <= 1.0, s"ratio out of range: $r"))
      // classes are disjoint; lowercase letters are the uncounted rest
      assert(rs.sum <= 1.0 + 1e-9, s"disjoint classes over-count: $r")
    }
  }

  test("word entropy is bounded by ln(n_distinct) and zero for uniform-1 docs") {
    val rows = Profiling.qWordEntropy(spark, sf001).collect()
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val nd = r.getAs[Long]("n_distinct")
      assert(h >= -1e-4, s"entropy negative: $r")
      assert(h <= math.log(nd.toDouble) + 1e-4, s"entropy above ln(types): $r")
      if (nd == 1) assert(math.abs(h) < 1e-9, s"single-type doc must be 0: $r")
    }
  }

  test("source caps keep at most N per source with contiguous ranks") {
    val rows = Curation.qSourceCaps(spark, sf001).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.length <= Curation.SourceCap)
      val ranks = rs.map(_.getAs[Int]("cap_rank")).sorted
      assert(ranks.toSeq == (1 to rs.length).toSeq, "ranks must be 1..k")
    }
  }

  test("ngram novelty: the earliest document is fully novel, fractions proper") {
    val rows = Dedup.qNgramNovelty(spark, sf001).collect()
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Double]("novelty") == 1.0, s"first doc must be novel: $first")
    rows.foreach { r =>
      val f = r.getAs[Double]("novelty")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
  }

  test("semdedup keepers precede their dropped vectors above threshold") {
    val rows = Similarity.qSemdedup(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("kept_by") < r.getAs[Long]("vec_id"),
        s"keeper must be earlier: $r")
      assert(r.getAs[Double]("sim_kept") >= Similarity.NearDupThreshold,
        s"kept pair under threshold: $r")
    }
  }

  test("unioned shard sketches give the same estimate as one direct sketch") {
    // HLL mergeability is exact: union-of-shard-sketches must EQUAL the
    // sketch built in a single pass over the same keys, not just
    // approximate it — this is what licenses pre-aggregated sketch tables
    val merged = Sketches.qSketchMerge(spark, sf001).collect()
    assert(merged.nonEmpty)
    merged.foreach(r => assert(r.getAs[Boolean]("within_bound"), s"out of bound: $r"))
    val direct = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(12))).as("est"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("est")).toMap
    val viaUnion = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey"), lit(12)).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("est")).toMap
    assert(viaUnion == direct, s"merge must be lossless: $viaUnion vs $direct")
  }

  test("pagerank step conserves damped rank mass") {
    val rows = Graph.qPagerankIter(spark, sf001).collect()
    val mass = rows.map(r => r.getAs[Double]("rank") - (1.0 - Graph.Damping)).sum
    val nSources = Tables.orders(spark, sf001)
      .join(Tables.lineitem(spark, sf001), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey")).distinct().count()
    // every source customer distributes exactly 1.0 of damped mass
    assert(math.abs(mass - Graph.Damping * nSources) < 1e-2,
      s"mass $mass != ${Graph.Damping} * $nSources")
  }

  test("skyline matches the brute-force dominance check") {
    val parts = Tables.part(spark, sf001)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expect = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, pr2, sz2) => pr2 < pr && sz2 >= sz }
    }.map(_._1).toSet
    val got = Analytics.qSkyline(spark, sf001).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    assert(got == expect, s"skyline mismatch: extra=${got -- expect} missing=${expect -- got}")
  }

  test("seasonal decomposition reassembles the series and seasonal means cancel") {
    val rows = Temporal.qSeasonalDecompose(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val y = r.getAs[Long]("rev_cents").toDouble
      val recomposed = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(y - recomposed) < 1e-4, s"trend+seasonal+residual != y: $r")
    }
    // the seasonal component is a mean of detrended values, so weighting
    // each dow's value by its day count must cancel against the residuals
    val byDow = rows.groupBy(_.getAs[Int]("dow"))
    assert(byDow.size == 7)
    byDow.values.foreach { g =>
      val meanResid = g.map(_.getAs[Double]("residual")).sum / g.size
      assert(math.abs(meanResid) < 1e-3, s"per-dow residuals must center on 0")
    }
  }

  test("forecast backtest scores both baselines with sane error magnitudes") {
    val rows = Temporal.qForecastEval(spark, sf001).collect()
    assert(rows.map(_.getAs[String]("model")).sorted.toSeq ==
      Seq("naive_lag1", "seasonal_naive_lag7"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0)
      assert(r.getAs[Double]("mae_cents") >= 0.0)
      val sm = r.getAs[Double]("smape")
      assert(sm >= 0.0 && sm <= 2.0, s"SMAPE is bounded by 2: $r")
    }
  }
}
