package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineOpsSpec extends SparkSpec {

  test("crossval folds partition the corpus exactly (doc counts sum to the corpus)") {
    val folds = PipelineOps.qCrossvalFolds(spark, sf001).collect()
    assert(folds.map(_.getLong(0)).toSet.subsetOf((0L until 5L).toSet))
    val total = graft.sources.Tables.documents(spark, sf001).count()
    assert(folds.map(_.getLong(1)).sum == total)
    // deterministic: a second evaluation assigns identical fold sizes
    val again = PipelineOps.qCrossvalFolds(spark, sf001).collect()
    assert(folds.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("lsh tune: collision probability is monotone in similarity and rows sharpen the curve") {
    val rows = PipelineOps.qLshTune(spark, sf001).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2), r.getDouble(4)))
    assert(rows.nonEmpty)
    // within a config, p_collide grows with the decile
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val byDecile = rs.sortBy(_._2).map(_._3)
      assert(byDecile.zip(byDecile.tail).forall { case (a, b) => a <= b + 1e-12 })
    }
    // at the TOP decile every config catches nearly everything; at any
    // fixed decile more rows-per-band (sharper curve) never collides more
    val byConfig = rows.groupBy(_._1)
    val decs = rows.map(_._2).distinct
    decs.foreach { d =>
      val ps = PipelineOps.LshConfigs.flatMap(c =>
        byConfig(c).find(_._2 == d).map(t => (c._2, t._3)))
      ps.sortBy(_._1).map(_._2).sliding(2).foreach {
        case Seq(lo, hi) => assert(hi <= lo + 1e-9, s"decile $d: $ps")
        case _ =>
      }
    }
  }

  test("curriculum phases cover all tokens once, scores descend across phases") {
    val phases = PipelineOps.qCurriculum(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(phases.map(_._1).toSeq == (1 to phases.length))
    val totalDocs = graft.sources.Tables.documents(spark, sf001).count()
    assert(phases.map(_._2).sum == totalDocs)
    // phase 1 holds the highest scores: min of each phase >= max of the next
    phases.sliding(2).foreach {
      case Array(hi, lo) => assert(hi._4 >= lo._5, s"$hi vs $lo")
      case _ =>
    }
    // equal-mass cut: no phase exceeds ~half the token mass (4 phases)
    val total = phases.map(_._3).sum
    phases.foreach(p => assert(p._3 < total, p.toString))
  }

  test("table profile reports plausible stats for every profiled column") {
    val prof = PipelineOps.qTableProfile(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.keySet == Set("o_orderstatus", "o_orderpriority", "o_totalprice", "o_custkey"))
    val price = prof("o_totalprice")
    assert(price.getLong(2) == 0L) // no nulls
    assert(price.getDouble(4) <= price.getDouble(5)) // min <= max
    assert(price.isNullAt(6) && price.isNullAt(7)) // no string lane
    val status = prof("o_orderstatus")
    assert(status.isNullAt(4) && status.isNullAt(5))
    assert(status.getString(6) <= status.getString(7))
  }

  test("srm: expected counts sum to the corpus and chi2 contributions are non-negative") {
    val rows = PipelineOps.qSrm(spark, sf001).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    val totalDocs = graft.sources.Tables.documents(spark, sf001).count()
    assert(rows.map(_.getLong(1)).sum == totalDocs)
    assert(math.abs(rows.map(_.getDouble(2)).sum - totalDocs) < 1e-6)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
  }

  test("time-to-convert percentiles are ordered and positive") {
    val r = PipelineOps.qTimeToConvert(spark, sf001).collect()(0)
    val (p50, p90, p99) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(p50 > 0 && p50 <= p90 && p90 <= p99)
    assert(r.getLong(3) > 0)
  }

  test("reorder rate: repeat customers never exceed total customers") {
    val rows = PipelineOps.qReorderRate(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("compress ratio: unique grams bounded by total, ratio in (0, 1]") {
    val rows = PipelineOps.qCompressRatio(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("session funnel: stage counts sum to the session count and stages only shrink") {
    val rows = PipelineOps.qSessionFunnel(spark, sf001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nSessions = Relational.qSessionize(spark, sf001)
      .agg(org.apache.spark.sql.functions.sum("n_sessions")).collect()(0).getLong(0)
    assert(rows.values.sum == nSessions)
    // funnel property: reached-stage-k counts shrink as k grows
    val reached = (1 to 3).map(k => rows.filter(_._1 >= k).values.sum)
    assert(reached.zip(reached.tail).forall { case (a, b) => a >= b })
  }

  test("watermark audit: lateness percentiles ordered, on-time share in (0,1]") {
    val rows = PipelineOps.qWatermarkAudit(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p95, mx) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 >= 0 && p50 <= p95 && p95 <= mx)
      val share = r.getDouble(5)
      assert(share > 0 && share <= 1.0)
    }
  }

  test("join-skew profiler: row counts conserve and skew factor >= 1") {
    val rows = PipelineOps.qJoinSkew(spark, sf001).collect()
    assert(rows.length == 5)
    val li = graft.sources.Tables.lineitem(spark, sf001).count()
    rows.filter(_.getString(0).startsWith("lineitem.")).foreach { r =>
      assert(r.getLong(2) == li, r.toString) // n_rows = fact rows for each key
      assert(r.getDouble(6) >= 1.0 - 1e-9)   // max/mean >= 1 by definition
      assert(r.getDouble(3) <= r.getDouble(4)) // p50 <= p99
      assert(r.getDouble(4) <= r.getLong(5).toDouble + 1e-9)
    }
  }

  test("feature store: one row per ordering customer, internally consistent features") {
    val rows = PipelineOps.qFeatureStore(spark, sf001).collect()
    val ordering = graft.sources.Tables.orders(spark, sf001)
      .select("o_custkey").distinct().count()
    assert(rows.length.toLong == ordering)
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0)
      assert(r.getDouble(4) > 0)
      // avg order value times order count recovers total spend (to rounding)
      assert(math.abs(r.getDouble(5) * r.getLong(1) - r.getDouble(4)) <
        0.01 * r.getLong(1) + 1e-6)
      assert(r.getDouble(6) >= 0.0)
    }
  }

  test("A/B conversion: users partition into variants and z is finite when defined") {
    val r = PipelineOps.qAbConversion(spark, sf001).collect()(0)
    val nUsers = graft.sources.Tables.events(spark, sf001)
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(2) == nUsers)
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    if (!r.isNullAt(6)) assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }

  test("negative sampling: draws are reproducible and never true positives") {
    val a = PipelineOps.qNegativeSampling(spark, sf001).collect()
    val b = PipelineOps.qNegativeSampling(spark, sf001).collect()
    assert(a.nonEmpty && a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x == y) }
    import spark.implicits._
    val pos = graft.sources.Tables.orders(spark, sf001)
      .join(graft.sources.Tables.lineitem(spark, sf001), $"o_orderkey" === $"l_orderkey")
      .select($"o_custkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    a.foreach { r =>
      assert(!pos.contains((r.getLong(0), r.getLong(2))), r.toString)
    }
  }

  test("contrastive pairs: positives and hard negatives are disjoint and bounded by cell pairs") {
    val rows = Similarity.qContrastivePairs(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nPos, nNeg) = (r.getLong(1), r.getLong(2))
      assert(nPos >= 0 && nNeg >= 0 && nPos + nNeg > 0)
      // mean similarities only reported when the class is non-empty, in [-1, 1]
      if (nPos > 0) assert(math.abs(r.getDouble(3)) <= 1.0)
      if (nNeg > 0) assert(math.abs(r.getDouble(4)) <= 1.0)
    }
  }
}
