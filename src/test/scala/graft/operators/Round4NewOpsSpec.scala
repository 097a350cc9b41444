package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Behavioral invariants for the late-round-4 operator batch (Benford,
  * JSD drift, degree distribution, BM25, readability, RFM). The DuckDB
  * oracle gate pins value-level correctness; these pin the semantic
  * properties a refactor could silently break.
  */
class Round4NewOpsSpec extends SparkSpec {

  test("benford digits partition the rows and expected shares are log10(1+1/d)") {
    val rows = Profiling.qBenford(spark, sf001).collect()
    val digits = rows.map(_.getAs[Int]("digit"))
    assert(digits.toSet.subsetOf((1 to 9).toSet) && digits.length == digits.distinct.length)
    // every row lands in exactly one digit bucket
    val nRows = Tables.lineitem(spark, sf001).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nRows)
    rows.foreach { r =>
      val d = r.getAs[Int]("digit")
      assert(math.abs(r.getAs[Double]("benford_share") - math.log10(1.0 + 1.0 / d)) < 1e-6)
      // deviation is share - expectation on the same grid
      assert(math.abs(r.getAs[Double]("dev") -
        (r.getAs[Double]("share") - r.getAs[Double]("benford_share"))) < 2e-6)
    }
    // shares are a distribution
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-5)
  }

  test("jsd drift is a per-source divergence in [0, 1] bits") {
    val rows = Profiling.qJsdDrift(spark, sf001).collect()
    val nSources = Tables.documents(spark, sf001).select(col("source")).distinct().count()
    assert(rows.length == nSources)
    rows.foreach { r =>
      val j = r.getAs[Double]("jsd_bits")
      assert(j >= 0.0 && j <= 1.0, s"JSD must be in [0,1] bits: $r")
      assert(r.getAs[Long]("n_words") > 0)
    }
  }

  test("degree buckets bound their degrees by powers of two and cover all suppliers") {
    val rows = Graph.qDegreeDist(spark, sf001).collect()
    val nSupp = Tables.orders(spark, sf001)
      .join(Tables.lineitem(spark, sf001), col("o_orderkey") === col("l_orderkey"))
      .select(col("l_suppkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nSupp)
    rows.foreach { r =>
      val b = r.getAs[Int]("log2_bucket")
      assert(r.getAs[Long]("min_degree") >= (1L << b), s"bucket lower bound: $r")
      assert(r.getAs[Long]("max_degree") < (1L << (b + 1)), s"bucket upper bound: $r")
    }
  }

  test("bm25 returns descending scores over docs that contain a query term") {
    val rows = TextAnalysis.qBm25(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= TextAnalysis.Bm25TopK)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "top-k must be sorted")
    rows.foreach(r => assert(r.getAs[Long]("n_terms") >= 1
      && r.getAs[Long]("n_terms") <= TextAnalysis.Bm25Query.length))
    // every returned doc really contains at least one query term
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val matching = Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")).as("t"))
      .filter(arrays_overlap(col("t"),
        array(TextAnalysis.Bm25Query.map(lit(_)): _*)))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(matching))
  }

  test("readability bands follow the rounded flesch score") {
    val rows = TextAnalysis.qReadability(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("flesch")
      val expected =
        if (f >= 90) "very_easy" else if (f >= 60) "easy"
        else if (f >= 50) "medium" else if (f >= 30) "hard" else "very_hard"
      assert(r.getAs[String]("band") == expected, s"band must match score: $r")
      // the score recomputes from the emitted integer counts
      val w = r.getAs[Long]("n_words").toDouble
      val sy = r.getAs[Long]("n_syllables").toDouble
      val se = r.getAs[Long]("n_sentences").toDouble
      assert(math.abs(f - (206.835 - 1.015 * (w / se) - 84.6 * (sy / w))) < 1e-3)
    }
  }

  test("incremental minhash equals the full near-dup pair set restricted to batch-corpus crossings") {
    val inc = Dedup.qIncrementalMinhash(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("dup_of"), r.getAs[Double]("jaccard")))
      .toSet
    // every admitted probe pairs a batch doc with an established doc
    inc.foreach { case (d, dup, j) =>
      assert(d >= Dedup.IncrementalCutover && dup < Dedup.IncrementalCutover)
      assert(j >= Dedup.JaccardThreshold)
    }
    // same band scheme as the full query: the incremental pair set is
    // exactly the full pair set's batch x corpus crossings
    val full = Dedup.qDedupMinhash(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
      .filter { case (a, b, _) => a < Dedup.IncrementalCutover && b >= Dedup.IncrementalCutover }
      .map { case (a, b, j) => (b, a, j) }
      .toSet
    assert(inc == full, s"incremental pairs must equal restricted full pairs: $inc vs $full")
  }

  test("ewma starts at the raw value and stays inside the window's value range") {
    val rows = Temporal.qEwma(spark, sf001).collect()
    assert(rows.nonEmpty)
    // reconstruct each user's ordered series and check the smoother
    val byUser = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("us"), r.getAs[Double]("value")))
      .groupBy(_._1)
      .map { case (u, es) => u -> es.sortBy(e => (e._3, e._2)).map(_._4) }
    val out = rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")) ->
      r.getAs[Double]("ewma")).toMap
    val firstEvents = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Long]("us"),
        r.getAs[Double]("value")))
      .groupBy(_._1)
      .map { case (_, es) => es.minBy(e => (e._3, e._2)) }
    // a user's FIRST event has a single-term series: ewma == value
    firstEvents.foreach { case (u, eid, _, v) =>
      assert(math.abs(out((u, eid)) - v) < 1e-5, s"first ewma must equal value for user $u")
    }
    // every smoothed value lies within its user's min/max raw value
    rows.foreach { r =>
      val vals = byUser(r.getAs[Long]("user_id"))
      val e = r.getAs[Double]("ewma")
      assert(e >= vals.min - 1e-6 && e <= vals.max + 1e-6, s"ewma outside value range: $r")
    }
  }

  test("twap matches a driver-side recomputation per user") {
    val rows = Temporal.qTwap(spark, sf001).collect()
    assert(rows.nonEmpty)
    val byUser = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"), r.getAs[Long]("us"),
        r.getAs[Double]("value")))
      .groupBy(_._1)
    rows.foreach { r =>
      val es = byUser(r.getAs[Long]("user_id")).sortBy(e => (e._3, e._2))
      val durs = es.zip(es.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      val span = durs.map(_._2).sum
      assert(r.getAs[Long]("span_us") == span)
      assert(r.getAs[Long]("n_intervals") == durs.length)
      val expected = durs.map { case (v, d) => v * d }.sum / span
      assert(math.abs(r.getAs[Double]("twap") - expected) < 1e-4, s"twap mismatch: $r")
    }
  }

  test("welch t-test matches a driver-side recomputation and df stays in its bounds") {
    val rows = Profiling.qWelchTtest(spark, sf001).collect()
    assert(rows.nonEmpty)
    val data = Tables.events(spark, sf001)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id") % 2,
        r.getAs[Double]("value")))
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val arm0 = data.filter(d => d._1 == t && d._2 == 0).map(_._3)
      val arm1 = data.filter(d => d._1 == t && d._2 == 1).map(_._3)
      assert(r.getAs[Long]("n0") == arm0.length && r.getAs[Long]("n1") == arm1.length)
      def stats(xs: Array[Double]) = {
        val n = xs.length.toDouble
        val m = xs.sum / n
        (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
      }
      val (n0, m0, v0) = stats(arm0)
      val (n1, m1, v1) = stats(arm1)
      val se = v0 / n0 + v1 / n1
      assert(math.abs(r.getAs[Double]("t_stat") - (m0 - m1) / math.sqrt(se)) < 1e-2)
      val df = r.getAs[Double]("welch_df")
      assert(df >= math.min(n0, n1) - 1 - 1e-6 && df <= n0 + n1 - 2 + 1e-6,
        s"welch df out of bounds: $r")
    }
  }

  test("stickiness is dau/wau with dau never exceeding wau") {
    val rows = Behavioral.qStickiness(spark, sf001).collect()
    val nDays = Tables.events(spark, sf001)
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.length == nDays)
    rows.foreach { r =>
      val dau = r.getAs[Long]("dau"); val wau = r.getAs[Long]("wau")
      assert(dau >= 1 && dau <= wau, s"dau must not exceed wau: $r")
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
      assert(math.abs(st - dau.toDouble / wau) < 1e-5)
    }
  }

  test("cohort ltv curves are cumulative and consistent per cohort") {
    val rows = Behavioral.qCohortLtv(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("cohort_month")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("age_months"))
      // first cell's cumulative equals its own revenue
      assert(math.abs(sorted.head.getAs[Double]("cum_revenue") -
        sorted.head.getAs[Double]("revenue")) < 1e-6)
      // cumulative is nondecreasing and sums the per-age revenue
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(math.abs(b.getAs[Double]("cum_revenue") -
            (a.getAs[Double]("cum_revenue") + b.getAs[Double]("revenue"))) < 1e-2)
        case _ =>
      }
      // ltv is the per-customer cumulative
      sorted.foreach { r =>
        assert(math.abs(r.getAs[Double]("ltv_per_customer") * r.getAs[Long]("n_customers")
          - r.getAs[Double]("cum_revenue")) < r.getAs[Long]("n_customers") * 1e-3)
      }
    }
    // cohort sizes cover every customer exactly once at age 0
    val nCust = Tables.orders(spark, sf001).select(col("o_custkey")).distinct().count()
    val age0 = rows.filter(_.getAs[Int]("age_months") == 0)
    assert(age0.map(r => r.getAs[String]("cohort_month") -> r.getAs[Long]("n_customers"))
      .toMap.values.sum == nCust)
  }

  test("basket lift marginals bound the pair counts and ratios recompute") {
    val rows = Behavioral.qBasketLift(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cab = r.getAs[Long]("c_ab")
      val ca = r.getAs[Long]("c_a"); val cb = r.getAs[Long]("c_b")
      assert(cab >= Behavioral.BasketMinCooc && cab <= math.min(ca, cb),
        s"pair count must be bounded by marginals: $r")
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
      assert(math.abs(r.getAs[Double]("confidence") - cab.toDouble / ca) < 1e-5)
    }
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b }, "sorted by lift desc")
  }

  test("pareto shares are monotone in pct and bounded by the top-rank identity") {
    val rows = Behavioral.qParetoShare(spark, sf001).collect()
    assert(rows.map(_.getAs[Int]("pct")).toSeq == Behavioral.ParetoLevels)
    val nCust = Tables.orders(spark, sf001).select(col("o_custkey")).distinct().count()
    rows.foreach { r =>
      val pct = r.getAs[Int]("pct")
      assert(r.getAs[Long]("n_top") == (nCust * pct + 99) / 100)
      val share = r.getAs[Double]("revenue_share")
      // top p% of customers hold at least p% of revenue (sorted desc)
      assert(share >= pct / 100.0 - 1e-9 && share <= 1.0)
    }
    val shares = rows.map(_.getAs[Double]("revenue_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      "share must grow with pct")
  }

  test("item-cf neighbors are symmetric-counted, ranked, and capped at top-k") {
    val rows = Recsys.qItemCf(spark, sf001).collect()
    assert(rows.nonEmpty)
    val byPart = rows.groupBy(_.getAs[Long]("part"))
    byPart.foreach { case (_, rs) =>
      assert(rs.length <= Recsys.CfTopK)
      val ranked = rs.sortBy(_.getAs[Int]("rk"))
      assert(ranked.map(_.getAs[Int]("rk")).toSeq == (1 to rs.length))
      val cos = ranked.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
    // pair counts are symmetric: (a, b, c_ab) implies the reverse count
    val cnt = rows.map(r => (r.getAs[Long]("part"), r.getAs[Long]("neighbor")) ->
      r.getAs[Long]("c_ab")).toMap
    cnt.foreach { case ((a, b), c) =>
      cnt.get((b, a)).foreach(rc => assert(rc == c, s"asymmetric count for ($a,$b)"))
    }
    rows.foreach { r =>
      val expected = r.getAs[Long]("c_ab") /
        math.sqrt((r.getAs[Long]("c_a") * r.getAs[Long]("c_b")).toDouble)
      assert(math.abs(r.getAs[Double]("cosine") - expected) < 1e-5)
    }
  }

  test("embed density classes partition the corpus and satisfy the degree rules") {
    val rows = Similarity.qEmbedDensity(spark, sf001).collect()
    val nVec = Tables.embeddings(spark, sf001).count()
    assert(rows.length == nVec)
    val byId = rows.map(r => r.getAs[Long]("vec_id") -> r).toMap
    val pairs = Similarity.embedNeardupPairs(spark, sf001, Similarity.EmbedChunkSize)
      .select(col("vec_id_a"), col("vec_id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    rows.foreach { r =>
      val d = r.getAs[Long]("degree")
      assert(d == deg.getOrElse(r.getAs[Long]("vec_id"), 0L))
      val cls = r.getAs[String]("density_class")
      if (d >= Similarity.DensityMinPts) assert(cls == "core")
      else assert(cls == "border" || cls == "noise")
    }
    // border ⇔ sub-core with a core neighbor
    pairs.foreach { case (a, b) =>
      def check(x: Long, y: Long): Unit =
        if (byId(x).getAs[String]("density_class") == "noise")
          assert(byId(y).getAs[String]("density_class") != "core",
            s"$x marked noise but has core neighbor $y")
      check(a, b); check(b, a)
    }
  }

  test("dow profile lift recombines to the per-type overall mean") {
    val rows = Temporal.qDowProfile(spark, sf001).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("isodow")).toSet.subsetOf((1 to 7).toSet))
      // weighted mean of weekday means = overall mean, so the weighted
      // mean of lifts is 1
      val n = rs.map(_.getAs[Long]("n_events")).sum.toDouble
      val wLift = rs.map(r => r.getAs[Double]("lift") * r.getAs[Long]("n_events")).sum / n
      assert(math.abs(wLift - 1.0) < 1e-4, s"weighted lift $wLift != 1")
    }
  }

  test("cusum changepoint flags the extremum of the daily-mean deviation walk") {
    val rows = Temporal.qCusumChangepoint(spark, sf001).collect()
    val types = Tables.events(spark, sf001)
      .select(col("event_type")).distinct().count()
    assert(rows.length == types)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") >= 1)
      val peak = r.getAs[Double]("peak_cusum")
      val dir = r.getAs[String]("shift_direction")
      assert(if (peak > 0) dir == "level_drop" else dir == "level_rise")
    }
  }

  test("rfm segments cover every customer with quartile digits in 1..4") {
    val rows = Behavioral.qRfmSegments(spark, sf001).collect()
    val nCust = Tables.orders(spark, sf001).select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCust)
    rows.foreach { r =>
      Seq("r_q", "f_q", "m_q").foreach { c =>
        val v = r.getAs[Int](c)
        assert(v >= 1 && v <= 4, s"$c must be a quartile digit: $r")
      }
    }
    // each marginal quartile holds a nontrivial share (exact quartiles
    // of a continuous-ish metric put ~25% in each bucket; integer ties
    // can skew the frequency dimension, so bound loosely)
    val total = rows.map(_.getAs[Long]("n_customers")).sum.toDouble
    val mMarg = rows.groupBy(_.getAs[Int]("m_q"))
      .map { case (_, rs) => rs.map(_.getAs[Long]("n_customers")).sum / total }
    assert(mMarg.forall(s => s > 0.10 && s < 0.45), s"monetary quartiles skewed: $mMarg")
  }
}
