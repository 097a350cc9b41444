package graft.operators

import graft.SparkSpec
import graft.sources.Tables

/** Invariant coverage for the round-6 statistical / curation batch
  * (effect sizes, paired tests, stationarity, shard/gate audits, rich
  * club). Value equality vs DuckDB is the oracle gate's job; these pin
  * the mathematical identities and bounds each statistic must satisfy
  * regardless of data, so a future refactor that keeps the oracle in
  * sync but breaks the math cannot slip through.
  */
class Round6BatchSpec extends SparkSpec {

  test("cohens d: Hedges' g shrinks toward zero without changing sign") {
    val rows = Profiling.qCohensD(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Double]("cohens_d")
      val g = r.getAs[Double]("hedges_g")
      assert(math.abs(g) <= math.abs(d) + 1e-12, s"$g vs $d")
      assert(d == 0.0 || math.signum(g) == math.signum(d))
      assert(r.getAs[Long]("n_returned") > 1 && r.getAs[Long]("n_kept") > 1)
    }
  }

  test("cliffs delta: bounded, counts complete, Romano label consistent") {
    val r = Profiling.qCliffsDelta(spark, sf001).collect().head
    val delta = r.getAs[Double]("cliffs_delta")
    assert(delta >= -1.0 && delta <= 1.0)
    val total = Tables.lineitem(spark, sf001).count()
    assert(r.getAs[Long]("n_returned") + r.getAs[Long]("n_kept") == total)
    val expected =
      if (math.abs(delta) < 0.147) "negligible"
      else if (math.abs(delta) < 0.33) "small"
      else if (math.abs(delta) < 0.474) "medium"
      else "large"
    assert(r.getAs[String]("magnitude") == expected)
  }

  test("odds ratio: CI brackets the point estimate, cells partition the table") {
    val r = Profiling.qOddsRatio(spark, sf001).collect().head
    val or = r.getAs[Double]("odds_ratio")
    assert(or > 0.0)
    assert(r.getAs[Double]("ci_lo") <= or && or <= r.getAs[Double]("ci_hi"))
    val cells = Seq("n_exp_ret", "n_exp_kept", "n_unexp_ret", "n_unexp_kept")
      .map(r.getAs[Long](_))
    assert(cells.forall(_ > 0))
    assert(cells.sum == Tables.lineitem(spark, sf001).count())
  }

  test("grubbs: G positive and below the hard (n-1)/sqrt(n) maximum") {
    val r = Profiling.qGrubbsOutlier(spark, sf001).collect().head
    val n = r.getAs[Long]("n_days").toDouble
    val g = r.getAs[Double]("grubbs_g")
    assert(g > 0.0)
    assert(g <= (n - 1) / math.sqrt(n) + 1e-9, s"G=$g exceeds max for n=$n")
    assert(r.getAs[java.sql.Date]("peak_date") != null)
  }

  test("wilcoxon signed-rank: W+ within [0, n(n+1)/2], calendar-bounded pairs") {
    val r = Profiling.qWilcoxonSigned(spark, sf001).collect().head
    val n = r.getAs[Long]("n_pairs")
    val wp = r.getAs[Double]("w_plus")
    assert(n > 0 && n <= 366)
    assert(wp >= 0.0 && wp <= n.toDouble * (n + 1) / 2)
  }

  test("dickey-fuller: rho is exactly 1 + beta and obs = days - 1") {
    val r = Temporal.qDickeyFuller(spark, sf001).collect().head
    // both are roundPortable(…, 6) of doubles differing by exactly 1.0,
    // and |beta| < 2 so adding 1 is exact at this precision
    assert(math.abs(r.getAs[Double]("rho") - 1.0 - r.getAs[Double]("beta")) < 2e-6)
    // a daily revenue series should not look explosive
    assert(r.getAs[Double]("rho") < 1.5)
  }

  test("theil-sen: pair count is the exact day-frame triangle") {
    val r = Temporal.qTheilSen(spark, sf001).collect().head
    val days = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n_pairs") == days * (days - 1) / 2)
    assert(days <= 366)
  }

  test("lang mix: entropy within [0, ln 4], shares within [0,1]") {
    val rows = TextAnalysis.qLangMix(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("avg_mix_entropy")
      assert(h >= 0.0 && h <= math.log(4.0) + 1e-9, s"entropy $h")
      val ms = r.getAs[Double]("multi_share")
      assert(ms >= 0.0 && ms <= 1.0)
      assert(r.getAs[Long]("n_multi") <= r.getAs[Long]("n_docs"))
    }
  }

  test("shard balance: 32 shards, min <= mean <= max, imbalance >= 1") {
    val r = PipelineOps.qShardBalance(spark, sf001).collect().head
    val n = r.getAs[Long]("n_shards")
    assert(n == 32L)
    val (tot, mn, mx) = (r.getAs[Long]("total_tokens"),
      r.getAs[Long]("min_tokens"), r.getAs[Long]("max_tokens"))
    assert(mn * n <= tot && tot <= mx * n)
    assert(r.getAs[Double]("imbalance") >= 1.0)
    assert(r.getAs[Double]("cv") >= 0.0)
  }

  test("quality gate: global drop share respects the P20 tie convention") {
    val rows = PipelineOps.qQualityGate(spark, sf001).collect()
    assert(rows.nonEmpty)
    val dropped = rows.map(_.getAs[Long]("n_dropped")).sum
    val docs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(docs == Tables.documents(spark, sf001).count())
    // only docs STRICTLY below the cut drop; the cut cell's ties all
    // survive, so the global share can only undershoot 20 %
    assert(dropped < math.ceil(0.2 * docs).toLong)
    assert(dropped > 0, "a real corpus has a nonempty bottom quintile")
    // every source pays the same cut, so per-source shares vary
    rows.foreach { r =>
      val s = r.getAs[Double]("drop_share")
      assert(s >= 0.0 && s < 1.0)
    }
  }

  test("event entropy: tiers partition users; entropy below ln(avg types)") {
    val rows = Behavioral.qEventEntropy(spark, sf001).collect()
    assert(rows.map(_.getAs[String]("tier")).toSeq.sorted ==
      rows.map(_.getAs[String]("tier")).toSeq)
    val users = rows.map(_.getAs[Long]("n_users")).sum
    assert(users ==
      Tables.events(spark, sf001).select("user_id").distinct().count())
    rows.foreach { r =>
      val h = r.getAs[Double]("avg_entropy")
      val t = r.getAs[Double]("avg_types")
      // per-user H <= ln(types); averaging + Jensen keeps the bound
      assert(h >= 0.0 && h <= math.log(t) + 1e-9, s"H=$h types=$t")
    }
  }

  test("embed dim variance: full dim frame, shared n, dead flag consistent") {
    val rows = Similarity.qEmbedDimVariance(spark, sf001).collect()
    assert(rows.map(_.getAs[Int]("dim")).toSeq == (1 to rows.length))
    assert(rows.map(_.getAs[Long]("n_vecs")).distinct.length == 1)
    val meanVar = rows.map(_.getAs[Double]("variance")).sum / rows.length
    rows.foreach { r =>
      val v = r.getAs[Double]("variance")
      assert(v >= 0.0)
      assert(r.getAs[Boolean]("is_dead") == (v < 0.01 * meanVar))
    }
  }

  test("rich club: densities in [0,1], club edges within the clique bound") {
    val r = Graph.qRichClub(spark, sf001).collect().head
    val k = r.getAs[Long]("k_club")
    val ce = r.getAs[Long]("club_edges")
    assert(ce <= k * (k - 1) / 2)
    val cd = r.getAs[Double]("club_density")
    assert(cd >= 0.0 && cd <= 1.0)
    assert(r.getAs[Double]("rich_club_ratio") >= 0.0)
    assert(r.getAs[Long]("n_edges") >= ce)
  }

  test("jarque-bera: JB nonnegative, decision matches the chi2 cut") {
    val r = Profiling.qJarqueBera(spark, sf001).collect().head
    val jb = r.getAs[Double]("jb_stat")
    assert(jb >= 0.0)
    assert(r.getAs[Long]("n_days") > 0)
    // JB is exactly the chi2(2) decomposition of its two summands
    val sk = r.getAs[Double]("skewness")
    val xk = r.getAs[Double]("excess_kurtosis")
    val n = r.getAs[Long]("n_days").toDouble
    assert(math.abs(jb - n / 6.0 * (sk * sk + xk * xk / 4.0)) < 1e-2)
    assert(r.getAs[Boolean]("normal_at_5pct") == (jb <= 5.9915))
  }

  test("kruskal-wallis: H nonnegative, tie correction only inflates") {
    val r = Profiling.qKruskalWallis(spark, sf001).collect().head
    val h = r.getAs[Double]("h_stat")
    val hc = r.getAs[Double]("h_corrected")
    assert(h >= 0.0)
    // ties divide by C ∈ (0,1] so the corrected stat can only grow
    assert(hc >= h - 1e-9, s"hc=$hc < h=$h")
    assert(r.getAs[Long]("n_docs") == Tables.documents(spark, sf001).count())
    assert(r.getAs[Long]("n_sources") ==
      Tables.documents(spark, sf001).select("source").distinct().count())
  }

  test("durbin-watson: DW in [0,4] and rho hint is its mirror") {
    val r = Temporal.qDurbinWatson(spark, sf001).collect().head
    val dw = r.getAs[Double]("dw_stat")
    assert(dw >= 0.0 && dw <= 4.0, s"dw=$dw")
    // rho ≈ 1 − DW/2 (both independently rounded to 4 dp)
    assert(math.abs(r.getAs[Double]("rho_hint") - (1.0 - dw / 2.0)) < 1e-3)
    assert(r.getAs[Long]("n_days") > 0)
  }

  test("chow: split RMSE never exceeds pooled, both regimes populated") {
    val r = Temporal.qChowTest(spark, sf001).collect().head
    val sp = r.getAs[Double]("rmse_pooled")
    val ss = r.getAs[Double]("rmse_split")
    // each regime's own OLS fits at least as well as the pooled line
    // (r9: emitted as per-day RMSE — the raw SSR is dollars² over the
    // fact and overflowed the portable-rounding int64 bound at sf1)
    assert(ss <= sp + 1e-6, s"split=$ss pooled=$sp")
    assert(sp > 0.0 && ss > 0.0)
    val f = r.getAs[Double]("f_stat")
    assert(f >= 0.0)
    assert(r.getAs[Boolean]("structural_break") == (f > 3.0))
    assert(r.getAs[Long]("n_pre") > 4 && r.getAs[Long]("n_post") > 4)
  }

  test("mrr/map: bounded, zero iff no hits, rr at least 1/k when hit") {
    val rows = Evaluation.qMrrMap(spark, sf001).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      val rr = r.getAs[Double]("reciprocal_rank")
      val ap = r.getAs[Double]("avg_precision")
      assert(rr >= 0.0 && rr <= 1.0 && ap >= 0.0 && ap <= 1.0)
      assert((hits == 0) == (rr == 0.0))
      if (hits > 0) assert(rr >= 1.0 / 3 - 1e-9)
      // each hit contributes at most 1 to the AP sum before the /k
      // (ap is reported rounded to 6 dp, so allow the half-ulp slack)
      assert(ap <= hits / 3.0 + 5e-7)
    }
  }

  test("brier: components bounded, resolution never exceeds uncertainty") {
    val r = Evaluation.qBrier(spark, sf001).collect().head
    val bs = r.getAs[Double]("brier")
    val rel = r.getAs[Double]("reliability")
    val res = r.getAs[Double]("resolution")
    val unc = r.getAs[Double]("uncertainty")
    assert(bs >= 0.0 && bs <= 1.0)
    assert(rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25)
    // law of total variance: binned-mean variance <= total variance
    assert(res <= unc + 1e-9, s"res=$res unc=$unc")
    assert(r.getAs[Long]("n_docs") > 0)
  }

  test("page-hinkley: stat nonnegative, peak day inside the calendar") {
    val r = Temporal.qPageHinkley(spark, sf001).collect().head
    val ph = r.getAs[Double]("ph_stat")
    assert(ph >= 0.0)
    assert(r.getAs[Boolean]("drift") == (ph > Temporal.PageHinkleyLambda))
    val nDays = r.getAs[Long]("n_days")
    assert(nDays > 0 && r.getAs[Long]("peak_di") >= 0)
  }

  test("granger: nested-model F nonnegative, drop share in [0,1]") {
    val r = Temporal.qGranger(spark, sf001).collect().head
    // the restricted model is nested, so its SSR can only be larger
    val drop = r.getAs[Double]("ssr_drop_share")
    assert(drop >= 0.0 && drop <= 1.0, s"drop=$drop")
    val f = r.getAs[Double]("f_stat")
    assert(f >= 0.0)
    assert(r.getAs[Boolean]("granger_causal") == (f > Temporal.GrangerFCrit))
  }

  test("interval coalesce: islands and coverage respect interval bounds") {
    val rows = Temporal.qIntervalCoalesce(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val ns = r.getAs[Long]("n_suppliers")
      assert(r.getAs[Long]("tot_islands") >= ns)
      assert(r.getAs[Double]("avg_islands") >= 1.0)
      // the shortest possible island is one interval: 3+0 transit +1
      assert(r.getAs[Double]("avg_covered_days") >= 4.0)
      assert(r.getAs[Long]("max_covered") >=
        math.ceil(r.getAs[Double]("avg_covered_days")).toLong)
    }
  }

  test("fd violations: PK rule exactly holds, shares bounded") {
    val rows = Profiling.qFdViolations(spark, sf001).collect()
    assert(rows.length == 4)
    val byFd = rows.map(r => r.getAs[String]("fd") -> r).toMap
    val pk = byFd("o_orderkey->o_custkey")
    assert(pk.getAs[Long]("violating_keys") == 0L)
    assert(pk.getAs[Double]("g3_error") == 0.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_keys") > 0)
      val s1 = r.getAs[Double]("viol_key_share")
      val g3 = r.getAs[Double]("g3_error")
      assert(s1 >= 0.0 && s1 <= 1.0 && g3 >= 0.0 && g3 < 1.0)
      // deleting rows only from violating keys: g3 positive iff any
      assert((r.getAs[Long]("violating_keys") == 0L) == (g3 == 0.0))
    }
  }
}
