package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-9 additions: semantic invariants of the causal-inference /
  * advanced-test batch. The oracle gate proves cross-engine equality;
  * these pin the MATH — identities the estimators must satisfy no
  * matter what the data says.
  */
class Round9NewOpsSpec extends SparkSpec {

  test("iv 2sls: beta is exactly reduced form over first stage, arms partition") {
    val rows = Inference.qIv2sls(spark, sf001).collect()
    assert(rows.length == 3)
    val total = Tables.lineitem(spark, sf001).count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    rows.foreach { r =>
      val (fs, rf, b) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      // relative: the emitted columns are independently rounded, and a
      // weak first stage amplifies its rounding into beta's magnitude
      assert(math.abs(b - rf / fs) / math.abs(b) < 1e-4, s"wald identity: $r")
    }
  }

  test("delta method: point estimate inside its own CI, equals the plain ratio") {
    val rows = Inference.qDeltaMethod(spark, sf001).collect()
    assert(rows.length == 5)
    val plain = Tables.events(spark, sf001)
      .groupBy(col("event_type"))
      .agg((sum(col("value")) / count(lit(1))).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val (t, ratio, se, lo, hi) =
        (r.getString(0), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))
      assert(se > 0 && lo <= ratio && ratio <= hi, s"CI sanity: $r")
      assert(math.abs(ratio - plain(t)) < 1e-4,
        s"point estimate is the plain ratio: $r vs ${plain(t)}")
    }
  }

  test("brunner-munzel: rank means reconstruct the total rank sum") {
    val r = Inference.qBrunnerMunzel(spark, sf001).collect().head
    val (n1, n2) = (r.getLong(0), r.getLong(1))
    val (rb1, rb2) = (r.getDouble(2), r.getDouble(3))
    val n = n1 + n2
    // Σ all midranks = N(N+1)/2 regardless of ties
    assert(math.abs(n1 * rb1 + n2 * rb2 - n * (n + 1) / 2.0) < 1e-3)
  }

  test("bartlett: nonnegative statistic over all sources") {
    val r = Inference.qBartlett(spark, sf001).collect().head
    assert(r.getLong(0) == 20)
    assert(r.getDouble(2) >= 0.0)
  }

  test("kpss: eta positive, day domain matches the calendar") {
    val r = Inference.qKpss(spark, sf001).collect().head
    val days = Tables.lineitem(spark, sf001)
      .select(to_date(col("l_shipdate"))).distinct().count()
    assert(r.getLong(0) == days && r.getLong(1) == Inference.KpssLag)
    assert(r.getDouble(2) > 0.0)
  }

  test("cox-stuart: pair accounting and z/p consistency") {
    val r = Inference.qCoxStuart(spark, sf001).collect().head
    val (nd, np, pos, neg) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(np == nd / 2 && pos + neg <= np)
    val (z, p) = (r.getDouble(4), r.getDouble(5))
    assert(p >= 0.0 && p <= 1.0)
    assert((pos > neg) == (z > 0) || pos == neg)
  }

  test("weibull fit: positive shape and scale, mean gap bracketed by the fit") {
    val r = Inference.qWeibullFit(spark, sf001).collect().head
    val (mean, k, lam) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(r.getLong(0) > 0 && mean > 0 && k > 0 && lam > 0)
    // Weibull mean = λΓ(1+1/k) stays within a small factor of the
    // sample mean when the log-moment fit is sane
    assert(lam / mean < 3.0 && mean / lam < 3.0)
  }

  test("gumbel fit: positive spread, return level above location") {
    val r = Inference.qGumbelFit(spark, sf001).collect().head
    val (mu, beta, rl) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(r.getLong(0) > 0 && beta > 0)
    // −ln(−ln(1−1/T)) > 0 for T ≥ 2, so the return level exceeds μ
    assert(rl > mu)
  }

  test("t-closeness: t bounded by [0,1], rollup internally consistent") {
    val rows = Inference.qTCloseness(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (maxT, avgT, over) = (r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(maxT >= 0 && maxT <= 1 && avgT >= 0 && avgT <= maxT + 1e-12)
      assert(over >= 0 && over <= r.getLong(1))
      assert((maxT > Inference.TCloseT) == (over > 0))
    }
  }

  test("ktruss: converged fixpoint, truss is a subgraph of the thresholded base") {
    val r = Graph.qKtruss(spark, sf001).collect().head
    assert(r.getBoolean(4), "bounded rounds must reach the fixpoint here")
    val (nodes, edges) = (r.getLong(2), r.getLong(3))
    // every truss node closes ≥ k−2 triangles on some edge ⇒ degree ≥ k−1
    assert(edges == 0 || edges * 2 >= nodes * (Graph.TrussK - 1))
  }

  test("slope one: rmse dominates mae, coverage within [0,1]") {
    val r = Recsys.qSlopeOne(spark, sf001).collect().head
    val (nr, np) = (r.getLong(0), r.getLong(1))
    val (cov, mae, rmse) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(np <= nr && cov > 0 && cov <= 1.0)
    assert(mae >= 0 && rmse >= mae) // Jensen: √E[e²] ≥ E|e|
  }

  test("anderson-darling: Stephens adjustment direction and verdict consistency") {
    val r = Inference.qAndersonDarling(spark, sf001).collect().head
    val (a2, a2s) = (r.getDouble(1), r.getDouble(2))
    assert(r.getLong(0) > 0)
    assert(a2 > 0 && a2s > a2) // (1 + 0.75/n + 2.25/n²) > 1
    assert(r.getBoolean(3) == (a2s > 0.752))
  }

  test("mst boruvka: spanning forest invariants hold") {
    val r = Graph.qMstBoruvka(spark, sf001).collect().head
    val (nn, nc, ne, w) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(r.getBoolean(4), "bounded rounds must span the trade graph")
    // forest identity: components + edges = nodes (acyclicity certificate)
    assert(nc + ne == nn)
    assert(w > 0 && ne < nn)
  }

  test("jonckheere: J bounded by the total pair space, mean at its center") {
    val r = Inference.qJonckheere(spark, sf001).collect().head
    val n = r.getLong(0)
    val (j, ej) = (r.getDouble(2), r.getDouble(3))
    // J counts between-group pairs: 0 ≤ J ≤ C(n,2); E[J] is its center
    assert(j >= 0 && j <= n * (n - 1) / 2.0)
    assert(ej > 0 && ej < n * (n - 1) / 2.0)
    val p = r.getDouble(5)
    assert(p >= 0 && p <= 1)
  }

  test("fligner-killeen: portable normal quantile inverts the shared CDF") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the Newton scheme must invert the engine's own Phi to ~1e-9 —
    // spot-check over a grid including deep tails
    val ps = Seq(0.001, 0.025, 0.2, 0.5, 0.7, 0.975, 0.999)
    val df0 = ps.toDF("p").withColumn("z0",
      graft.functions.NumFns.normQuantileStart(col("p")))
    val zN = (1 to Inference.FkNewtonSteps).foldLeft(df0) { (df, i) =>
      df.withColumn(s"z$i",
        graft.functions.NumFns.normQuantileStep(col(s"z${i - 1}"), col("p")))
    }.withColumn("back",
      graft.functions.NumFns.normCdf(col(s"z${Inference.FkNewtonSteps}")))
    // 5e-9, not machine precision: the A&S 7.1.26 coefficients sum to
    // 1 − 1e-9, so the shared CDF literal itself is discontinuous by
    // ~1e-9 at z = 0 — the inversion cannot beat the function's own gap
    zN.select(col("p"), col("back")).collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 5e-9,
        s"Phi(qnorm(p)) != p at ${r.getDouble(0)}")
    }
    val fk = Inference.qFlignerKilleen(spark, sf001).collect().head
    assert(fk.getLong(0) == 20 && fk.getDouble(2) >= 0.0)
    assert(fk.getBoolean(3) == (fk.getDouble(2) > Inference.FkCrit19))
  }

  test("tost: verdict consistent with p, and p honest about the margin") {
    val rows = Inference.qTostEquivalence(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (diff, margin, p) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(6))
      assert(margin > 0 && p >= 0 && p <= 1)
      assert(r.getBoolean(7) == (p < 0.05))
      // TOST can only conclude equivalence when the point estimate is
      // actually inside the margin — at sf0.001's n (~100/arm) the
      // noise legitimately exceeds the 5% margin, so the verdict must
      // then be NOT-equivalent (p ≥ .5 when |diff| ≥ δ)
      if (math.abs(diff) >= margin) assert(p >= 0.5 && !r.getBoolean(7))
    }
  }

  test("distance correlation: strong dependence between length and tokens, in [0,1]") {
    val r = Inference.qDistanceCorr(spark, sf001).collect().head
    val (dcov, dcor) = (r.getDouble(2), r.getDouble(3))
    assert(r.getLong(0) == 500 && r.getLong(1) > 0)
    assert(dcov >= 0 && dcor >= 0 && dcor <= 1.0 + 1e-9)
    // token count is nearly proportional to length: dCor must be high
    assert(dcor > 0.9, s"length/token dependence should be strong: $dcor")
  }

  test("van der waerden: nonnegative statistic, verdict matches the gate") {
    val r = Inference.qVanDerWaerden(spark, sf001).collect().head
    assert(r.getLong(0) == 20 && r.getLong(1) == 500)
    assert(r.getDouble(2) >= 0.0)
    assert(r.getBoolean(3) == (r.getDouble(2) > Inference.FkCrit19))
  }

  test("hodges-lehmann: pair count exact, shift inside the difference range") {
    val r = Inference.qHodgesLehmann(spark, sf001).collect().head
    val docs = Tables.documents(spark, sf001)
      .filter(col("source").isin(Inference.BmSourceA, Inference.BmSourceB))
    val na = docs.filter(col("source") === Inference.BmSourceA).count()
    val nb = docs.filter(col("source") === Inference.BmSourceB).count()
    assert(r.getLong(0) == na * nb)
    val ext = docs.agg(min(col("n_chars")), max(col("n_chars"))).collect().head
    val (lo, hi) = (ext.getLong(0), ext.getLong(1))
    assert(r.getLong(1) >= lo - hi && r.getLong(1) <= hi - lo)
  }
}
