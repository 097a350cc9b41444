package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Behavioral invariants for the round-4 operator batch (the DuckDB
  * oracle gate covers value-level correctness; these pin the semantic
  * properties a refactor could silently break).
  */
class Round4BatchSpec extends SparkSpec {

  test("gaps-islands partitions each user's active days into maximal runs") {
    val islands = Temporal.qGapsIslands(spark, sf001).collect()
    assert(islands.nonEmpty)
    // length arithmetic: an island of consecutive days has end-start+1 days
    islands.foreach { r =>
      assert(r.getAs[Long]("n_days") ==
        r.getAs[Int]("end_day") - r.getAs[Int]("start_day") + 1,
        s"island must be gap-free: $r")
    }
    // maximality: consecutive islands of one user are separated by a gap
    islands.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      rs.sortBy(_.getAs[Int]("start_day")).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("start_day") > a.getAs[Int]("end_day") + 1,
            s"adjacent islands must not touch: $a | $b")
        case _ =>
      }
    }
    // coverage: island days sum to the distinct (user, day) count
    val nDays = Tables.events(spark, sf001)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().count()
    assert(islands.map(_.getAs[Long]("n_days")).sum == nDays)
  }

  test("anomaly flags deviate by more than 3 sigma from their own stats") {
    val rows = Temporal.qAnomalyZscore(spark, sf001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_prev") >= Temporal.AnomalyMinPrev)
      val dev = math.abs(r.getAs[Double]("value") - r.getAs[Double]("mean_prev"))
      // rounded columns: allow the rounding slack
      assert(dev > 3.0 * r.getAs[Double]("std_prev") - 3e-4,
        s"flagged row must deviate: $r")
    }
  }

  test("line dedup keeps every segment of the first document and accounts all segments") {
    val rows = Dedup.qLineDedup(spark, sf001).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0 precedes everyone, so all its segments are first occurrences
    assert(byId(0L).getAs[Double]("kept_frac") == 1.0)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_segs"))
      assert(r.getAs[Long]("n_kept") >= 0L)
    }
    // segment accounting: n_segs matches the tokenizer's segment count
    val expected = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        (floor((size(graft.functions.TextFns.tokens(col("text"))) - 1) / Dedup.SegmentTokens) + 1)
          .as("n"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_segs") == expected(r.getAs[Long]("doc_id")))
    }
  }

  test("BPE pair counts over the weighted vocab equal brute-force corpus counts") {
    val fast = TextAnalysis.qBpePairCount(spark, sf001).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("freq"))
    // brute force: explode the corpus itself, no vocab weighting
    val brute = Tables.documents(spark, sf001)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("pair"))
      .limit(TextAnalysis.BpeTopPairs)
      .collect().map(r => r.getAs[String]("pair") -> r.getAs[Long]("freq"))
    assert(fast.toSeq == brute.toSeq,
      s"vocab-weighted counts must equal corpus counts:\n${fast.toSeq}\n${brute.toSeq}")
  }

  test("PMI pair counts are bounded by their marginals and formula recomputes") {
    val rows = TextAnalysis.qTokenPmi(spark, sf001).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf001).count()
    rows.foreach { r =>
      val (ca, cb, cab) = (r.getAs[Long]("c_a"), r.getAs[Long]("c_b"), r.getAs[Long]("c_ab"))
      assert(cab <= math.min(ca, cb), s"joint must not exceed marginal: $r")
      assert(r.getAs[String]("w_a") < r.getAs[String]("w_b"), "pairs must be canonical")
      val pmi = math.log(cab.toDouble * nDocs / (ca.toDouble * cb))
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-4, s"formula mismatch: $r")
    }
  }

  test("KS drift recomputes brute-force for one source and is 0 iff identical") {
    val rows = Profiling.qKsDrift(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getAs[Double]("ks_stat")
      assert(ks >= 0.0 && ks <= 1.0)
    }
    // brute-force one source against the corpus
    val docs = Tables.documents(spark, sf001).select(col("source"), col("n_chars"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("n_chars"))
    val src = rows.head.getAs[String]("source")
    val mine = docs.filter(_._1 == src).map(_._2)
    val all = docs.map(_._2)
    val values = all.distinct.sorted
    val brute = values.map { v =>
      math.abs(mine.count(_ <= v).toDouble / mine.length -
        all.count(_ <= v).toDouble / all.length)
    }.max
    assert(math.abs(rows.head.getAs[Double]("ks_stat") - brute) < 1e-5,
      s"KS mismatch for $src: got ${rows.head.getAs[Double]("ks_stat")}, brute $brute")
  }

  test("LOCF carries the most recent purchase value, never a future one") {
    val rows = Temporal.qLocfImpute(spark, sf001).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
      var expect: Option[Double] = None
      ordered.foreach { r =>
        if (r.getAs[String]("event_type") == "purchase")
          expect = Some(r.getAs[Double]("value"))
        val got = Option(r.getAs[java.lang.Double]("last_purchase_value")).map(_.toDouble)
        assert(got == expect.map(v => math.rint(v * 100) / 100),
          s"LOCF mismatch at ${r.getAs[Long]("event_id")}: got $got expected $expect")
      }
    }
  }

  test("burst days exceed the factor and quiet users flag nothing") {
    val bursts = Temporal.qBurstDetect(spark, sf001).collect()
    assert(bursts.nonEmpty, "synthetic data must contain at least one burst")
    bursts.foreach { r =>
      assert(r.getAs[Long]("n_events") > Temporal.BurstFactor * r.getAs[Double]("median_daily"),
        s"flagged day must exceed the threshold: $r")
    }
  }

  test("BFS levels are a valid shortest-hop labeling") {
    val rows = Graph.qBfsLevels(spark, sf001).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("level")).toMap
    assert(rows(Graph.BfsSource) == 0L)
    assert(rows.values.forall(_ >= 0L))
    // triangle inequality over every edge: levels of neighbors differ by <= 1
    val e = Tables.orders(spark, sf001)
      .join(Tables.lineitem(spark, sf001), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, sf001), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf001), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(col("c_nationkey").cast("long").as("a"), col("s_nationkey").cast("long").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    e.foreach { case (a, b) =>
      (rows.get(a), rows.get(b)) match {
        case (Some(la), Some(lb)) =>
          assert(math.abs(la - lb) <= 1, s"edge ($a,$b) violates BFS: $la vs $lb")
        case _ => fail(s"edge endpoint missing from BFS output: ($a,$b)")
      }
    }
  }

  test("class-balance weights are exact dyadics and renormalize to the class count") {
    val rows = Similarity.qClassBalance(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      val eff = r.getAs[Double]("eff_n")
      val expect = if (n >= 63) 2.0 else 2.0 * (1.0 - 1.0 / (1L << n).toDouble)
      assert(math.abs(eff - expect) < 1e-6, s"effective n mismatch: $r")
      assert(eff >= 1.0 && eff <= 2.0)
    }
    // renormalization: weights sum to the corpus vector count (mean weight ~ 1/vector)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    val expected = rows.map(_.getAs[Long]("n_vecs")).sum.toDouble
    assert(math.abs(wsum - expected) < 1e-2, s"weights must renormalize: $wsum vs $expected")
  }

  test("mutual information is non-negative and bounded by marginal entropy") {
    val row = Profiling.qMutualInfo(spark, sf001).collect().head
    val mi = row.getAs[Double]("mi_nats")
    assert(mi >= -1e-9, s"MI must be non-negative: $mi")
    // H(lang) upper-bounds MI(source, lang)
    val langs = Tables.documents(spark, sf001).groupBy(col("lang")).count()
      .collect().map(_.getAs[Long]("count"))
    val n = langs.sum.toDouble
    val hLang = langs.map { c => -(c / n) * math.log(c / n) }.sum
    assert(mi <= hLang + 1e-9, s"MI $mi must not exceed H(lang) $hLang")
  }

  test("prefix pairs share their exact opening — recall and no false positives") {
    import graft.functions.TextFns
    val pairs = Dedup.qDedupPrefix(spark, sf001).collect()
    assert(pairs.nonEmpty)
    val openings = Tables.documents(spark, sf001)
      .select(col("doc_id"),
        concat_ws(" ", slice(TextFns.tokens(col("text")), 1, Dedup.PrefixTokens)).as("o"),
        size(TextFns.tokens(col("text"))).as("n"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("o"), r.getAs[Int]("n")))
      .toMap
    val pairSet = pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a < b, "pairs must be canonical")
      assert(openings(a)._1 == openings(b)._1, s"pair ($a,$b) must share its opening")
    }
    // exact recall: every qualifying same-opening pair is found
    val expected = openings.toSeq.filter(_._2._2 >= Dedup.PrefixTokens)
      .groupBy(_._2._1).values.filter(_.length > 1)
      .flatMap(_.map(_._1).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    assert(pairSet == expected, s"recall mismatch: missing=${expected -- pairSet}")
  }

  test("freshness decay: newest-day events carry full weight, weights halve per day") {
    val rows = Temporal.qFreshnessDecay(spark, sf001).collect()
    assert(rows.nonEmpty)
    // recompute one user brute-force
    val ev = Tables.events(spark, sf001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value")).collect()
    val maxDay = ev.map(r => r.getAs[Long]("us") / 86400000000L).max
    val uid = rows.head.getAs[Long]("user_id")
    val mine = ev.filter(_.getAs[Long]("user_id") == uid)
    val expect = mine.map { r =>
      val age = (maxDay - r.getAs[Long]("us") / 86400000000L).toInt
      if (age >= 63) 0.0 else r.getAs[Double]("value") / (1L << age).toDouble
    }.sum
    assert(math.abs(rows.head.getAs[Double]("decayed_sum") - expect) < 1e-4,
      s"decay mismatch for $uid")
  }

  test("vocab overlap is a valid Jaccard and detects the shared word-soup vocabulary") {
    val rows = TextAnalysis.qSourceVocabOverlap(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (na, nb, c) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_common"))
      assert(c <= math.min(na, nb))
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(math.abs(j - c.toDouble / (na + nb - c)) < 1e-5)
    }
    // sources draw from one shared vocabulary, so overlap must be high
    assert(rows.map(_.getAs[Double]("jaccard")).max > 0.5)
  }

  test("Spearman matches a brute-force rank correlation and lives in [-1, 1]") {
    val rows = Profiling.qSpearman(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("spearman")
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9, s"out of range: $r")
    }
    // brute force one source
    val src = rows.head.getAs[String]("source")
    val d = Tables.documents(spark, sf001)
      .filter(col("source") === src)
      .select(col("n_chars").cast("double"),
        size(graft.functions.TextFns.tokens(col("text"))).cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    def avgRanks(xs: Array[Double]): Array[Double] = {
      val sorted = xs.zipWithIndex.sortBy(_._1)
      val ranks = new Array[Double](xs.length)
      var i = 0
      while (i < sorted.length) {
        var j = i
        while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
        val avg = (i + 1 + j).toDouble / 2 // mean of ranks i+1..j
        (i until j).foreach(k => ranks(sorted(k)._2) = avg)
        i = j
      }
      ranks
    }
    val ra = avgRanks(d.map(_._1))
    val rb = avgRanks(d.map(_._2))
    val n = d.length.toDouble
    val (sa, sb) = (ra.sum, rb.sum)
    val sab = ra.zip(rb).map { case (a, b) => a * b }.sum
    val saa = ra.map(a => a * a).sum
    val sbb = rb.map(b => b * b).sum
    val brute = (n * sab - sa * sb) /
      (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    assert(math.abs(rows.head.getAs[Double]("spearman") - brute) < 1e-4,
      s"Spearman mismatch for $src")
  }

  test("Gini is 0 for uniform mass and matches brute force on real data") {
    import spark.implicits._
    val rows = Profiling.qGini(spark, sf001).collect()
    rows.foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 - 1e-9 && g < 1.0, s"Gini out of range: $r")
    }
    // brute force one source
    val src = rows.head.getAs[String]("source")
    val xs = Tables.documents(spark, sf001).filter(col("source") === src)
      .select(size(graft.functions.TextFns.tokens(col("text"))).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = xs.length
    val s1 = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val brute = 2.0 * s1 / (n.toDouble * xs.sum) - (n + 1).toDouble / n
    assert(math.abs(rows.head.getAs[Double]("gini") - brute) < 1e-6)
  }

  test("quantile normalization preserves within-source order and hits global extremes") {
    val rows = Curation.qQuantileNorm(spark, sf001).collect()
    val global = Tables.documents(spark, sf001).select(col("n_chars"))
      .collect().map(_.getLong(0))
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      // monotone: normalized values follow the source's own length order
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("norm_chars") <= b.getAs[Double]("norm_chars") + 1e-9)
        case _ =>
      }
      // the source's min/max map to the global min/max
      assert(ordered.head.getAs[Double]("norm_chars") == global.min.toDouble)
      assert(ordered.last.getAs[Double]("norm_chars") == global.max.toDouble)
    }
  }

  test("segment dedup reconstruction removes later copies and keeps first occurrences") {
    import spark.implicits._
    val w20a = (1 to 20).map(i => s"a$i").mkString(" ") // 2 segments
    val tailC = (1 to 10).map(i => s"c$i").mkString(" ")
    val docs = Seq(
      (1L, w20a),                                          // original
      (2L, w20a),                                          // exact copy -> empty
      (3L, w20a.split(" ").take(10).mkString(" ") + " " + tailC) // shared head, new tail
    ).toDF("doc_id", "text")
    val out = Dedup.dedupSegments(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_deduped"), r.getAs[Long]("n_kept"))).toMap
    assert(out(1L)._1 == w20a && out(1L)._2 == 2L, s"doc 1 must survive intact: ${out(1L)}")
    assert(out(2L)._1 == "" && out(2L)._2 == 0L, s"exact copy must collapse: ${out(2L)}")
    assert(out(3L)._1 == tailC && out(3L)._2 == 1L,
      s"shared head must drop, novel tail must survive: ${out(3L)}")
  }

  test("cluster stats conserve documents and clusters") {
    val stats = Dedup.qDupClusterStats(spark, sf001).collect()
    val labels = Dedup.qDedupCluster(spark, sf001).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == labels.length,
      "every document must be in exactly one cluster")
    assert(stats.map(_.getAs[Long]("n_clusters")).sum ==
      labels.map(_.getAs[Long]("cluster")).distinct.length)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_docs") ==
        r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
  }

  test("mix allocation sums exactly to the budget and follows the quotas") {
    val rows = Curation.qMixAllocate(spark, sf001).collect()
    assert(rows.length >= 2)
    assert(rows.map(_.getAs[Long]("alloc_tokens")).sum == Curation.MixBudgetTokens,
      "largest-remainder apportionment must hit the budget exactly")
    rows.foreach { r =>
      val diff = r.getAs[Long]("alloc_tokens") - r.getAs[Double]("exact_quota")
      assert(math.abs(diff) < 1.0, s"allocation must be within one unit of quota: $r")
    }
  }

  test("temperature reweighting flattens the mix and renormalizes to 1") {
    val rows = Curation.qDomainTemperature(spark, sf001).collect()
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_.getAs[Double]("temp_share")).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getAs[Double]("nat_share")).sum - 1.0) < 1e-3)
    // rows are ordered head-first: the head is damped, the tail boosted
    assert(rows.head.getAs[Double]("boost") < 1.0, s"head must be damped: ${rows.head}")
    assert(rows.last.getAs[Double]("boost") > 1.0, s"tail must be boosted: ${rows.last}")
    // sqrt-temperature preserves share ORDER while compressing ratios
    val nat = rows.map(_.getAs[Double]("nat_share"))
    val tmp = rows.map(_.getAs[Double]("temp_share"))
    assert(nat.zip(nat.tail).forall { case (a, b) => a >= b })
    assert(tmp.zip(tmp.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert(tmp.head / tmp.last < nat.head / nat.last,
      "temperature must compress the head/tail ratio")
  }
}
