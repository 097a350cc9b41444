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
