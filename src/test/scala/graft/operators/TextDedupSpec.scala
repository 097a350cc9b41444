package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns

class TextDedupSpec extends SparkSpec {

  test("shingles produce n-2 trigrams over a token sequence") {
    import spark.implicits._
    val sh = Seq("a b c d e").toDF("text")
      .select(TextFns.shingles(TextFns.tokens(col("text"))).as("sh"))
      .collect().head.getSeq[String](0)
    assert(sh.toSet == Set("a b c", "b c d", "c d e"))
  }

  test("quality ratios are bounded and consistent") {
    val rows = TextAnalysis.qTextQuality(spark, sf001).collect()
    rows.foreach { r =>
      val ratio = r.getAs[Double]("stop_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Double]("quality_score") >= 0.0)
      assert(r.getAs[Int]("n_stop") <= r.getAs[Int]("n_tokens"))
    }
  }

  test("exact dedup partitions the corpus (sum of copies = row count)") {
    val rows = Dedup.qDedupExact(spark, sf001).collect()
    val total = rows.map(_.getAs[Long]("n_copies")).sum
    assert(total == graft.sources.Tables.documents(spark, sf001).count())
  }

  test("minhash LSH recovers the planted near-duplicates with verified jaccard") {
    val rows = Dedup.qDedupMinhash(spark, sf001).collect()
    // 28 planted pairs at sf0.001 (bimodal: everything else < 0.3)
    assert(rows.length >= 24, s"recall too low: ${rows.length}")
    rows.foreach(r => assert(r.getAs[Double]("jaccard") >= 0.5))
  }

  test("min-shingle blocking finds nearly the same pairs as full LSH") {
    val lsh = Dedup.qDedupMinhash(spark, sf001).collect().length
    val blocked = Dedup.qDedupNgramJaccard(spark, sf001).collect().length
    assert(blocked >= (lsh * 2) / 3, s"blocked=$blocked lsh=$lsh")
  }

  test("connectedComponents labels a long chain in O(log n) doubling rounds") {
    import spark.implicits._
    // a 200-link path graph: the r1 one-hop loop needed ~200 rounds here;
    // pointer doubling must finish within the 64-round safety cap (≈9
    // rounds for diameter 200), and every node must reach min label 0
    val n = 200L
    val fwd = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
    val labels = Dedup.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L), "chain did not converge to min label")
  }

  test("connectedComponents on an empty edge set returns no labels (no NPE)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Dedup.connectedComponents(empty).collect().isEmpty)
  }

  test("incremental dedup admits exactly the batch docs with unseen fingerprints") {
    import spark.implicits._
    val fps = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), md5(TextFns.normalized(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val existing = fps.filter(_._1 < Dedup.IncrementalCutover).map(_._2).toSet
    val expected = fps.filter { case (id, fp) =>
      id >= Dedup.IncrementalCutover && !existing.contains(fp)
    }.map(_._1).toSet
    val admitted = Dedup.qIncrementalDedup(spark, sf001).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(admitted == expected)
    assert(admitted.forall(_ >= Dedup.IncrementalCutover))
  }

  test("bigram LM scores the common continuation above the rare one") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // "the cat" appears 9x, "the dog" once: p(cat|the)=0.9, p(dog|the)=0.1
    val docs = (1L to 9L).map(i => (i, "the cat", "en", "src0", 7L)) :+
      ((10L, "the dog", "en", "src0", 7L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.qBigramLm(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"))).toMap
    assert(rows.values.forall(_._1 == 1L))
    assert(math.abs(rows(1L)._2 - math.log(0.9)) < 1e-4)
    assert(math.abs(rows(10L)._2 - math.log(0.1)) < 1e-4)
    assert(rows(1L)._2 > rows(10L)._2)
  }

  test("vocab coverage is a monotone curve with decreasing word shares") {
    val rows = TextAnalysis.qVocabCoverage(spark, sf001).collect()
    // the synthetic vocab (31 words) is smaller than k=50: full coverage
    assert(rows.nonEmpty && rows.length <= TextAnalysis.VocabTopK)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    assert(math.abs(rows.last.getAs[Double]("cum_share") - 1.0) < 1e-3,
      "a vocab covering every word must reach cum_share 1")
    val shares = rows.map(_.getAs[Double]("share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b },
      "shares must be non-increasing in rank")
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a })
    assert(cums.last <= 1.0 + 1e-9 && cums.last > shares.head)
  }

  test("minhash estimates track exact jaccard within the binomial bound") {
    val rows = Dedup.qMinhashEst(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("jaccard_est")
      assert(est >= 0.0 && est <= 1.0)
      assert(r.getAs[Double]("abs_err") ==
        math.rint(math.abs(r.getAs[Double]("jaccard") - est) * 1e4) / 1e4)
    }
    val within = rows.count(_.getAs[Boolean]("within_3sd")).toDouble / rows.length
    assert(within >= 0.9, s"only $within of pairs inside 3 sigma")
  }

  test("boilerplate ratio isolates the shared template from unique content") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    val template = "copyright acme corp all rights reserved"
    // 3 docs share the template (its shingles hit the >=3 doc floor);
    // their unique tails and doc 4 stay below it
    val docs = Seq(
      (1L, s"$template alpha beta gamma delta", "en", "src0", 40L),
      (2L, s"$template epsilon zeta eta theta", "en", "src0", 40L),
      (3L, s"$template iota kappa lambda mu", "en", "src0", 40L),
      (4L, "nu xi omicron pi rho sigma tau", "en", "src1", 30L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.qBoilerplate(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_boiler"), r.getAs[Double]("boiler_ratio"))).toMap
    // the template alone yields 4 trigram shingles present in all 3 docs
    Seq(1L, 2L, 3L).foreach { id =>
      // 10 tokens -> 8 trigrams; the 4 template-internal ones are shared
      assert(rows(id) == ((4L, 0.5)), s"doc $id: ${rows(id)}")
    }
    assert(rows(4L) == ((0L, 0.0)), "unique doc must carry no boilerplate")
  }

  test("simhash fingerprints are deterministic and near-dups are hamming-close") {
    val fp = Dedup.qDedupSimhash(spark, sf001)
    val m = fp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == graft.sources.Tables.documents(spark, sf001).count())
    // pick a verified near-dup pair and check hamming distance is small
    val pair = Dedup.qDedupMinhash(spark, sf001).collect()
      .maxBy(_.getAs[Double]("jaccard"))
    val ham = java.lang.Long.bitCount(
      m(pair.getAs[Long]("doc_a")) ^ m(pair.getAs[Long]("doc_b")))
    assert(ham <= 12, s"hamming=$ham for jaccard=${pair.getAs[Double]("jaccard")}")
  }
}
