package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.TextFns
import graft.sources.Tables

/** Dev-only stage profiler for the shingle/dedup pipeline. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
    time("tokens") { toks.count() }
    val shNoDistinct = toks.select(col("doc_id"),
      transform(sequence(lit(0), size(col("t")) - 3),
        i => concat_ws(" ", element_at(col("t"), i + 1),
          element_at(col("t"), i + 2), element_at(col("t"), i + 3))).as("sh"))
    time("shingles (no distinct)") { shNoDistinct.select(sum(size(col("sh")))).count() }
    val sh = toks.select(col("doc_id"), TextFns.shingles(col("t")).as("sh"))
    time("shingles + array_distinct") { sh.select(sum(size(col("sh")))).count() }
    val m = sh.select(col("doc_id"), transform(col("sh"), md5 _).as("m"))
    time("+ md5 per shingle") { m.select(sum(size(col("m")))).count() }
    val mm = sh.select(col("doc_id"), col("sh"),
      array_min(transform(col("sh"), md5 _)).as("mn"),
      array_max(transform(col("sh"), md5 _)).as("mx"))
    time("+ min/max (md5 twice)") { mm.count() }
    val h0 = sh.select(col("doc_id"), transform(col("sh"), TextFns.hash28(_)).as("h0s"))
    time("hash28 (md5+conv) per shingle") { h0.select(sum(size(col("h0s")))).count() }

    val blocked = sh
      .withColumn("m", transform(col("sh"), md5 _))
      .withColumn("mn", array_min(col("m")))
      .withColumn("mx", array_max(col("m")))
    val a = blocked.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("mn"), col("mx"))
    val b = blocked.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("mn"), col("mx"))
    val joined = a.join(b, Seq("mn", "mx")).filter(col("doc_a") < col("doc_b"))
    time("block join only") { joined.count() }
    val jac = joined.select(col("doc_a"), col("doc_b"),
      round(TextFns.jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    time("block join + jaccard") { jac.count() }
    println(jac.queryExecution.executedPlan.toString.take(4000))
    time("full qDedupNgramJaccard") { graft.operators.Dedup.qDedupNgramJaccard(spark, dir).count() }

    import graft.functions.VectorFns
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), VectorFns.asDouble(col("embedding")).as("v"))
    time("embeddings scan+cast") { e.count() }
    val en = e.withColumn("nsq", VectorFns.normSq(col("v")))
    time("+ norms (codegen chain)") { en.count() }
    val pairs = en.as("a").join(en.as("b").hint("shuffle_hash"),
      col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
    time("label self-join (no sim)") { pairs.count() }
    val sims = pairs.select(round(VectorFns.dot(col("a.v"), col("b.v")) /
      (sqrt(col("a.nsq")) * sqrt(col("b.nsq"))), 4).as("sim"))
    time("+ pairwise sim") { sims.count() }
    val eb = en.withColumn("bucket", VectorFns.lshBucket(col("v"), 8, 64))
    time("+ lsh buckets") { eb.count() }
    val sims2 = pairs.select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
      round(VectorFns.dot(col("a.v"), col("b.v")) /
        (sqrt(col("a.nsq")) * sqrt(col("b.nsq"))), 4).as("sim"))
    time("+ sim + filter") { sims2.filter(col("sim") >= 0.40).count() }
    time("+ sim + filter + orderBy") { sims2.filter(col("sim") >= 0.40).orderBy(col("va")).count() }
    time("full qEmbedNeardup") { graft.operators.Similarity.qEmbedNeardup(spark, dir).count() }
    time("full qAnnLsh") { graft.operators.Similarity.qAnnLsh(spark, dir).count() }
    println(graft.operators.Similarity.qEmbedNeardup(spark, dir)
      .queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
