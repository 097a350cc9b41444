package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.sources.Tables

/** One-off stage-cost probe for q_dedup_fuzzy at sf1 (r10): where do
  * the ~26s go — tokenization, pair enumeration, or the banded DP?
  */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val k = graft.operators.Dedup.FuzzyMaxEdits
    def titles = Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 6)
      .select(col("doc_id"), element_at(col("t"), 1).as("k"),
        array_join(slice(col("t"), 1, 6), " ").as("title"))
      .withColumn("band", floor(length(col("title")) / (k + 1)))
    time("tokenize+titles (count)") { titles.count() }
    val t = titles.localCheckpoint()
    val probe = t.select(col("doc_id"), col("k"), col("title"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
    val cand = t.as("a").join(probe.as("b").hint("shuffle_hash"),
      col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id") &&
        abs(length(col("a.title")) - length(col("b.title"))) <= k)
    (1 to 2).foreach { i =>
      time(s"enumerate pairs only, run $i") { cand.count() }
    }
    (1 to 2).foreach { i =>
      time(s"enumerate + banded DP, run $i") {
        cand.select(levenshtein(col("a.title"), col("b.title"), k).as("e"))
          .filter(col("e") >= 0).count()
      }
    }
    spark.stop()
  }
}
