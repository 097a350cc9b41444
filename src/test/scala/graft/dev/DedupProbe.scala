package graft.dev

import graft.GraftSession

/** Dev-only: low-variance timing for the dedup family. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[dprobe] $name%-28s min=${ts.min}%6.2f  med=${ts.sorted.apply(1)}%6.2f")
    }
    time("ngram_jaccard") { graft.operators.Dedup.qDedupNgramJaccard(spark, dir).count() }
    time("minhash") { graft.operators.Dedup.qDedupMinhash(spark, dir).count() }
    time("cluster") { graft.operators.Dedup.qDedupCluster(spark, dir).count() }
    spark.stop()
  }
}
