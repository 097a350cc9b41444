package graft.dev

import graft.{GraftSession, SparkEntry}

/** Dev-only A/B: grouped-top-k heap lowering on vs off across the
  * rank-filter queries it rewrites.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = Seq("q_window_rank", "q_item_cf", "q_source_caps", "q_ann_topk",
      "q_window_ntile", "q_rank_fusion")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("true", "false", "true").foreach { flag =>
      spark.conf.set("spark.graft.groupedTopK", flag)
      names.foreach { name =>
        val q = SparkEntry.queries(name)
        q(spark, dir).write.format("noop").mode("overwrite").save() // warm
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          q(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[topk] flag=$flag $name%-18s min=${times.min}%6.2f")
      }
    }
    spark.stop()
  }
}
