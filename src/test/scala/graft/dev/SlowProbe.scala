package graft.dev
import graft.{GraftSession, SparkEntry}
object SlowProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_lead_lag", "q_json_extract", "q_pca_power_iter", "q_minhash_est",
        "q_basket_lift", "q_jsd_drift", "q_eval_overlap", "q_item_cf")
    val s = GraftSession.builder("local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      q(s, dir).write.format("noop").mode("overwrite").save()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(s, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[slow] $name%-20s min=${times.min}%6.2f med=${times.sorted.apply(1)}%6.2f")
    }
    s.stop()
  }
}
