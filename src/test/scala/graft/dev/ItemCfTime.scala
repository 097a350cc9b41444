package graft.dev
import graft.{GraftSession, SparkEntry}
object ItemCfTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.builder("local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries("q_item_cf")
    q(s, dir).write.format("noop").mode("overwrite").save()
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      q(s, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[icf] full q_item_cf min=${times.min}%6.2f")
    s.stop()
  }
}
