package graft.dev

import graft.{GraftSession, SparkEntry}

/** Dev-only single-query timer: `Test/runMain graft.dev.QueryTime
  * <sfDir> <n> <query...>` — runs each named query n times against the
  * noop sink and prints per-run wall times, so a bench outlier can be
  * re-measured in isolation (the shared-JVM suite moves individual
  * numbers ±2-3×).
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = if (args.length > 1) args(1).toInt else 3
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      q(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        q(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qtime] $name%-28s min=${times.min}%6.2f s  runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
