package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * One untimed warm sweep over the whole suite first (codegen
  * compilation, C2 JIT, file listing — a single per-query warm run is
  * not enough on a cold JVM: queries early in the alphabet were paying
  * multi-second JIT tax that vanished once the JVM was hot), then each
  * query is timed as the min of two runs — steady-state numbers, which
  * is what a resident engine on a cluster actually delivers.
  *
  * Methodology (r2): each run is timed against the `noop` sink
  * (`df.write.format("noop")`), not `.count()`. Counting lets
  * ColumnPruning drop every computed column from the timed plan (q1's
  * sums, window columns, vector math would all be pruned away), so the
  * count-based numbers understated real work. The noop sink fully
  * evaluates and serializes every output row/column and discards it —
  * the closest local analog of handing results to a downstream stage.
  */
object Bench {
  private def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args: restrict to the named queries (micro-bench iteration)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val suite = if (args.nonEmpty) all.filter(q => args.contains(q._1)) else all
    suite.foreach { case (name, fn) => // warm sweep: codegen + JIT + listing
      try exec(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] warm $name failed: ${e.getMessage}") }
    }
    // Measured (r5): per-query unpersist of accumulated localCheckpoint
    // blocks makes the suite SLOWER (189.7s → 209.6s over 248 queries;
    // q_item_cf 7s → 25s) — the async block-removal RPC storm costs more
    // than the storage rent it frees. Leave block-manager hygiene to
    // Spark's own LRU eviction.
    val results = suite.map { case (name, fn) =>
      try {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          exec(fn(spark, sfDir))
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1.0
      }
    }
    // The driver captures only the LAST 2000 chars of stdout and parses
    // the JSON it finds there. Every prior final-line format overflowed
    // that window (r7's 403-entry t_cs array alone was ~1.6 KB, plus the
    // slowest-queries dict, plus sbt's trailing "[success] Total time"
    // line — the line's HEAD fell outside the capture and parsed:null
    // again). So: the FULL per-query map goes to bench_full.json
    // (committed) and is printed once for the transcript; the FINAL
    // stdout line is a compact (<600 B) JSON object — total, count,
    // distribution stats, slowest queries — that always fits. build.sbt
    // pairs this with outputStrategy := StdoutOutput (no "[info] "
    // prefix) and showSuccess := false (no trailing sbt line), so the
    // capture window ends with exactly this parseable object.
    def f3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$fullQs,"sf":"$sfDir"}"""
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: ${e.getMessage}") }
    println(full)
    val sorted = results.map(_._2).filter(_ >= 0).sorted
    def pct(p: Double): Double =
      if (sorted.isEmpty) 0.0
      else sorted(((sorted.length - 1) * p).round.toInt)
    val slowestFirst = results.sortBy(-_._2).take(8)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
    val compactQs = slowestFirst.mkString("{", ",", "}")
    val nFail = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"n_failed":$nFail,"median":${f3(pct(0.5))},"p95":${f3(pct(0.95))},"max":${f3(pct(1.0))},"queries_file":"bench_full.json","queries":$compactQs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
