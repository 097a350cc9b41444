package graft.dev
import graft.GraftSession
import org.apache.spark.sql.functions._
/** Stage-by-stage timing probe for q_common_neighbors at sf1 — where do
  * the ~120 s actually go? Each step materializes via noop write.
  */
object CnProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val s = GraftSession.builder("local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cn] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val lineitem = s.read.parquet(s"$dir/lineitem.parquet")
    val edges = time("edges distinct+checkpoint") {
      orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("su"))
        .distinct().localCheckpoint()
    }
    println(s"[cn] edges = ${edges.count()}")
    val deg = edges.groupBy(col("c")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2 && col("d") <= 64)
      .select(col("c"),
        floor(lit(1e12) / log(col("d").cast("double")) + lit(0.5))
          .cast("long").as("wq"))
    time("deg count")(println(s"[cn] deg rows = ${deg.count()}"))
    val byCust = edges.join(deg.hint("shuffle_hash"), Seq("c"))
      .groupBy(col("c"))
      .agg(sort_array(collect_list(col("su"))).as("sus"),
        first(col("wq")).as("wq"))
      .localCheckpoint()
    time("byCust collect+checkpoint")(println(s"[cn] byCust = ${byCust.count()}"))
    val pairs = byCust
      .select(col("wq"), explode(flatten(transform(col("sus"), (x, i) =>
        transform(slice(col("sus"), i + lit(2), size(col("sus"))), y =>
          struct(x.as("sa"), y.as("sb")))))).as("p"))
    time("pairs explode only") {
      println(s"[cn] pairs = ${pairs.count()}")
    }
    val agg = pairs
      .groupBy(col("p.sa").as("sa"), col("p.sb").as("sb"))
      .agg(count(lit(1)).as("n_common"), sum(col("wq")).as("aa"))
    time("pair agg")(println(s"[cn] groups = ${agg.count()}"))
    time("full topn") {
      agg.select(col("sa"), col("sb"), col("n_common"),
          graft.functions.NumFns.roundPortable(
            col("aa").cast("double") / lit(1e12), 6).as("aa_score"))
        .orderBy(col("aa_score").desc, col("sa"), col("sb"))
        .limit(20).write.format("noop").mode("overwrite").save()
    }
    s.stop()
  }
}
