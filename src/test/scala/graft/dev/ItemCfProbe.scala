package graft.dev

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.NumFns
import graft.operators.Recsys._
import graft.sources.Tables

/** Dev-only stage-by-stage timing of q_item_cf to locate the wall. */
object ItemCfProbe {
  def time(name: String)(df: => DataFrame): Unit = {
    val times = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[icf] $name%-22s min=${times.min}%6.2f")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.builder("local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    val inc = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .distinct()
    time("incidence")(inc)

    val baskets = inc.groupBy(col("cust"))
      .agg(sort_array(collect_set(col("part"))).as("ps"))
      .filter(size(col("ps")) <= CfMaxBasket)
    time("baskets")(baskets)

    val bc = baskets.localCheckpoint()
    println(s"[icf] basket rows=${bc.count()} " +
      s"pairs=${bc.select(sum(expr("size(ps)*(size(ps)-1)/2"))).first().get(0)}")

    val pairComb = flatten(transform(col("ps"), (x, i) =>
      transform(slice(col("ps"), i + lit(2), size(col("ps"))),
        y => struct(x.as("pa"), y.as("pb")))))
    time("pairs-hof-explode")(bc.select(explode(pairComb).as("p")))

    val pairsHof = bc.select(explode(pairComb).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= CfMinCooc)
    time("pairs-hof-grouped")(pairsHof)

    // alternative: flat posexplode + slice explode (codegen'd Generate)
    val pairsGen = bc
      .select(col("ps"), posexplode(col("ps")).as(Seq("i", "pa")))
      .select(col("pa"),
        explode(slice(col("ps"), col("i") + lit(2), size(col("ps")))).as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= CfMinCooc)
    time("pairs-gen-grouped")(pairsGen)

    // alternative: incidence self-join on cust
    val ki = inc.join(bc.select(col("cust")), Seq("cust")).localCheckpoint()
    val pairsJoin = ki.select(col("cust"), col("part").as("pa"))
      .join(ki.select(col("cust"), col("part").as("pb")).hint("shuffle_hash"), Seq("cust"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= CfMinCooc)
    time("pairs-selfjoin")(pairsJoin)

    println(s"[icf] pair rows=${pairsHof.count()}")

    val marg = bc.select(explode(col("ps")).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("c"))
    val pairs = pairsHof
    val sym = pairs.union(
      pairs.select(col("pb").as("pa"), col("pa").as("pb"), col("c_ab")))
    val scored = sym
      .join(marg.hint("shuffle_hash")
        .select(col("part").as("pa"), col("c").as("c_a")), "pa")
      .join(marg.hint("shuffle_hash")
        .select(col("part").as("pb"), col("c").as("c_b")), "pb")
      .withColumn("cosine", NumFns.roundPortable(
        col("c_ab") / sqrt((col("c_a") * col("c_b")).cast("double")), 6))
    time("scored")(scored)

    val w = Window.partitionBy(col("pa"))
      .orderBy(col("cosine").desc, col("pb"))
    time("full-with-window")(scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= CfTopK)
      .select(col("pa").as("part"), col("rk"), col("pb").as("neighbor"),
        col("c_ab"), col("c_a"), col("c_b"), col("cosine"))
      .orderBy(col("part"), col("rk")))

    s.stop()
  }
}
