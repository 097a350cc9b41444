package graft.dev

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.VectorFns
import graft.sources.Tables

/** Dev-only stage profiler for the PCA moment-sum pipeline. */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"[pca] $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
    time("scan+asDouble") { e.count() }
    val ei = e.select(col("vec_id"), col("v"), posexplode(col("v")))
      .select(col("vec_id"), col("v"), col("pos").as("i"), col("col").as("xi"))
    time("first explode (carrying v)") { ei.count() }
    val pairs = ei.select(col("vec_id"), col("i"), col("xi"), posexplode(col("v")))
      .select(col("i"), col("pos").as("j"),
        round(col("xi") * col("col") * lit(1e12), 0).cast("long").as("q"),
        (col("vec_id") % 64).as("salt"))
    time("second explode -> 26M q rows") { pairs.count() }
    time("sum q no salt") {
      pairs.groupBy(col("i"), col("j")).agg(sum(col("q"))).count()
    }
    time("sum q salted 2-stage") {
      pairs.groupBy(col("i"), col("j"), col("salt")).agg(sum(col("q")).as("pq"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("pq").cast(org.apache.spark.sql.types.DecimalType(38, 0)))).count()
    }
    // flat single-explode variant: per element, emit the whole product row
    val flat = e.select(col("vec_id"), posexplode(col("v")))
      .select(col("vec_id"), col("pos").as("i"), col("col").as("xi"))
    time("self-join variant") {
      flat.as("a").join(flat.as("b").hint("shuffle_hash"), "vec_id")
        .select(col("a.i").as("i"), col("b.i").as("j"),
          round(col("a.xi") * col("b.xi") * lit(1e12), 0).cast("long").as("q"))
        .groupBy(col("i"), col("j")).agg(sum(col("q"))).count()
    }
    time("full qPcaPowerIter") {
      val df = graft.operators.Similarity.qPcaPowerIter(spark, dir)
      df.write.format("noop").mode("overwrite").save(); df.count()
    }
    // tail isolation: covariance assembly onward, from cached moments
    val DI = org.apache.spark.sql.types.DecimalType(38, 0)
    val sij = pairs.groupBy(col("i"), col("j"), col("salt")).agg(sum(col("q")).as("pq"))
      .groupBy(col("i"), col("j")).agg(sum(col("pq").cast(DI)).as("sij"))
      .localCheckpoint()
    val su = flat.select(col("i"), round(col("xi") * lit(1e12), 0).cast("long").as("q"))
      .groupBy(col("i")).agg(sum(col("q").cast(DI)).as("su")).localCheckpoint()
    val cnt = e.agg(count(lit(1)).as("n")).localCheckpoint()
    time("tail from cached moments") {
      val cov = sij
        .join(broadcast(su.select(col("i").as("ri"), col("su").as("su_i"))), col("i") === col("ri"))
        .join(broadcast(su.select(col("i").as("rj"), col("su").as("su_j"))), col("j") === col("rj"))
        .crossJoin(broadcast(cnt))
        .select(col("i"), col("j"),
          (col("sij").cast("double") / col("n") / lit(1e12)
            - (col("su_i").cast("double") / col("n") / lit(1e12))
              * (col("su_j").cast("double") / col("n") / lit(1e12))).as("cij"))
      val D = org.apache.spark.sql.types.DecimalType(38, 12)
      val seed = 1.0 / math.sqrt(64.0)
      val v1 = cov.groupBy(col("i"))
        .agg(sum((col("cij") * lit(seed)).cast(D)).cast("double").as("v1raw"))
      val sc = v1.agg(
        sum((col("v1raw") * col("v1raw")).cast(D)).cast("double").as("nsq"),
        sum((col("v1raw") * lit(seed)).cast(D)).cast("double").as("lambda"))
      v1.crossJoin(broadcast(sc))
        .select((col("i") + 1).as("pos"),
          round(col("v1raw") / sqrt(col("nsq")), 6).as("comp"),
          round(col("lambda"), 6).as("lambda"))
        .orderBy(col("pos")).count()
    }
    // replicate the REAL function verbatim, timing each eager step
    locally {
      val t0 = System.nanoTime()
      val D = org.apache.spark.sql.types.DecimalType(38, 12)
      val DIx = org.apache.spark.sql.types.DecimalType(38, 0)
      val e2 = Tables.embeddings(spark, dir)
        .select(col("vec_id"), VectorFns.asDouble(col("embedding")).as("v"))
      val ei2 = e2.select(col("vec_id"), col("v"), posexplode(col("v")))
        .select(col("vec_id"), col("v"), col("pos").as("i"), col("col").as("xi"))
      val pairs2 = ei2.select(col("vec_id"), col("i"), col("xi"), posexplode(col("v")))
        .select(col("i"), col("pos").as("j"),
          round(col("xi") * col("col") * lit(1e12), 0).cast("long").as("q"),
          (col("vec_id") % 64).as("salt"))
      val sij2 = pairs2.groupBy(col("i"), col("j"), col("salt"))
        .agg(sum(col("q")).as("pq"))
        .groupBy(col("i"), col("j"))
        .agg(sum(col("pq").cast(DIx)).as("sij"))
        .localCheckpoint()
      println(f"[pca2] sij checkpoint ${(System.nanoTime()-t0)/1e9}%.2f s")
      val t1 = System.nanoTime()
      val su2 = ei2.select(col("i"),
          round(col("xi") * lit(1e12), 0).cast("long").as("q"),
          (col("vec_id") % 64).as("salt"))
        .groupBy(col("i"), col("salt")).agg(sum(col("q")).as("pq"))
        .groupBy(col("i")).agg(sum(col("pq").cast(DIx)).as("su"))
        .localCheckpoint()
      println(f"[pca2] su checkpoint ${(System.nanoTime()-t1)/1e9}%.2f s")
      val t2 = System.nanoTime()
      val cnt2 = e2.agg(count(lit(1)).as("n")).localCheckpoint()
      println(f"[pca2] cnt checkpoint ${(System.nanoTime()-t2)/1e9}%.2f s")
      val t3 = System.nanoTime()
      val cov2 = sij2
        .join(broadcast(su2.select(col("i").as("ri"), col("su").as("su_i"))), col("i") === col("ri"))
        .join(broadcast(su2.select(col("i").as("rj"), col("su").as("su_j"))), col("j") === col("rj"))
        .crossJoin(broadcast(cnt2))
        .select(col("i"), col("j"),
          (col("sij").cast("double") / col("n") / lit(1e12)
            - (col("su_i").cast("double") / col("n") / lit(1e12))
              * (col("su_j").cast("double") / col("n") / lit(1e12))).as("cij"))
      val seed2 = 1.0 / math.sqrt(64.0)
      val v12 = cov2.groupBy(col("i"))
        .agg(sum((col("cij") * lit(seed2)).cast(D)).cast("double").as("v1raw"))
        .localCheckpoint()
      println(f"[pca2] v1 checkpoint ${(System.nanoTime()-t3)/1e9}%.2f s")
      val t4 = System.nanoTime()
      val sc2 = v12.agg(
        sum((col("v1raw") * col("v1raw")).cast(D)).cast("double").as("nsq"),
        sum((col("v1raw") * lit(seed2)).cast(D)).cast("double").as("lambda"))
      v12.crossJoin(broadcast(sc2))
        .select((col("i") + 1).as("pos"),
          round(col("v1raw") / sqrt(col("nsq")), 6).as("comp"),
          round(col("lambda"), 6).as("lambda"))
        .orderBy(col("pos")).write.format("noop").mode("overwrite").save()
      println(f"[pca2] final write ${(System.nanoTime()-t4)/1e9}%.2f s")
    }
    spark.stop()
  }
}
