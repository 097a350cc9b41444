package graft.dev

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftSession

/** Dev-only: compare JSON single-key extraction strategies on events. */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.sources.Tables.events(spark, dir)

    def run(name: String)(k: org.apache.spark.sql.Column): Unit = {
      def pass(): Unit = ev.select(col("event_type"), k.as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")), min(col("k")), max(col("k")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
      pass()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); pass(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[jsonprobe] $name%-18s min=${times.min}%6.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    run("get_json_object")(get_json_object(col("props"), "$.k").cast("long"))
    run("from_json")(from_json(col("props"),
      StructType(Seq(StructField("k", LongType)))).getField("k"))
    run("variant")(expr("CAST(variant_get(parse_json(props), '$.k') AS LONG)"))
    spark.stop()
  }
}
