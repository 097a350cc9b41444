package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Relational
import graft.sources.Tables

/** Streaming operators must converge to the batch answers: we stream the
  * same events parquet through a file source into a memory sink and
  * compare with the batch mirrors.
  */
class EventPipelineSpec extends SparkSpec {

  test("streamed hourly counts equal the batch aggregation") {
    val stream = EventPipeline.streamEventsFrom(spark, sf001)
    val q = EventPipeline.hourlyCounts(stream)
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT hour_epoch, event_type, n_events FROM hourly_test ORDER BY hour_epoch, event_type")
        .collect()
      val batch = Relational.qEventsHourly(spark, sf001)
        .select(col("hour_epoch"), col("event_type"), col("n_events"))
        .collect()
      assert(streamed.length == batch.length)
      streamed.zip(batch).foreach { case (sRow, b) => assert(sRow == b) }
    } finally q.stop()
  }

  test("stateful sessionization matches the batch window-function answer") {
    import spark.implicits._
    val evs = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[EventPipeline.Event]
    // batch execution of the flatMapGroupsWithState operator
    val out = EventPipeline.sessionize(evs).collect()
      .map(u => u.user_id -> ((u.n_sessions, u.n_events))).toMap
    val expected = Relational.qSessionize(spark, sf001).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events")))).toMap
    assert(out == expected)
  }
}
