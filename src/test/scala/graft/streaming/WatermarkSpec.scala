package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

case class RawEvent(ts: Timestamp, user_id: Long, event_id: Long,
    event_type: String, value: Double)

class WatermarkSpec extends SparkSpec {

  private def ev(h: Int, m: Int, uid: Long, eid: Long): RawEvent =
    RawEvent(Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00"), uid, eid, "click", 1.0)

  test("streaming dedup drops in-watermark duplicates and bounds state") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[RawEvent]
    val q = EventPipeline.dedupedStream(in.toDF())
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 0, 1, 100), ev(1, 5, 1, 100), ev(1, 10, 2, 200))
      q.processAllAvailable()
      // duplicate (1,100) arrives again within the watermark
      in.addData(ev(1, 20, 1, 100), ev(1, 30, 3, 300))
      q.processAllAvailable()
      val ids = spark.table("dedup_test")
        .select(col("user_id"), col("event_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(ids.length == ids.distinct.length, "emitted a duplicate")
      assert(ids.toSet == Set((1L, 100L), (2L, 200L), (3L, 300L)))
    } finally q.stop()
  }

  test("append-mode hourly windows finalize only after the watermark passes") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[RawEvent]
    val q = EventPipeline.hourlyCounts(in.toDF())
      .writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      in.addData(ev(1, 0, 1, 1), ev(1, 30, 2, 2))
      q.processAllAvailable()
      // nothing finalized yet: watermark (max ts - 2h) is before hour 1
      assert(spark.table("late_test").count() == 0)
      // advance event time far enough to close hour 1's window
      in.addData(ev(5, 0, 3, 3))
      q.processAllAvailable()
      val done = spark.table("late_test").collect()
      assert(done.length == 1)
      assert(done.head.getAs[Long]("n_events") == 2)
      // an event for hour 1 arriving now is beyond the watermark: dropped
      in.addData(ev(1, 45, 4, 4), ev(6, 0, 5, 5))
      q.processAllAvailable()
      // advance the watermark twice more (it is computed from the
      // previous batch's max event time) so every early window closes
      in.addData(ev(12, 0, 6, 6))
      q.processAllAvailable()
      in.addData(ev(18, 0, 7, 7))
      q.processAllAvailable()
      val counts = spark.table("late_test").collect()
        .map(r => r.getAs[Long]("hour_epoch") -> r.getAs[Long]("n_events")).toMap
      val hour1 = Timestamp.valueOf("2024-01-01 01:00:00").getTime / 1000
      assert(counts(hour1) == 2, s"late event was not dropped: $counts")
      // the late event joined no other window either
      assert(counts.values.sum == counts.size - 1 + 2, s"unexpected counts: $counts")
    } finally q.stop()
  }
}
