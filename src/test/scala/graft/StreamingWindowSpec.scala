package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming windowed aggregation with watermark (the streaming twin of
  * q12_hourly_events): append-mode tumbling windows finalize only once
  * the watermark passes their end.
  */
class StreamingWindowSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumbling window finalizes when the watermark passes") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    // grouping must be on the window struct itself — extracting .start
    // before the aggregation would detach the watermark column
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("v"))
    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      // two events inside [10:00, 10:05)
      input.addData(
        (ts("2024-01-01 10:01:00"), "click", 1.5),
        (ts("2024-01-01 10:03:00"), "click", 2.0))
      query.processAllAvailable()
      assert(spark.table("win_out").count() == 0) // not finalized yet
      // watermark jumps past 10:05 (max event 10:16 - 10 min = 10:06)
      input.addData((ts("2024-01-01 10:16:00"), "view", 9.0))
      query.processAllAvailable()
      val rows = spark.table("win_out")
        .select("wstart", "event_type", "n", "v").collect().toSeq
      assert(rows == Seq(org.apache.spark.sql.Row(
        ts("2024-01-01 10:00:00"), "click", 2L, 3.5)))
    } finally query.stop()
  }
}
