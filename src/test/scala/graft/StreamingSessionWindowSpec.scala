package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming session_window aggregation — the streaming twin of
  * q32_session_window: gap sessions merge as events arrive and emit
  * only when the watermark passes the session end.
  */
class StreamingSessionWindowSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap sessions merge across batches and finalize past the watermark") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Long, Timestamp, Double)]
    val agg = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("v"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"), col("n_events"),
        col("v"))
    val query = agg.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // Two events 20 min apart → ONE session (gap < 30 min), arriving
      // in different micro-batches to exercise session merging.
      input.addData((1L, ts("2024-01-01 10:00:00"), 1.0))
      query.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:20:00"), 2.0))
      query.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // session still open

      // Watermark jumps past the session end (10:20 + 30 min = 10:50):
      // max event 11:10 - 10 min = 11:00 > 10:50 → finalize.
      input.addData((2L, ts("2024-01-01 11:10:00"), 9.0))
      query.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "session_start", "n_events", "v")
        .collect().toSeq
      assert(rows == Seq(org.apache.spark.sql.Row(
        1L, ts("2024-01-01 10:00:00"), 2L, 3.0)), rows)
    } finally query.stop()
  }
}
