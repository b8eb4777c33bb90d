package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream interval join with watermarks on both sides — the
  * streaming twin of the as-of/enrichment joins: each purchase joins
  * signups of the same user within a bounded look-back window. The
  * time-range condition is what bounds both sides' state (without it
  * Spark rejects the join as unbounded-state); watermarks let the
  * engine drop rows older than the horizon.
  */
class StreamStreamJoinSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("purchases join signups within a 30-minute look-back, state-bounded") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val signups = MemoryStream[(Long, Timestamp, String)]

    val p = purchases.toDF().toDF("user_id", "p_ts", "amount")
      .withWatermark("p_ts", "10 minutes")
    val s = signups.toDF().toDF("s_user", "s_ts", "plan")
      .withWatermark("s_ts", "10 minutes")

    val joined = p.join(s,
      col("user_id") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))

    val query = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      signups.addData(
        (1L, ts("2024-01-01 10:00:00"), "pro"),
        (2L, ts("2024-01-01 10:05:00"), "free"))
      purchases.addData(
        (1L, ts("2024-01-01 10:20:00"), 9.99), // 20 min after signup → joins
        (2L, ts("2024-01-01 10:50:00"), 5.00), // 45 min after → outside window
        (3L, ts("2024-01-01 10:30:00"), 1.00)) // no signup at all
      query.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("user_id", "amount", "plan").collect().toSeq
      assert(rows == Seq(org.apache.spark.sql.Row(1L, 9.99, "pro")), rows)

      // A signup arriving later still joins a buffered purchase whose
      // event time is within the interval (out-of-order arrival).
      signups.addData((3L, ts("2024-01-01 10:25:00"), "trial"))
      query.processAllAvailable()
      val rows2 = spark.table("ss_join")
        .select("user_id", "amount", "plan").collect().toSeq
        .sortBy(_.getLong(0))
      assert(rows2 == Seq(
        org.apache.spark.sql.Row(1L, 9.99, "pro"),
        org.apache.spark.sql.Row(3L, 1.00, "trial")), rows2)
    } finally query.stop()
  }
}
