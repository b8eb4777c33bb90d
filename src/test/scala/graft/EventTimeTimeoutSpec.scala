package graft

import graft.streaming.StreamingFlightSession
import graft.streaming.StreamingFlightSession.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Event-time state eviction: the watermark — the data's own clock —
  * drives the 20-minute inactivity timeout, so replays evict
  * identically regardless of processing speed.
  */
class EventTimeTimeoutSpec extends SparkSpecBase {

  private val T0 = 1712338000L

  test("watermark-driven eviction loses the takeoff; within-horizon flights complete") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlightsEventTime(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("et_out").start()
    try {
      // ab0001 takes off; ab0002 will land inside the horizon.
      input.addData(
        Observation("ab0001", T0, Some(80.0), Some(12.0)),
        Observation("ab0002", T0, Some(80.0), Some(12.0)))
      query.processAllAvailable()

      // ab0002 lands 10 min later → completes (duration 10).
      input.addData(Observation("ab0002", T0 + 600, Some(0.0), Some(0.0)))
      query.processAllAvailable()
      assert(spark.table("et_out").collect().map(r => (r.getString(0),
        r.getInt(1))).toSeq == Seq(("ab0002", 10)))

      // An unrelated key 2 hours ahead pushes the watermark far past
      // ab0001's timeout (T0 + 20 min): its state is evicted.
      input.addData(Observation("zz9999", T0 + 7200, Some(100.0), Some(5.0)))
      query.processAllAvailable()

      // ab0001 now "lands" — but its takeoff state is gone, so nothing
      // is emitted (a takeoff-less landing emits no record).
      input.addData(Observation("ab0001", T0 + 7260, Some(0.0), Some(0.0)))
      query.processAllAvailable()
      val flights = spark.table("et_out").collect()
        .map(_.getString(0)).toSeq
      assert(!flights.contains("ab0001"), flights.toString)
      assert(flights.count(_ == "ab0002") == 1)
    } finally query.stop()
  }

  test("within-horizon observations keep state alive across batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlightsEventTime(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("et_alive").start()
    try {
      input.addData(Observation("ab0001", T0, Some(80.0), Some(12.0)))
      query.processAllAvailable()
      // 15-min heartbeats: each re-arms last_contact + 20 min, so the
      // watermark (15 min behind the heartbeat + 10 min delay) never
      // catches the timeout.
      (1 to 4).foreach { i =>
        input.addData(
          Observation("ab0001", T0 + i * 900L, Some(200.0), Some(1.0)))
        query.processAllAvailable()
      }
      // landing 10 min after the last heartbeat → full duration flight
      input.addData(
        Observation("ab0001", T0 + 4 * 900L + 600, Some(0.0), Some(0.0)))
      query.processAllAvailable()
      val got = spark.table("et_alive").collect()
        .map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(got == Seq(("ab0001", 70))) // (3600 + 600) / 60
    } finally query.stop()
  }
}
