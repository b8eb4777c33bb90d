package graft

import graft.streaming.StreamingFlightSession
import graft.streaming.StreamingFlightSession._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** The flight session on Spark 4's `transformWithState` arbitrary-
  * state API: scenario goldens plus batch-order parity against the
  * `flatMapGroupsWithState` implementation (both drive the shared
  * `step` transition, so any divergence is plumbing, not semantics).
  * transformWithState requires the RocksDB state store — a dedicated
  * session carries that conf so concurrently-running suites are
  * untouched.
  */
class TransformWithStateSpec extends SparkSpecBase {

  private lazy val rocks = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def awaitProcessed(
      query: StreamingQuery, n: Long, timeoutMs: Long = 120000): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (query.recentProgress.map(_.numInputRows).sum < n &&
      System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(query.recentProgress.map(_.numInputRows).sum >= n,
      s"stream did not absorb $n input rows within ${timeoutMs}ms")
  }

  private def runTws(
      name: String, batches: Seq[Seq[Observation]]): Seq[CompletedFlight] = {
    val session = rocks
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlightsTws(session, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .start()
    try {
      batches.foreach(b => input.addData(b: _*))
      awaitProcessed(query, batches.map(_.size).sum)
    } finally query.stop()
    session.table(name).as[CompletedFlight].collect().toSeq.sortBy(_.icao24)
  }

  private val t0 = 1712338000L

  test("takeoff, cruise, landing emits exactly one completed flight") {
    val out = runTws("tws_basic", Seq(
      Seq(Observation("ab0001", t0, Some(80.0), Some(12.0))),
      Seq(Observation("ab0001", t0 + 300, Some(230.0), Some(-2.0))),
      Seq(Observation("ab0001", t0 + 600, Some(5.0), Some(0.0)))))
    assert(out.map(_.icao24) == Seq("ab0001"))
    assert(out.head.flight_duration_minutes == 10)
    assert(out.head.landed_at.toInstant.getEpochSecond == t0 + 600)
  }

  test("a landing with no recorded takeoff emits nothing") {
    val out = runTws("tws_no_takeoff", Seq(
      Seq(Observation("cd0002", t0, Some(200.0), Some(0.0))),
      Seq(Observation("cd0002", t0 + 300, Some(0.0), Some(0.0)))))
    assert(out.isEmpty)
  }

  test("parity with flatMapGroupsWithState across random scenarios") {
    val rnd = new scala.util.Random(4242)
    def randomObs(key: String, t: Long): Observation = Observation(
      key, t,
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(300).toDouble),
      if (rnd.nextInt(10) == 0) None
      else Some((rnd.nextInt(21) - 10).toDouble))
    (1 to 3).foreach { run =>
      val keys = Seq("k1", "k2", "k3")
      val batches = (0 until 6).map { b =>
        keys.flatMap { k =>
          if (rnd.nextBoolean()) Seq(randomObs(k, t0 + b * 300)) else Nil
        }
      }
      val tws = runTws(s"tws_parity_$run", batches)

      val session = rocks
      import session.implicits._
      implicit val sqlCtx = session.sqlContext
      val input = MemoryStream[Observation]
      val query = StreamingFlightSession
        .completedFlights(session, input.toDS())
        .writeStream.outputMode("append")
        .format("memory").queryName(s"fmgws_parity_$run")
        .start()
      try {
        batches.foreach(b => input.addData(b: _*))
        awaitProcessed(query, batches.map(_.size).sum)
      } finally query.stop()
      val fmgws = session.table(s"fmgws_parity_$run")
        .as[CompletedFlight].collect().toSeq.sortBy(_.icao24)

      assert(tws == fmgws,
        s"run $run diverged:\ntws:   $tws\nfmgws: $fmgws")
    }
  }

  test("event-time timers evict by watermark: lost takeoff emits nothing") {
    val session = rocks
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlightsTwsEventTime(session, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("tws_et_out").start()
    try {
      // ab0001 takes off; ab0002 will land inside the horizon.
      input.addData(
        Observation("ab0001", t0, Some(80.0), Some(12.0)),
        Observation("ab0002", t0, Some(80.0), Some(12.0)))
      query.processAllAvailable()

      input.addData(Observation("ab0002", t0 + 600, Some(0.0), Some(0.0)))
      query.processAllAvailable()
      assert(session.table("tws_et_out").collect().map(r =>
        (r.getString(0), r.getInt(1))).toSeq == Seq(("ab0002", 10)))

      // an unrelated key 2 h ahead pushes the watermark past ab0001's
      // last_contact + 20 min → its event-time timer fires, state gone
      input.addData(Observation("zz9999", t0 + 7200, Some(100.0), Some(5.0)))
      query.processAllAvailable()

      // ab0001 "lands" — takeoff state evicted, so nothing is emitted
      input.addData(Observation("ab0001", t0 + 7260, Some(0.0), Some(0.0)))
      query.processAllAvailable()
      val flights = session.table("tws_et_out").collect()
        .map(_.getString(0)).toSeq
      assert(!flights.contains("ab0001"), flights.toString)
      assert(flights.count(_ == "ab0002") == 1)
    } finally query.stop()
  }

  test("RocksDB state survives a checkpoint restart: the takeoff from " +
      "leg 1 closes as a landing in leg 2") {
    val session = rocks
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("tws-restart")
    val sink = s"$dir/flights"
    val checkpoint = s"$dir/checkpoint"
    val input = MemoryStream[Observation]
    def start() = StreamingFlightSession
      .completedFlightsTws(session, input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CompletedFlight],
          _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(sink)
      }
      .option("checkpointLocation", checkpoint)
      .start()

    val q1 = start()
    try {
      input.addData(Observation("hh", t0, Some(80.0), Some(12.0)))
      awaitProcessed(q1, 1)
    } finally q1.stop()

    val q2 = start()
    try {
      input.addData(Observation("hh", t0 + 600, Some(0.0), Some(0.0)))
      val deadline = System.currentTimeMillis + 120000
      def emitted() = scala.util.Try(
        session.read.parquet(sink).count() >= 1).getOrElse(false)
      while (!emitted() && System.currentTimeMillis < deadline)
        Thread.sleep(100)
    } finally q2.stop()

    val got = session.read.parquet(sink).as[CompletedFlight].collect()
    assert(got.toSeq == Seq(CompletedFlight("hh", 10,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + 600)))))
  }

  test("initial-state bootstrap: a batch-persisted in-flight aircraft " +
      "lands correctly in the stream") {
    // the reference's startup semantics: the persisted source.parquet
    // active-flight state seeds the streaming operator, so a session
    // opened by the BATCH pipeline closes in the STREAM
    val session = rocks
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val initial = Seq(
      ("hh0001", ActiveFlight(
        takeoff_at = t0.toInt, flight_last_contact = t0.toInt,
        flight_trajectory = "climb", is_first_contact = Some(false))))
      .toDS()
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlightsTwsFromState(session, input.toDS(), initial)
      .writeStream.outputMode("append")
      .format("memory").queryName("tws_bootstrap")
      .start()
    try {
      // only the LANDING arrives on the stream — the takeoff lives in
      // the bootstrapped state
      input.addData(Observation("hh0001", t0 + 600, Some(0.0), Some(0.0)))
      awaitProcessed(query, 1)
      val deadline = System.currentTimeMillis + 90000
      while (session.table("tws_bootstrap").isEmpty &&
        System.currentTimeMillis < deadline) Thread.sleep(100)
    } finally query.stop()
    val got = session.table("tws_bootstrap").as[CompletedFlight].collect()
    assert(got.toSeq == Seq(CompletedFlight("hh0001", 10,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + 600)))))
  }

  test("state survives across batches and an inactivity timer is armed") {
    val session = rocks
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlightsTws(session, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("tws_state_rows")
      .start()
    try {
      input.addData(
        Observation("aa0001", t0, Some(80.0), Some(12.0)),
        Observation("aa0002", t0, Some(90.0), Some(10.0)))
      awaitProcessed(query, 2)
      val deadline = System.currentTimeMillis + 90000
      def stateRows: Long = query.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).lastOption.getOrElse(0L)
      while (stateRows < 2 && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      assert(stateRows == 2,
        s"expected 2 keyed-state rows, got $stateRows")
    } finally query.stop()
  }
}
