package graft

import graft.streaming.StreamingFlightSession
import graft.streaming.StreamingFlightSession._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twin specs. The state machine is deliberately
  * per-observation (not per-micro-batch), so results are independent of
  * how the engine slices batches — the specs feed all data up front and
  * wait for the input row count to be absorbed.
  *
  * NOTE: `processAllAvailable()` cannot be used here — with
  * ProcessingTimeTimeout the engine keeps constructing no-data batches
  * (timeouts must be able to fire), so the no-new-data signal never
  * arrives and the call blocks forever.
  */
class StreamingFlightSessionSpec extends SparkSpecBase {

  private def awaitProcessed(
      query: StreamingQuery, n: Long, timeoutMs: Long = 120000): Unit = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (query.recentProgress.map(_.numInputRows).sum < n &&
      System.currentTimeMillis < deadline) Thread.sleep(100)
    assert(query.recentProgress.map(_.numInputRows).sum >= n,
      s"stream did not absorb $n input rows within ${timeoutMs}ms")
  }

  private def runScenario(
      name: String, batches: Seq[Seq[Observation]],
      session: org.apache.spark.sql.SparkSession = spark)
      : Seq[CompletedFlight] = {
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlights(session, input.toDS())
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

  test("state-store metrics surface per-batch state size — the signal " +
      "an operator watches at scale") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .completedFlights(spark, input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("state_metrics_out")
      .start()
    try {
      // two live aircraft, no landings → both must be held in state
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
        s"expected 2 keyed-state rows in the progress metrics, got $stateRows")
      assert(query.recentProgress.exists(
        _.stateOperators.exists(_.numRowsUpdated > 0)),
        "state updates must be reported")
    } finally query.stop()
  }

  test("streaming session: takeoff, cruise, landing emits one flight") {
    val got = runScenario("flights_out", Seq(
      Seq(Observation("ab0001", t0, Some(80.0), Some(12.0))),
      Seq(Observation("ab0001", t0 + 300, Some(230.0), Some(-2.0))),
      Seq(Observation("ab0001", t0 + 600, Some(0.0), Some(0.0)))))
    assert(got == Seq(CompletedFlight("ab0001", 10,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + 600)))))
  }

  test("streaming session: landing without takeoff stamp emits nothing") {
    // Appears mid-flight already level+stopped → landing detected on
    // first contact, but no takeoff was ever stamped → session closes
    // silently (matches the batch twin's takeoff_at != 0 filter).
    val got = runScenario("flights_none", Seq(
      Seq(Observation("cd0002", t0, Some(0.0), Some(0.0)))))
    assert(got.isEmpty)
  }

  test("state survives a query restart from the checkpoint") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-restart")
    val checkpoint = s"$dir/checkpoint"
    val sink = s"$dir/out"
    val input = MemoryStream[Observation]

    // the memory sink cannot recover from a checkpoint — foreachBatch
    // into parquet is the restart-capable shape
    def start() = StreamingFlightSession
      .completedFlights(spark, input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CompletedFlight],
          _: Long) =>
        if (!b.isEmpty) b.write.mode("append").parquet(sink)
      }
      .option("checkpointLocation", checkpoint)
      .start()

    // leg 1: takeoff observed, then the query goes down
    val q1 = start()
    try {
      input.addData(Observation("hh", t0, Some(80.0), Some(12.0)))
      awaitProcessed(q1, 1)
    } finally q1.stop()

    // leg 2: restart from the checkpoint — the keyed state (stamped
    // takeoff) must still be there for the landing to close the session
    val q2 = start()
    try {
      input.addData(Observation("hh", t0 + 600, Some(0.0), Some(0.0)))
      val deadline = System.currentTimeMillis + 120000
      def emitted() = scala.util.Try(
        spark.read.parquet(sink).count() >= 1).getOrElse(false)
      while (!emitted() && System.currentTimeMillis < deadline)
        Thread.sleep(100)
    } finally q2.stop()

    val got = spark.read.parquet(sink).as[CompletedFlight].collect()
    assert(got.toSeq == Seq(CompletedFlight("hh", 10,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + 600)))))
  }

  test("foreachBatch persists enriched flights to the partitioned sink") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sink")
    val sink = s"$dir/flights"
    val metadata = df(Schemas.metadata,
      org.apache.spark.sql.Row("gg", "AB-CDE", "Boeing 737", "BOEING",
        "Lease Co", "Demo Air", "2000-02-01"))
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .enrichedFlights(spark, input.toDS(), metadata)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) Sources.writeFlights(batch, sink)
      }
      .option("checkpointLocation", s"$dir/checkpoint")
      .start()
    try {
      input.addData(Observation("gg", t0, Some(80.0), Some(12.0)))
      input.addData(Observation("gg", t0 + 600, Some(0.0), Some(0.0)))
      awaitProcessed(query, 2)
    } finally query.stop()
    val persisted = spark.read.parquet(sink)
    assert(persisted.select("icao24", "registration", "landed_date")
      .collect().toSeq == Seq(org.apache.spark.sql.Row("gg", "AB-CDE",
        java.sql.Date.valueOf("2024-04-05"))))
  }

  test("stream-static metadata enrichment joins on the session close event") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val metadata = df(Schemas.metadata,
      org.apache.spark.sql.Row("ff", "AB-CDE", "Boeing 737", "BOEING",
        "Lease Co", "Demo Air", "2000-02-01"))
    val input = MemoryStream[Observation]
    val query = StreamingFlightSession
      .enrichedFlights(spark, input.toDS(), metadata)
      .writeStream.outputMode("append")
      .format("memory").queryName("flights_enriched")
      .start()
    try {
      input.addData(Observation("ff", t0, Some(80.0), Some(12.0)))
      input.addData(Observation("ff", t0 + 600, Some(0.0), Some(0.0)))
      awaitProcessed(query, 2)
    } finally query.stop()
    val got = spark.table("flights_enriched")
      .select("icao24", "flight_duration_minutes", "registration", "built")
      .collect().toSeq
    assert(got == Seq(org.apache.spark.sql.Row("ff", 10, "AB-CDE",
      java.sql.Timestamp.valueOf("2000-02-01 00:00:00"))))
  }

  test("runs on the RocksDB state store (production backend for large state)") {
    // isolated session: the provider conf must not leak into streaming
    // tests running concurrently in other suites
    val rocks = spark.newSession()
    rocks.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val got = runScenario("flights_rocks", Seq(
      Seq(Observation("ee", t0, Some(80.0), Some(12.0))),
      Seq(Observation("ee", t0 + 600, Some(0.0), Some(0.0)))),
      session = rocks)
    assert(got == Seq(CompletedFlight("ee", 10,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + 600)))))
  }

  test("streaming matches batch twin on a multi-aircraft scenario") {
    val got = runScenario("flights_multi", Seq(
      Seq(Observation("aa", t0, Some(80.0), Some(12.0)),
        Observation("bb", t0, Some(200.0), Some(1.0))),
      Seq(Observation("aa", t0 + 300, Some(100.0), Some(-3.0)),
        Observation("bb", t0 + 300, Some(210.0), Some(0.5)),
        Observation("cc", t0 + 300, Some(5.0), None)),
      Seq(Observation("aa", t0 + 900, Some(4.0), Some(0.0)),
        Observation("bb", t0 + 900, Some(205.0), Some(0.2)))))
    // aa: takeoff at t0, descend at t0+300, level+slow at t0+900 → 15 min
    // flight. bb cruises throughout. cc: vertical rate null + velocity 5
    // → landing needs descend trajectory for the <10 arm → stays active.
    assert(got == Seq(CompletedFlight("aa", 15,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + 900)))))
  }
}
