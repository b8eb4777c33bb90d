package graft

import graft.streaming.StreamingFlightSession.{CompletedFlight, Observation}
import org.apache.spark.sql.{DataFrame, Row}

/** Multi-batch replay (SURVEY §5.2#5): run the BATCH two-phase pipeline
  * over a scripted scenario with parquet-free in-memory state handoff
  * and assert the emitted completed flights match the hand-computed
  * session log — the same scenario the streaming spec replays, pinning
  * batch/streaming parity.
  */
class ReplayParitySpec extends SparkSpecBase {

  private val t0 = 1712338000L

  private def statesDf(obs: Seq[Observation]): DataFrame =
    df(Schemas.states, obs.map(o => Row(o.icao24,
      java.lang.Long.valueOf(o.last_contact),
      o.velocity.map(java.lang.Double.valueOf).orNull,
      o.vertical_rate.map(java.lang.Double.valueOf).orNull)): _*)

  /** One reference cycle: phase A state merge, then phase B split. */
  private def runBatches(batches: Seq[Seq[Observation]])
      : (Seq[Row], Seq[Row]) = {
    val emptyMeta = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.metadata)
    var state = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.source)
    val completed = Seq.newBuilder[Row]
    batches.zipWithIndex.foreach { case (obs, i) =>
      val now = t0 + 300L * i
      val merged = ActiveFlightsJob.stateUpdate(statesDf(obs), state, now - 1200)
      val out = CompleteFlightsJob.transform(merged, emptyMeta)
      completed ++= out.complete
        .select("icao24", "flight_duration_minutes", "landed_at")
        .collect().toSeq
      // materialize: next batch's state must not lazily re-derive
      state = df(Schemas.source, out.active.collect().toSeq: _*)
    }
    (completed.result(), state.collect().toSeq)
  }

  test("batch replay emits the same session log as the streaming twin") {
    val scenario = Seq(
      Seq(Observation("aa", t0, Some(80.0), Some(12.0)),
        Observation("bb", t0, Some(200.0), Some(1.0))),
      Seq(Observation("aa", t0 + 300, Some(100.0), Some(-3.0)),
        Observation("bb", t0 + 300, Some(210.0), Some(0.5)),
        Observation("cc", t0 + 300, Some(5.0), None)),
      Seq(Observation("aa", t0 + 900, Some(4.0), Some(0.0)),
        Observation("bb", t0 + 900, Some(205.0), Some(0.2))))
    // Streaming-spec expectation: exactly aa's 15-minute flight.
    val (completed, state) = runBatches(scenario)
    assert(completed == Seq(Row("aa", Integer.valueOf(15),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + 900)))))
    // bb still cruising, cc still active (no landing without descend).
    assert(state.map(_.getString(0)).sorted.toSeq == Seq("bb", "cc"))
  }

  test("state eviction drops aircraft unseen for over 20 minutes") {
    val scenario = Seq(
      Seq(Observation("aa", t0, Some(80.0), Some(12.0))),
      Seq(), // absent
      Seq(), // absent
      Seq(), // absent
      Seq(), // absent — by now t0 is 20+ min old at now = t0+1500
      Seq())
    val (completed, state) = runBatches(scenario)
    assert(completed.isEmpty)
    assert(state.isEmpty)
  }

  test("takeoff timestamp survives across intermediate batches") {
    val scenario = Seq(
      Seq(Observation("aa", t0, Some(80.0), Some(12.0))),
      Seq(Observation("aa", t0 + 300, Some(230.0), Some(5.0))),
      Seq(Observation("aa", t0 + 600, Some(150.0), Some(-8.0))),
      Seq(Observation("aa", t0 + 899, Some(0.0), Some(0.0))))
    val (completed, _) = runBatches(scenario)
    // duration = ceil(899/60) = 15 minutes from the ORIGINAL takeoff.
    assert(completed == Seq(Row("aa", Integer.valueOf(15),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(t0 + 899)))))
  }
}
