package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twin of the batch pipeline: the reference's
  * 5-minute Airflow cycle (snapshot ⟗ state → classify → emit landed,
  * persist active) is exactly a keyed-state streaming job
  * (reference DAG: src/dags/flight_utilization.py:72-78; state loop:
  * opensky/transformers.py:105-146 + complete_flights/transformers.py:155-178).
  *
  * State per `icao24` lives in `GroupState[ActiveFlight]`; the batch
  * twin's 20-minute inactivity eviction (F1) becomes a
  * processing-time timeout. Landing detection closes the session and
  * emits a `CompletedFlight`; the built-in `session_window` cannot
  * express this close condition (predicate-based, not gap-based).
  *
  * Scale note: state is hash-partitioned by key across executors by
  * the engine; per-key state is O(1) (four fields), so total state is
  * bounded by the live-aircraft cardinality, not input volume.
  */
object StreamingFlightSession {

  /** One observation of one aircraft from a snapshot batch. */
  final case class Observation(
      icao24: String,
      last_contact: Long,
      velocity: Option[Double],
      vertical_rate: Option[Double])

  /** Keyed state carried across batches (cf. Schemas.source). */
  final case class ActiveFlight(
      takeoff_at: Int,
      flight_last_contact: Int,
      flight_trajectory: String,
      is_first_contact: Option[Boolean])

  /** Emitted when a landing closes the session (cf. Schemas.flights,
    * pre-enrichment — the metadata join happens downstream).
    */
  final case class CompletedFlight(
      icao24: String,
      flight_duration_minutes: Int,
      landed_at: java.sql.Timestamp)

  val InactivityTimeout = "20 minutes"

  private val Climb = "climb"
  private val Descend = "descend"
  private val Other = "other"

  private def isLanding(obs: Observation, trajectory: String): Boolean =
    obs.last_contact != 0 &&
      obs.vertical_rate.forall(_ == 0) &&
      ((trajectory == Descend && obs.velocity.exists(_ < 10)) ||
        obs.velocity.forall(_ == 0))

  private def nextTrajectory(
      verticalRate: Option[Double], prev: String): String =
    if (verticalRate.exists(_ > 0)) Climb
    else if (verticalRate.exists(_ < 0) || prev == Descend) Descend
    else Other

  val InactivityMillis: Long = 20L * 60 * 1000

  /** The per-key state machine, processing one micro-batch's
    * observations for one aircraft. Mirrors the batch plan:
    * first-contact transition (C3) → contact refresh (C4) →
    * classification (E1–E3) → takeoff stamp (C5) / landing emission →
    * trajectory update (E4).
    *
    * Timeout arming is injected: the processing-time variant arms a
    * wall-clock duration (reference fidelity — its Airflow loop runs
    * on wall clock), the event-time variant arms
    * `last_contact + horizon` against the watermark, which is the
    * reprocessing-safe choice at scale: replaying yesterday's feed
    * evicts by the data's own clock, not by how fast the replay runs.
    */
  def updateFlight(
      icao24: String,
      observations: Iterator[Observation],
      state: GroupState[ActiveFlight],
      armTimeout: (GroupState[ActiveFlight], Observation) => Unit =
        (st, _) => st.setTimeoutDuration(InactivityTimeout))
      : Iterator[CompletedFlight] = {
    if (state.hasTimedOut) {
      // F1 twin: unseen past the horizon — evict silently.
      state.remove()
      Iterator.empty
    } else {
      val completed = Seq.newBuilder[CompletedFlight]
      observations.toSeq.sortBy(_.last_contact).foreach { obs =>
        val (next, emitted) = step(icao24, state.getOption, obs)
        emitted.foreach(completed += _)
        next match {
          case Some(s) =>
            state.update(s)
            armTimeout(state, obs)
          case None => state.remove()
        }
      }
      completed.result().iterator
    }
  }

  /** Pure per-observation transition — the single source of truth for
    * the session state machine, shared by the `flatMapGroupsWithState`
    * path and the `transformWithState` processor so the two APIs can
    * never drift: (prior, obs) → (next state — None closes the
    * session — and an optional completed-flight emission).
    */
  def step(
      icao24: String,
      prior: Option[ActiveFlight],
      obs: Observation): (Option[ActiveFlight], Option[CompletedFlight]) = {
    val firstContact = prior match {
      case None => Some(true)
      case Some(f) => f.is_first_contact match {
        case None => Some(true)
        case Some(true) => Some(false)
        case other => other
      }
    }
    val flc =
      if (obs.last_contact != 0) obs.last_contact.toInt
      else prior.map(_.flight_last_contact).getOrElse(0)
    val trajectory = prior.map(_.flight_trajectory).orNull
    val takeoffAt = prior.map(_.takeoff_at).getOrElse(0)
    val isTakeoff =
      firstContact.contains(true) && obs.vertical_rate.exists(_ > 0)
    if (!isTakeoff && isLanding(obs, trajectory)) {
      val emitted =
        if (takeoffAt != 0)
          Some(CompletedFlight(
            icao24,
            math.ceil((obs.last_contact - takeoffAt) / 60.0).toInt,
            java.sql.Timestamp.from(
              java.time.Instant.ofEpochSecond(obs.last_contact))))
        else None
      (None, emitted)
    } else {
      val stamped = if (isTakeoff) flc else takeoffAt
      (Some(ActiveFlight(
        stamped, flc,
        nextTrajectory(obs.vertical_rate, trajectory), firstContact)),
        None)
    }
  }

  /** Wire a streaming Dataset of observations into the session state
    * machine. Caller attaches the sink (`writeStream`) and trigger.
    */
  def completedFlights(
      spark: SparkSession,
      observations: Dataset[Observation]): Dataset[CompletedFlight] = {
    import spark.implicits._
    observations
      .groupByKey(_.icao24)
      .flatMapGroupsWithState[ActiveFlight, CompletedFlight](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (k, it, st) => updateFlight(k, it, st))
  }

  /** The same session on the `transformWithState` arbitrary-state API
    * (Spark 4's successor to `flatMapGroupsWithState`): typed
    * `ValueState` + explicit per-key timers replace the fused
    * GroupState/timeout object. Requires the RocksDB state store.
    * Parity with the fMGWS path is structural — both drive `step`.
    */
  def completedFlightsTws(
      spark: SparkSession,
      observations: Dataset[Observation]): Dataset[CompletedFlight] = {
    import spark.implicits._
    observations
      .groupByKey(_.icao24)
      .transformWithState(
        new FlightSessionProcessor,
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** `transformWithState` bootstrapped from a BATCH state table — the
    * reference's exact startup semantics: its every-5-minutes job
    * begins by reading the persisted `source.parquet` active-flight
    * state (reference: opensky/transformers.py:60-66). Here that
    * state seeds the streaming operator's keyed state on the first
    * batch, so a batch-mode deployment can hand off to the streaming
    * twin without losing in-flight sessions.
    */
  def completedFlightsTwsFromState(
      spark: SparkSession,
      observations: Dataset[Observation],
      initial: Dataset[(String, ActiveFlight)]): Dataset[CompletedFlight] = {
    import spark.implicits._
    observations
      .groupByKey(_.icao24)
      .transformWithState(
        new FlightSessionBootstrapProcessor,
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append(),
        initial.groupByKey(_._1).mapValues(_._2))
  }

  /** Shared per-batch loop for the three `transformWithState`
    * processors — one definition of the step-drive + one-live-timer
    * pattern, so the processors differ ONLY in input type and timer
    * arming (the same guarantee `step` gives across state APIs).
    */
  private[streaming] def runBatch[I](
      key: String,
      rows: Iterator[I],
      asObs: I => Observation,
      state: org.apache.spark.sql.streaming.ValueState[ActiveFlight],
      handle: org.apache.spark.sql.streaming.StatefulProcessorHandle,
      armAt: ActiveFlight => Long): Iterator[CompletedFlight] = {
    val out = Seq.newBuilder[CompletedFlight]
    rows.toSeq.map(asObs).sortBy(_.last_contact).foreach { obs =>
      val prior = if (state.exists()) Some(state.get()) else None
      val (next, emitted) = step(key, prior, obs)
      emitted.foreach(out += _)
      next match {
        case Some(st) => state.update(st)
        case None => state.clear()
      }
    }
    // exactly one live inactivity timer per key: drop stale arms from
    // earlier batches, then re-arm iff the session is still open
    handle.listTimers().foreach(handle.deleteTimer)
    if (state.exists()) handle.registerTimer(armAt(state.get()))
    out.result().iterator
  }

  /** Observation carrying its event-time column (required for
    * watermarking — Spark tracks the watermark on a timestamp column
    * of the input, not on an arbitrary long).
    */
  final case class TimedObservation(
      icao24: String,
      last_contact: Long,
      velocity: Option[Double],
      vertical_rate: Option[Double],
      ts: java.sql.Timestamp)

  /** Event-time variant: state evicts when the WATERMARK (not the wall
    * clock) passes `last_contact + 20 min`. Re-running yesterday's
    * feed at full speed produces identical evictions — the property a
    * 100 TB backfill needs and a processing-time timeout cannot give.
    */
  def completedFlightsEventTime(
      spark: SparkSession,
      observations: Dataset[Observation],
      watermarkDelay: String = "10 minutes"): Dataset[CompletedFlight] = {
    import spark.implicits._
    observations
      .map(o => TimedObservation(o.icao24, o.last_contact, o.velocity,
        o.vertical_rate, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(o.last_contact))))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.icao24)
      .flatMapGroupsWithState[ActiveFlight, CompletedFlight](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: String, it: Iterator[TimedObservation],
            st: GroupState[ActiveFlight]) =>
          updateFlight(
            k,
            it.map(t => Observation(
              t.icao24, t.last_contact, t.velocity, t.vertical_rate)),
            st,
            // Arm from the stamped state's last_contact (the running max
            // of non-zero contacts), not the observation in hand: correct
            // under any intra-batch iteration order, so an out-of-order
            // batch can never arm the timeout from a stale observation
            // and evict early.
            (state, _) => state.setTimeoutTimestamp(
              state.get.flight_last_contact.toLong * 1000L +
                InactivityMillis))
      }
  }

  /** Event-time `transformWithState` variant: the inactivity timer is
    * an explicit event-time timer armed at `last_contact + horizon`,
    * fired by the WATERMARK — the backfill-safe eviction (identical
    * results replaying yesterday's feed at any speed), now on the
    * arbitrary-state API.
    */
  def completedFlightsTwsEventTime(
      spark: SparkSession,
      observations: Dataset[Observation],
      watermarkDelay: String = "10 minutes"): Dataset[CompletedFlight] = {
    import spark.implicits._
    observations
      .map(o => TimedObservation(o.icao24, o.last_contact, o.velocity,
        o.vertical_rate, java.sql.Timestamp.from(
          java.time.Instant.ofEpochSecond(o.last_contact))))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.icao24)
      .transformWithState(
        new FlightSessionEventTimeProcessor,
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Full streaming pipeline: session close events enriched with the
    * static metadata dimension (stream–static broadcast left join —
    * the streaming twin of phase B's J2).
    */
  def enrichedFlights(
      spark: SparkSession,
      observations: Dataset[Observation],
      metadata: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    completedFlights(spark, observations).toDF()
      .join(org.apache.spark.sql.functions.broadcast(metadata),
        Seq("icao24"), "left")
      .withColumn("built", org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.col("built"), "yyyy-MM-dd"))
}

/** `transformWithState` processor for the flight session: one typed
  * `ValueState[ActiveFlight]` per aircraft plus one explicit
  * processing-time inactivity timer per key (re-armed every batch the
  * key appears in; firing clears the state — the F1 eviction twin).
  * All transition logic delegates to `StreamingFlightSession.step`.
  */
class FlightSessionProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    String,
    StreamingFlightSession.Observation,
    StreamingFlightSession.CompletedFlight] {

  import StreamingFlightSession._
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
    TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var state: ValueState[ActiveFlight] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ActiveFlight](
      "flight", org.apache.spark.sql.Encoders.product[ActiveFlight],
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[Observation],
      timerValues: TimerValues): Iterator[CompletedFlight] =
    runBatch[Observation](key, rows, identity, state, getHandle,
      _ => timerValues.getCurrentProcessingTimeInMs + InactivityMillis)

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[CompletedFlight] = {
    // F1 twin: unseen past the horizon — evict silently.
    state.clear()
    Iterator.empty
  }
}

/** Event-time sibling of [[FlightSessionProcessor]]: the inactivity
  * timer is armed at the session's own `last_contact + horizon` (the
  * running max of non-zero contacts, never a stale observation) and
  * fires when the WATERMARK passes it — replay-deterministic eviction.
  */
class FlightSessionEventTimeProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    String,
    StreamingFlightSession.TimedObservation,
    StreamingFlightSession.CompletedFlight] {

  import StreamingFlightSession._
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
    TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var state: ValueState[ActiveFlight] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ActiveFlight](
      "flight", org.apache.spark.sql.Encoders.product[ActiveFlight],
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[TimedObservation],
      timerValues: TimerValues): Iterator[CompletedFlight] =
    runBatch[TimedObservation](key, rows,
      t => Observation(t.icao24, t.last_contact, t.velocity,
        t.vertical_rate),
      state, getHandle,
      // arm from the stamped state's last_contact (the running max of
      // non-zero contacts) — correct under any intra-batch order
      st => st.flight_last_contact.toLong * 1000L + InactivityMillis)

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[CompletedFlight] = {
    state.clear()
    Iterator.empty
  }
}

/** [[FlightSessionProcessor]] plus batch-state bootstrap: the engine
  * feeds each key's row from the initial-state Dataset exactly once
  * (first batch) through `handleInitialState`, which seeds the typed
  * ValueState and arms the inactivity timer — after that the key
  * behaves exactly like one the stream created itself.
  */
class FlightSessionBootstrapProcessor
  extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
    String,
    StreamingFlightSession.Observation,
    StreamingFlightSession.CompletedFlight,
    StreamingFlightSession.ActiveFlight] {

  import StreamingFlightSession._
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
    TTLConfig, TimeMode, TimerValues, ValueState}

  @transient private var state: ValueState[ActiveFlight] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[ActiveFlight](
      "flight", org.apache.spark.sql.Encoders.product[ActiveFlight],
      TTLConfig.NONE)

  override def handleInitialState(
      key: String,
      initialState: ActiveFlight,
      timerValues: TimerValues): Unit = {
    state.update(initialState)
    getHandle.registerTimer(
      timerValues.getCurrentProcessingTimeInMs + InactivityMillis)
  }

  override def handleInputRows(
      key: String,
      rows: Iterator[Observation],
      timerValues: TimerValues): Iterator[CompletedFlight] =
    runBatch[Observation](key, rows, identity, state, getHandle,
      _ => timerValues.getCurrentProcessingTimeInMs + InactivityMillis)

  override def handleExpiredTimer(
      key: String,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[CompletedFlight] = {
    state.clear()
    Iterator.empty
  }
}
