package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The flight-classification expressions — the reference's entire "UDF
  * surface" — as pure, codegen-friendly Column expressions (no UDFs).
  *
  * Semantics derived from reference:
  * src/plugins/scripts/complete_flights/transformers.py:37-81 and its
  * truth-table tests (test_transform.py:57-275).
  *
  * Null behavior is deliberately three-valued: pandas comparisons
  * against NaN yield False, Spark yields null; in every consuming
  * context (CASE arms, filters) null and false coincide, which is
  * verified by the truth-table specs.
  */
object FlightExprs {

  val Takeoff = "takeoff"
  val Landing = "landing"
  val Other = "other"
  val Climb = "climb"
  val Descend = "descend"

  /** E1: first batch ever seen AND climbing. */
  def isTakeoff(
      isFirstContact: Column = col("is_first_contact"),
      verticalRate: Column = col("vertical_rate")): Column =
    isFirstContact === true && verticalRate > 0

  /** E2: seen this batch, vertical rate zero-or-missing, and either
    * (descending AND slow) or velocity zero-or-missing.
    */
  def isLanding(
      lastContact: Column = col("last_contact"),
      verticalRate: Column = col("vertical_rate"),
      trajectory: Column = col("flight_trajectory"),
      velocity: Column = col("velocity")): Column =
    lastContact =!= 0 &&
      (verticalRate === 0 || verticalRate.isNull) &&
      ((trajectory === Descend && velocity < 10) ||
        velocity === 0 || velocity.isNull)

  /** E3: CASE takeoff → landing → other. */
  def flightStatus(
      isFirstContact: Column = col("is_first_contact"),
      verticalRate: Column = col("vertical_rate"),
      lastContact: Column = col("last_contact"),
      trajectory: Column = col("flight_trajectory"),
      velocity: Column = col("velocity")): Column =
    when(isTakeoff(isFirstContact, verticalRate), Takeoff)
      .when(isLanding(lastContact, verticalRate, trajectory, velocity), Landing)
      .otherwise(Other)

  /** E4: sticky-descend trajectory — climbing wins; otherwise once
    * descending, level flight stays "descend".
    */
  def flightTrajectory(
      verticalRate: Column = col("vertical_rate"),
      prevTrajectory: Column = col("flight_trajectory")): Column =
    when(verticalRate > 0, Climb)
      .when(verticalRate < 0 || prevTrajectory === Descend, Descend)
      .otherwise(Other)

  /** C3: tri-state first-contact transition, applied simultaneously:
    * null (never seen) → true (first batch); true → false (seen before);
    * false stays false. Chain order matters — isNull must be tested
    * before the ===true rewrite to avoid double-applying.
    */
  def firstContactTransition(
      isFirstContact: Column = col("is_first_contact")): Column =
    when(isFirstContact.isNull, true)
      .when(isFirstContact === true, false)
      .otherwise(isFirstContact)

  /** C4: refresh the persistent last-contact where the aircraft was seen
    * this batch (0-sentinel means "absent this batch").
    */
  def refreshedFlightLastContact(
      lastContact: Column = col("last_contact"),
      flightLastContact: Column = col("flight_last_contact")): Column =
    when(lastContact =!= 0, lastContact).otherwise(flightLastContact)

  /** C5: stamp takeoff time from the refreshed contact on takeoff rows. */
  def stampedTakeoffAt(
      status: Column = col("flight_status"),
      flightLastContact: Column = col("flight_last_contact"),
      takeoffAt: Column = col("takeoff_at")): Column =
    when(status === Takeoff, flightLastContact).otherwise(takeoffAt)

  /** M1: flight duration in whole minutes, rounded up. */
  def durationMinutes(
      landedEpoch: Column,
      takeoffEpoch: Column): Column =
    ceil((landedEpoch - takeoffEpoch) / 60.0).cast("int")
}
