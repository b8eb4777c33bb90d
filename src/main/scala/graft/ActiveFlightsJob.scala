package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The hot-path state update: merge the fresh global snapshot with the
  * persisted active-flight state (reference:
  * src/plugins/scripts/opensky/transformers.py:105-142).
  *
  * Pure DataFrame => DataFrame — all I/O and the "now" horizon live at
  * the job edge so the plan is deterministic and oracle-testable.
  *
  * Scale note: both sides are keyed by `icao24` with unique keys; the
  * full-outer join shuffles on the key (or broadcasts when one side is
  * small — left to Catalyst/AQE). State is rewritten per micro-batch,
  * so the whole update is one Project→Filter→Join→Project plan.
  */
object ActiveFlightsJob {

  private val zeroFilled =
    Seq("last_contact", "velocity", "vertical_rate",
      "takeoff_at", "flight_last_contact")
  private val epochCols =
    Seq("last_contact", "takeoff_at", "flight_last_contact")

  /** F1: evict state rows unseen for longer than the horizon.
    * `horizonEpoch` = now − 20 min, epoch seconds, passed in for
    * determinism (reference computes it inline:
    * opensky/transformers.py:85-97).
    */
  def removeInactive(activeFlights: DataFrame, horizonEpoch: Long): DataFrame =
    activeFlights.filter(col("flight_last_contact") > horizonEpoch)

  /** P2: project the persisted state down to the columns carried across
    * batches (reference: opensky/transformers.py:68-70).
    */
  def activeFlightsFromSource(source: DataFrame): DataFrame =
    source.select(Schemas.activeFlightCols.map(col): _*)

  /** The full state-update plan: J1 full-outer join + C1 zero-fill +
    * C2 int casts + C3 first-contact transition + C4 contact refresh.
    *
    * @param states       projected snapshot (icao24, last_contact,
    *                     velocity, vertical_rate)
    * @param latestSource previous batch's 8-column state table
    * @param horizonEpoch inactivity eviction horizon (epoch seconds)
    */
  def stateUpdate(
      states: DataFrame,
      latestSource: DataFrame,
      horizonEpoch: Long): DataFrame =
    mergeWithActive(states,
      removeInactive(activeFlightsFromSource(latestSource), horizonEpoch))

  /** The merge core (J1 + C1–C4) over an already-evicted active set —
    * also the entry point for callers that express eviction
    * declaratively (e.g. a broadcast-scalar horizon join).
    */
  def mergeWithActive(states: DataFrame, active: DataFrame): DataFrame = {
    val merged = states.join(active, Seq("icao24"), "full_outer")
      .na.fill(0, zeroFilled)
    val casted = epochCols.foldLeft(merged) { (df, c) =>
      df.withColumn(c, col(c).cast(IntegerType))
    }
    casted
      .withColumn("is_first_contact", FlightExprs.firstContactTransition())
      .withColumn("flight_last_contact",
        FlightExprs.refreshedFlightLastContact())
      .select(Schemas.source.fieldNames.map(col): _*)
  }
}
