package graft

import java.sql.Timestamp

/** Typed record for the completed-flights sink — the engine's analog
  * of the reference's `Flights(TypedDict)` contract at the sink
  * boundary (reference: src/plugins/scripts/complete_flights/db.py:17-27).
  */
final case class Flight(
    icao24: String,
    flight_duration_minutes: Int,
    landed_at: Timestamp,
    registration: Option[String],
    model: Option[String],
    manufacturer_icao: Option[String],
    owner: Option[String],
    operator: Option[String],
    built: Option[Timestamp])
