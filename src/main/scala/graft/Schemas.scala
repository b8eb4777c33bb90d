package graft

import org.apache.spark.sql.types._

/** Schema catalog for the flight-utilization engine.
  *
  * Mirrors the reference's column-name registry
  * (reference: src/plugins/common/constants.py:13-39,
  * src/plugins/scripts/opensky/constants.py:5-23,
  * src/plugins/scripts/complete_flights/constants.py:12-21) as explicit
  * Spark `StructType`s — schema-on-read everywhere, never inference for
  * the state tables.
  */
object Schemas {

  /** Raw OpenSky states snapshot: 17 columns decoded from the JSON
    * array-of-arrays payload (reference: opensky/constants.py:5-23).
    */
  val states17: StructType = StructType(Seq(
    StructField("icao24", StringType),
    StructField("callsign", StringType),
    StructField("origin_country", StringType),
    StructField("time_position", LongType),
    StructField("last_contact", LongType),
    StructField("longitude", DoubleType),
    StructField("latitude", DoubleType),
    StructField("baro_altitude", DoubleType),
    StructField("on_ground", BooleanType),
    StructField("velocity", DoubleType),
    StructField("true_track", DoubleType),
    StructField("vertical_rate", DoubleType),
    StructField("sensors", StringType),
    StructField("geo_altitude", DoubleType),
    StructField("squawk", StringType),
    StructField("spi", BooleanType),
    StructField("position_source", IntegerType),
  ))

  /** Projected working subset of the states snapshot
    * (reference: opensky/transformers.py:49-56).
    */
  val states: StructType = StructType(Seq(
    StructField("icao24", StringType),
    StructField("last_contact", LongType),
    StructField("velocity", DoubleType),
    StructField("vertical_rate", DoubleType),
  ))

  /** Persistent keyed state table ("source"), one row per active flight
    * (reference: common/constants.py:13-21). `last_contact`,
    * `takeoff_at`, `flight_last_contact` carry the 0-sentinel for
    * "absent"; `is_first_contact` is tri-state (null = never seen).
    */
  val source: StructType = StructType(Seq(
    StructField("icao24", StringType),
    StructField("last_contact", IntegerType),
    StructField("velocity", DoubleType),
    StructField("vertical_rate", DoubleType),
    StructField("takeoff_at", IntegerType),
    StructField("flight_last_contact", IntegerType),
    StructField("flight_trajectory", StringType),
    StructField("is_first_contact", BooleanType),
  ))

  /** Subset of `source` carried across micro-batches into the join
    * (reference: common/constants.py:34-39).
    */
  val activeFlightCols: Seq[String] = Seq(
    "icao24", "takeoff_at", "flight_last_contact",
    "flight_trajectory", "is_first_contact")

  /** Aircraft metadata dimension after projection/rename
    * (reference: complete_flights/constants.py:12-21).
    */
  val metadata: StructType = StructType(Seq(
    StructField("icao24", StringType),
    StructField("registration", StringType),
    StructField("model", StringType),
    StructField("manufacturer_icao", StringType),
    StructField("owner", StringType),
    StructField("operator", StringType),
    StructField("built", StringType),
  ))

  /** Completed-flights sink record
    * (reference: complete_flights/db.py:17-27).
    */
  val flights: StructType = StructType(Seq(
    StructField("icao24", StringType),
    StructField("flight_duration_minutes", IntegerType),
    StructField("landed_at", TimestampType),
    StructField("registration", StringType),
    StructField("model", StringType),
    StructField("manufacturer_icao", StringType),
    StructField("owner", StringType),
    StructField("operator", StringType),
    StructField("built", TimestampType),
  ))
}
