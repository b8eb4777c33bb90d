package graft.queries

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-fidelity operators (SURVEY.md §2) exercised over the
  * driver corpus, each paired with a DuckDB oracle that re-implements
  * the semantics independently in SQL.
  */
object RefQueries {

  type Fn = (SparkSession, String) => DataFrame

  /** 15-day eviction horizon over the derived state — wide enough that
    * both the kept and evicted branches are populated at every SF.
    */
  private val HorizonSeconds = 1296000L

  /** Data-dependent horizon kept IN the plan: a broadcast scalar join
    * instead of a driver-side collect, so the query stays one job at
    * any scale. (The production job takes the horizon as a parameter —
    * `ActiveFlightsJob.stateUpdate` — because "now" comes from the
    * trigger, not the data.)
    */
  private def withHorizon(src: DataFrame): DataFrame =
    src.crossJoin(broadcast(
      src.agg((max(col("flight_last_contact")) - HorizonSeconds)
        .as("horizon"))))

  def activeSurvivors(spark: SparkSession, dir: String): DataFrame =
    withHorizon(ActiveFlightsJob.activeFlightsFromSource(
      Derived.source(spark, dir)))
      .filter(col("flight_last_contact") > col("horizon"))
      .select(Schemas.activeFlightCols.map(col): _*)

  def stateUpdate(spark: SparkSession, dir: String): DataFrame =
    ActiveFlightsJob.mergeWithActive(
      Derived.states(spark, dir), activeSurvivors(spark, dir))

  /** Both reference phases fused end-to-end: state update (phase A)
    * feeding the completion split (phase B) in one declarative plan.
    */
  def pipelineEndToEnd(spark: SparkSession, dir: String): DataFrame =
    CompleteFlightsJob.transformComplete(
      CompleteFlightsJob.classify(stateUpdate(spark, dir)),
      Derived.metadata(spark, dir))

  def completeFlights(spark: SparkSession, dir: String): DataFrame =
    CompleteFlightsJob.transformComplete(
      CompleteFlightsJob.classify(Derived.source(spark, dir)),
      Derived.metadata(spark, dir))

  /** E1–E3 as a SQL CASE — shared by every classifying oracle. */
  private val statusCaseSql =
    """CASE WHEN is_first_contact = true AND vertical_rate > 0 THEN 'takeoff'
         WHEN last_contact <> 0
              AND (vertical_rate = 0 OR vertical_rate IS NULL)
              AND ((flight_trajectory = 'descend' AND velocity < 10)
                   OR velocity = 0 OR velocity IS NULL)
         THEN 'landing'
         ELSE 'other' END"""

  /** Full state-update oracle (phase A), reusable as a nested subquery. */
  private val stateUpdateOracleSql =
    s"""WITH st AS (${Derived.statesSql}),
      src AS (${Derived.sourceSql}),
      active AS (
        SELECT icao24, takeoff_at, flight_last_contact, flight_trajectory, is_first_contact
        FROM src
        WHERE flight_last_contact > (SELECT max(flight_last_contact) - $HorizonSeconds FROM src)),
      merged AS (
        SELECT COALESCE(st.icao24, a.icao24) AS icao24,
               CAST(COALESCE(st.last_contact, 0) AS INTEGER) AS last_contact,
               COALESCE(st.velocity, 0) AS velocity,
               COALESCE(st.vertical_rate, 0) AS vertical_rate,
               CAST(COALESCE(a.takeoff_at, 0) AS INTEGER) AS takeoff_at,
               CAST(COALESCE(a.flight_last_contact, 0) AS INTEGER) AS flight_last_contact,
               a.flight_trajectory AS flight_trajectory,
               a.is_first_contact AS is_first_contact
        FROM st FULL OUTER JOIN active a ON st.icao24 = a.icao24)
      SELECT icao24, last_contact, velocity, vertical_rate, takeoff_at,
             CASE WHEN last_contact <> 0 THEN last_contact
                  ELSE flight_last_contact END AS flight_last_contact,
             flight_trajectory,
             CASE WHEN is_first_contact IS NULL THEN true
                  WHEN is_first_contact = true THEN false
                  ELSE is_first_contact END AS is_first_contact
      FROM merged"""

  /** Phase B (classify → landed → enrich) over any 8-col source CTE. */
  private def completeOracleSql(sourceRef: String) =
    s"""WITH meta AS (${Derived.metadataSql}),
      classified AS (
        SELECT *, $statusCaseSql AS flight_status FROM $sourceRef),
      complete AS (
        SELECT icao24, takeoff_at, last_contact FROM classified
        WHERE flight_status = 'landing' AND takeoff_at <> 0)
      SELECT c.icao24,
             CAST(ceil((c.last_contact - c.takeoff_at) / 60.0) AS INTEGER) AS flight_duration_minutes,
             to_timestamp(c.last_contact)::TIMESTAMP AS landed_at,
             m.registration, m.model, m.manufacturer_icao, m.owner, m.operator,
             strptime(m.built, '%Y-%m-%d') AS built
      FROM complete c LEFT JOIN meta m ON c.icao24 = m.icao24"""

  val entries: Map[String, (Fn, Option[String])] = Map(

    // The two-phase reference cycle fused: phase A state update feeding
    // phase B completion split, one declarative plan end-to-end.
    "ref_pipeline_e2e" -> ((
      pipelineEndToEnd _,
      Some(completeOracleSql(s"(${stateUpdateOracleSql})"))
    )),

    // P3/P4 — dimension projection + rename (MetadataJob).
    "ref_metadata_project" -> ((
      (s: SparkSession, d: String) =>
        MetadataJob.projectMetadata(Derived.rawAircraftDb(s, d)),
      Some(s"SELECT icao24, registration, model, manufacturer_icao, owner, operator, built FROM (${Derived.metadataSql})")
    )),

    // F1 — inactivity eviction; horizon via broadcast scalar join.
    "ref_eviction" -> ((
      activeSurvivors _,
      Some(s"""WITH src AS (${Derived.sourceSql})
        SELECT icao24, takeoff_at, flight_last_contact, flight_trajectory, is_first_contact
        FROM src
        WHERE flight_last_contact > (SELECT max(flight_last_contact) - $HorizonSeconds FROM src)""")
    )),

    // J1 + C1–C4 — the full state-update plan.
    "ref_state_update" -> ((
      stateUpdate _,
      Some(stateUpdateOracleSql)
    )),

    // E1–E4 — classification + trajectory as pure expressions.
    "ref_classify" -> ((
      (s: SparkSession, d: String) =>
        CompleteFlightsJob.classify(Derived.source(s, d))
          .withColumn("next_trajectory", FlightExprs.flightTrajectory())
          .select("icao24", "flight_status", "next_trajectory"),
      Some(s"""WITH src AS (${Derived.sourceSql})
        SELECT icao24,
          $statusCaseSql AS flight_status,
          CASE WHEN vertical_rate > 0 THEN 'climb'
               WHEN vertical_rate < 0 OR flight_trajectory = 'descend' THEN 'descend'
               ELSE 'other' END AS next_trajectory
        FROM src""")
    )),

    // C5 + E4 + P6 — the active branch of the completion split.
    "ref_active_branch" -> ((
      (s: SparkSession, d: String) =>
        CompleteFlightsJob.transformActive(
          CompleteFlightsJob.classify(Derived.source(s, d))),
      Some(s"""WITH src AS (${Derived.sourceSql}),
        classified AS (
          SELECT *, $statusCaseSql AS flight_status
          FROM src)
        SELECT icao24, last_contact, velocity, vertical_rate,
               CASE WHEN flight_status = 'takeoff' THEN flight_last_contact
                    ELSE takeoff_at END AS takeoff_at,
               flight_last_contact,
               CASE WHEN vertical_rate > 0 THEN 'climb'
                    WHEN vertical_rate < 0 OR flight_trajectory = 'descend' THEN 'descend'
                    ELSE 'other' END AS flight_trajectory,
               is_first_contact
        FROM classified WHERE flight_status <> 'landing'""")
    )),

    // F2/F4 + M1–M3 + J2 — the complete branch: landed flights enriched
    // with the metadata dimension (flagship; also SparkEntry.entry).
    "ref_complete_flights" -> ((
      completeFlights _,
      Some(completeOracleSql(s"(${Derived.sourceSql})"))
    )),
  )
}
