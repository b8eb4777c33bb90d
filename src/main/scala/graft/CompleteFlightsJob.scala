package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Flight-completion detection: classify every state row, split landed
  * flights from still-active ones, enrich landed flights with the
  * aircraft-metadata dimension, and hand the survivors back as the next
  * batch's state (reference:
  * src/plugins/scripts/complete_flights/transformers.py:83-187).
  *
  * Scale note: the metadata dimension (~500k rows projected to 7
  * columns) is broadcast — the classic broadcast-hash enrichment join;
  * the classified state is computed once and reused by both branches.
  */
object CompleteFlightsJob {

  import FlightExprs._

  /** Both output branches of one batch. */
  final case class TransformedFlights(active: DataFrame, complete: DataFrame)

  /** E3: add the per-row `flight_status` classification. */
  def classify(source: DataFrame): DataFrame =
    source.withColumn("flight_status", flightStatus())

  /** Active branch: stamp takeoff time on fresh takeoffs (C5), recompute
    * the sticky trajectory (E4), drop the transient status column
    * (reference: complete_flights/transformers.py:89-106).
    */
  def transformActive(classified: DataFrame): DataFrame =
    classified
      .filter(col("flight_status") =!= Landing)
      .withColumn("takeoff_at", stampedTakeoffAt())
      .withColumn("flight_trajectory", flightTrajectory())
      .drop("flight_status")

  /** Complete branch: landed flights with a valid takeoff stamp, reduced
    * to the sink record — duration (M1), landing timestamp (M2), and the
    * left-joined metadata with strictly-formatted `built` parse (J2, M3)
    * (reference: complete_flights/transformers.py:108-153).
    */
  def transformComplete(classified: DataFrame, metadata: DataFrame): DataFrame =
    classified
      .filter(col("flight_status") === Landing)
      .filter(col("takeoff_at") =!= 0)
      .select("icao24", "takeoff_at", "last_contact")
      .withColumn("flight_duration_minutes",
        durationMinutes(col("last_contact"), col("takeoff_at")))
      .withColumn("landed_at", timestamp_seconds(col("last_contact")))
      .drop("takeoff_at", "last_contact")
      .join(broadcast(metadata), Seq("icao24"), "left")
      .withColumn("built", to_timestamp(col("built"), "yyyy-MM-dd"))

  /** Typed view of the complete branch — compile-time field checking at
    * the sink boundary (the reference's `Flights(TypedDict)` analog).
    */
  def completeAsDataset(
      classified: DataFrame,
      metadata: DataFrame): org.apache.spark.sql.Dataset[Flight] = {
    val df = transformComplete(classified, metadata)
    import df.sparkSession.implicits._
    df.as[Flight]
  }

  /** Full batch transform (reference: complete_flights/transformers.py:155-171).
    *
    * The classified state feeds BOTH branches, and each branch is
    * consumed by its own sink action — materialize it once
    * (localCheckpoint, the repo-wide pattern: persist() would register
    * a CacheManager entry nothing ever frees across a long micro-batch
    * loop, while checkpoint blocks are released by the ContextCleaner
    * once the batch's frames are dropped). The "computed once" in the
    * scale note above is this materialization, not an automatic
    * property of two plans derived from one val.
    */
  def transform(source: DataFrame, metadata: DataFrame): TransformedFlights = {
    val classified = classify(source).localCheckpoint(true)
    TransformedFlights(
      active = transformActive(classified),
      complete = transformComplete(classified, metadata))
  }
}
