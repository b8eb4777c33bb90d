package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Daily dimension refresh: project the raw 27-column aircraft database
  * down to the 7-column metadata dimension and normalize the one
  * divergent column name (reference:
  * src/plugins/scripts/opensky/transformers.py:166-193).
  */
object MetadataJob {

  private val rawCols = Seq(
    "icao24", "registration", "model", "manufacturericao",
    "owner", "operator", "built")

  /** P3 + P4: project and rename. */
  def projectMetadata(raw: DataFrame): DataFrame =
    raw.select(rawCols.map(col): _*)
      .withColumnRenamed("manufacturericao", "manufacturer_icao")
}
