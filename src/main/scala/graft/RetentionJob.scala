package graft

import org.apache.spark.sql.SparkSession
import java.time.LocalDate

/** Sink retention: the reference's 365-day MongoDB TTL
  * (reference: src/plugins/scripts/complete_flights/db.py:43-53)
  * re-expressed as partition drops on the `landed_date`-partitioned
  * flights table — an O(partitions) metadata operation instead of a
  * row-level delete scan, which is the only retention that stays cheap
  * at 100 TB.
  */
object RetentionJob {

  val DefaultRetentionDays = 365

  /** Delete whole `landed_date=` partitions older than the horizon.
    * Returns the dropped partition dates.
    */
  def dropExpired(
      spark: SparkSession,
      sinkPath: String,
      today: LocalDate,
      retentionDays: Int = DefaultRetentionDays): Seq[LocalDate] = {
    val horizon = today.minusDays(retentionDays.toLong)
    val root = new org.apache.hadoop.fs.Path(sinkPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val name = st.getPath.getName
        if (!name.startsWith("landed_date=")) None
        else scala.util.Try(
          LocalDate.parse(name.stripPrefix("landed_date="))).toOption
          .filter(_.isBefore(horizon))
          // only report a partition dropped if the delete actually
          // succeeded — a false return (object-store race, permission
          // drift) would otherwise read as success while expired rows
          // silently outlive the TTL
          .filter(_ => fs.delete(st.getPath, true))
      }
      .sorted
  }
}
