package graft

import org.apache.spark.sql.Row
import java.nio.file.Files
import java.time.LocalDate

/** TTL-as-partition-drop: expired `landed_date=` partitions disappear,
  * fresh ones survive, and the table stays readable afterwards.
  */
class RetentionJobSpec extends SparkSpecBase {

  private def flight(id: String, epoch: Long) =
    Row(id, Integer.valueOf(10),
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epoch)),
      null, null, null, null, null, null)

  test("drops only partitions older than the retention horizon") {
    val dir = Files.createTempDirectory("graft-retention").toString
    val sink = s"$dir/flights"
    // 2024-04-05 (old) and 2025-04-05 (fresh)
    Sources.writeFlights(df(Schemas.flights,
      flight("old111", 1712338215L), flight("new222", 1743874215L)), sink)

    val dropped = RetentionJob.dropExpired(
      spark, sink, today = LocalDate.parse("2025-06-01"))

    assert(dropped == Seq(LocalDate.parse("2024-04-05")))
    val left = spark.read.parquet(sink)
    assert(left.select("icao24").collect().map(_.getString(0)).toSeq
      == Seq("new222"))
  }

  test("landed_date filters prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-prune").toString
    val sink = s"$dir/flights"
    Sources.writeFlights(df(Schemas.flights,
      flight("aaa111", 1712338215L), flight("bbb222", 1743874215L)), sink)
    val all = spark.read.parquet(sink)
    val filtered = all
      .filter(org.apache.spark.sql.functions.col("landed_date")
        === "2024-04-05")
    filtered.collect()
    // the executed scan reads strictly fewer files than the table has
    // (inputFiles reflects the pre-pruning index, so probe the metric)
    val scanned = filtered.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get
    assert(scanned > 0 && scanned < all.inputFiles.length,
      s"scanned $scanned of ${all.inputFiles.length} files")
  }

  test("no-op on a missing sink and on all-fresh data") {
    assert(RetentionJob.dropExpired(
      spark, "/tmp/graft-no-such-sink", LocalDate.now()).isEmpty)
    val dir = Files.createTempDirectory("graft-retention2").toString
    val sink = s"$dir/flights"
    Sources.writeFlights(df(Schemas.flights, flight("aa", 1743874215L)), sink)
    assert(RetentionJob.dropExpired(
      spark, sink, LocalDate.parse("2025-06-01")).isEmpty)
    assert(spark.read.parquet(sink).count() == 1)
  }
}
