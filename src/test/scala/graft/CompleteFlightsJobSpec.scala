package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp
import java.time.Instant

/** Golden specs for the completion-detection job, ported from the
  * reference's tests (reference:
  * src/tests/plugins/scripts/complete_flights/test_transform.py:306-392).
  */
class CompleteFlightsJobSpec extends SparkSpecBase {

  private def i(x: Int) = Integer.valueOf(x)
  private def d(x: Double) = java.lang.Double.valueOf(x)
  private def ts(epoch: Long) = Timestamp.from(Instant.ofEpochSecond(epoch))

  private val classifiedSchema = StructType(
    Schemas.source.fields :+ StructField("flight_status", StringType))

  test("active branch golden: takeoff stamp + trajectory recompute") {
    val classified = df(classifiedSchema,
      Row("65432a", i(1712338215), d(110.11), d(7.49), i(1712338215),
        i(1712338215), "other", java.lang.Boolean.FALSE, "other"),
      Row("1b3456", i(0), d(0.0), d(0.0), i(1712338205), i(1712338110),
        "climb", java.lang.Boolean.FALSE, "other"),
      Row("12c456", i(1712338315), d(71.14), d(11.38), i(0), i(1712338315),
        "climb", java.lang.Boolean.TRUE, "takeoff"))

    val out = CompleteFlightsJob.transformActive(classified)

    assert(out.columns.toSeq == Schemas.source.fieldNames.toSeq)
    assertSameRows(out, Seq(
      Row("12c456", i(1712338315), d(71.14), d(11.38), i(1712338315),
        i(1712338315), "climb", java.lang.Boolean.TRUE),
      Row("1b3456", i(0), d(0.0), d(0.0), i(1712338205), i(1712338110),
        "other", java.lang.Boolean.FALSE),
      Row("65432a", i(1712338215), d(110.11), d(7.49), i(1712338215),
        i(1712338215), "climb", java.lang.Boolean.FALSE)))
  }

  test("complete branch golden: 154-minute flight with joined metadata") {
    val classified = df(classifiedSchema,
      Row("65432a", i(1712338215), d(9.11), d(0.0), i(1712329013),
        i(1712338215), "descend", java.lang.Boolean.FALSE, "landing"),
      Row("1b3456", i(1712338315), d(0.0), d(0.0), i(0), i(1712338315),
        "descend", java.lang.Boolean.FALSE, "landing"))
    val metadata = df(Schemas.metadata,
      Row("65432a", "AB-CDE", "Boeing 737", "BOEING", "Test Lease",
        "Test Air", "2000-02-01"),
      Row("12c456", "BC-DEF", "Airbus 320", "AIRBUS", "New Test Lease",
        "New Test Air", "1990-03-05"))

    val out = CompleteFlightsJob.transformComplete(classified, metadata)

    assertSameRows(out, Seq(
      Row("65432a", i(154), ts(1712338215L), "AB-CDE", "Boeing 737",
        "BOEING", "Test Lease", "Test Air", ts(949363200L))))
  }

  test("complete branch keeps unmatched metadata as nulls") {
    val classified = df(classifiedSchema,
      Row("ffffff", i(1712338215), d(0.0), d(0.0), i(1712329013),
        i(1712338215), "other", java.lang.Boolean.FALSE, "landing"))
    val metadata = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.metadata)

    val out = CompleteFlightsJob.transformComplete(classified, metadata)

    assertSameRows(out, Seq(
      Row("ffffff", i(154), ts(1712338215L), null, null, null, null, null,
        null)))
  }

  test("full transform splits by classification") {
    val source = df(Schemas.source,
      // cruising: stays active
      Row("aaaaaa", i(1712338215), d(110.11), d(7.49), i(1712338215),
        i(1712338215), "other", java.lang.Boolean.FALSE),
      // landed: descend + slow + level
      Row("65432a", i(1712338215), d(9.11), d(0.0), i(1712329013),
        i(1712338215), "descend", java.lang.Boolean.FALSE))
    val metadata = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.metadata)

    val out = CompleteFlightsJob.transform(source, metadata)

    assert(out.active.select("icao24").collect().map(_.getString(0)).toSeq
      == Seq("aaaaaa"))
    assert(out.complete.select("icao24").collect().map(_.getString(0)).toSeq
      == Seq("65432a"))
  }
}
