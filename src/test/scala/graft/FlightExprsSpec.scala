package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Truth-table specs for E1–E4 + C3/C4, ported from the reference's
  * per-method tests (reference:
  * src/tests/plugins/scripts/complete_flights/test_transform.py:57-275,
  * src/tests/plugins/scripts/opensky/test_transformers.py:188-242).
  */
class FlightExprsSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("icao24", StringType),
    StructField("last_contact", IntegerType),
    StructField("velocity", DoubleType),
    StructField("vertical_rate", DoubleType),
    StructField("takeoff_at", IntegerType),
    StructField("flight_last_contact", IntegerType),
    StructField("flight_trajectory", StringType),
    StructField("is_first_contact", BooleanType),
  ))

  private def statusOf(lastContact: Any, velocity: Any, verticalRate: Any,
      trajectory: String, isFirstContact: Any): String = {
    val in = df(schema, Row("a23456", lastContact, velocity, verticalRate,
      Integer.valueOf(1712337230), Integer.valueOf(1712338130), trajectory,
      isFirstContact))
    in.select(FlightExprs.flightStatus().as("s")).collect()(0).getString(0)
  }

  private def landingOf(lastContact: Any, velocity: Any, verticalRate: Any,
      trajectory: String): Boolean = {
    val in = df(schema, Row("a23456", lastContact, velocity, verticalRate,
      Integer.valueOf(1712337230), Integer.valueOf(1712338130), trajectory,
      java.lang.Boolean.TRUE))
    val r = in.select(FlightExprs.isLanding().as("l")).collect()(0)
    !r.isNullAt(0) && r.getBoolean(0)
  }

  private def trajectoryOf(verticalRate: Any, prev: String): String = {
    val in = df(schema, Row("a23456", Integer.valueOf(1712338130),
      java.lang.Double.valueOf(110.52), verticalRate,
      Integer.valueOf(1712337230), Integer.valueOf(1712338130), prev,
      java.lang.Boolean.FALSE))
    in.select(FlightExprs.flightTrajectory().as("t")).collect()(0).getString(0)
  }

  private val t = Integer.valueOf(1712338130)
  private def d(x: Double) = java.lang.Double.valueOf(x)

  test("takeoff: first contact and climbing") {
    assert(statusOf(t, d(240.52), d(6.3), "climb", java.lang.Boolean.TRUE) == "takeoff")
  }
  test("no takeoff when not first contact") {
    assert(statusOf(t, d(240.52), d(6.3), "climb", java.lang.Boolean.FALSE) == "other")
  }
  test("no takeoff when vertical rate is zero") {
    assert(statusOf(t, d(240.52), d(0.0), "climb", java.lang.Boolean.TRUE) == "other")
  }
  test("landing: descend and slow, level") {
    assert(statusOf(t, d(9.52), d(0.0), "descend", java.lang.Boolean.TRUE) == "landing")
  }
  test("no landing when absent this batch (0-sentinel)") {
    assert(statusOf(Integer.valueOf(0), d(9.52), d(0.0), "descend",
      java.lang.Boolean.TRUE) == "other")
  }
  test("no landing when too fast while descending") {
    assert(statusOf(t, d(11.52), d(0.0), "descend", java.lang.Boolean.TRUE) == "other")
  }
  test("no landing when still climbing or sinking") {
    assert(!landingOf(t, d(8.52), d(1.1), "descend"))
    assert(!landingOf(t, d(8.52), d(-1.1), "descend"))
  }
  test("landing with null vertical rate and zero velocity") {
    assert(statusOf(t, d(0.0), null, "other", java.lang.Boolean.FALSE) == "landing")
  }
  test("landing with null velocity") {
    assert(statusOf(t, null, d(0.0), "other", java.lang.Boolean.FALSE) == "landing")
  }
  test("status other for cruise") {
    assert(statusOf(t, d(110.52), d(-1.1), "descend", java.lang.Boolean.FALSE) == "other")
  }

  test("trajectory: positive rate wins as climb") {
    assert(trajectoryOf(d(1.1), "descend") == "climb")
  }
  test("trajectory: negative rate is descend") {
    assert(trajectoryOf(d(-1.1), "climb") == "descend")
  }
  test("trajectory: sticky descend at level flight") {
    assert(trajectoryOf(d(0.0), "descend") == "descend")
  }
  test("trajectory: level flight otherwise is other") {
    assert(trajectoryOf(d(0.0), "climb") == "other")
  }
  test("trajectory: null rate with null prev is other") {
    assert(trajectoryOf(null, null) == "other")
  }

  test("first-contact transition is simultaneous: null→true, true→false") {
    val in = df(schema,
      Row("a23456", Integer.valueOf(0), d(137.18), d(-1.1),
        Integer.valueOf(0), Integer.valueOf(1712338203), "descend",
        java.lang.Boolean.FALSE),
      Row("65432a", Integer.valueOf(1712338237), d(240.52), d(0.0),
        Integer.valueOf(1712338215), Integer.valueOf(1712338237), "other",
        java.lang.Boolean.TRUE),
      Row("1b3456", Integer.valueOf(1712338135), d(18.41), d(6.11),
        Integer.valueOf(1712338205), Integer.valueOf(1712338135), "climb",
        null))
    val out = in.withColumn("is_first_contact",
      FlightExprs.firstContactTransition())
      .select("icao24", "is_first_contact")
    assertSameRows(out, Seq(
      Row("1b3456", java.lang.Boolean.TRUE),
      Row("65432a", java.lang.Boolean.FALSE),
      Row("a23456", java.lang.Boolean.FALSE)))
  }

  test("flight_last_contact refreshes only for aircraft seen this batch") {
    val in = df(schema,
      Row("a23456", Integer.valueOf(0), d(137.18), d(-1.1),
        Integer.valueOf(0), Integer.valueOf(1712338203), "descend",
        java.lang.Boolean.FALSE),
      Row("65432a", Integer.valueOf(1712338237), d(240.52), d(0.0),
        Integer.valueOf(1712338215), Integer.valueOf(1712338115), "other",
        java.lang.Boolean.TRUE),
      Row("1b3456", Integer.valueOf(1712338135), d(18.41), d(6.11),
        Integer.valueOf(1712338205), Integer.valueOf(0), "climb", null))
    val out = in.withColumn("flight_last_contact",
      FlightExprs.refreshedFlightLastContact())
      .select("icao24", "flight_last_contact")
    assertSameRows(out, Seq(
      Row("1b3456", Integer.valueOf(1712338135)),
      Row("65432a", Integer.valueOf(1712338237)),
      Row("a23456", Integer.valueOf(1712338203))))
  }

  test("duration is ceil of minutes") {
    val in = df(schema, Row("65432a", Integer.valueOf(1712338215), d(9.11),
      d(0.0), Integer.valueOf(1712329013), Integer.valueOf(1712338215),
      "descend", java.lang.Boolean.FALSE))
    val out = in.select(FlightExprs.durationMinutes(
      col("last_contact"), col("takeoff_at")).as("m")).collect()(0).getInt(0)
    assert(out == 154)
  }
}
