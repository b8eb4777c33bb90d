package graft

import org.apache.spark.sql.Row

/** Golden specs for the state-update plan, ported from the reference's
  * `_transform` / `_remove_inactive` tests (reference:
  * src/tests/plugins/scripts/opensky/test_transformers.py:244-368).
  * The "now" horizon is a parameter here, so the goldens pin T instead
  * of calling the clock.
  */
class ActiveFlightsJobSpec extends SparkSpecBase {

  private val T = 1712338230
  private def i(x: Int) = Integer.valueOf(x)
  private def d(x: Double) = java.lang.Double.valueOf(x)
  private def L(x: Long) = java.lang.Long.valueOf(x)

  test("eviction boundary: 19 min old stays, 21 min old is dropped") {
    val activeFlights = df(Schemas.source,
      Row("a23456", i(T), d(18.41), d(6.11), i(1712338205), i(T - 19 * 60),
        "climb", java.lang.Boolean.FALSE),
      Row("65432a", i(T), d(240.52), d(0.0), i(1712338215), i(T - 21 * 60),
        "other", java.lang.Boolean.FALSE))
    val out = ActiveFlightsJob.removeInactive(activeFlights, T - 20 * 60)
    assertSameRows(out.select("icao24"), Seq(Row("a23456")))
  }

  test("state update golden: merge, fill, transition, refresh") {
    val states = df(Schemas.states,
      Row("65432a", L(T), d(210.11), d(-0.7)),
      Row("12c456", L(T), d(18.41), d(6.11)))
    val latestSource = df(Schemas.source,
      Row("a23456", i(0), d(137.18), d(-1.1), i(0), i(T - 25 * 60),
        "descend", java.lang.Boolean.FALSE),
      Row("65432a", i(T - 15 * 60), d(240.52), d(0.0), i(1712338215),
        i(T - 15 * 60), "other", java.lang.Boolean.FALSE),
      Row("1b3456", i(T - 5 * 60), d(18.41), d(6.11), i(1712338205),
        i(T - 5 * 60), "climb", java.lang.Boolean.TRUE))

    val out = ActiveFlightsJob.stateUpdate(states, latestSource, T - 20 * 60)

    assertSameRows(out, Seq(
      Row("12c456", i(T), d(18.41), d(6.11), i(0), i(T), null,
        java.lang.Boolean.TRUE),
      Row("1b3456", i(0), d(0.0), d(0.0), i(1712338205), i(T - 5 * 60),
        "climb", java.lang.Boolean.FALSE),
      Row("65432a", i(T), d(210.11), d(-0.7), i(1712338215), i(T), "other",
        java.lang.Boolean.FALSE)))
  }

  test("state update from an empty state table: everything is first contact") {
    val states = df(Schemas.states,
      Row("65432a", L(T), d(210.11), d(-0.7)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.source)

    val out = ActiveFlightsJob.stateUpdate(states, empty, T - 20 * 60)

    assertSameRows(out, Seq(
      Row("65432a", i(T), d(210.11), d(-0.7), i(0), i(T), null,
        java.lang.Boolean.TRUE)))
  }

  test("output schema matches the declared source schema") {
    val states = df(Schemas.states, Row("65432a", L(T), d(210.11), d(-0.7)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.source)
    val out = ActiveFlightsJob.stateUpdate(states, empty, T - 20 * 60)
    assert(out.schema.fieldNames.toSeq == Schemas.source.fieldNames.toSeq)
    assert(out.schema("last_contact").dataType.typeName == "integer")
    assert(out.schema("takeoff_at").dataType.typeName == "integer")
    assert(out.schema("flight_last_contact").dataType.typeName == "integer")
  }
}
