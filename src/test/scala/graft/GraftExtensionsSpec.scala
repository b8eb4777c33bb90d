package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions entry point registers the native functions
  * on sessions built with the extensions installed.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions sessions see cosine_similarity in the catalog") {
    val base = SparkTestSession.spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extended = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = extended.sql(
        """SELECT cosine_similarity(
             CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
             CAST(array(3.0, 2.0, 1.0) AS ARRAY<FLOAT>)) AS s""")
        .collect()(0).getDouble(0)
      assert(math.abs(got - 10.0 / 14.0) < 1e-12)
      val cell = extended.sql(
        """SELECT nearest_cell(
             CAST(array(0.0, 1.0) AS ARRAY<FLOAT>),
             array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS c""")
        .collect()(0).getInt(0)
      assert(cell == 1)
      // the planner strategy is injected too: the native as-of join
      // plans without any per-session registration call
      val planner = extended
        .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.planner
      assert(planner.strategies.contains(graft.plans.AsOfJoinStrategy),
        planner.strategies.map(_.getClass.getName).mkString(","))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
