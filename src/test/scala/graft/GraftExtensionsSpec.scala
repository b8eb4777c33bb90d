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
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
