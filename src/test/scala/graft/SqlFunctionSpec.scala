package graft

import graft.functions.VectorExprs

/** The custom Catalyst expression is reachable from the SQL surface
  * once registered on the session.
  */
class SqlFunctionSpec extends SparkSpecBase {

  test("cosine_similarity is callable from SQL") {
    VectorExprs.registerSql(spark)
    val got = spark.sql(
      """SELECT cosine_similarity(
           CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
           CAST(array(3.0, 2.0, 1.0) AS ARRAY<FLOAT>)) AS s""")
      .collect()(0).getDouble(0)
    assert(math.abs(got - 10.0 / 14.0) < 1e-12)
  }

  test("SQL surface type-checks the arguments") {
    VectorExprs.registerSql(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_similarity(1, 2)").collect()
    }
  }
}
