package graft

import org.apache.spark.sql.Row
import java.nio.file.Files

/** Source-edge specs: missing→empty fallback, schema validation,
  * states decode (reference:
  * src/tests/plugins/scripts/opensky/test_transformers.py:94-160,
  * src/tests/plugins/common/test_s3.py:63-68).
  */
class SourcesSpec extends SparkSpecBase {

  test("missing state file degrades to empty frame with declared schema") {
    val out = Sources.readParquetOrEmpty(
      spark, "/tmp/graft-does-not-exist.parquet", Schemas.source)
    assert(out.schema == Schemas.source)
    assert(out.count() == 0)
  }

  test("state file lacking required columns raises InvalidSource") {
    val dir = Files.createTempDirectory("graft-badstate").toString
    val bad = df(Schemas.states,
      Row("a23456", java.lang.Long.valueOf(1712338235L),
        java.lang.Double.valueOf(18.41), java.lang.Double.valueOf(6.11)))
    bad.write.mode("overwrite").parquet(s"$dir/state.parquet")
    intercept[Sources.InvalidSource] {
      Sources.readParquetOrEmpty(spark, s"$dir/state.parquet", Schemas.source)
        .columns
    }
  }

  test("state round-trips through the parquet overwrite writer") {
    val dir = Files.createTempDirectory("graft-state").toString
    val state = df(Schemas.source,
      Row("a23456", Integer.valueOf(1712338235), java.lang.Double.valueOf(18.41),
        java.lang.Double.valueOf(6.11), Integer.valueOf(0),
        Integer.valueOf(1712338235), "climb", java.lang.Boolean.TRUE))
    Sources.writeState(state, s"$dir/state.parquet")
    val back = Sources.readParquetOrEmpty(
      spark, s"$dir/state.parquet", Schemas.source)
    assertSameRows(back, state.collect().toSeq)
  }

  test("states payload decodes onto the 17-column schema and projects") {
    val row = Seq("a23456", "Speedbird", "Ukraine", 1712338230L, 1712338130L,
      -37.80467681, 144.9659498, 700.25, false, 240.52, 5.154, 6.3, null,
      620.25, "Code", false, 0)
    val out = Sources.projectStates(Sources.statesFromRows(spark, Seq(row)))
    assertSameRows(out, Seq(
      Row("a23456", java.lang.Long.valueOf(1712338130L),
        java.lang.Double.valueOf(240.52), java.lang.Double.valueOf(6.3))))
  }

  test("malformed states row fails fast") {
    intercept[Sources.InvalidResponseError] {
      Sources.statesFromRows(spark, Seq(Seq("a23456", 1712338130L)))
    }
  }
}
