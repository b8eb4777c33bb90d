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

  // F7: the empty-relation guard. A cycle with zero completed flights
  // must be a NO-OP on the sink — writing an empty partitioned frame
  // would create a schema-less parquet directory that crashes the
  // next reader with "Unable to infer schema" (and, after retention
  // dropped every partition, the same way).
  test("writeFlights on an empty relation is a no-op; a later real " +
      "append still works (F7 empty-relation guard)") {
    val dir = Files.createTempDirectory("graft-f7").toString
    val sink = s"$dir/flights.parquet"
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.flights)
    Sources.writeFlights(empty, sink)
    assert(!new java.io.File(sink).exists(),
      "empty write must not create the sink directory")
    // the guarded no-op must not poison a later real append
    val one = df(Schemas.flights,
      Row("a23456", Integer.valueOf(10),
        java.sql.Timestamp.valueOf("2024-04-05 17:36:40"),
        "VQ-BGU", "A320", "AIRBUS", "owner", "op",
        java.sql.Timestamp.valueOf("2008-01-01 00:00:00")))
    Sources.writeFlights(one, sink)
    Sources.writeFlights(empty, sink) // guard again, post-append
    val back = spark.read.parquet(sink)
    assert(back.count() == 1)
    assert(back.columns.contains("landed_date"))
  }
}
