package graft

import org.apache.spark.sql.Row
import java.nio.file.{Files, Paths}

/** File-format source coverage: header+inferSchema CSV for the
  * aircraft database (S3) and schema'd JSON replay for states
  * snapshots (S1 file-based twin).
  */
class SourceFormatsSpec extends SparkSpecBase {

  test("ORC round-trip preserves schema and values, and filters push " +
      "into the ORC scan — the columnar alternative when a lakehouse " +
      "standardizes on ORC instead of parquet") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-orc").toString
    val df = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source", "n_chars", "text")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == df.schema, s"schema drift: ${back.schema}")
    assert(back.count() == df.count())
    assert(back.agg(sum("n_chars"), sum(length(col("text")))).head()
      == df.agg(sum("n_chars"), sum(length(col("text")))).head())
    val plan = back.filter(col("doc_id") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"),
      s"ORC scan must accept the pushed filter:\n$plan")
  }

  test("metadata CSV scan infers types and projects to the dimension") {
    val dir = Files.createTempDirectory("graft-csv")
    val csv =
      """icao24,registration,manufacturericao,model,owner,operator,built,extra
        |a23456,AB-CDE,BOEING,Boeing 737,Lease Co,Test Air,2000-02-01,1
        |65432a,BC-DEF,AIRBUS,Airbus 320,Own Co,New Air,1990-03-05,2
        |""".stripMargin
    Files.writeString(dir.resolve("aircraft.csv"), csv)

    val raw = Sources.readMetadataCsv(spark, dir.toString + "/aircraft.csv")
    assert(raw.schema("extra").dataType.typeName == "integer") // inferred
    val dim = MetadataJob.projectMetadata(raw)
    assert(dim.columns.toSeq == Schemas.metadata.fieldNames.toSeq)
    assertSameRows(dim.select("icao24", "manufacturer_icao", "built"), Seq(
      Row("65432a", "AIRBUS", "1990-03-05"),
      Row("a23456", "BOEING", "2000-02-01")))
  }

  test("states JSON replay reads with the declared schema, no inference") {
    val dir = Files.createTempDirectory("graft-json")
    // one snapshot row per line, fields named as in the 17-col schema
    Files.writeString(dir.resolve("states.json"),
      """{"icao24":"a23456","callsign":"Speedbird","origin_country":"UA","time_position":1712338230,"last_contact":1712338130,"longitude":-37.8,"latitude":144.9,"baro_altitude":700.25,"on_ground":false,"velocity":240.52,"true_track":5.154,"vertical_rate":6.3,"sensors":null,"geo_altitude":620.25,"squawk":"Code","spi":false,"position_source":0}
        |{"icao24":"65432a","last_contact":1712338131,"velocity":10.5,"vertical_rate":0.0,"on_ground":true}
        |""".stripMargin)

    val states17 = Sources.readStatesJson(spark, dir.toString + "/states.json")
    assert(states17.schema == Schemas.states17)
    val projected = Sources.projectStates(states17)
    assertSameRows(projected, Seq(
      Row("65432a", java.lang.Long.valueOf(1712338131L),
        java.lang.Double.valueOf(10.5), java.lang.Double.valueOf(0.0)),
      Row("a23456", java.lang.Long.valueOf(1712338130L),
        java.lang.Double.valueOf(240.52), java.lang.Double.valueOf(6.3))))
  }

  test("malformed states JSON fails fast") {
    val dir = Files.createTempDirectory("graft-badjson")
    Files.writeString(dir.resolve("states.json"),
      """{"icao24":"a23456","last_contact":"not-a-number"}
        |""".stripMargin)
    intercept[org.apache.spark.SparkException] {
      Sources.readStatesJson(spark, dir.toString + "/states.json").collect()
    }
  }

  test("complete branch has a typed Dataset[Flight] view") {
    val classified = df(
      org.apache.spark.sql.types.StructType(Schemas.source.fields :+
        org.apache.spark.sql.types.StructField("flight_status",
          org.apache.spark.sql.types.StringType)),
      Row("65432a", Integer.valueOf(1712338215), java.lang.Double.valueOf(9.11),
        java.lang.Double.valueOf(0.0), Integer.valueOf(1712329013),
        Integer.valueOf(1712338215), "descend", java.lang.Boolean.FALSE,
        "landing"))
    val metadata = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], Schemas.metadata)
    val ds = CompleteFlightsJob.completeAsDataset(classified, metadata)
    val flights: Seq[Flight] = ds.collect().toSeq
    assert(flights == Seq(Flight("65432a", 154,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1712338215L)),
      None, None, None, None, None, None)))
  }

  test("flights sink partitions by landing date for TTL partition drops") {
    val dir = Files.createTempDirectory("graft-sink").toString
    val flights = df(Schemas.flights,
      Row("a23456", Integer.valueOf(10),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1712338215L)),
        null, null, null, null, null, null),
      Row("65432a", Integer.valueOf(20),
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1712500000L)),
        null, null, null, null, null, null))
    Sources.writeFlights(flights, s"$dir/flights")
    val partitions = Files.list(Paths.get(s"$dir/flights")).toArray
      .map(_.toString).filter(_.contains("landed_date=")).sorted
    assert(partitions.map(_.split("landed_date=").last).toSeq ==
      Seq("2024-04-05", "2024-04-07"))
  }
}
