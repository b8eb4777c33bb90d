package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession shared by every suite in the fork. */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 2), schema)

  /** Order-insensitive golden compare, keyed on the first column. */
  def assertSameRows(got: DataFrame, expected: Seq[Row]): Unit = {
    val gotRows = got.collect().toSeq
      .sortBy(r => Option(r.get(0)).map(_.toString).getOrElse(""))
    val expRows = expected
      .sortBy(r => Option(r.get(0)).map(_.toString).getOrElse(""))
    assert(gotRows.length == expRows.length,
      s"row count ${gotRows.length} != ${expRows.length}\ngot: $gotRows\nexp: $expRows")
    gotRows.zip(expRows).foreach { case (g, e) =>
      assert(g == e, s"\ngot:      $g\nexpected: $e")
    }
  }
}
