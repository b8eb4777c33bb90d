package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Derived

/** Pins `Derived.events` against every physical `ts` encoding the
  * driver's corpus generator has shipped, so a testdata regeneration
  * can never again silently break the whole events-derived query
  * surface (round 10: TIMESTAMP(NANOS) → TIMESTAMP(MICROS) switch cost
  * 27/107 oracle queries, the bench, and 7 tests at analysis time).
  *
  * Three fixtures with identical logical content:
  *  - BIGINT nanoseconds — what `nanosAsLong=true` yields from a
  *    TIMESTAMP(NANOS) file (post-read they are indistinguishable).
  *  - TIMESTAMP_NTZ micros — what pyarrow's `timestamp[us]`
  *    (isAdjustedToUTC=false) reads as; the current corpus encoding.
  *  - TIMESTAMP (LTZ) micros — the tz-adjusted variant.
  *
  * `Derived.events` must return byte-identical rows AND schema from all
  * three, because downstream oracle hashes depend on both.
  */
class DerivedEventsSpec extends SparkSpecBase {

  // 2024-03-01T12:34:56.789012 UTC and one second later, in micros.
  private val baseMicros = 1709296496789012L
  private val rowsLogical = Seq(
    (1L, baseMicros, 10L, "click", 42.5, "{}"),
    (2L, baseMicros + 1000000L, 20L, "signup", 61.0, "{}"))

  private def writeDir(): String =
    Files.createTempDirectory("derived-events").toString

  private def writeNanosLong(dir: String): Unit = {
    import spark.implicits._
    rowsLogical
      .map { case (id, us, uid, et, v, p) => (id, us * 1000L, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
  }

  private def writeMicros(dir: String, ntz: Boolean): Unit = {
    val tsType: DataType = if (ntz) TimestampNTZType else TimestampType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val rows = rowsLogical.map { case (id, us, uid, et, v, p) =>
      val tsVal: Any =
        if (ntz)
          LocalDateTime.ofEpochSecond(us / 1000000L,
            ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        else {
          val t = new Timestamp(us / 1000L)
          t.setNanos(((us % 1000000L) * 1000L).toInt)
          t
        }
      Row(id, tsVal, uid, et, v, p)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.parquet(s"$dir/events.parquet")
  }

  private def canonical(df: DataFrame): Seq[String] =
    df.orderBy(df.columns.map(col).toSeq: _*).collect().toSeq.map(_.toString)

  test("events yields identical rows+schema from nanos-BIGINT, NTZ-micros and LTZ-micros encodings") {
    val nanosDir = writeDir(); writeNanosLong(nanosDir)
    val ntzDir = writeDir(); writeMicros(ntzDir, ntz = true)
    val ltzDir = writeDir(); writeMicros(ltzDir, ntz = false)

    val fromNanos = Derived.events(spark, nanosDir)
    val fromNtz = Derived.events(spark, ntzDir)
    val fromLtz = Derived.events(spark, ltzDir)

    // Schema must be identical — oracle hash compare is schema-sensitive.
    assert(fromNanos.schema == fromNtz.schema,
      s"nanos vs NTZ schema drift:\n${fromNanos.schema}\n${fromNtz.schema}")
    assert(fromNanos.schema == fromLtz.schema,
      s"nanos vs LTZ schema drift:\n${fromNanos.schema}\n${fromLtz.schema}")
    assert(fromNanos.schema("ts").dataType == TimestampType)

    val a = canonical(fromNanos)
    assert(a == canonical(fromNtz), "nanos vs NTZ row drift")
    assert(a == canonical(fromLtz), "nanos vs LTZ row drift")

    // Micros precision survives end-to-end (.789012 not truncated).
    assert(a.head.contains("12:34:56.789012"), s"precision lost: ${a.head}")
  }

  test("events rejects an unrecognized ts encoding with a named diagnosis") {
    val dir = writeDir()
    import spark.implicits._
    rowsLogical
      .map { case (id, us, uid, et, v, p) => (id, us.toString, uid, et, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException](Derived.events(spark, dir))
    // the corpus-boundary TYPE-FAMILY guard fires first with the
    // named table+column diagnosis (round-10 hardening)
    assert(e.getMessage.contains("'events'"))
    assert(e.getMessage.contains("'ts'"))
    assert(e.getMessage.contains("string"))
  }

  test("type-family guard: an embedding column outside the numeric " +
      "array family fails with a named diagnosis") {
    val dir = writeDir()
    import spark.implicits._
    Seq((1L, Seq("not", "numbers"), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException](
      Derived.table(spark, dir, "embeddings"))
    assert(e.getMessage.contains("'embeddings'"))
    assert(e.getMessage.contains("'embedding'"))
    assert(e.getMessage.contains("array<string>"))
  }

  test("corpus boundary guard names the table and missing column on drift") {
    val dir = writeDir()
    import spark.implicits._
    // documents without its load-bearing `text` column
    Seq((1L, "en", "web")).toDF("doc_id", "lang", "source")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException](
      Derived.table(spark, dir, "documents"))
    assert(e.getMessage.contains("documents"))
    assert(e.getMessage.contains("text"))
    assert(e.getMessage.contains("doc_id:bigint"))
  }

  test("derived states/source agree across encodings (downstream fan-out)") {
    val nanosDir = writeDir(); writeNanosLong(nanosDir)
    val ntzDir = writeDir(); writeMicros(ntzDir, ntz = true)
    assert(canonical(Derived.states(spark, nanosDir)) ==
      canonical(Derived.states(spark, ntzDir)))
    assert(canonical(Derived.source(spark, nanosDir)) ==
      canonical(Derived.source(spark, ntzDir)))
  }
}
