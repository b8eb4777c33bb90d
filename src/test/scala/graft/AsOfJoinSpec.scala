package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** As-of join semantics: latest preceding right row per key, inclusive
  * at equal timestamps, null when nothing precedes, atomic rows even
  * with null value fields.
  */
class AsOfJoinSpec extends SparkSpecBase {

  private val leftSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("u", LongType),
    StructField("ts", TimestampType)))
  private val rightSchema = StructType(Seq(
    StructField("u", LongType),
    StructField("ts", TimestampType),
    StructField("rate", DoubleType),
    StructField("tag", StringType)))

  private def t(s: String) = Timestamp.valueOf(s)
  private def L(x: Long) = java.lang.Long.valueOf(x)
  private def D(x: Double) = java.lang.Double.valueOf(x)

  private val right = Seq(
    Row(L(10), t("2024-01-01 09:00:00"), D(5.0), "a"),
    Row(L(10), t("2024-01-01 11:00:00"), D(7.0), "b"),
    Row(L(10), t("2024-01-01 13:00:00"), null, "c"), // null value field
    Row(L(99), t("2024-01-01 09:00:00"), D(1.0), "z"))

  private def run(leftRows: Row*): Seq[Row] =
    AsOfJoin.asofJoin(
      df(leftSchema, leftRows: _*), df(rightSchema, right: _*),
      "u", "ts", Seq("rate", "tag"))
      .select("id", "rate", "tag")
      .collect().toSeq.sortBy(_.getLong(0))

  test("matches the latest preceding right row per key") {
    val got = run(
      Row(L(1), L(10), t("2024-01-01 10:00:00")),
      Row(L(2), L(10), t("2024-01-01 12:00:00")))
    assert(got == Seq(Row(L(1), D(5.0), "a"), Row(L(2), D(7.0), "b")))
  }

  test("equal timestamps are inclusive; no preceding row yields nulls") {
    val got = run(
      Row(L(1), L(10), t("2024-01-01 09:00:00")), // == right ts
      Row(L(2), L(10), t("2024-01-01 08:00:00")), // before everything
      Row(L(3), L(50), t("2024-01-01 12:00:00"))) // key with no right rows
    assert(got == Seq(
      Row(L(1), D(5.0), "a"),
      Row(L(2), null, null),
      Row(L(3), null, null)))
  }

  test("a later right row with a null field does not fall back to older values") {
    val got = run(Row(L(1), L(10), t("2024-01-01 14:00:00")))
    assert(got == Seq(Row(L(1), null, "c")))
  }

  test("null keys and null timestamps follow equi-join semantics — " +
      "composed and native paths agree") {
    // right noise: a null-key row and a null-ts row, which SQL ASOF
    // can never match; left row 2 has a null key and must get nulls
    val noisyRight = right ++ Seq(
      Row(null, t("2024-01-01 08:00:00"), D(99.0), "nullkey"),
      Row(L(10), null, D(98.0), "nullts"))
    val leftRows = Seq(
      Row(L(1), L(10), t("2024-01-01 10:00:00")),
      Row(L(2), null, t("2024-01-01 10:00:00")),
      Row(L(3), L(10), null))
    val expected = Seq(
      Row(L(1), D(5.0), "a"),
      Row(L(2), null, null),
      Row(L(3), null, null))
    val composed = AsOfJoin.asofJoin(
        df(leftSchema, leftRows: _*), df(rightSchema, noisyRight: _*),
        "u", "ts", Seq("rate", "tag"))
      .select("id", "rate", "tag").collect().toSeq.sortBy(_.getLong(0))
    assert(composed == expected, s"composed: $composed")
    val native = AsOfJoin.asofJoinNative(
        df(leftSchema, leftRows: _*), df(rightSchema, noisyRight: _*),
        "u", "ts", Seq("rate", "tag"))
      .select("id", "rate", "tag").collect().toSeq.sortBy(_.getLong(0))
    assert(native == expected, s"native: $native")
  }
}
